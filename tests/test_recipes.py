"""Recipe runner end-to-end (reference recipes/sara.yml analogue)."""

import numpy as np

from pfb_imaging_tpu.recipes import load_recipe, run_recipe


def test_load_recipe_mini_yaml():
    r = load_recipe("recipes/sara.yml")
    assert r["name"] == "sara-pipeline"
    assert len(r["steps"]) == 5
    assert r["steps"][0]["command"] == "simulate"
    assert r["steps"][2]["args"]["nband"] == 2
    assert r["steps"][2]["args"]["epsilon"] == 1e-9


def test_run_sara_recipe(tmp_path):
    run_recipe("recipes/sara.yml", {"out": str(tmp_path)})
    from pfb_imaging_tpu.utils.fits import load_fits
    from pfb_imaging_tpu.utils.store import TreeStore

    dt = TreeStore(str(tmp_path / "sim_I.dt"))
    node = dt.group("band0000_time0000")
    assert node.attrs["niters"] == 2
    img, hdr = load_fits(str(tmp_path / "sim_I_image_mfs.fits"))
    assert np.isfinite(img).all()
