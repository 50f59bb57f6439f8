"""Path-equivalence tests (reference tests/test_imager.py:122-240):
the imager's gridded dirty must equal direct gridding of the concatenated
stream (linearity in rows), and per-partition summing must match one-shot
gridding — the row-sharding correctness argument."""

import numpy as np
import pytest

from pfb_imaging_tpu.core.imager import imager
from pfb_imaging_tpu.core.init import init
from pfb_imaging_tpu.core.simulate import simulate_vis_store
from pfb_imaging_tpu.ops.dft import vis2dirty_dft
from pfb_imaging_tpu.utils.store import TreeStore


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    base = tmp_path_factory.mktemp("eq")
    ms = str(base / "eq.ms.tree")
    store, truth = simulate_vis_store(ms, nant=10, ntime=3, nchan=4, nx=48)
    xds = str(base / "eq.xds")
    init(ms, xds)
    dt = str(base / "eq.dt")
    imager(
        xds, dt, nband=1, nx=48, cell_size=np.rad2deg(truth["cell_rad"]) * 3600,
        epsilon=1e-10, do_wgridding=True, fits_out=False,
    )
    return ms, xds, dt, truth


def test_imager_equals_dft_of_concatenated_stream(products):
    """MFS dirty from the imager == one explicit DFT over ALL rows — the
    reference's imager <-> init+grid MFS equality, with the DFT as oracle."""
    ms, xds, dt, truth = products
    tree = TreeStore(dt)
    node = tree.group("band0000_time0000")
    dirty = np.asarray(node.read("DIRTY"))

    x = TreeStore(xds)
    uvw, vis, wgt, mask = [], [], [], []
    for key in x.groups():
        g = x.group(key)
        uvw.append(np.asarray(g.read("UVW")))
        vis.append(np.asarray(g.read("VIS")))
        wgt.append(np.asarray(g.read("WEIGHT")))
        mask.append(np.asarray(g.read("MASK")))
    uvw = np.concatenate(uvw)
    vis = np.concatenate(vis)
    wgt = np.concatenate(wgt) * np.concatenate(mask)
    freq = np.asarray(x.attrs["freq"])
    cell = truth["cell_rad"]
    oracle = np.asarray(
        vis2dirty_dft(uvw, freq, vis, wgt=wgt, nx=48, ny=48, cellx=cell, celly=cell, divide_by_n=False)
    )
    err = np.abs(dirty - oracle).max() / np.abs(oracle).max()
    assert err < 1e-9, f"imager vs DFT rel err {err}"


def test_partition_sum_linearity(products):
    """Sum of per-partition dirty images == whole-stream dirty (the row-shard
    psum correctness argument, reference imager-pipeline.md:121-125)."""
    ms, xds, dt, truth = products
    tree = TreeStore(dt)
    node = tree.group("band0000_time0000")
    dirty = np.asarray(node.read("DIRTY"))
    cell = truth["cell_rad"]
    acc = np.zeros_like(dirty)
    for pk in node.groups():
        pg = node.group(pk)
        acc += np.asarray(
            vis2dirty_dft(
                np.asarray(pg.read("UVW")),
                np.asarray(pg.read("FREQ")),
                np.asarray(pg.read("VIS")),
                wgt=np.asarray(pg.read("WEIGHT")) * np.asarray(pg.read("MASK")),
                nx=48,
                ny=48,
                cellx=cell,
                celly=cell,
                divide_by_n=False,
            )
        )
    err = np.abs(dirty - acc).max() / np.abs(acc).max()
    assert err < 1e-9


def test_psf_peak_equals_wsum(products):
    ms, xds, dt, truth = products
    tree = TreeStore(dt)
    node = tree.group("band0000_time0000")
    psf = np.asarray(node.read("PSF"))
    wsum = float(np.asarray(node.read("WSUM"))[0])
    nx_psf = psf.shape[0]
    assert psf[nx_psf // 2, nx_psf // 2] == pytest.approx(wsum, rel=1e-9)
