"""``model2comps``: fit an image cube to a component-coefficient model
(reference core/model2comps.py:23-692)."""

from __future__ import annotations

import numpy as np

from ..utils.logging import get_logger
from ..utils.modelspec import fit_image_cube, save_mds
from ..utils.store import TreeStore

log = get_logger("MODEL2COMPS")


def model2comps(dt_path, mds_path=None, model_name: str = "MODEL", nbasisf: int | None = None, nbasist: int = 1):
    """Fit the tree's model cube; returns the mds TreeStore."""
    dt = TreeStore(dt_path)
    attrs = dt.attrs
    band_nodes = [k for k in dt.groups() if k.startswith("band")]
    nband = len(band_nodes)
    freq_out = np.asarray(attrs["freq_out"], dtype=float)
    nx, ny = attrs["nx"], attrs["ny"]

    model = np.zeros((nband, nx, ny))
    for b, key in enumerate(band_nodes):
        node = dt.group(key)
        if node.has(model_name):
            model[b] = np.asarray(node.read(model_name))
    if not model.any():
        raise ValueError(f"No {model_name} found in {dt_path}")

    coeffs, ix, iy, mattrs = fit_image_cube(
        np.asarray([0.0]), freq_out, model[None], nbasisf=nbasisf or nband, nbasist=nbasist
    )
    mattrs["cell_rad"] = attrs["cell_rad"]
    mds_path = mds_path or str(dt.path).replace(".dt", ".mds")
    mds = TreeStore(mds_path, mode="w")
    save_mds(mds, coeffs, ix, iy, mattrs)
    log.info("wrote %s with %d components", mds_path, ix.size)
    return mds
