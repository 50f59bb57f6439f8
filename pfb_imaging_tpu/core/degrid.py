"""``degrid``: predict a component model into the measurement container's
MODEL_DATA (reference core/degrid.py:31-344 + gridder comps2vis:148-367).

The reference distributes this with dask blockwise over row/chan chunks;
here each partition is one jitted degrid (rows shard over the mesh via
parallel/ when configured).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.gridder import dirty2vis, plan_wgridder
from ..utils.logging import get_logger
from ..utils.modelspec import eval_coeffs_to_slice, load_mds
from ..utils.store import TreeStore
from ..utils.stokes import stokes_to_corr

log = get_logger("DEGRID")


def degrid(
    mds_path,
    ms_path,
    cell_rad: float,
    column: str = "MODEL_DATA",
    epsilon: float = 1e-7,
    do_wgridding: bool = True,
    freq_bins: int | None = None,
    to_corr: bool = False,
):
    """Render the .mds model per (partition, freq bin) and degrid to vis."""
    coeffs, ix, iy, mattrs = load_mds(TreeStore(mds_path))
    ms = TreeStore(ms_path, mode="w")
    nx, ny = mattrs["nx"], mattrs["ny"]
    feed_type = ms.attrs.get("feed_type", "linear")
    ncorr = ms.attrs.get("ncorr", 1)

    for key in ms.groups():
        g = ms.group(key)
        uvw = np.asarray(g.read("UVW"))
        freqs = np.asarray(g.read("FREQ")) if g.has("FREQ") else np.asarray(ms.attrs["freq"])
        ttime = g.attrs.get("time", 0.0)
        nbin = freq_bins or len(mattrs["freqs"])
        edges = np.linspace(freqs.min(), freqs.max() * (1 + 1e-12), nbin + 1)
        which = np.clip(np.digitize(freqs, edges) - 1, 0, nbin - 1)

        vis = np.zeros((uvw.shape[0], freqs.size), dtype=np.complex128)
        for bin_id in range(nbin):
            chans = np.where(which == bin_id)[0]
            if chans.size == 0:
                continue
            fc = float(freqs[chans].mean())
            img = eval_coeffs_to_slice(ttime, fc, coeffs, ix, iy, mattrs)
            plan = plan_wgridder(
                uvw,
                freqs[chans],
                nx=nx,
                ny=ny,
                cellx=cell_rad,
                celly=cell_rad,
                l0=g.attrs.get("l0", 0.0),
                m0=g.attrs.get("m0", 0.0),
                epsilon=epsilon,
                do_wgridding=do_wgridding,
                divide_by_n=False,
            )
            vis[:, chans] = np.asarray(dirty2vis(plan, jnp.asarray(img)))
        if to_corr:
            stokes = np.zeros((4,) + vis.shape, dtype=vis.dtype)
            stokes[0] = vis
            out = np.asarray(stokes_to_corr(jnp.asarray(stokes), feed_type=feed_type, ncorr=ncorr))
        else:
            out = vis
        g.write(column, out)
        log.info("degrid: wrote %s for %s", column, key)
    return ms
