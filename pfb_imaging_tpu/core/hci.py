"""``hci``: high-cadence (snapshot) imaging (reference core/hci.py:39-980 +
utils/stokes2im.py).

Grids a dirty-image cube per (time, freq) chunk into a pre-scaffolded
stacked store, with optional synthetic transient injection and per-bin RMS
flagging — the reference's transient-search pipeline shape.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..models.transients import transient_spectrum
from ..ops.gridder import dirty2vis, plan_wgridder, vis2dirty
from ..utils.logging import get_logger
from ..utils.store import TreeStore

log = get_logger("HCI")


def hci(
    xds_path,
    output_store,
    nx: int = 128,
    cell_rad: float | None = None,
    freq_chunks: int = 1,
    epsilon: float = 1e-7,
    do_wgridding: bool = True,
    inject_transient: dict | None = None,
    rms_flag_level: float | None = None,
):
    """Snapshot dirty cubes per (scan/time, freq chunk).

    Output: stacked cube store with CUBE (ntime, nfreq_chunk, nx, ny),
    WSUMS, TIMES, FREQS (reference make_dummy_dataset scaffold,
    core/hci.py:741).
    """
    xds = TreeStore(xds_path)
    attrs = xds.attrs
    cell = cell_rad or attrs["cell_rad"]
    keys = xds.groups()
    ntime = len(keys)
    freqs_all = np.asarray(xds.group(keys[0]).read("FREQ"))
    splits = np.array_split(np.arange(freqs_all.size), freq_chunks)

    out = TreeStore(output_store, mode="w")
    cube = np.zeros((ntime, freq_chunks, nx, nx))
    wsums = np.zeros((ntime, freq_chunks))
    times = np.zeros(ntime)
    flags = np.zeros((ntime, freq_chunks), dtype=np.uint8)

    for t, key in enumerate(keys):
        g = xds.group(key)
        uvw = np.asarray(g.read("UVW"))
        freqs = np.asarray(g.read("FREQ"))
        vis = np.asarray(g.read("VIS"))
        wgt = np.asarray(g.read("WEIGHT"))
        mask = np.asarray(g.read("MASK"))
        times[t] = g.attrs.get("time", float(t))

        for c, chans in enumerate(splits):
            if chans.size == 0:
                continue
            plan = plan_wgridder(
                uvw,
                freqs[chans],
                nx=nx,
                ny=nx,
                cellx=cell,
                celly=cell,
                epsilon=epsilon,
                do_wgridding=do_wgridding,
                divide_by_n=False,
            )
            vis_tc = vis[:, chans].copy()
            if inject_transient is not None:
                # render the transient at its pixel and add its visibilities
                ds = transient_spectrum(times[t : t + 1], freqs[chans], **{
                    k: v for k, v in inject_transient.items() if k not in ("xfrac", "yfrac")
                })[0]
                img = np.zeros((nx, nx))
                p = int(inject_transient.get("xfrac", 0.5) * nx)
                q = int(inject_transient.get("yfrac", 0.5) * nx)
                img[p, q] = 1.0
                base_vis = np.asarray(dirty2vis(plan, jnp.asarray(img)))
                vis_tc = vis_tc + base_vis * ds[None, :]
            dirty = np.asarray(vis2dirty(plan, jnp.asarray(vis_tc), wgt=jnp.asarray(wgt[:, chans]), mask=jnp.asarray(mask[:, chans])))
            wsum_tc = float(wgt[:, chans][mask[:, chans].astype(bool)].sum())
            cube[t, c] = dirty / max(wsum_tc, 1e-300)
            wsums[t, c] = wsum_tc

    if rms_flag_level is not None:
        rms_all = cube.std(axis=(2, 3))
        med = np.median(rms_all[rms_all > 0])
        flags = (rms_all > rms_flag_level * med).astype(np.uint8)

    out.write("CUBE", cube)
    out.write("WSUMS", wsums)
    out.write("TIMES", times)
    out.write("FREQS", freqs_all)
    out.write("FLAGS", flags)
    out.set_attrs(nx=nx, ny=nx, cell_rad=cell, ntime=ntime, nfreq_chunks=freq_chunks)
    log.info("hci cube %s written", output_store)
    return out
