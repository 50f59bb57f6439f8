"""``fluxtractor``: per-band vis-space Hessian CG inside a mask — the "flux
mop" (reference core/fluxtractor.py:20-316 + opt/pcg.py:444-583 pcg_dds).

Solves ``(R^T W R + eta) x = residual`` restricted to the mask per band and
writes MODEL_MOPPED / RESIDUAL_MOPPED / UPDATE back into the tree.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.gridder import plan_wgridder
from ..ops.hessian import hessian_vis
from ..opt.pcg import pcg
from ..utils.logging import get_logger
from ..utils.store import TreeStore, require_complete
from .imager import residual_from_parts

log = get_logger("FLUXTRACTOR")


def fluxtractor(
    dt_path,
    mask=None,
    eta: float = 1e-3,
    cg_tol: float = 1e-4,
    cg_maxit: int = 50,
    epsilon: float = 1e-7,
    do_wgridding: bool = True,
    double_precision: bool = True,
):
    """Returns (model_mopped, residual_mopped)."""
    dt = TreeStore(dt_path, mode="w")
    require_complete(dt)
    attrs = dt.attrs
    nx, ny = attrs["nx"], attrs["ny"]
    band_nodes = [k for k in dt.groups() if k.startswith("band")]
    nband = len(band_nodes)
    cell = attrs["cell_rad"]
    dtype = np.float64 if double_precision else np.float32

    wsums = np.array([float(np.asarray(dt.group(k).read("WSUM"))[0]) for k in band_nodes])
    wsum = wsums.sum()
    if mask is None:
        mask = np.ones((nx, ny))
    mask = np.asarray(mask, dtype=float)

    model = np.zeros((nband, nx, ny))
    residual = np.zeros((nband, nx, ny))
    for b, key in enumerate(band_nodes):
        node = dt.group(key)
        resid_b = np.asarray(node.read("RESIDUAL" if node.has("RESIDUAL") else "DIRTY")) / wsum
        model_b = np.asarray(node.read("MODEL")) if node.has("MODEL") else np.zeros((nx, ny))

        # vis-space Hessian over this band's partitions
        plans, wgts, masks = [], [], []
        for pk in node.groups():
            pg = node.group(pk)
            plans.append(
                plan_wgridder(
                    np.asarray(pg.read("UVW")),
                    np.asarray(pg.read("FREQ")),
                    nx=nx,
                    ny=ny,
                    cellx=cell,
                    celly=cell,
                    l0=pg.attrs.get("l0", 0.0),
                    m0=pg.attrs.get("m0", 0.0),
                    epsilon=epsilon,
                    do_wgridding=do_wgridding,
                    divide_by_n=False,
                    dtype=dtype,
                )
            )
            wgts.append(jnp.asarray(np.asarray(pg.read("WEIGHT"))))
            masks.append(jnp.asarray(np.asarray(pg.read("MASK"))))

        maskj = jnp.asarray(mask)

        def hess(x, plans=plans, wgts=wgts, masks=masks):
            out = eta * x
            xm = x * maskj
            for plan, w, m in zip(plans, wgts, masks):
                out = out + maskj * hessian_vis(plan, xm, wgt=w, mask=m) / wsum
            return out

        x = pcg(hess, jnp.asarray(resid_b * mask), tol=cg_tol, maxit=cg_maxit, minit=1)
        model[b] = model_b + np.asarray(x) * mask
        node.write("UPDATE", np.asarray(x))
        node.write("MODEL_MOPPED", model[b])
        log.info("band %d mopped, |x|max=%.3e", b, float(jnp.abs(x).max()))

    for b, key in enumerate(band_nodes):
        node = dt.group(key)
        residual[b] = residual_from_parts(
            node, model[b], epsilon=epsilon, do_wgridding=do_wgridding, double_precision=double_precision
        )
        node.write("RESIDUAL_MOPPED", residual[b])
    return model, residual
