"""Pallas tiled gridding kernel — the TPU scatter core.

XLA's scatter lowers to near-serial updates on TPU (measured ~0.07 Mvis/s
at 1024² — docs/tpu-runtime-notes.md); this kernel implements the BASELINE
north star's recipe: bucket visibilities by uv tile, accumulate each tile's
stencils in VMEM, overlap-add the halo aprons back onto the grid.

Mosaic alignment rules (dynamic VMEM indices must be 8-sublane aligned and
full-lane) shape the kernel: the accumulator window is always full-width in
lanes and 8-aligned in sublanes, and the visibility's ES stencil is
EVALUATED IN-REGISTER over that window from its fractional (u, v)
coordinates — iota minus scalar, square, sqrt, exp — so the kernel never
performs an unaligned vector access and needs no precomputed stencils.

Per-vis work: ~a dozen VPU ops on a (16, TILE_V + 128) window. Padding
entries carry zero visibility values (no masking in the hot loop).

Validated in interpreter mode against a direct scatter oracle
(tests/test_gridder_pallas.py); ``interpret=False`` for TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_U = 256  # sublane-dim tile
TILE_V = 128  # lane-dim tile
PAD_U = 16  # stencil landing window height (8-aligned start + support)
PAD_V = 128  # lane apron (>= support, multiple of 128)
ACC_U = TILE_U + PAD_U
ACC_V = TILE_V + PAD_V


def plan_tiles(u_loc: np.ndarray, v_loc: np.ndarray, support: int, nbig_x: int, nbig_y: int):
    """Bucket visibilities by the uv tile containing their support window.

    u_loc/v_loc: (n,) fractional grid coordinates of each visibility with
    the window start already wrapped into [0, nbig) — i.e. the window
    covers integer cells [i0, i0+W) with i0 = floor(c - W/2) + 1.

    Returns a dict with the packed per-tile layout:
      pad_idx (nbuckets*capacity,): index into the vis stream (n == padding
          sentinel; gather from a zero-extended values array),
      lu8: 8-aligned window start within the tile,
      fu/fv: fractional (u, v) coordinates relative to (tile + lu8, tile),
      capacity, ntx, nty, fallback (wrapping windows for the XLA path).
    """
    assert support <= 8 and support <= PAD_V
    n = u_loc.size
    iu0 = (np.floor(u_loc - support / 2.0) + 1).astype(np.int64)
    iv0 = (np.floor(v_loc - support / 2.0) + 1).astype(np.int64)
    iu0w = np.mod(iu0, nbig_x)
    iv0w = np.mod(iv0, nbig_y)
    # wrap the coordinate along with the window
    u_w = u_loc + (iu0w - iu0)
    v_w = v_loc + (iv0w - iv0)
    ntx = (nbig_x + TILE_U - 1) // TILE_U
    nty = (nbig_y + TILE_V - 1) // TILE_V
    nbuckets = ntx * nty
    ok = (iu0w <= nbig_x - support) & (iv0w <= nbig_y - support)
    tid = np.where(ok, (iu0w // TILE_U) * nty + (iv0w // TILE_V), nbuckets)
    order = np.argsort(tid, kind="stable")
    n_ok = int(ok.sum())
    good = order[:n_ok]
    tid_g = tid[good]
    starts = np.searchsorted(tid_g, np.arange(nbuckets), side="left")
    ends = np.searchsorted(tid_g, np.arange(nbuckets), side="right")
    counts = ends - starts
    capacity = max(int(counts.max()) if nbuckets else 1, 8)

    pad_idx = np.full((nbuckets, capacity), n, np.int32)
    lu8 = np.zeros((nbuckets, capacity), np.int32)
    fu = np.zeros((nbuckets, capacity), np.float32)
    fv = np.zeros((nbuckets, capacity), np.float32)
    for b in range(nbuckets):
        sel = good[starts[b] : ends[b]]
        c = sel.size
        tx, ty = b // nty, b % nty
        lu_loc = iu0w[sel] - tx * TILE_U  # in [0, TILE_U)
        aligned = (lu_loc // 8) * 8
        pad_idx[b, :c] = sel
        lu8[b, :c] = aligned
        fu[b, :c] = (u_w[sel] - tx * TILE_U) - aligned
        fv[b, :c] = v_w[sel] - ty * TILE_V
    return dict(
        pad_idx=pad_idx.reshape(-1),
        lu8=lu8.reshape(-1),
        fu=fu.reshape(-1),
        fv=fv.reshape(-1),
        capacity=capacity,
        ntx=ntx,
        nty=nty,
        fallback=order[n_ok:],
    )


def _scatter_kernel(lu_ref, fu_ref, fv_ref, vre_ref, vim_ref, out_ref, *, support: int, beta: float, capacity: int):
    """One tile: evaluate + accumulate each visibility's ES stencil."""
    out_ref[...] = jnp.zeros_like(out_ref)
    inv = 2.0 / support
    row = jax.lax.broadcasted_iota(jnp.int32, (PAD_U, ACC_V), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (PAD_U, ACC_V), 1).astype(jnp.float32)

    def es(x):
        x2 = x * x
        inside = x2 < 1.0
        return jnp.where(inside, jnp.exp(beta * (jnp.sqrt(jnp.where(inside, 1.0 - x2, 0.0)) - 1.0)), 0.0)

    def body(i, _):
        xu = (row - fu_ref[i]) * inv
        xv = (col - fv_ref[i]) * inv
        sten = es(xu) * es(xv)
        lu = pl.multiple_of(lu_ref[i], 8)
        out_ref[0, 0, pl.ds(lu, PAD_U), :] += vre_ref[i] * sten
        out_ref[0, 1, pl.ds(lu, PAD_U), :] += vim_ref[i] * sten
        return 0

    jax.lax.fori_loop(0, capacity, body, 0)


@partial(jax.jit, static_argnames=("support", "beta", "capacity", "ntx", "nty", "nbig_x", "nbig_y", "interpret"))
def pallas_scatter_grid(
    lu8,
    fu,
    fv,
    vre,
    vim,
    *,
    support: int,
    beta: float,
    capacity: int,
    ntx: int,
    nty: int,
    nbig_x: int,
    nbig_y: int,
    interpret: bool = False,
):
    """Tiled scatter; returns the (2, nbig_x, nbig_y) real/imag grid.

    All arrays are (nbuckets*capacity,) in tile-packed order (plan_tiles);
    vre/vim are the weighted visibility values (zero on padding slots).
    """
    nbuckets = ntx * nty
    blocks = pl.pallas_call(
        partial(_scatter_kernel, support=support, beta=beta, capacity=capacity),
        grid=(nbuckets,),
        in_specs=[
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # lu8
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # fu
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # fv
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # vre
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # vim
        ],
        out_specs=pl.BlockSpec((1, 2, ACC_U, ACC_V), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbuckets, 2, ACC_U, ACC_V), jnp.float32),
        interpret=interpret,
    )(lu8, fu, fv, vre, vim)

    # overlap-add epilogue (tiles overlap only in their halo aprons)
    blocks = blocks.reshape(ntx, nty, 2, ACC_U, ACC_V)
    strips = 0
    for ty in range(nty):
        pad = ((0, 0), (0, 0), (0, 0), (ty * TILE_V, (nty - 1 - ty) * TILE_V))
        strips = strips + jnp.pad(blocks[:, ty], pad)
    grid_full = 0
    for tx in range(ntx):
        pad = ((0, 0), (tx * TILE_U, (ntx - 1 - tx) * TILE_U), (0, 0))
        grid_full = grid_full + jnp.pad(strips[tx], pad)
    # windows never extend past the grid (plan admits only iu0 <= nbig - W
    # and the ES kernel is exactly zero outside its support), so the apron
    # beyond nbig carries no mass — cropping suffices
    return grid_full[:, :nbig_x, :nbig_y]
