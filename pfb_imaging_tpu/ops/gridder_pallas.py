"""Pallas tiled gridding kernel (experimental; the BASELINE north star's
"sort/bucket vis by uv-tile, per-tile dense accumulate in VMEM" recipe).

The XLA scatter path in ops/gridder.py is correct everywhere; this module
provides the TPU-kernel alternative for the scatter core:

  * plan time (host): visibilities are bucketed by the uv tile containing
    their support window and padded to a static per-tile capacity; windows
    that wrap the grid edge go to the XLA fallback (a vanishing fraction
    away from sub-Nyquist settings).
  * kernel: one program per tile; a VMEM accumulator of
    (2, TILE+HALO_U, TILE+HALO_V) collects the W x W stencils of the
    tile's visibilities (serial fori over the padded bucket — padding
    entries carry zero contributions, so no per-vis masking is needed).
  * epilogue (XLA): overlap-add of the per-tile padded blocks back onto
    the full grid — dense, deterministic, race-free.

Tested in interpreter mode on CPU (tests/test_gridder_pallas.py) so the
kernel logic is validated without TPU compile cycles.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = 256
HALO_U = 8  # >= support, sublane-aligned
HALO_V = 128  # >= support, lane-aligned


def plan_tiles(iu0: np.ndarray, iv0: np.ndarray, support: int, nbig_x: int, nbig_y: int, vals_re, vals_im, ku, kv):
    """Bucket + pad the visibility stream by uv tile.

    Args:
        iu0/iv0: (n,) window starts, wrapped into [0, nbig).
        vals_re/vals_im: (n,) weighted visibility values.
        ku/kv: (n, support) separable kernel weights.

    Returns dict with padded per-tile arrays (nbuckets*capacity leading
    dim): lu, lv (tile-local starts), contrib_re/im (support x support
    stencils), plus (ntx, nty, capacity) and the fallback indices.
    """
    assert support <= HALO_U and support <= HALO_V
    ntx = (nbig_x + TILE - 1) // TILE
    nty = (nbig_y + TILE - 1) // TILE
    nbuckets = ntx * nty
    ok = (iu0 <= nbig_x - support) & (iv0 <= nbig_y - support)
    tid = np.where(ok, (iu0 // TILE) * nty + (iv0 // TILE), nbuckets)
    order = np.argsort(tid, kind="stable")
    n_ok = int(ok.sum())
    good = order[:n_ok]
    tid_g = tid[good]
    starts = np.searchsorted(tid_g, np.arange(nbuckets), side="left")
    ends = np.searchsorted(tid_g, np.arange(nbuckets), side="right")
    counts = ends - starts
    capacity = max(int(counts.max()) if nbuckets else 1, 1)

    lu = np.zeros((nbuckets, capacity), np.int32)
    lv = np.zeros((nbuckets, capacity), np.int32)
    cre = np.zeros((nbuckets, capacity, support, support), np.float32)
    cim = np.zeros((nbuckets, capacity, support, support), np.float32)
    stén_re = vals_re[:, None, None] * (ku[:, :, None] * kv[:, None, :])
    stén_im = vals_im[:, None, None] * (ku[:, :, None] * kv[:, None, :])
    for b in range(nbuckets):
        sel = good[starts[b] : ends[b]]
        c = sel.size
        tx, ty = b // nty, b % nty
        lu[b, :c] = iu0[sel] - tx * TILE
        lv[b, :c] = iv0[sel] - ty * TILE
        cre[b, :c] = stén_re[sel]
        cim[b, :c] = stén_im[sel]
    return dict(
        lu=lu.reshape(-1),
        lv=lv.reshape(-1),
        contrib_re=cre.reshape(-1, support, support),
        contrib_im=cim.reshape(-1, support, support),
        capacity=capacity,
        ntx=ntx,
        nty=nty,
        fallback=order[n_ok:],
    )


def _scatter_kernel(u_ref, v_ref, cre_ref, cim_ref, out_ref, *, support: int, capacity: int):
    out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        lu = u_ref[i]
        lv = v_ref[i]
        pad_re = jnp.zeros((HALO_U, HALO_V), out_ref.dtype).at[:support, :support].set(cre_ref[i])
        pad_im = jnp.zeros((HALO_U, HALO_V), out_ref.dtype).at[:support, :support].set(cim_ref[i])
        out_ref[0, 0, pl.ds(lu, HALO_U), pl.ds(lv, HALO_V)] += pad_re
        out_ref[0, 1, pl.ds(lu, HALO_U), pl.ds(lv, HALO_V)] += pad_im
        return 0

    jax.lax.fori_loop(0, capacity, body, 0)


@partial(jax.jit, static_argnames=("support", "capacity", "ntx", "nty", "nbig_x", "nbig_y", "interpret"))
def pallas_scatter_grid(
    lu,
    lv,
    contrib_re,
    contrib_im,
    *,
    support: int,
    capacity: int,
    ntx: int,
    nty: int,
    nbig_x: int,
    nbig_y: int,
    interpret: bool = False,
):
    """Tiled scatter; returns the (2, nbig_x, nbig_y) real/imag grid."""
    nbuckets = ntx * nty
    blocks = pl.pallas_call(
        partial(_scatter_kernel, support=support, capacity=capacity),
        grid=(nbuckets,),
        in_specs=[
            pl.BlockSpec((capacity,), lambda t: (t,)),
            pl.BlockSpec((capacity,), lambda t: (t,)),
            pl.BlockSpec((capacity, support, support), lambda t: (t, 0, 0)),
            pl.BlockSpec((capacity, support, support), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, TILE + HALO_U, TILE + HALO_V), lambda t: (t, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbuckets, 2, TILE + HALO_U, TILE + HALO_V), contrib_re.dtype),
        interpret=interpret,
    )(lu, lv, contrib_re, contrib_im)

    # overlap-add epilogue (tiles overlap only in their halo aprons)
    blocks = blocks.reshape(ntx, nty, 2, TILE + HALO_U, TILE + HALO_V)
    # fold v within each tile row
    strips = 0
    for ty in range(nty):
        pad = ((0, 0), (0, 0), (0, 0), (ty * TILE, (nty - 1 - ty) * TILE))
        strips = strips + jnp.pad(blocks[:, ty], pad)
    # fold u across tile rows
    grid_full = 0
    for tx in range(ntx):
        pad = ((0, 0), (tx * TILE, (ntx - 1 - tx) * TILE), (0, 0))
        grid_full = grid_full + jnp.pad(strips[tx], pad)
    # crop the outer apron (plan admits only non-wrapping windows)
    return grid_full[:, :nbig_x, :nbig_y]
