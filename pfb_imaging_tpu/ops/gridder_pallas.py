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
    capacity = ((capacity + 1023) // 1024) * 1024  # rank-1 SMEM blocks tile at 1024
    # SMEM holds 5 x capacity scalars; chunk overloaded buckets so each
    # kernel invocation stays within the 1 MB budget
    max_cap = 8192
    nchunks = max((capacity + max_cap - 1) // max_cap, 1)
    capacity = min(capacity, max_cap)

    nslots = nbuckets * nchunks
    pad_idx = np.full((nslots, capacity), n, np.int32)
    lu8 = np.zeros((nslots, capacity), np.int32)
    fu = np.zeros((nslots, capacity), np.float32)
    fv = np.zeros((nslots, capacity), np.float32)
    for b in range(nbuckets):
        sel = good[starts[b] : ends[b]]
        tx, ty = b // nty, b % nty
        lu_loc = iu0w[sel] - tx * TILE_U  # in [0, TILE_U)
        aligned = (lu_loc // 8) * 8
        fu_all = (u_w[sel] - tx * TILE_U) - aligned
        fv_all = v_w[sel] - ty * TILE_V
        for ch in range(nchunks):
            piece = slice(ch * capacity, (ch + 1) * capacity)
            c = sel[piece].size
            if c == 0:
                break
            slot = b * nchunks + ch
            pad_idx[slot, :c] = sel[piece]
            lu8[slot, :c] = aligned[piece]
            fu[slot, :c] = fu_all[piece]
            fv[slot, :c] = fv_all[piece]
    return dict(
        pad_idx=pad_idx.reshape(-1),
        lu8=lu8.reshape(-1),
        fu=fu.reshape(-1),
        fv=fv.reshape(-1),
        capacity=capacity,
        nchunks=nchunks,
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


@partial(jax.jit, static_argnames=("support", "beta", "capacity", "nchunks", "ntx", "nty", "nbig_x", "nbig_y", "interpret"))
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
    nchunks: int = 1,
    interpret: bool = False,
):
    """Tiled scatter; returns the (2, nbig_x, nbig_y) real/imag grid.

    All arrays are (nbuckets*nchunks*capacity,) in tile-packed order
    (plan_tiles); vre/vim are the weighted visibility values (zero on
    padding slots).
    """
    nbuckets = ntx * nty * nchunks
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
    blocks = blocks.reshape(ntx, nty, nchunks, 2, ACC_U, ACC_V).sum(axis=2)
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


# ── full vis2dirty through the Pallas scatter ────────────────────────


def plan_pallas(plan) -> dict:
    """Tile-bucket a WGridderPlan's (sorted-stream) uv coordinates.

    Returns the plan_tiles dict plus device arrays for the packed gather.
    Coordinates are the plan's signed fractional grid positions; window
    wrapping is resolved here (mod nbig).
    """
    nvis = plan.sort_idx.shape[0]
    u = np.asarray(plan.u_pix[:nvis], np.float64)
    v = np.asarray(plan.v_pix[:nvis], np.float64)
    tiles = plan_tiles(np.mod(u, plan.nbig_x), np.mod(v, plan.nbig_y), plan.support, plan.nbig_x, plan.nbig_y)
    tiles["pad_idx_dev"] = jnp.asarray(tiles["pad_idx"])
    tiles["lu8_dev"] = jnp.asarray(tiles["lu8"])
    tiles["fu_dev"] = jnp.asarray(tiles["fu"].astype(np.float32))
    tiles["fv_dev"] = jnp.asarray(tiles["fv"].astype(np.float32))
    # the few visibilities whose support windows wrap the grid edge go
    # through the XLA scatter (typically <<1% away from sub-Nyquist setups)
    nfall = max(int(tiles["fallback"].size), 1)
    fb = np.zeros(nfall, np.int64)
    fb[: tiles["fallback"].size] = tiles["fallback"]
    tiles["fb_idx_dev"] = jnp.asarray(fb.astype(np.int32))
    tiles["fb_valid"] = jnp.asarray((np.arange(nfall) < tiles["fallback"].size).astype(np.float32))
    return tiles


def vis2dirty_pallas(plan, tiles: dict, vis_re, vis_im, wgt=None, mask=None, interpret: bool = False):
    """vis2dirty with the Pallas scatter core (per-plane host loop).

    Numerically identical to ops.gridder.vis2dirty_hostloop; the scatter is
    the tiled VMEM kernel instead of an XLA scatter.
    """
    from .gridder import _vis2dirty_finish, _vis2dirty_prepare, _w_weight

    wv_ri = _vis2dirty_prepare(plan, vis_re, vis_im, wgt, mask)
    nvis = plan.sort_idx.shape[0]
    kw = dict(
        support=plan.support,
        beta=plan.beta,
        capacity=tiles["capacity"],
        nchunks=tiles.get("nchunks", 1),
        ntx=tiles["ntx"],
        nty=tiles["nty"],
        nbig_x=plan.nbig_x,
        nbig_y=plan.nbig_y,
        interpret=interpret,
    )

    @partial(jax.jit, static_argnames=())
    def _plane_vals(plan, wv_ri, p_arr):
        p = p_arr[0]
        ww = _w_weight(plan, plan.w_lam[:nvis], p)
        vre = jnp.concatenate([wv_ri[0] * ww, jnp.zeros(1, wv_ri.dtype)])
        vim = jnp.concatenate([wv_ri[1] * ww, jnp.zeros(1, wv_ri.dtype)])
        return vre[tiles["pad_idx_dev"]], vim[tiles["pad_idx_dev"]]

    @jax.jit
    def _plane_image(plan, grid_ri, p_arr):
        p = p_arr[0]
        rdtype = plan.u_pix.dtype
        from .gridder import _crop_center

        grid = jax.lax.complex(grid_ri[0], grid_ri[1])
        big = jnp.fft.ifft2(grid) * (plan.nbig_x * plan.nbig_y)
        bre = jnp.fft.fftshift(jnp.real(big))
        bim = jnp.fft.fftshift(jnp.imag(big))
        are = _crop_center(plan, bre)
        aim = _crop_center(plan, bim)
        if plan.do_wgridding:
            wp = plan.w0 + p.astype(rdtype) * plan.dw
            phase = (-2.0 * jnp.pi * wp) * plan.nm1
            c, s = jnp.cos(phase), jnp.sin(phase)
            return jnp.stack([are * c - aim * s, are * s + aim * c])
        return jnp.stack([are, aim])

    from .gridder import _uv_stencil

    @jax.jit
    def _fallback_grid(plan, wv_ri, p_arr):
        """XLA scatter for the (few) wrapping-window visibilities."""
        p = p_arr[0]
        idx = tiles["fb_idx_dev"]
        ww = _w_weight(plan, plan.w_lam[idx], p) * tiles["fb_valid"]
        vre = wv_ri[0, idx] * ww
        vim = wv_ri[1, idx] * ww
        iu, iv, ku, kv = _uv_stencil(plan, plan.u_pix[idx], plan.v_pix[idx])
        kw2 = ku[:, :, None] * kv[:, None, :]
        contrib = jnp.stack([vre, vim])[:, :, None, None] * kw2[None]
        g = jnp.zeros((2, plan.nbig_x, plan.nbig_y), wv_ri.dtype)
        return g.at[:, iu[:, :, None], iv[:, None, :]].add(contrib)

    has_fallback = int(np.asarray(tiles["fb_valid"]).sum()) > 0
    acc = None
    for p in range(plan.nw):
        p_arr = jnp.asarray(np.asarray([p], np.int32))
        vre, vim = _plane_vals(plan, wv_ri, p_arr)
        grid_ri = pallas_scatter_grid(tiles["lu8_dev"], tiles["fu_dev"], tiles["fv_dev"], vre, vim, **kw)
        if has_fallback:
            grid_ri = grid_ri + _fallback_grid(plan, wv_ri, p_arr)
        c = _plane_image(plan, grid_ri, p_arr)
        acc = c if acc is None else acc + c
    return _vis2dirty_finish(plan, acc)


# ── w-stacked kernel: all planes in one pass ─────────────────────────


def _scatter_kernel_wstack(
    lu_ref, fu_ref, fv_ref, wl_ref, vre_ref, vim_ref, out_ref, *, support: int, beta: float, capacity: int,
    nw: int, w0: float, dw: float, w_support: int
):
    """Evaluate each stencil once; accumulate into every w-plane grid with
    its own w-kernel weight. Independent per-plane accumulators pipeline
    the read-modify-writes."""
    out_ref[...] = jnp.zeros_like(out_ref)
    inv = 2.0 / support
    winv = 2.0 / (w_support * dw)
    row = jax.lax.broadcasted_iota(jnp.int32, (PAD_U, ACC_V), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (PAD_U, ACC_V), 1).astype(jnp.float32)

    def es_v(x):
        x2 = x * x
        inside = x2 < 1.0
        return jnp.where(inside, jnp.exp(beta * (jnp.sqrt(jnp.where(inside, 1.0 - x2, 0.0)) - 1.0)), 0.0)

    def es_s(x):
        x2 = x * x
        safe = jnp.minimum(x2, 1.0)
        return jnp.where(x2 < 1.0, jnp.exp(beta * (jnp.sqrt(1.0 - safe) - 1.0)), 0.0)

    def body(i, _):
        xu = (row - fu_ref[i]) * inv
        xv = (col - fv_ref[i]) * inv
        sten = es_v(xu) * es_v(xv)
        lu = pl.multiple_of(lu_ref[i], 8)
        wl = wl_ref[i]
        for p in range(nw):
            ww = es_s((wl - (w0 + p * dw)) * winv)
            out_ref[0, p, 0, pl.ds(lu, PAD_U), :] += (vre_ref[i] * ww) * sten
            out_ref[0, p, 1, pl.ds(lu, PAD_U), :] += (vim_ref[i] * ww) * sten
        return 0

    jax.lax.fori_loop(0, capacity, body, 0)


@partial(
    jax.jit,
    static_argnames=(
        "support", "beta", "capacity", "nchunks", "ntx", "nty", "nbig_x", "nbig_y",
        "nw", "w0", "dw", "w_support", "interpret",
    ),
)
def pallas_scatter_grid_wstack(
    lu8, fu, fv, wl, vre, vim, *,
    support: int, beta: float, capacity: int, ntx: int, nty: int,
    nbig_x: int, nbig_y: int, nw: int, w0: float, dw: float, w_support: int,
    nchunks: int = 1, interpret: bool = False,
):
    """All-planes tiled scatter: returns (nw, 2, nbig_x, nbig_y).

    VMEM per tile is nw * 2 * ACC_U * ACC_V * 4 bytes (~0.56 MB per plane
    pair at the default tile) — callers should keep nw <= ~8 per invocation
    and chunk larger plane counts.
    """
    nbuckets = ntx * nty * nchunks
    blocks = pl.pallas_call(
        partial(
            _scatter_kernel_wstack, support=support, beta=beta, capacity=capacity,
            nw=nw, w0=w0, dw=dw, w_support=w_support,
        ),
        grid=(nbuckets,),
        in_specs=[
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # lu8
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # fu
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # fv
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # wl
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # vre
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),  # vim
        ],
        out_specs=pl.BlockSpec((1, nw, 2, ACC_U, ACC_V), lambda t: (t, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbuckets, nw, 2, ACC_U, ACC_V), jnp.float32),
        interpret=interpret,
    )(lu8, fu, fv, wl, vre, vim)

    blocks = blocks.reshape(ntx, nty, nchunks, nw, 2, ACC_U, ACC_V).sum(axis=2)
    strips = 0
    for ty in range(nty):
        pad = ((0, 0), (0, 0), (0, 0), (0, 0), (ty * TILE_V, (nty - 1 - ty) * TILE_V))
        strips = strips + jnp.pad(blocks[:, ty], pad)
    grid_full = 0
    for tx in range(ntx):
        pad = ((0, 0), (0, 0), (tx * TILE_U, (ntx - 1 - tx) * TILE_U), (0, 0))
        grid_full = grid_full + jnp.pad(strips[tx], pad)
    return grid_full[:, :, :nbig_x, :nbig_y]


def vis2dirty_pallas_wstack(plan, tiles: dict, vis_re, vis_im, wgt=None, mask=None, interpret: bool = False):
    """vis2dirty with the w-stacked Pallas scatter (one kernel pass for all
    planes), plane-chunked to bound VMEM."""
    from .gridder import _uv_stencil, _vis2dirty_finish, _vis2dirty_prepare, _w_weight

    wv_ri = _vis2dirty_prepare(plan, vis_re, vis_im, wgt, mask)
    nvis = plan.sort_idx.shape[0]

    # packed values + w coords (plane-independent)
    zpad = jnp.zeros(1, wv_ri.dtype)
    vre_pad = jnp.concatenate([wv_ri[0], zpad])[tiles["pad_idx_dev"]]
    vim_pad = jnp.concatenate([wv_ri[1], zpad])[tiles["pad_idx_dev"]]
    wl_pad = jnp.concatenate([plan.w_lam[:nvis], zpad])[tiles["pad_idx_dev"]]

    has_fallback = int(np.asarray(tiles["fb_valid"]).sum()) > 0

    @jax.jit
    def _fallback_grids(plan, wv_ri, p0_arr, nw_chunk_arr):
        del nw_chunk_arr
        idx = tiles["fb_idx_dev"]
        iu, iv, ku, kv = _uv_stencil(plan, plan.u_pix[idx], plan.v_pix[idx])
        kw2 = ku[:, :, None] * kv[:, None, :]

        def one(p):
            ww = _w_weight(plan, plan.w_lam[idx], p) * tiles["fb_valid"]
            contrib = jnp.stack([wv_ri[0, idx] * ww, wv_ri[1, idx] * ww])[:, :, None, None] * kw2[None]
            g = jnp.zeros((2, plan.nbig_x, plan.nbig_y), wv_ri.dtype)
            return g.at[:, iu[:, :, None], iv[:, None, :]].add(contrib)

        return one

    @jax.jit
    def _plane_image(plan, grid_ri, p_arr):
        from .gridder import _crop_center

        p = p_arr[0]
        rdtype = plan.u_pix.dtype
        grid = jax.lax.complex(grid_ri[0], grid_ri[1])
        big = jnp.fft.ifft2(grid) * (plan.nbig_x * plan.nbig_y)
        bre = jnp.fft.fftshift(jnp.real(big))
        bim = jnp.fft.fftshift(jnp.imag(big))
        are = _crop_center(plan, bre)
        aim = _crop_center(plan, bim)
        if plan.do_wgridding:
            wp = plan.w0 + p.astype(rdtype) * plan.dw
            phase = (-2.0 * jnp.pi * wp) * plan.nm1
            c, s = jnp.cos(phase), jnp.sin(phase)
            return jnp.stack([are * c - aim * s, are * s + aim * c])
        return jnp.stack([are, aim])

    acc = None
    pw = 8  # planes per kernel pass (VMEM bound)
    for p0 in range(0, plan.nw, pw):
        nw_chunk = min(pw, plan.nw - p0)
        grids = pallas_scatter_grid_wstack(
            tiles["lu8_dev"], tiles["fu_dev"], tiles["fv_dev"], wl_pad, vre_pad, vim_pad,
            support=plan.support, beta=plan.beta, capacity=tiles["capacity"],
            nchunks=tiles.get("nchunks", 1), ntx=tiles["ntx"], nty=tiles["nty"],
            nbig_x=plan.nbig_x, nbig_y=plan.nbig_y,
            nw=nw_chunk, w0=plan.w0 + p0 * plan.dw, dw=plan.dw, w_support=plan.w_support,
            interpret=interpret,
        )
        for q in range(nw_chunk):
            p_arr = jnp.asarray(np.asarray([p0 + q], np.int32))
            grid_ri = grids[q]
            if has_fallback:
                from .gridder import _uv_stencil as _uvs  # noqa: F401

                idx = tiles["fb_idx_dev"]
                ww = _w_weight(plan, plan.w_lam[idx], jnp.asarray(p0 + q)) * tiles["fb_valid"]
                iu, iv, ku, kv = _uv_stencil(plan, plan.u_pix[idx], plan.v_pix[idx])
                kw2 = ku[:, :, None] * kv[:, None, :]
                contrib = jnp.stack([wv_ri[0, idx] * ww, wv_ri[1, idx] * ww])[:, :, None, None] * kw2[None]
                grid_ri = grid_ri.at[:, iu[:, :, None], iv[:, None, :]].add(contrib)
            c = _plane_image(plan, grid_ri, p_arr)
            acc = c if acc is None else acc + c
    return _vis2dirty_finish(plan, acc)


# ── grouped kernel: register accumulation per aligned row-group ──────


def add_group_flags(tiles: dict) -> dict:
    """Sort each tile's slots by lu8 and mark group boundaries.

    Within a tile bucket, visibilities sharing the same 8-aligned window
    row accumulate in vector registers; one VMEM read-modify-write happens
    per group (at the slot whose ``flush`` flag is set). Padding slots
    carry zero values and flush=0 except the final slot.
    """
    cap = tiles["capacity"]
    nslots = tiles["lu8"].size // cap
    lu8 = tiles["lu8"].reshape(nslots, cap).copy()
    fu = tiles["fu"].reshape(nslots, cap).copy()
    fv = tiles["fv"].reshape(nslots, cap).copy()
    pad_idx = tiles["pad_idx"].reshape(nslots, cap).copy()
    flush = np.zeros((nslots, cap), np.int32)
    nvis_sentinel = pad_idx.max()
    for s in range(nslots):
        valid = pad_idx[s] != nvis_sentinel
        nv = int(valid.sum())
        if nv:
            order = np.argsort(lu8[s, :nv], kind="stable")
            lu8[s, :nv] = lu8[s, order]
            fu[s, :nv] = fu[s, order]
            fv[s, :nv] = fv[s, order]
            pad_idx[s, :nv] = pad_idx[s, order]
            # flush when the next valid slot starts a new group
            nxt = np.roll(lu8[s, :nv], -1)
            flush[s, :nv] = (nxt != lu8[s, :nv]).astype(np.int32)
            flush[s, nv - 1] = 1
        # padding slots: lu8 already 0, values are zero — route their
        # (empty) flush to slot capacity-1 of the padding group
        if nv < cap:
            flush[s, cap - 1] = 1
            lu8[s, nv:] = lu8[s, nv - 1] if nv else 0
    out = dict(tiles)
    out["lu8"] = lu8.reshape(-1)
    out["fu"] = fu.reshape(-1)
    out["fv"] = fv.reshape(-1)
    out["pad_idx"] = pad_idx.reshape(-1)
    out["flush"] = flush.reshape(-1)
    out["pad_idx_dev"] = jnp.asarray(out["pad_idx"])
    out["lu8_dev"] = jnp.asarray(out["lu8"])
    out["fu_dev"] = jnp.asarray(out["fu"].astype(np.float32))
    out["fv_dev"] = jnp.asarray(out["fv"].astype(np.float32))
    out["flush_dev"] = jnp.asarray(out["flush"])
    return out


def _scatter_kernel_grouped(lu_ref, fu_ref, fv_ref, flush_ref, vre_ref, vim_ref, out_ref, *, support: int, beta: float, capacity: int):
    """Register-accumulated groups + separable stencil evaluation."""
    out_ref[...] = jnp.zeros_like(out_ref)
    inv = 2.0 / support
    rowv = jax.lax.broadcasted_iota(jnp.int32, (PAD_U, 1), 0).astype(jnp.float32)
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, ACC_V), 1).astype(jnp.float32)

    def es(x):
        x2 = x * x
        inside = x2 < 1.0
        return jnp.where(inside, jnp.exp(beta * (jnp.sqrt(jnp.where(inside, 1.0 - x2, 0.0)) - 1.0)), 0.0)

    def body(i, carry):
        acc_re, acc_im = carry
        ku = es((rowv - fu_ref[i]) * inv)  # (PAD_U, 1)
        kv = es((colv - fv_ref[i]) * inv)  # (1, ACC_V)
        sten = ku * kv
        acc_re = acc_re + vre_ref[i] * sten
        acc_im = acc_im + vim_ref[i] * sten
        do_flush = flush_ref[i] == 1

        @pl.when(do_flush)
        def _():
            lu = pl.multiple_of(lu_ref[i], 8)
            out_ref[0, 0, pl.ds(lu, PAD_U), :] += acc_re
            out_ref[0, 1, pl.ds(lu, PAD_U), :] += acc_im

        zero = jnp.zeros_like(acc_re)
        acc_re = jnp.where(do_flush, zero, acc_re)
        acc_im = jnp.where(do_flush, zero, acc_im)
        return acc_re, acc_im

    z = jnp.zeros((PAD_U, ACC_V), jnp.float32)
    jax.lax.fori_loop(0, capacity, body, (z, z))


@partial(jax.jit, static_argnames=("support", "beta", "capacity", "nchunks", "ntx", "nty", "nbig_x", "nbig_y", "interpret"))
def pallas_scatter_grid_grouped(
    lu8, fu, fv, flush, vre, vim, *,
    support: int, beta: float, capacity: int, ntx: int, nty: int,
    nbig_x: int, nbig_y: int, nchunks: int = 1, interpret: bool = False,
):
    """Grouped tiled scatter; returns the (2, nbig_x, nbig_y) grid."""
    nbuckets = ntx * nty * nchunks
    blocks = pl.pallas_call(
        partial(_scatter_kernel_grouped, support=support, beta=beta, capacity=capacity),
        grid=(nbuckets,),
        in_specs=[
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, ACC_U, ACC_V), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbuckets, 2, ACC_U, ACC_V), jnp.float32),
        interpret=interpret,
    )(lu8, fu, fv, flush, vre, vim)

    blocks = blocks.reshape(ntx, nty, nchunks, 2, ACC_U, ACC_V).sum(axis=2)
    strips = 0
    for ty in range(nty):
        pad = ((0, 0), (0, 0), (0, 0), (ty * TILE_V, (nty - 1 - ty) * TILE_V))
        strips = strips + jnp.pad(blocks[:, ty], pad)
    grid_full = 0
    for tx in range(ntx):
        pad = ((0, 0), (tx * TILE_U, (ntx - 1 - tx) * TILE_U), (0, 0))
        grid_full = grid_full + jnp.pad(strips[tx], pad)
    return grid_full[:, :nbig_x, :nbig_y]


def vis2dirty_pallas_grouped(plan, tiles: dict, vis_re, vis_im, wgt=None, mask=None, interpret: bool = False):
    """vis2dirty with the grouped Pallas scatter (per-plane host loop).

    ``tiles`` must come from plan_pallas + add_group_flags.
    """
    from .gridder import _uv_stencil, _vis2dirty_finish, _vis2dirty_prepare, _w_weight

    wv_ri = _vis2dirty_prepare(plan, vis_re, vis_im, wgt, mask)
    nvis = plan.sort_idx.shape[0]
    kw = dict(
        support=plan.support, beta=plan.beta, capacity=tiles["capacity"],
        nchunks=tiles.get("nchunks", 1), ntx=tiles["ntx"], nty=tiles["nty"],
        nbig_x=plan.nbig_x, nbig_y=plan.nbig_y, interpret=interpret,
    )
    has_fallback = int(np.asarray(tiles["fb_valid"]).sum()) > 0

    @jax.jit
    def _plane_vals(plan, wv_ri, p_arr):
        p = p_arr[0]
        ww = _w_weight(plan, plan.w_lam[:nvis], p)
        vre = jnp.concatenate([wv_ri[0] * ww, jnp.zeros(1, wv_ri.dtype)])
        vim = jnp.concatenate([wv_ri[1] * ww, jnp.zeros(1, wv_ri.dtype)])
        return vre[tiles["pad_idx_dev"]], vim[tiles["pad_idx_dev"]]

    @jax.jit
    def _plane_image(plan, grid_ri, p_arr):
        from .gridder import _crop_center

        p = p_arr[0]
        rdtype = plan.u_pix.dtype
        grid = jax.lax.complex(grid_ri[0], grid_ri[1])
        big = jnp.fft.ifft2(grid) * (plan.nbig_x * plan.nbig_y)
        bre = jnp.fft.fftshift(jnp.real(big))
        bim = jnp.fft.fftshift(jnp.imag(big))
        are = _crop_center(plan, bre)
        aim = _crop_center(plan, bim)
        if plan.do_wgridding:
            wp = plan.w0 + p.astype(rdtype) * plan.dw
            phase = (-2.0 * jnp.pi * wp) * plan.nm1
            c, s = jnp.cos(phase), jnp.sin(phase)
            return jnp.stack([are * c - aim * s, are * s + aim * c])
        return jnp.stack([are, aim])

    @jax.jit
    def _fallback_grid(plan, wv_ri, p_arr):
        p = p_arr[0]
        idx = tiles["fb_idx_dev"]
        ww = _w_weight(plan, plan.w_lam[idx], p) * tiles["fb_valid"]
        vre = wv_ri[0, idx] * ww
        vim = wv_ri[1, idx] * ww
        iu, iv, ku, kv = _uv_stencil(plan, plan.u_pix[idx], plan.v_pix[idx])
        kw2 = ku[:, :, None] * kv[:, None, :]
        contrib = jnp.stack([vre, vim])[:, :, None, None] * kw2[None]
        g = jnp.zeros((2, plan.nbig_x, plan.nbig_y), wv_ri.dtype)
        return g.at[:, iu[:, :, None], iv[:, None, :]].add(contrib)

    acc = None
    for p in range(plan.nw):
        p_arr = jnp.asarray(np.asarray([p], np.int32))
        vre, vim = _plane_vals(plan, wv_ri, p_arr)
        grid_ri = pallas_scatter_grid_grouped(
            tiles["lu8_dev"], tiles["fu_dev"], tiles["fv_dev"], tiles["flush_dev"], vre, vim, **kw
        )
        if has_fallback:
            grid_ri = grid_ri + _fallback_grid(plan, wv_ri, p_arr)
        c = _plane_image(plan, grid_ri, p_arr)
        acc = c if acc is None else acc + c
    return _vis2dirty_finish(plan, acc)


# ── gather (degrid) kernel ───────────────────────────────────────────


def _gather_kernel(lu_ref, fu_ref, fv_ref, grid_ref, outre_ref, outim_ref, scratch_ref, sem, *, support: int, beta: float, capacity: int, nty: int, nchunks: int):
    """One tile: DMA the tile+halo grid block to VMEM, then for each
    visibility evaluate its separable ES stencil over the aligned window
    and reduce the weighted sum to a scalar.

    The halo blocks OVERLAP (stride TILE, extent ACC), which BlockSpec
    cannot express — the grid stays in ANY/HBM and the kernel DMAs its
    own block at explicit offsets."""
    t = pl.program_id(0)
    b = t // nchunks
    tx = b // nty
    ty = b % nty

    copy = pltpu.make_async_copy(
        grid_ref.at[:, pl.ds(tx * TILE_U, ACC_U), pl.ds(ty * TILE_V, ACC_V)],
        scratch_ref,
        sem,
    )
    copy.start()
    copy.wait()

    inv = 2.0 / support
    rowv = jax.lax.broadcasted_iota(jnp.int32, (PAD_U, 1), 0).astype(jnp.float32)
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, ACC_V), 1).astype(jnp.float32)

    def es(x):
        x2 = x * x
        inside = x2 < 1.0
        return jnp.where(inside, jnp.exp(beta * (jnp.sqrt(jnp.where(inside, 1.0 - x2, 0.0)) - 1.0)), 0.0)

    def body(i, _):
        ku = es((rowv - fu_ref[i]) * inv)
        kv = es((colv - fv_ref[i]) * inv)
        sten = ku * kv
        lu = pl.multiple_of(lu_ref[i], 8)
        wre = scratch_ref[0, pl.ds(lu, PAD_U), :]
        wim = scratch_ref[1, pl.ds(lu, PAD_U), :]
        outre_ref[i] = jnp.sum(wre * sten)
        outim_ref[i] = jnp.sum(wim * sten)
        return 0

    jax.lax.fori_loop(0, capacity, body, 0)


@partial(jax.jit, static_argnames=("support", "beta", "capacity", "nchunks", "ntx", "nty", "nbig_x", "nbig_y", "interpret"))
def pallas_gather_grid(
    lu8, fu, fv, grid_ri, *,
    support: int, beta: float, capacity: int, ntx: int, nty: int,
    nbig_x: int, nbig_y: int, nchunks: int = 1, interpret: bool = False,
):
    """Tiled gather: per-slot (re, im) samples of grid_ri (2, nbig, nbig).

    The grid is pre-padded by the tile apron so every tile's block load is
    in bounds.
    """
    nbuckets = ntx * nty * nchunks
    # pad the grid so block (tx, ty) can always load (2, ACC_U, ACC_V)
    gpad = jnp.pad(grid_ri, ((0, 0), (0, ntx * TILE_U + PAD_U - nbig_x), (0, nty * TILE_V + PAD_V - nbig_y)))

    outre, outim = pl.pallas_call(
        partial(_gather_kernel, support=support, beta=beta, capacity=capacity, nty=nty, nchunks=nchunks),
        grid=(nbuckets,),
        in_specs=[
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # full padded grid; kernel DMAs its block
        ],
        out_specs=(
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((capacity,), lambda t: (t,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbuckets * capacity,), jnp.float32),
            jax.ShapeDtypeStruct((nbuckets * capacity,), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((2, ACC_U, ACC_V), jnp.float32), pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(lu8, fu, fv, gpad)
    return outre, outim


def dirty2vis_pallas(plan, tiles: dict, image, mask=None, split: bool = False, interpret: bool = False):
    """dirty2vis with the Pallas gather core (per-plane host loop).

    Numerically identical to ops.gridder.dirty2vis_hostloop.
    """
    from .gridder import _dirty2vis_finish_ri, _pad_center, _crop_center, _uv_stencil, _w_weight  # noqa: F401

    ieff = image.astype(plan.u_pix.dtype) * plan.corr_img * plan.cw_img
    nvis = plan.sort_idx.shape[0]
    has_fallback = int(np.asarray(tiles["fb_valid"]).sum()) > 0

    @jax.jit
    def _plane_grid(plan, ieff, p_arr):
        p = p_arr[0]
        rdtype = plan.u_pix.dtype
        if plan.do_wgridding:
            wp = plan.w0 + p.astype(rdtype) * plan.dw
            phase = (2.0 * jnp.pi * wp) * plan.nm1
            are = _pad_center(plan, ieff * jnp.cos(phase))
            aim = _pad_center(plan, ieff * jnp.sin(phase))
        else:
            are = _pad_center(plan, ieff)
            aim = jnp.zeros_like(are)
        a = jax.lax.complex(jnp.fft.ifftshift(are), jnp.fft.ifftshift(aim))
        grid = jnp.fft.fft2(a)
        return jnp.stack([jnp.real(grid), jnp.imag(grid)])

    @jax.jit
    def _accumulate(plan, packed_re, packed_im, p_arr, acc):
        """Unpack tile order -> sorted-stream order, apply w-weight, add."""
        p = p_arr[0]
        ww = _w_weight(plan, plan.w_lam[:nvis], p)
        out = jnp.zeros((2, nvis + 1), packed_re.dtype)
        out = out.at[0, tiles["pad_idx_dev"]].add(packed_re)
        out = out.at[1, tiles["pad_idx_dev"]].add(packed_im)
        return acc + out[:, :nvis] * ww[None]

    @jax.jit
    def _fallback_vals(plan, grid_ri, p_arr):
        p = p_arr[0]
        idx = tiles["fb_idx_dev"]
        ww = _w_weight(plan, plan.w_lam[idx], p) * tiles["fb_valid"]
        iu, iv, ku, kv = _uv_stencil(plan, plan.u_pix[idx], plan.v_pix[idx])
        g = grid_ri[:, iu[:, :, None], iv[:, None, :]]
        kw2 = ku[:, :, None] * kv[:, None, :]
        vals = jnp.sum(g * kw2[None], axis=(2, 3)) * ww[None]
        return idx, vals

    kw = dict(
        support=plan.support, beta=plan.beta, capacity=tiles["capacity"],
        nchunks=tiles.get("nchunks", 1), ntx=tiles["ntx"], nty=tiles["nty"],
        nbig_x=plan.nbig_x, nbig_y=plan.nbig_y, interpret=interpret,
    )
    acc = jnp.zeros((2, nvis), jnp.float32)
    for p in range(plan.nw):
        p_arr = jnp.asarray(np.asarray([p], np.int32))
        grid_ri = _plane_grid(plan, ieff, p_arr)
        pre, pim = pallas_gather_grid(tiles["lu8_dev"], tiles["fu_dev"], tiles["fv_dev"], grid_ri, **kw)
        acc = _accumulate(plan, pre, pim, p_arr, acc)
        if has_fallback:
            idx, vals = _fallback_vals(plan, grid_ri, p_arr)
            acc = acc.at[:, idx].add(vals * tiles["fb_valid"][None])
    out_ri = _dirty2vis_finish_ri(plan, acc, mask)
    if split:
        return out_ri
    return jax.lax.complex(out_ri[0], out_ri[1])


# ── classic-stack backend surface (round 5, VERDICT r4 #5) ───────────
# ``gridder="pallas"`` in core/imager.py and core/degrid.py routes the
# classic ES w-stacking plan through these wrappers instead of the XLA
# scan. ROUTING NOTE: the bucketed-scan classic path and the IDG path
# pay per-GROUP costs, so heavily padded layouts (very sparse uv
# coverage on a big grid) waste slots; the Pallas scatter pays per
# VISIBILITY (plus a per-tile VMEM flush), making it the only scatter
# path whose cost does not grow with slot padding. Auto-routing keeps
# IDG/stack (they win everywhere measured so far); "pallas" is the
# explicit escape hatch for pathological sparse layouts.

_TILES_CACHE: dict = {}


def tiles_for(plan) -> dict:
    """Per-plan tile layout, cached by plan identity (plans are immutable)."""
    key = id(plan)
    hit = _TILES_CACHE.get(key)
    if hit is None or hit[0]() is not plan:
        import weakref

        _TILES_CACHE.clear()  # plans are few and large; keep one
        tiles = plan_pallas(plan)
        try:
            ref = weakref.ref(plan)
        except TypeError:  # pragma: no cover - non-weakrefable plan
            ref = lambda: plan  # noqa: E731
        _TILES_CACHE[key] = (ref, tiles)
        hit = _TILES_CACHE[key]
    return hit[1]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _require_f32(plan):
    if plan.u_pix.dtype != jnp.float32:
        raise ValueError(
            "the Pallas scatter backend is f32-only (Mosaic VMEM tiles); "
            "plan with dtype=np.float32 / double_precision=False"
        )


def vis2dirty_scatter(plan, vis, wgt=None, mask=None, vis_im=None):
    """Classic-stack-signature adjoint through the Pallas scatter core
    (w-stacked kernel; all planes in one pass)."""
    _require_f32(plan)
    if vis_im is None:
        vis_re, vis_im = jnp.real(vis), jnp.imag(vis)
    else:
        vis_re = vis
    return vis2dirty_pallas_wstack(
        plan, tiles_for(plan), vis_re, vis_im, wgt, mask,
        interpret=_interpret_default(),
    )


def dirty2vis_scatter(plan, image, mask=None, split: bool = False):
    """Classic-stack-signature forward through the Pallas gather core."""
    _require_f32(plan)
    return dirty2vis_pallas(
        plan, tiles_for(plan), image, mask, split=split,
        interpret=_interpret_default(),
    )
