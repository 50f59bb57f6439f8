"""uv-counts gridding and Briggs/robust imaging weights.

TPU-native equivalents of the reference's numba kernels
(/root/reference/src/pfb_imaging/utils/weighting.py): nearest-neighbour
counts scatter with the Hermitian v<0 fold, Briggs ``counts_to_weights``,
``filter_extreme_counts`` and the super-uniform ``box_sum_counts``.

All functions are jittable; the scatter is a single XLA scatter-add over the
flattened (corr, nrow*nchan) stream (the reference chunks rows over threads
— here XLA owns the parallelism; a Pallas binning kernel can replace the
scatter when it shows up in profiles).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import LIGHTSPEED


def _all_host(*arrs):
    return all(isinstance(a, np.ndarray) for a in arrs)


def _uv_bins(uvw, freq, nx, ny, cell_size_x, cell_size_y, usign, vsign):
    """Shared NN binning math (reference weighting.py:85-140 and 184-200).

    Returns (iu, iv, in_bounds) with shape (nrow, nchan).
    """
    u_cell = 1.0 / (nx * cell_size_x)
    umax = abs(1.0 / cell_size_x / 2.0)
    v_cell = 1.0 / (ny * cell_size_y)
    vmax = abs(1.0 / cell_size_y / 2.0)

    chan_normfreq = freq / LIGHTSPEED  # (nchan,)
    u_tmp = uvw[:, 0:1] * chan_normfreq[None, :] * usign
    v_tmp = uvw[:, 1:2] * chan_normfreq[None, :] * vsign
    # Hermitian fold: v < 0 -> conjugate baseline
    neg = v_tmp < 0
    u_tmp = jnp.where(neg, -u_tmp, u_tmp)
    v_tmp = jnp.where(neg, -v_tmp, v_tmp)

    ug = (u_tmp + umax) / u_cell
    vg = (v_tmp + vmax) / v_cell
    iu = jnp.floor(ug).astype(jnp.int32)
    iv = jnp.floor(vg).astype(jnp.int32)
    in_bounds = (iu >= 0) & (iu < nx) & (iv >= 0) & (iv < ny)
    return iu, iv, in_bounds


def compute_counts(
    uvw,
    freq,
    mask,
    wgt,
    nx: int,
    ny: int,
    cell_size_x: float,
    cell_size_y: float,
    usign: float = 1.0,
    vsign: float = -1.0,
):
    """Sum weights onto the uv grid with NN binning (reference _compute_counts).

    Args:
        uvw: (nrow, 3); freq: (nchan,); mask: (nrow, nchan) {0,1};
        wgt: (ncorr, nrow, nchan).

    Returns:
        counts (ncorr, nx, ny). Out-of-bounds samples are dropped (the
        reference skips them so sub-Nyquist gridding still works).

    Host numpy inputs route to the native OpenMP histogram
    (native/plan_kernels.cpp:counts_nn): the XLA scatter-add form
    serialises per scalar update on TPU (~92 s for 4M vis at 8192^2,
    BENCH_r03), the host pass is O(nvis) adds.
    """
    if _all_host(uvw, freq, mask, wgt):
        from ..native import counts_nn

        out = counts_nn(uvw, freq, mask, wgt, nx, ny, cell_size_x, cell_size_y,
                        usign, vsign, 1.0 / LIGHTSPEED)
        if out is not None:
            return out
    return _compute_counts_jax(uvw, freq, mask, wgt, nx, ny, cell_size_x,
                               cell_size_y, usign, vsign)


@partial(jax.jit, static_argnames=("nx", "ny", "cell_size_x", "cell_size_y", "usign", "vsign"))
def _compute_counts_jax(
    uvw,
    freq,
    mask,
    wgt,
    nx: int,
    ny: int,
    cell_size_x: float,
    cell_size_y: float,
    usign: float = 1.0,
    vsign: float = -1.0,
):
    iu, iv, in_bounds = _uv_bins(uvw, freq, nx, ny, cell_size_x, cell_size_y, usign, vsign)
    sel = in_bounds & (mask != 0)
    flat_idx = (iu * ny + iv).reshape(-1)
    flat_idx = jnp.where(sel.reshape(-1), flat_idx, nx * ny)  # dropped

    def one_corr(w):
        vals = jnp.where(sel, w, 0.0).reshape(-1)
        grid = jnp.zeros(nx * ny, dtype=w.dtype).at[flat_idx].add(vals, mode="drop")
        return grid.reshape(nx, ny)

    return jax.vmap(one_corr)(wgt)


def counts_to_weights(
    counts,
    uvw,
    freq,
    weight,
    mask,
    nx: int,
    ny: int,
    cell_size_x: float,
    cell_size_y: float,
    robust: float,
    usign: float = 1.0,
    vsign: float = -1.0,
):
    """Convert gridded counts to imaging weights (reference weighting.py:143-208).

    Briggs: ssq = (5*10^-robust)^2 * sum(counts) / sum(counts^2) per corr,
    counts <- counts*ssq + 1, then weight /= counts at each sample's cell.
    robust <= -2 gives uniform weighting (no Briggs floor).

    Host numpy inputs route to the native per-sample pass (the Briggs
    grid adjustment is numpy; the division loop is OpenMP).
    """
    if _all_host(counts, uvw, freq, weight, mask):
        from ..native import weights_from_counts

        counts = np.asarray(counts, np.float64)
        if not np.any(counts != 0):
            return weight
        if robust > -2:
            numsqrt = 5 * 10 ** (-robust)
            avgwnum = np.sum(counts * counts, axis=(1, 2))
            avgwden = np.sum(counts, axis=(1, 2))
            ssq = numsqrt * numsqrt * avgwden / np.where(avgwnum > 0, avgwnum, 1.0)
            counts = counts * ssq[:, None, None] + 1.0
        out = weights_from_counts(counts, uvw, freq, mask, weight, nx, ny,
                                  cell_size_x, cell_size_y, usign, vsign,
                                  1.0 / LIGHTSPEED)
        if out is not None:
            return out
    return _counts_to_weights_jax(counts, uvw, freq, weight, mask, nx, ny,
                                  cell_size_x, cell_size_y, robust, usign, vsign)


@partial(jax.jit, static_argnames=("nx", "ny", "cell_size_x", "cell_size_y", "robust", "usign", "vsign"))
def _counts_to_weights_jax(
    counts,
    uvw,
    freq,
    weight,
    mask,
    nx: int,
    ny: int,
    cell_size_x: float,
    cell_size_y: float,
    robust: float,
    usign: float = 1.0,
    vsign: float = -1.0,
):
    ncorr = weight.shape[0]
    if robust > -2:
        numsqrt = 5 * 10 ** (-robust)
        avgwnum = jnp.sum(counts * counts, axis=(1, 2))
        avgwden = jnp.sum(counts, axis=(1, 2))
        ssq = numsqrt * numsqrt * avgwden / jnp.where(avgwnum > 0, avgwnum, 1.0)
        counts = counts * ssq[:, None, None] + 1.0

    iu, iv, in_bounds = _uv_bins(uvw, freq, nx, ny, cell_size_x, cell_size_y, usign, vsign)
    sel = in_bounds & (mask != 0)
    iu_c = jnp.clip(iu, 0, nx - 1)
    iv_c = jnp.clip(iv, 0, ny - 1)

    def one_corr(w, c):
        cval = c[iu_c, iv_c]  # (nrow, nchan)
        new = jnp.where(sel & (cval > 0), w / jnp.where(cval > 0, cval, 1.0), w)
        return new

    # if the counts grid is entirely empty the reference returns the weights
    # unchanged (weighting.py:146-148)
    any_counts = jnp.any(counts != 0)
    out = jax.vmap(one_corr)(weight, counts)
    return jnp.where(any_counts, out, weight)


def filter_extreme_counts(counts, level: float = 10.0):
    """Floor small nonzero counts at median/level (reference weighting.py:213-226)."""
    if not level:
        return counts
    nz = counts > 0
    # median over nonzero entries (host-free: use where + quantile on masked)
    vals = jnp.where(nz, counts, jnp.nan)
    med = jnp.nanmedian(vals)
    lowval = med / level
    return jnp.where(nz, jnp.maximum(counts, lowval), counts)


def reduce_counts(counts: dict, grouping: str) -> dict:
    """Combine per-(band, time) counts grids per a grouping strategy
    (reference weighting.py:471-505, design D16).

    grouping: "per-band-time" (identity), "mfs"/"per-time" (sum over bands
    within each time), "per-band" (sum over times within each band).
    """
    valid = ("per-band-time", "mfs", "per-band", "per-time")
    if grouping == "per-band-time":
        return dict(counts)
    if grouping in ("mfs", "per-time", "per-band"):
        fix_band = grouping == "per-band"
        sums = {}
        for (b, t), grid in counts.items():
            key = b if fix_band else t
            sums[key] = grid.copy() if key not in sums else sums[key] + grid
        return {(b, t): sums[b if fix_band else t] for (b, t) in counts}
    raise ValueError(f"Unknown weight grouping {grouping!r}; expected one of {valid}")


def l2_reweight(residual_vis, wgt, mask, dof: float, wgt_prev=1.0):
    """Student-t (L2) visibility reweighting (reference gridder.py:509-532).

    Scales natural weights by (dof + 2) / (dof + |r|^2 w_prev / ovar) where
    ovar is the per-corr mean residual power over unflagged samples.
    """
    ressq = (residual_vis * wgt_prev * jnp.conj(residual_vis)).real
    msk = mask > 0
    ssq = jnp.sum(jnp.where(msk[None] if ressq.ndim == 3 else msk, ressq, 0.0), axis=(-2, -1))
    ovar = ssq / jnp.maximum(jnp.sum(msk), 1)
    shape = (-1,) + (1,) * (ressq.ndim - 1)
    denom = dof + ressq / ovar.reshape(shape)
    return jnp.where(ovar.reshape(shape) > 0, wgt * (dof + 2) / denom, wgt)


@partial(jax.jit, static_argnames=("npix_super",))
def box_sum_counts(counts, npix_super: int):
    """Box-sum counts over a (2*npix_super+1)^2 window (super-uniform
    weighting, reference weighting.py:229-254), zero-padded at edges."""
    if npix_super is None or npix_super <= 0:
        return counts
    size = 2 * npix_super + 1

    def box1d(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (npix_super, npix_super)
        xp = jnp.pad(x, pad)
        cs = jnp.cumsum(xp, axis=axis)
        zero_shape = list(cs.shape)
        zero_shape[axis] = 1
        cs = jnp.concatenate([jnp.zeros(zero_shape, cs.dtype), cs], axis=axis)
        hi = jax.lax.slice_in_dim(cs, size, cs.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(cs, 0, cs.shape[axis] - size, axis=axis)
        return hi - lo

    return box1d(box1d(counts, -2), -1)
