"""Daubechies wavelet transforms for the SARA dictionary.

Replaces the reference's numba kernel stack (wavelets/convolutions.py,
wavelets/wavelets.py) with XLA convolutions:

  * analysis  = zero-extended full convolution with the decomposition
    filters, downsampled by 2 starting at index 1 (exactly the reference's
    ``downsampling_convolution`` with step=2, convolutions.py:6-125);
  * synthesis = stride-2 upsampling convolution, valid part
    (``upsampling_convolution_valid_sf``, convolutions.py:126-330).

With this index bookkeeping the synthesis operator is the *exact transpose*
of analysis and an exact left inverse (the zero-extension makes the shift
family complete over the signal support), which the tests assert to machine
precision — the same adjointness/round-trip contract the reference checks
against PyWavelets (tests/test_wavelets.py:75-277).

Filter banks are computed at build time by spectral factorisation of the
Daubechies polynomial (PyWavelets is not a dependency); db1-db8 are checked
against published db2/db4 coefficients in the tests.

Sizes (reference wavelets/wavelets.py:28-35):
    coeff_size(n, k)  = (n + k - 1) // 2
    signal_size(c, k) = 2c - k + 2
"""

from __future__ import annotations

from functools import lru_cache
from math import comb

import jax
import jax.numpy as jnp
import numpy as np


def coeff_size(nsignal: int, nfilter: int) -> int:
    return (nsignal + nfilter - 1) // 2


def signal_size(ncoeff: int, nfilter: int) -> int:
    return 2 * ncoeff - nfilter + 2


def dwt_max_level(n: int, filter_len: int) -> int:
    if filter_len <= 1 or n < filter_len - 1:
        return 0
    return int(np.log2(n / (filter_len - 1.0)))


@lru_cache(maxsize=None)
def daubechies(p: int) -> np.ndarray:
    """Minimal-phase Daubechies scaling filter with p vanishing moments
    (length 2p), normalised to sum sqrt(2). db1 == Haar.

    Spectral factorisation: the half-band polynomial
    P(y) = sum_k C(p-1+k, k) y^k with y = (2 - z - 1/z)/4; keep the z-roots
    inside the unit circle and multiply by (1+z)^p.
    """
    if p == 1:
        return np.array([1.0, 1.0]) / np.sqrt(2.0)
    coeffs = [comb(p - 1 + k, k) for k in range(p)]
    yroots = np.roots(list(reversed(coeffs)))
    zroots = []
    for y in yroots:
        b = 2.0 - 4.0 * y
        disc = np.sqrt(b * b - 4.0 + 0j)
        z1 = (b + disc) / 2.0
        z2 = (b - disc) / 2.0
        zroots.append(z1 if abs(z1) < 1 else z2)
    poly = np.poly1d([1.0])
    for _ in range(p):
        poly = poly * np.poly1d([1.0, 1.0])
    for z in zroots:
        poly = poly * np.poly1d([1.0, -z])
    h = np.real(poly.coeffs)
    h = h / h.sum() * np.sqrt(2.0)
    return h


@lru_cache(maxsize=None)
def filter_bank(base: str):
    """(dec_lo, dec_hi, rec_lo, rec_hi) for 'dbN', PyWavelets conventions:
    rec_lo = scaling filter h; dec_lo = reverse(rec_lo);
    rec_hi[n] = (-1)^n dec_lo[n]; dec_hi = reverse(rec_hi)."""
    if not base.startswith("db"):
        raise ValueError(f"Unknown wavelet base {base!r} (only dbN supported)")
    p = int(base[2:])
    h = daubechies(p)
    rec_lo = h
    dec_lo = rec_lo[::-1].copy()
    signs = (-1.0) ** np.arange(2 * p)
    rec_hi = signs * dec_lo
    dec_hi = rec_hi[::-1].copy()
    return dec_lo, dec_hi, rec_lo, rec_hi


# ── 1D building blocks (XLA convolutions along the last axis) ─────────


def dwt1d(x, dec_lo, dec_hi):
    """One analysis level along the last axis.

    x: (..., n) -> (ca, cd) each (..., c) with c = (n + k - 1)//2.
    out[o] = sum_j f[j] * x[2o + 1 - j] over the zero-extended signal.
    """
    k = dec_lo.shape[0]
    n = x.shape[-1]
    c = coeff_size(n, k)
    batch_shape = x.shape[:-1]
    lhs = x.reshape(-1, 1, n)
    # correlation with reversed filters == true convolution
    rhs = jnp.stack([dec_lo[::-1], dec_hi[::-1]])[:, None, :]  # (2, 1, k)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs.astype(x.dtype),
        window_strides=(2,),
        padding=[(k - 2, 2 * c - n)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        # HIGH (3-pass bf16): TPU convs default to single-pass bf16
        # operands — the dot/hdot ADJOINT contract (what primal-dual's
        # convergence rests on) needs ~f32 accuracy on-chip (round 5;
        # invisible to the CPU tests). HIGH reaches ~1e-6 relative —
        # ample for the PD — at half the HIGHEST (6-pass) cost.
        precision=jax.lax.Precision.HIGH,
    )
    out = out.reshape(*batch_shape, 2, c)
    return out[..., 0, :], out[..., 1, :]


def idwt1d(ca, cd, rec_lo, rec_hi):
    """One synthesis level along the last axis: the exact transpose of
    :func:`dwt1d` (and its left inverse). (..., c) -> (..., 2c - k + 2)."""
    k = rec_lo.shape[0]
    c = ca.shape[-1]
    batch_shape = ca.shape[:-1]
    lhs = jnp.stack([ca, cd], axis=-2).reshape(-1, 2, c)
    rhs = jnp.stack([rec_lo[::-1], rec_hi[::-1]])[None, :, :]  # (1, 2, k) out=1, in=2
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs.astype(ca.dtype),
        window_strides=(1,),
        padding=[(1, 1)],
        lhs_dilation=(2,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGH,  # see dwt1d
    )
    return out.reshape(*batch_shape, signal_size(c, k))


# ── 2D level transforms (x-major layout) ─────────────────────────────


def dwt2d_level(image, dec_lo, dec_hi):
    """One 2D analysis level: image (nx, ny) -> block (2cx, 2cy) laid out
    [[LL, LH], [HL, HH]] with the x-subband on axis 0 and y-subband on axis 1.
    """
    # along y (last axis)
    la, ld = dwt1d(image, dec_lo, dec_hi)
    row = jnp.concatenate([la, ld], axis=-1)  # (nx, 2cy)
    # along x
    ca, cd = dwt1d(row.T, dec_lo, dec_hi)  # each (2cy, cx)
    return jnp.concatenate([ca, cd], axis=-1).T  # (2cx, 2cy)


def idwt2d_level(block, rec_lo, rec_hi, nx_out: int, ny_out: int):
    """Inverse of :func:`dwt2d_level`; crops to (nx_out, ny_out) which the
    caller takes from the bookkeeping (signal_size, possibly minus 1)."""
    ncx2, ncy2 = block.shape
    cx, cy = ncx2 // 2, ncy2 // 2
    # along x first (transpose of the analysis order)
    t = block.T  # (2cy, 2cx)
    x = idwt1d(t[..., :cx], t[..., cx:], rec_lo, rec_hi)  # (2cy, sx)
    x = x[..., :nx_out].T  # (sx, 2cy) -> crop -> transpose -> (nx_out? , 2cy)
    y = idwt1d(x[..., :cy], x[..., cy:], rec_lo, rec_hi)  # (nx_out, sy)
    return y[..., :ny_out]
