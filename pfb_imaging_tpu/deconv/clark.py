"""Clark CLEAN minor cycle (reference deconv/clark.py:12-145).

Structure preserved: an active set of pixels above ``subpf * rmax`` is
cleaned by a cheap subminor peak-subtract loop (PSF windows only), then the
full-cube residual is recomputed once per major iteration with the FFT PSF
convolution. The reference's numba subminor iterates over an explicit
active-pixel list; on TPU the active set is a dense mask and the rank-1 PSF
subtraction is a masked full-image update (dense vector ops are cheaper
than gather/scatter bookkeeping on this hardware).

Normalisation contract preserved: dirty/psf are wsum-normalised so
``wsums.sum() == 1`` and MFS images are in Jy/beam (clark.py:85-88).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.psf import psf_convolve


@partial(jax.jit, static_argnames=("gamma", "th", "maxit"))
def subminor(residual, psf, active, model, wsums, gamma: float = 0.05, th: float = 0.0, maxit: int = 1000):
    """Peak-subtract within the active set.

    residual: (nband, nx, ny); psf: (nband, nx_psf, ny_psf); active: (nx, ny)
    bool mask; model updated in Jy (divided by wsums at the peak).
    """
    nband, nx, ny = residual.shape
    _, nx_psf, ny_psf = psf.shape
    nx0, ny0 = nx_psf // 2, ny_psf // 2
    fsel = wsums > 0
    safe_wsums = jnp.where(fsel, wsums, 1.0)

    def peak(res):
        rs = jnp.sum(res, axis=0) ** 2 * active
        pq = jnp.argmax(rs)
        p, q = pq // ny, pq % ny
        return p, q, jnp.sqrt(rs[p, q])

    p0, q0, amax0 = peak(residual)

    def cond(carry):
        model, res, amax, p, q, k = carry
        return (amax > th) & (k < maxit)

    def body(carry):
        model, res, amax, p, q, k = carry
        xhat = res[:, p, q]
        model = model.at[:, p, q].add(gamma * jnp.where(fsel, xhat / safe_wsums, 0.0))
        psf_win = jax.lax.dynamic_slice(psf, (0, nx0 - p, ny0 - q), (nband, nx, ny))
        sub = gamma * (xhat / safe_wsums)[:, None, None] * psf_win
        # only active pixels matter for the subminor search; subtracting on
        # the full window keeps them consistent (inactive pixels are
        # recomputed exactly by the FFT convolution in the caller)
        res = res - sub * active[None]
        pn, qn, amax_n = peak(res)
        return (model, res, amax_n, pn, qn, k + 1)

    init = (model, residual, amax0, p0, q0, jnp.int32(0))
    model, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return model


def clark(
    dirty,
    psf,
    psfhat,
    wsums,
    mask=None,
    threshold: float = 0.0,
    gamma: float = 0.05,
    pf: float = 0.05,
    maxit: int = 50,
    subpf: float = 0.5,
    submaxit: int = 1000,
    verbosity: int = 1,
):
    """Clark CLEAN. Host loop over major iterations (each one jit-dispatched);
    returns (model, residual, status)."""
    nband, nx, ny = dirty.shape
    _, nx_psf, ny_psf = psf.shape
    if mask is None:
        mask = jnp.ones((nx, ny), dtype=dirty.dtype)
    model = jnp.zeros_like(dirty)
    residual = dirty

    def peak(res):
        rs = jnp.sum(res, axis=0) ** 2 * mask
        pq = jnp.argmax(rs)
        return float(jnp.sqrt(rs.reshape(-1)[pq]))

    rmax = peak(residual)
    tol = max(pf * rmax, threshold)
    k = 0
    stall = 0
    while rmax > tol and k < maxit and stall < 5:
        subth = subpf * rmax
        active = (jnp.sum(residual, axis=0) ** 2 * mask) > subth**2
        model = subminor(residual, psf, active, model, wsums, gamma=gamma, th=subth, maxit=submaxit)
        # exact subtraction on the full cube via FFT PSF convolution
        residual = dirty - psf_convolve(model, psfhat, nx_psf, ny_psf)
        rmax_p = rmax
        rmax = peak(residual)
        k += 1
        if abs(rmax_p - rmax) / abs(rmax_p) < 1e-3:
            stall += 1

    status = 1 if (k >= maxit or stall >= 5) else 0
    return model, residual, status


@partial(jax.jit, static_argnames=("gamma", "th", "maxit"))
def fssubminor(residual, psf, active, model, wsums, gamma: float = 0.05, th: float = 0.0, maxit: int = 1000):
    """Full-Stokes subminor (reference fssubminor, clark.py:147-225): peak
    search on the total-polarisation power sum_corr (sum_band r)^2; all
    correlations cleaned jointly at the peak.

    residual/model: (nband, ncorr, nx, ny); psf: (nband, ncorr, nxp, nyp);
    wsums: (nband, ncorr)."""
    nband, ncorr, nx, ny = residual.shape
    _, _, nx_psf, ny_psf = psf.shape
    nx0, ny0 = nx_psf // 2, ny_psf // 2
    fsel = wsums > 0
    safe_wsums = jnp.where(fsel, wsums, 1.0)

    def peak(res):
        mfs = jnp.sum(res, axis=0)  # (ncorr, nx, ny)
        rs = jnp.sum(mfs**2, axis=0) * active
        pq = jnp.argmax(rs)
        p, q = pq // ny, pq % ny
        return p, q, jnp.sqrt(rs[p, q])

    p0, q0, amax0 = peak(residual)

    def cond(carry):
        model, res, amax, p, q, k = carry
        return (amax > th) & (k < maxit)

    def body(carry):
        model, res, amax, p, q, k = carry
        xhat = res[:, :, p, q]  # (nband, ncorr)
        model = model.at[:, :, p, q].add(gamma * jnp.where(fsel, xhat / safe_wsums, 0.0))
        psf_win = jax.lax.dynamic_slice(psf, (0, 0, nx0 - p, ny0 - q), (nband, ncorr, nx, ny))
        sub = gamma * (xhat / safe_wsums)[:, :, None, None] * psf_win
        res = res - sub * active[None, None]
        pn, qn, amax_n = peak(res)
        return (model, res, amax_n, pn, qn, k + 1)

    init = (model, residual, amax0, p0, q0, jnp.int32(0))
    model, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return model


def fsclark(
    dirty,
    psf,
    psfhat,
    wsums,
    mask=None,
    threshold: float = 0.0,
    gamma: float = 0.05,
    pf: float = 0.05,
    maxit: int = 50,
    subpf: float = 0.5,
    submaxit: int = 1000,
):
    """Full-Stokes Clark CLEAN (reference fsclark, clark.py:225-295).

    dirty: (nband, ncorr, nx, ny) wsum-normalised (wsums.sum(axis=0) == 1
    per corr). Returns (model, residual, status)."""
    nband, ncorr, nx, ny = dirty.shape
    _, _, nx_psf, ny_psf = psf.shape
    if mask is None:
        mask = jnp.ones((nx, ny), dtype=dirty.dtype)
    model = jnp.zeros_like(dirty)
    residual = dirty

    def peak(res):
        mfs = jnp.sum(res, axis=0)
        rs = jnp.sum(mfs**2, axis=0) * mask
        pq = jnp.argmax(rs)
        return float(jnp.sqrt(rs.reshape(-1)[pq]))

    rmax = peak(residual)
    tol = max(pf * rmax, threshold)
    k = 0
    stall = 0
    while rmax > tol and k < maxit and stall < 5:
        subth = subpf * rmax
        mfs = jnp.sum(residual, axis=0)
        active = (jnp.sum(mfs**2, axis=0) * mask) > subth**2
        model = fssubminor(residual, psf, active, model, wsums, gamma=gamma, th=subth, maxit=submaxit)
        residual = dirty - psf_convolve(model, psfhat, nx_psf, ny_psf)
        rmax_p = rmax
        rmax = peak(residual)
        k += 1
        if abs(rmax_p - rmax) / abs(rmax_p) < 1e-3:
            stall += 1

    status = 1 if (k >= maxit or stall >= 5) else 0
    return model, residual, status
