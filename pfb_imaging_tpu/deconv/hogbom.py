"""Hogbom CLEAN minor cycle as a single jitted ``lax.while_loop``
(reference deconv/hogbom.py:9-71; the reference itself sketches a jax
version at hogbom.py:75-115 — here it is the production path).

Peak search is over the MFS residual ``(sum_b residual)^2``; the PSF
subtraction slices the (psf_oversize-padded) PSF cube around the peak.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("threshold", "gamma", "pf", "maxit"))
def hogbom(dirty, psf, threshold: float = 0.0, gamma: float = 0.1, pf: float = 0.1, maxit: int = 10000):
    """Returns (model, residual, status) with status 0 on convergence,
    1 on maxit/stall (reference return convention)."""
    nband, nx, ny = dirty.shape
    _, nx_psf, ny_psf = psf.shape
    nx0, ny0 = nx_psf // 2, ny_psf // 2
    wsums = jnp.amax(psf, axis=(1, 2))
    fsel = wsums > 0
    safe_wsums = jnp.where(fsel, wsums, 1.0)

    def peak(residual):
        rs = jnp.sum(residual, axis=0) ** 2
        pq = jnp.argmax(rs)
        p, q = pq // ny, pq % ny
        return p, q, jnp.sqrt(rs[p, q])

    p0, q0, rmax0 = peak(dirty)
    tol = jnp.maximum(pf * rmax0, threshold)

    def cond(carry):
        model, residual, rmax, p, q, k, stall = carry
        return (rmax > tol) & (k < maxit) & (stall < 5)

    def body(carry):
        model, residual, rmax, p, q, k, stall = carry
        xhat = jnp.where(fsel, residual[:, p, q] / safe_wsums, 0.0)
        model = model.at[:, p, q].add(gamma * xhat)
        psf_win = jax.lax.dynamic_slice(psf, (0, nx0 - p, ny0 - q), (nband, nx, ny))
        residual = residual - gamma * xhat[:, None, None] * psf_win
        pn, qn, rmax_n = peak(residual)
        stall = stall + jnp.where(jnp.abs(rmax - rmax_n) / jnp.abs(rmax) < 5e-3, 1, 0)
        return (model, residual, rmax_n, pn, qn, k + 1, stall)

    init = (jnp.zeros_like(dirty), dirty, rmax0, p0, q0, jnp.int32(0), jnp.int32(0))
    model, residual, rmax, _, _, k, stall = jax.lax.while_loop(cond, body, init)
    status = jnp.where((k >= maxit) | (stall >= 5), 1, 0)
    return model, residual, status
