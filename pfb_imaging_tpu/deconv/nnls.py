"""Non-negative least squares minor cycle via FISTA + power method
(reference deconv/nnls.py:33-151).

Minimises ``0.5 ||dirty - PSF conv x||^2_H`` s.t. ``x >= 0`` where the
quadratic is expressed through the PSF-convolution Hessian.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..opt.fista import fista
from ..opt.power_method import power_method
from ..ops.psf import psf_convolve


def nnls(dirty, psfhat, nx_psf: int, ny_psf: int, x0=None, tol: float = 1e-5, maxit: int = 100, hessnorm=None):
    """Returns the non-negative model."""

    def hess(x):
        return psf_convolve(x, psfhat, nx_psf, ny_psf)

    if hessnorm is None:
        hessnorm, _ = power_method(hess, dirty.shape, tol=1e-4, maxit=200)
        hessnorm = float(hessnorm) * 1.05

    def fprime(x):
        hx = hess(x)
        fid = 0.5 * jnp.vdot(x, hx).real - jnp.vdot(x, dirty).real
        return fid, hx - dirty

    def prox(x):
        return jnp.maximum(x, 0.0)

    x0 = jnp.zeros_like(dirty) if x0 is None else x0
    return fista(fprime, prox, x0, hessnorm, tol=tol, maxit=maxit)
