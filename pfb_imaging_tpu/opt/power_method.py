"""Spectral-norm estimation by the power method, jitted device-side
(reference opt/power_method.py:40-148). The driver inflates the result by
1.05 before using it as ``hess_norm`` (reference deconv/pfb.py:126)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def power_method(aop, imsize, b0=None, tol: float = 1e-5, maxit: int = 250, key=None):
    """Estimate the largest eigenvalue of the symmetric operator ``aop``.

    Returns (beta, b): the eigenvalue estimate and final vector.
    """
    if b0 is None:
        if key is None:
            key = jax.random.PRNGKey(42)
        b0 = jax.random.normal(key, imsize)
    b = b0 / jnp.linalg.norm(b0)

    def cond(carry):
        b, bp, beta, eps, k = carry
        return (eps > tol) & (k < maxit)

    def body(carry):
        b, bp, beta, eps, k = carry
        bn = aop(b)
        bnorm = jnp.linalg.norm(bn)
        betan = jnp.vdot(b, bn).real / jnp.vdot(b, b).real
        bn = bn / bnorm
        epsn = jnp.abs(betan - beta) / jnp.maximum(beta, 1e-300)
        return (bn, b, betan, epsn, k + 1)

    init = (b, b, jnp.asarray(1.0, b.dtype), jnp.asarray(1.0, b.dtype), jnp.int32(0))
    b, _, beta, _, _ = jax.lax.while_loop(cond, body, init)
    return beta, b
