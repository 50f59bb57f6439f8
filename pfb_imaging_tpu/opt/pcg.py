"""Preconditioned conjugate gradients as a single jitted device-side loop.

The reference's band workers run the whole CG loop inside one Ray actor
dispatch to avoid per-iteration round trips (reference opt/pcg.py:88-199
``pcg_numba`` + hessian.py:606-611 fast path). Here that is simply a
``lax.while_loop`` under jit — one dispatch per solve is the *default*.

Algorithmic details preserved from the reference oracle: relative-change
convergence ``eps = ||x - xp||/||x||``, minimum iterations, stall counter
(5 stalls with ``|eps_p - eps| < 1e-3 * tol`` terminate), zero-initial-
residual early exit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _norm_diff(x, xp):
    num = jnp.vdot(x - xp, x - xp).real
    den = jnp.maximum(jnp.vdot(x, x).real, 1e-12)
    return jnp.sqrt(num / den)


def pcg(
    aop,
    b,
    x0=None,
    precond=None,
    tol: float = 1e-5,
    maxit: int = 500,
    minit: int = 100,
):
    """Solve ``aop(x) = b``; jittable (close over aop/precond).

    Returns the solution x (same shape as b).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = lambda x: x  # noqa: E731

    r0 = aop(x0) - b
    y0 = precond(r0)
    rnorm0 = jnp.vdot(r0, y0).real

    def cond(carry):
        x, r, y, p, rnorm, k, eps, stall = carry
        return ((eps > tol) | (k < minit)) & (k < maxit) & (stall < 5)

    def body(carry):
        x, r, y, p, rnorm, k, eps, stall = carry
        ap = aop(p)
        alpha = rnorm / jnp.vdot(p, ap).real
        xn = x + alpha * p
        rn = r + alpha * ap
        yn = precond(rn)
        rnorm_next = jnp.vdot(rn, yn).real
        beta = rnorm_next / rnorm
        pn = beta * p - yn
        eps_n = _norm_diff(xn, x)
        stall_n = stall + jnp.where(jnp.abs(eps - eps_n) < 1e-3 * tol, 1, 0)
        return (xn, rn, yn, pn, rnorm_next, k + 1, eps_n, stall_n)

    init = (x0, r0, y0, -y0, rnorm0, jnp.int32(0), jnp.asarray(1.0, b.real.dtype), jnp.int32(0))
    x, r, *_ = jax.lax.while_loop(cond, body, init)
    # zero initial preconditioned residual -> return x0 (reference pcg.py:121-124)
    return jnp.where(jnp.any(y0 != 0), x, x0)


class PCG:
    """``ForwardSolver`` over a hess with a jittable ``dot`` (reference pcg.py:586-630).

    The reference sniffs a distributed ``hess.cg`` fast path; here the whole
    loop is device-side by construction, and a hess may still provide
    ``cg(residual, x0)`` to own its solve (e.g. band-sharded solves in
    parallel/), which is preferred when present.
    """

    def __init__(self, tol: float = 1e-5, maxit: int = 500, minit: int = 100, verbosity: int = 1):
        self.tol = tol
        self.maxit = maxit
        self.minit = minit
        self.verbosity = verbosity

    def solve(self, hess, residual, x0=None):
        if hasattr(hess, "cg"):
            return hess.cg(residual, x0=x0, tol=self.tol, maxit=self.maxit, minit=self.minit)
        precond = getattr(hess, "precond", None)
        return pcg(hess.dot, residual, x0=x0, precond=precond, tol=self.tol, maxit=self.maxit, minit=self.minit)
