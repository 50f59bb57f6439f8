"""Forward-backward splitting with optional FISTA momentum
(reference opt/forward_backward.py:21-135), jitted device-side.

The tight-frame proximal composition
``x + (1/nu) * Psi(prox_g(Psi^T x) - Psi^T x)`` is implemented once,
generically for any regulariser exposing a pure ``prox_fn``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import PsiOperator, require_protocol


def _norm_diff(x, xp):
    num = jnp.vdot(x - xp, x - xp).real
    den = jnp.maximum(jnp.vdot(x, x).real, 1e-12)
    return jnp.sqrt(num / den)


@partial(
    jax.jit,
    static_argnames=("psi_dot", "psi_hdot", "prox_fn", "primal_prox", "nu", "acceleration", "tol", "maxit"),
)
def forward_backward_loop(
    x,
    lam,
    weight,
    step,
    grad,  # jax.tree_util.Partial (traced pytree; see primal_dual_loop)
    *,
    psi_dot,
    psi_hdot,
    prox_fn,
    primal_prox=None,
    nu: float = 1.0,
    acceleration: bool = True,
    tol: float = 1e-5,
    maxit: int = 1000,
):
    """Returns (x, niter, eps)."""

    def apply_prox(xc, lam):
        alpha = psi_dot(xc)
        alpha_p = prox_fn(alpha, step * lam, sigma=1.0, weight=weight)
        xc = xc + psi_hdot(alpha_p - alpha) / nu
        if primal_prox is not None:
            xc = primal_prox(xc)
        return xc

    def cond(carry):
        x, xp, y, t, k, eps = carry
        return (eps > tol) & (k < maxit)

    def body(carry):
        x, xp, y, t, k, eps = carry
        xn = y - step * grad(y)
        xn = apply_prox(xn, lam)
        epsn = jnp.where(jnp.any(xn != 0), _norm_diff(xn, x), 1.0)
        if acceleration:
            tn = (1.0 + jnp.sqrt(1.0 + 4.0 * t**2)) / 2.0
            yn = xn + (t - 1.0) / tn * (xn - x)
        else:
            tn = t
            yn = xn
        return (xn, x, yn, tn, k + 1, epsn)

    init = (x, x, x, jnp.asarray(1.0, x.dtype), jnp.int32(0), jnp.asarray(1.0, x.dtype))
    x, _, _, _, k, eps = jax.lax.while_loop(cond, body, init)
    return x, k, eps


class ForwardBackward:
    """``BackwardSolver`` via forward-backward/FISTA (reference forward_backward.py)."""

    def __init__(
        self,
        tol: float = 1e-5,
        maxit: int = 1000,
        report_freq: int = 10,
        verbosity: int = 1,
        gamma: float = 1.0,
        acceleration: bool = True,
        on_converge=None,
        primal_prox=None,
    ):
        self.tol = tol
        self.maxit = maxit
        self.report_freq = report_freq
        self.verbosity = verbosity
        self.gamma = gamma
        self.acceleration = acceleration
        self.on_converge = on_converge
        self.primal_prox = primal_prox
        self._grad = None
        self._reg = None

    def setup(self, prox, hessnorm: float) -> None:
        require_protocol(prox.psi, PsiOperator, "prox.psi")
        self._reg = prox
        self.hessnorm = float(hessnorm)
        self.step = 2.0 * self.gamma / self.hessnorm

    def set_grad(self, grad) -> None:
        self._grad = grad

    def reset(self) -> None:
        """No warm-start state beyond x itself."""

    def solve(self, x, lam: float):
        if self._reg is None:
            raise RuntimeError("regulariser not bound; call setup() before solve()")
        if self._grad is None:
            raise RuntimeError("grad not set; call set_grad() before solve()")
        reg = self._reg
        budget = self.maxit
        k_total = 0
        eps = 1.0
        grad = self._grad
        if not isinstance(grad, jax.tree_util.Partial):
            grad = jax.tree_util.Partial(grad)
        from .primal_dual import dev_scalar

        dt = jnp.asarray(x).dtype
        while budget > 0:
            x, k, eps = forward_backward_loop(
                x,
                dev_scalar(lam, dt),
                getattr(reg, "l1weight", None),
                dev_scalar(self.step, dt),
                grad,
                psi_dot=reg.psi.dot,
                psi_hdot=reg.psi.hdot,
                prox_fn=reg.prox_fn,
                primal_prox=self.primal_prox,
                nu=reg.nu,
                acceleration=self.acceleration,
                tol=self.tol,
                maxit=self.maxit,
            )
            k_total += int(k)
            budget -= int(k)
            if float(eps) < self.tol:
                if self.on_converge is None or self.on_converge(x, k_total, float(eps)):
                    break
            else:
                break
        return x
