"""PFBSolver: the concrete DeconvSolver composing (hess, forward, backward,
regulariser) — reference deconv/pfb.py:57-193 with the same wiring and
gotchas: the grad closure ``grad(x) = -H(xtilde - x)/gamma`` with
``xtilde = model + gamma*update`` (pfb.py:155-161), the x1.05 hess-norm
inflation (pfb.py:126), ``ReweightOnConverge`` installation, and the
``reweight_active`` polarity (design D6: True means "stop at convergence
rather than trigger reweighting")."""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from ..ops import LinearOperator, require_protocol
from ..opt import BackwardSolver, ForwardSolver
from ..opt.power_method import power_method

log = logging.getLogger("pfb_tpu.PFB")


class ReweightOnConverge:
    """on_converge callback driving inner l1 reweighting (reference pfb.py:14-55)."""

    def __init__(self, regulariser, maxreweight: int = 20, verbosity: int = 1):
        self.reg = regulariser
        self.maxreweight = maxreweight
        self.verbosity = verbosity
        self._num = 0
        self._last_iter = 0

    def reset(self) -> None:
        self._num = 0
        self._last_iter = 0

    def __call__(self, x, k: int, eps: float) -> bool:
        if self.reg.reweight_active and self._num < self.maxreweight:
            self.reg.update_weights(x)
            if k - self._last_iter == 1:
                self._num += 1
            else:
                self._num = 0
            self._last_iter = k
            return False
        if self._num >= self.maxreweight and self.verbosity:
            log.info("Maximum reweighting steps reached")
        return True


def _pfb_grad(hess_dot, xtilde, gamma, x):
    """Pure gradient of the PFB smooth term (bound via tree_util.Partial)."""
    return -hess_dot(xtilde - x) / gamma


class PFBSolver:
    """Preconditioned forward-backward solver (``DeconvSolver``)."""

    def __init__(
        self,
        hess,
        forward_alg,
        backward_alg,
        prox,
        *,
        model,
        update,
        gamma: float = 1.0,
        hessnorm: float | None = None,
        l1_reweight_from: int = 5,
        maxreweight: int = 20,
        pm_tol: float = 1e-3,
        pm_maxit: int = 100,
        verbosity: int = 1,
    ):
        require_protocol(hess, LinearOperator, "hess")
        require_protocol(forward_alg, ForwardSolver, "forward_alg")
        require_protocol(backward_alg, BackwardSolver, "backward_alg")
        self.hess = hess
        self.forward_alg = forward_alg
        self.backward_alg = backward_alg
        self.reg = prox
        self._model = jnp.asarray(model)
        self._update = jnp.asarray(update)
        self._residual = None
        self._gamma = gamma
        self._l1_reweight_from = l1_reweight_from
        self._iter = 0

        if hessnorm is None:
            log.info("Finding spectral norm of Hessian approximation")
            b0 = None
            if jax.process_count() > 1:
                # multi-host: the start vector must share the hess's band
                # sharding — mixed local/global inputs cannot jit across
                # hosts (parallel/multihost.py)
                lead = next(
                    (
                        leaf
                        for leaf in jax.tree_util.tree_leaves(hess)
                        if hasattr(leaf, "sharding")
                        and getattr(leaf, "ndim", 0) >= 1
                        and leaf.shape[0] == model.shape[0]
                    ),
                    None,
                )
                if lead is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    b0 = jax.device_put(
                        jax.random.normal(jax.random.PRNGKey(42), model.shape),
                        NamedSharding(lead.sharding.mesh, P("band")),
                    )
            beta, _ = power_method(hess.dot, model.shape, b0=b0, tol=pm_tol, maxit=pm_maxit)
            hessnorm = float(beta) * 1.05
        self.hess_norm = float(hessnorm)
        log.info("Using hess_norm = %.3e", self.hess_norm)

        backward_alg.setup(prox, self.hess_norm)

        self._reweight_cb = None
        if hasattr(prox, "update_weights") and hasattr(prox, "reweight_active"):
            self._reweight_cb = ReweightOnConverge(prox, maxreweight=maxreweight, verbosity=verbosity)
            if getattr(backward_alg, "on_converge", None) is None:
                backward_alg.on_converge = self._reweight_cb

    # --- DeconvSolver interface ---

    def first(self, residual) -> None:
        self._residual = jnp.asarray(residual)

    def forward(self, residual):
        if self._residual is None:
            raise RuntimeError("residual not set; call first() before forward()")
        x0 = self._update if bool(jnp.any(self._update)) else None
        self._update = self.forward_alg.solve(self.hess, self._residual, x0=x0)
        xtilde = self._model + self._gamma * self._update
        if hasattr(self.hess, "dot_partial"):
            hess_dot = self.hess.dot_partial()
        else:
            hess_dot = jax.tree_util.Partial(self.hess.dot)
        from ..opt.primal_dual import dev_scalar

        grad = jax.tree_util.Partial(_pfb_grad, hess_dot, xtilde, dev_scalar(self._gamma, xtilde.dtype))
        self.backward_alg.set_grad(grad)
        return self._update

    def backward(self, lam: float):
        if self._reweight_cb is not None:
            self._reweight_cb.reset()
        self._model = self.backward_alg.solve(self._model, lam)
        self._iter += 1
        return self._model

    def last(self) -> None:
        if not hasattr(self.reg, "init_reweighting"):
            return
        if self._l1_reweight_from < 0 or self._iter < self._l1_reweight_from:
            return
        log.info("Computing L1 weights")
        self.reg.init_reweighting(self._update)
        self.reg.update_weights(self._model)

    # --- driver sniffing (reference pfb.py:181-193) ---

    @property
    def reweight_active(self) -> bool:
        if not hasattr(self.reg, "init_reweighting") or self._l1_reweight_from < 0:
            return True
        return self.reg.reweight_active

    def trigger_reweight(self) -> None:
        self._l1_reweight_from = self._iter
