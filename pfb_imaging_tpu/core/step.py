"""The PFB major cycle as one jittable program.

The reference's major cycle round-trips driver <-> Ray band workers per PD
iteration (deconv-primer.md:150-160); here the whole
CG-forward + PD-backward step is a single XLA program. Under a band-sharded
mesh the only collectives are the band-axis sums inside the dual update and
the CG/PD reduction scalars — exactly the communication structure of the
reference's band-actor topology, but compiled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..deconv.pfb import _pfb_grad
from ..ops.hessian import HessianCube, hess_cube_dot
from ..opt.pcg import pcg
from ..opt.primal_dual import primal_dual_loop
from ..prox.prox_21m import dual_update as dual_update_21m
from ..prox.positivity import positivity


@partial(
    jax.jit,
    static_argnames=("psi", "cg_tol", "cg_maxit", "cg_minit", "pd_tol", "pd_maxit", "pos"),
)
def pfb_major_step(
    hess: HessianCube,
    residual,
    model,
    update,
    dual,
    l1weight,
    lam,
    *,
    psi,
    gamma: float = 1.0,
    sigma,
    tau,
    cg_tol: float = 1e-4,
    cg_maxit: int = 100,
    cg_minit: int = 1,
    pd_tol: float = 1e-5,
    pd_maxit: int = 500,
    pos: bool = True,
):
    """One full major-cycle step (forward CG + backward PD).

    Returns (model, update, dual). The residual update (exact degrid/grid)
    stays outside — it needs the measurement operator (reference
    deconv-primer: the residual is always computed externally).
    """
    aop = jax.tree_util.Partial(hess_cube_dot, hess)
    update = pcg(aop, residual, x0=update, tol=cg_tol, maxit=cg_maxit, minit=cg_minit)
    xtilde = model + gamma * update
    grad = jax.tree_util.Partial(_pfb_grad, aop, xtilde, gamma)
    model, dual, _, _ = primal_dual_loop(
        model,
        dual,
        lam,
        l1weight,
        sigma,
        tau,
        grad,
        psi_dot=psi.dot,
        psi_hdot=psi.hdot,
        primal_prox=positivity if pos else None,
        dual_update=dual_update_21m,
        tol=pd_tol,
        maxit=pd_maxit,
    )
    return model, update, dual


def pd_step_sizes(hessnorm: float, gamma: float, nu: float):
    """sigma = hessnorm/(2 gamma)/nu, tau = 0.98/(hessnorm/(2 gamma) + sigma nu^2)."""
    sigma = hessnorm / (2.0 * gamma) / nu
    tau = 0.98 / (hessnorm / (2.0 * gamma) + sigma * nu**2)
    return sigma, tau
