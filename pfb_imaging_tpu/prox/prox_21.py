"""ℓ2,1 prox with a true l2 norm over the band axis (reference prox/prox_21.py).

Kept alongside the production "21m" signed-sum variant; both exist in the
reference and tests compare them.
"""

from __future__ import annotations

import jax.numpy as jnp


def prox_21(v, lam, sigma: float = 1.0, weight=None):
    """prox of (lam/sigma)*||W .||_{2,1} at v/sigma (reference prox_21_numba)."""
    if weight is None:
        weight = jnp.ones(v.shape[1:])
    l2 = jnp.sqrt(jnp.sum(v * v, axis=0)) / sigma
    soft = jnp.maximum(l2 - lam * weight / sigma, 0.0)
    ratio = jnp.where(l2 > 0, soft / jnp.where(l2 > 0, l2, 1.0), 0.0)
    return v * ratio[None] / sigma


def dual_update_21(vp, v, lam, sigma: float = 1.0, weight=None):
    """Moreau dual update for the 2,1 norm: v = vtilde - sigma*prox(vtilde/sigma)."""
    if weight is None:
        weight = jnp.ones(v.shape[1:])
    vtilde = vp + sigma * v
    return vtilde - sigma * prox_21(vtilde, lam, sigma=sigma, weight=weight)
