"""Weighted l1 regulariser (ISTA when psi is the identity; reference prox/l1.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import PsiOperator, require_protocol


class L1:
    """R(alpha) = ||W alpha||_1."""

    def __init__(self, psi, nu: float = 1.0):
        require_protocol(psi, PsiOperator, "psi")
        self.psi = psi
        self.nu = nu
        self.weight = jnp.ones((psi.nbasis, psi.nymax, psi.nxmax))

    @staticmethod
    def prox_fn(v, lam, sigma: float = 1.0, weight=1.0):
        """Pure soft threshold: prox_{(lam/sigma)||W .||_1}(v/sigma)."""
        vout = v / sigma
        thresh = (lam / sigma) * weight
        return jnp.sign(vout) * jnp.maximum(jnp.abs(vout) - thresh, 0.0)

    def prox(self, v, lam, sigma: float = 1.0):
        return self.prox_fn(v, lam, sigma=sigma, weight=self.weight)

    @property
    def l1weight(self):
        return self.weight
