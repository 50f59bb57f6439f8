"""Trivial dictionary for image-domain L1/ISTA (reference operators/psi.py:714-734)."""

from __future__ import annotations

import jax.numpy as jnp


class IdentityPsi:
    """PsiOperator whose analysis/synthesis are the identity.

    Coefficient layout is (nband, 1, nx, ny) to match the generic
    (nband, nbasis, nymax, nxmax) convention.
    """

    def __init__(self, nband: int, nx: int, ny: int):
        self.nband = nband
        self.nx = nx
        self.ny = ny
        self.nbasis = 1
        self.nymax = nx
        self.nxmax = ny

    @staticmethod
    def dot(x):
        return x[:, None, :, :]

    @staticmethod
    def hdot(alpha):
        return jnp.sum(alpha, axis=1)
