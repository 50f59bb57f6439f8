"""Gaussian-process covariance operator with Kronecker fast paths
(reference operators/gauss.py:40-118 + utils/misc.py kron_matvec:45-77).

K = K_f ⊗ K_l ⊗ K_m with squared-exponential factors; matvecs cost
O(N * sum n_i) instead of O(N^2) via the Kronecker identity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def expsq(x, xp, sigma_f: float, length: float):
    """Squared-exponential kernel matrix (africanus expsq in the reference)."""
    d2 = (np.asarray(x)[:, None] - np.asarray(xp)[None, :]) ** 2
    return sigma_f**2 * np.exp(-d2 / (2 * length**2))


def kron_matvec(mats, x):
    """(⊗_i A_i) vec(x) for square factors A_i (reference kron_matvec).

    x has shape (n_0, n_1, ..., n_{k-1}) matching the factor sizes.
    """
    out = x
    k = len(mats)
    for i, a in enumerate(mats):
        a = jnp.asarray(a)
        # contract factor i against its axis, keep axis order
        out = jnp.moveaxis(jnp.tensordot(a, out, axes=([1], [i])), 0, i)
    return out


class Gauss:
    """GP prior operator over (nband, nx, ny) cubes."""

    def __init__(self, freqs, xcoords, ycoords, sigma_f=1.0, lf=1.0, lx=1.0, ly=1.0, jitter=1e-10):
        self.kf = expsq(freqs, freqs, sigma_f, lf) + jitter * np.eye(len(freqs))
        self.kx = expsq(xcoords, xcoords, 1.0, lx) + jitter * np.eye(len(xcoords))
        self.ky = expsq(ycoords, ycoords, 1.0, ly) + jitter * np.eye(len(ycoords))
        self._chols = None

    def dot(self, x):
        return kron_matvec((self.kf, self.kx, self.ky), x)

    def hdot(self, x):
        return self.dot(x)  # symmetric

    def sqrtdot(self, x):
        """L x with K = L L^T (Kronecker of Cholesky factors) — white noise
        -> GP sample, used for GP-simulated gains in the reference tests."""
        if self._chols is None:
            self._chols = tuple(np.linalg.cholesky(k) for k in (self.kf, self.kx, self.ky))
        return kron_matvec(self._chols, x)
