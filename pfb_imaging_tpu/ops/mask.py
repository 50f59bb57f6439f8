"""Pixel-mask linear operator (reference operators/mask.py:4-27): maps
between full images and the vector of unmasked components."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class Mask:
    """image <-> unmasked-component vector."""

    def __init__(self, mask):
        mask = np.asarray(mask)
        self.shape = mask.shape
        self.idx = np.nonzero(mask.ravel())[0]
        self.nnz = self.idx.size

    def dot(self, x):
        """(nx, ny) image -> (nnz,) components."""
        return x.reshape(-1)[self.idx]

    def hdot(self, beta):
        """(nnz,) components -> (nx, ny) image."""
        flat = jnp.zeros(int(np.prod(self.shape)), dtype=beta.dtype)
        return flat.at[self.idx].set(beta).reshape(self.shape)
