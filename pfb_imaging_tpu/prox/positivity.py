"""Positivity constraints as pure image-domain proxes (reference prox/positivity.py).

The reference mutates in place; here each returns a new array (JAX pure
semantics) — mode 1 clamps negatives, mode 2 zeros a pixel across all bands
when any band is non-positive.
"""

from __future__ import annotations

import jax.numpy as jnp


def positivity(x):
    """Mode 1: clamp negative values to zero."""
    return jnp.maximum(x, 0.0)


def positivity_band(x):
    """Mode 2: zero a pixel in all bands where any band is <= 0.

    x has shape (nband, nx, ny).
    """
    bad = jnp.any(x <= 0.0, axis=0, keepdims=True)
    return jnp.where(bad, 0.0, x)


def positivity_prox(mode: int):
    """Map the CLI positivity mode to a prox callable (or None)."""
    if mode == 0:
        return None
    if mode == 1:
        return positivity
    if mode == 2:
        return positivity_band
    raise ValueError(f"Unknown positivity mode {mode}")
