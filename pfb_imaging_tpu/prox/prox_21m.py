"""The production SARA prox: the "21m" variant with a *signed sum* over the
band axis (reference prox/prox_21m.py — note this is deliberately NOT the
l2 norm; see SURVEY.md gotcha list, prox_21m.py:5-30 vs prox_21.py:5-23).

Layout: coefficient cubes are (nband, nbasis, nymax, nxmax); ``weight`` is
(nbasis, nymax, nxmax). The band-axis sum is the ONLY coupling between
bands in the whole backward step — under band sharding it becomes a psum
(see parallel/).
"""

from __future__ import annotations

import jax.numpy as jnp


def prox_21m(v, lam, sigma: float = 1.0, weight=None):
    """prox of (lam/sigma)*||W .||_{21m} evaluated at v/sigma.

    Mirrors prox_21m_numba (reference prox_21m.py:31-62):
        vbisum = sum_b(v)/sigma
        soft   = max(|vbisum| - lam*w/sigma, 0)
        out    = v * soft/|vbisum|/sigma   (0 where vbisum == 0)
    """
    if weight is None:
        weight = jnp.ones(v.shape[1:])
    vbisum = jnp.sum(v, axis=0) / sigma
    absv = jnp.abs(vbisum)
    soft = jnp.maximum(absv - lam * weight / sigma, 0.0)
    ratio = jnp.where(absv > 0, soft / jnp.where(absv > 0, absv, 1.0), 0.0)
    return v * ratio[None] / sigma


def dual_update(vp, v, lam, sigma: float = 1.0, weight=None):
    """Fused, numerically stable PD dual update (reference dual_update_numba_fast).

    v = vtilde * min(1, lam*w / |sum_b vtilde|),  vtilde = vp + sigma*v.
    ``v`` holds psih(xp) on entry (analysis coefficients of the primal
    extrapolate); returns the new dual.
    """
    if weight is None:
        weight = jnp.ones(v.shape[1:])
    vtilde = vp + sigma * v
    band_sum = jnp.abs(jnp.sum(vtilde, axis=0))
    threshold = lam * weight
    scale = jnp.where(band_sum > threshold, threshold / jnp.where(band_sum > 0, band_sum, 1.0), 1.0)
    return vtilde * scale[None]
