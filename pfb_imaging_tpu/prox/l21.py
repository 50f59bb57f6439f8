"""Weighted ℓ2,1 regulariser over a wavelet dictionary — the SARA prior
(reference prox/l21.py). Owns the l1-reweighting state.

Gotcha preserved from the reference (design D3): ``nu`` must be the squared
frame bound ||Psi Psi^T|| = nbasis for the SARA concatenation of orthonormal
bases, NOT the tight-frame 1.0 — presets pass nu=len(bases).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import PsiOperator, require_protocol
from .prox_21m import dual_update as _dual_update
from .prox_21m import prox_21m as _prox_21m


def l1reweight_func(mcomps, rmsfactor, rms_comps, alpha=4):
    """(1 + rmsfactor) / (1 + (|mcomps|/rms)^alpha) (reference utils/misc.py:742-756).

    Components rmsfactor times larger than the rms keep their weight; small
    (low-SNR) components are strongly thresholded.
    """
    rms = jnp.asarray(rms_comps)
    if rms.ndim == 1:
        rms = rms[:, None, None]
    return (1.0 + rmsfactor) / (1.0 + jnp.abs(mcomps) ** alpha / rms**alpha)


class L21:
    """Satisfies the ``Regulariser`` seam: R(x) = ||W Psi^T x||_{21m}.

    Args:
        psi: PsiOperator (pure dot/hdot over coefficient cubes).
        bases: basis names (logging only).
        nu: spectral norm of psi — nbasis for SARA (D3).
        rmsfactor, alpha: reweighting formula parameters.
    """

    def __init__(self, psi, bases, nu: float = 1.0, rmsfactor: float = 1.0, alpha: float = 2.0):
        require_protocol(psi, PsiOperator, "psi")
        self.psi = psi
        self.nu = nu
        self.bases = tuple(bases)
        self.rmsfactor = rmsfactor
        self.alpha = alpha
        self.l1weight = jnp.ones((psi.nbasis, psi.nymax, psi.nxmax))
        self._rms_comps = None

    # pure kernels consumed by the jitted PD loop (weight passed as a traced
    # argument so reweighting does not stale the jit cache)
    prox_fn = staticmethod(_prox_21m)
    dual_update_fn = staticmethod(_dual_update)

    def prox(self, v, lam, sigma: float = 1.0):
        """Pure: returns prox_{(lam/sigma)||W .||_{21m}}(v/sigma)."""
        return _prox_21m(v, lam, sigma=sigma, weight=self.l1weight)

    def dual_update(self, vp, v, lam, sigma: float = 1.0):
        """Fused PD dual update fast path (pure; returns the new dual)."""
        return _dual_update(vp, v, lam, sigma=sigma, weight=self.l1weight)

    @property
    def reweight_active(self) -> bool:
        return self._rms_comps is not None

    def init_reweighting(self, update):
        """Estimate per-basis rms from the update's nonzero coefficients and
        arm reweighting (reference l21.py:56-77)."""
        coeffs = np.asarray(jnp.sum(self.psi.dot(update), axis=0))
        rms_comps = np.ones(self.psi.nbasis)
        for i in range(self.psi.nbasis):
            nonzero = coeffs[i][coeffs[i] != 0]
            if nonzero.size:
                rms_comps[i] = np.std(nonzero)
        self._rms_comps = rms_comps

    def update_weights(self, x):
        """Recompute l1 weights from the current iterate."""
        mcomps = jnp.abs(jnp.sum(self.psi.dot(x), axis=0))
        self.l1weight = l1reweight_func(mcomps, self.rmsfactor, self._rms_comps, self.alpha)
