"""Cube-level PSF-Hessian preconditioner with an approximate inverse.

The reference exposes this twice (operators/hessian.py:251-436 ``HessPSF``
and operators/precond.py:12-154): ``dot`` is the per-band FFT PSF
convolution, ``idot`` approximately inverts it either by a per-band PCG
solve (mode="psf" — the forward-step workhorse of the legacy sara driver,
core/sara.py:280-281) or by the tapered direct inversion (mode="direct",
``xhat /= (abspsf + eta)`` with taper and beam^2 unwind).

TPU shape: one jitted program — per-band solves are a vmapped
``lax.while_loop`` CG over the band axis (shardable over the band mesh
axis), not per-band worker dispatches.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import taperf
from .hessian import hess_direct, hessian_psf

__all__ = ["HessPSF"]


class HessPSF:
    """Preconditioner over an image cube (reference HessPSF semantics).

    Args:
        abspsfhat: (nband, nx_psf, ny_psf//2+1) |PSFHAT| per band,
            wsum-normalised like the legacy driver (core/sara.py:154-157).
        nx_psf, ny_psf: padded PSF grid.
        beam: (nband, nx, ny) or None.
        eta: (nband,) or scalar Tikhonov term (relative to the PSF peak).
        cg_*: inner-solve controls for mode="psf".
        taper_width: cosine edge taper width for mode="direct".
    """

    def __init__(
        self,
        abspsfhat,
        nx_psf: int,
        ny_psf: int,
        beam=None,
        eta=1e-5,
        cg_tol: float = 1e-4,
        cg_maxit: int = 100,
        cg_minit: int = 1,
        taper_width: int = 32,
    ):
        self.abspsfhat = jnp.asarray(abspsfhat)
        self.nband = self.abspsfhat.shape[0]
        self.nx_psf, self.ny_psf = nx_psf, ny_psf
        self.beam = None if beam is None else jnp.asarray(beam)
        eta = np.broadcast_to(np.asarray(eta, dtype=float), (self.nband,))
        self.eta = jnp.asarray(eta)
        self.cg_tol, self.cg_maxit, self.cg_minit = cg_tol, cg_maxit, cg_minit
        self._taper_width = taper_width
        self._taper = None

    # ── forward ──────────────────────────────────────────────────────

    def dot(self, x):
        """(nband, nx, ny) -> beam*(|PSFHAT| conv (beam*x)) + eta*x."""

        def one(xb, ph, eta, bm):
            # eta added explicitly: hessian_psf's `if eta` guard cannot take
            # a vmapped tracer
            return hessian_psf(xb, ph, self.nx_psf, self.ny_psf, beam=bm) + eta * xb

        if self.beam is None:
            return jax.vmap(lambda xb, ph, eta: one(xb, ph, eta, None))(x, self.abspsfhat, self.eta)
        return jax.vmap(one)(x, self.abspsfhat, self.eta, self.beam)

    hdot = dot  # self-adjoint

    # ── approximate inverse ──────────────────────────────────────────

    def idot(self, x, mode: str = "psf", x0=None):
        """Approximate H^-1 x.

        mode="psf": per-band CG against :meth:`dot` (vmapped while_loops —
        the whole solve is ONE program). mode="direct": pointwise spectral
        division under an edge taper (reference hess_direct_slice).
        """
        x = jnp.asarray(x)
        if mode == "psf":
            from ..opt.pcg import pcg

            def solve_band(xb, ph, eta, bm, x0b):
                aop = jax.tree_util.Partial(
                    lambda v, ph=ph, eta=eta, bm=bm: hessian_psf(v, ph, self.nx_psf, self.ny_psf, beam=bm) + eta * v
                )
                return pcg(aop, xb, x0=x0b, tol=self.cg_tol, maxit=self.cg_maxit, minit=self.cg_minit)

            x0 = jnp.zeros_like(x) if x0 is None else jnp.asarray(x0)
            if self.beam is None:
                return jax.vmap(lambda xb, ph, eta, x0b: solve_band(xb, ph, eta, None, x0b))(
                    x, self.abspsfhat, self.eta, x0
                )
            return jax.vmap(solve_band)(x, self.abspsfhat, self.eta, self.beam, x0)
        if mode == "direct":
            if self._taper is None:
                self._taper = jnp.asarray(taperf(x.shape[-2:], self._taper_width))
            t = self._taper

            def direct_band(xb, ph, eta, bm):
                out = hess_direct(xb, ph, t, self.nx_psf, self.ny_psf, eta=eta, mode="backward")
                if bm is not None:
                    # beam^2 unwind with the reference's min_beam clamp
                    # (precond.py min_beam=5e-3)
                    out = out / jnp.maximum(bm, 5e-3) ** 2
                return out

            if self.beam is None:
                return jax.vmap(lambda xb, ph, eta: direct_band(xb, ph, eta, None))(x, self.abspsfhat, self.eta)
            return jax.vmap(direct_band)(x, self.abspsfhat, self.eta, self.beam)
        raise ValueError(f"unknown idot mode '{mode}'")
