"""Hessian approximations of the measurement operator (reference operators/hessian.py).

Three tiers, matching the reference:
  * ``hessian_vis``       — exact vis-space Hessian `B^T G^T W G B x (+ eta x)`
                            via a full degrid/grid round trip
                            (reference hessian.py:15-100).
  * ``hessian_psf``       — FFT PSF-convolution approximation
                            (reference hessian.py:103-175).
  * ``hess_direct``       — tapered direct Hessian and its pointwise inverse,
                            used as a cheap preconditioner
                            (reference hessian.py:178-248).
  * ``hessian_tree_dot``  — sum-over-partitions PSF Hessian
                            `H x = (1/wsum) Σ_p B_pᵀ(PSF_p ⊛ (B_p x)) + ηx`
                            (reference hessian.py:439-522, HessianTree).

All are pure jittable functions; the band axis is vmapped/sharded by callers
(parallel/ module) instead of living in Ray band workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gridder import WGridderPlan, dirty2vis, vis2dirty
from .psf import psf_convolve


def hessian_vis(plan: WGridderPlan, x, wgt=None, mask=None, beam=None, eta: float = 0.0, wsum=None):
    """Exact vis-space Hessian on one image slice.

    The plan must be built with ``divide_by_n=False`` (reference
    hessian_slice uses divide_by_n=False on both legs, hessian.py:49,76).
    """
    xin = x if beam is None else x * beam
    mvis = dirty2vis(plan, xin, mask=mask)
    conv = vis2dirty(plan, mvis, wgt=wgt, mask=mask)
    if wsum is not None:
        conv = conv / wsum
    if beam is not None:
        conv = conv * beam
    if eta:
        conv = conv + eta * x
    return conv


def hessian_psf(x, abspsfhat, nx_psf: int, ny_psf: int, beam=None, eta: float = 0.0):
    """Tikhonov-regularised FFT PSF Hessian: beam * (|PSFHAT| conv (beam*x)) + eta*x."""
    xin = x if beam is None else x * beam
    out = psf_convolve(xin, abspsfhat, nx_psf, ny_psf)
    if beam is not None:
        out = out * beam
    if eta:
        out = out + eta * x
    return out


def hess_direct(x, abspsfhat, taperxy, nx_psf: int, ny_psf: int, eta: float = 1.0, mode: str = "forward"):
    """Tapered direct Hessian (mode='forward') or its inverse (mode='backward').

    ``eta`` is relative to wsum (the PSF peak), as in the reference
    (hessian.py:210-248). x: (..., nx, ny).
    """
    nx, ny = x.shape[-2], x.shape[-1]
    xhat = jnp.fft.rfft2(x * taperxy, s=(nx_psf, ny_psf), axes=(-2, -1))
    if mode == "forward":
        xhat = xhat * (abspsfhat + eta)
    else:
        xhat = xhat / (abspsfhat + eta)
    big = jnp.fft.irfft2(xhat, s=(nx_psf, ny_psf), axes=(-2, -1))
    return big[..., :nx, :ny] * taperxy


def hessian_tree_dot(x, abspsfhat_parts, beam_parts, wsum, nx_psf: int, ny_psf: int, eta: float = 0.0):
    """Sum-over-partitions PSF Hessian for one band image.

    Args:
        x: (nx, ny) image.
        abspsfhat_parts: (npart, nx_psf, ny_psf//2+1) |PSFHAT| per partition.
        beam_parts: (npart, nx, ny) primary beam per partition (or None).
        wsum: normalisation (the caller passes TOTAL wsum across bands to
            match the legacy total-normalised convention — design D4).
        eta: Tikhonov parameter.
    """

    def one(abspsfhat, beam):
        xin = x if beam is None else x * beam
        out = psf_convolve(xin, abspsfhat, nx_psf, ny_psf)
        return out if beam is None else out * beam

    if beam_parts is None:
        terms = jax.vmap(lambda ph: one(ph, None))(abspsfhat_parts)
    else:
        terms = jax.vmap(one)(abspsfhat_parts, beam_parts)
    out = jnp.sum(terms, axis=0) / wsum
    if eta:
        out = out + eta * x
    return out
