"""Padded-FFT PSF convolution (pure XLA; reference operators/psf.py:8-105).

Stateless, shape-polymorphic over leading (band/corr) axes. The FFT pair is
the unnormalised-forward / 1/N-inverse convention the reference uses
(ducc0 inorm=0 / inorm=2), so a PSF whose FT is ``psfhat`` convolves with
no extra scaling.
"""

from __future__ import annotations

import jax.numpy as jnp


def psf_to_psfhat(psf):
    """PSFHAT = rfft2(ifftshift(PSF)) (reference gridder.py:915, core/grid).

    ``psf`` has shape (..., nx_psf, ny_psf); the returned half-plane FT has
    shape (..., nx_psf, ny_psf//2 + 1).
    """
    return jnp.fft.rfft2(jnp.fft.ifftshift(psf, axes=(-2, -1)), axes=(-2, -1))


def psf_convolve(x, psfhat, nx_psf: int, ny_psf: int):
    """PSF ⊛ x on a zero-padded grid, cropped back to x's shape.

    x: (..., nx, ny) real; psfhat: (..., nx_psf, ny_psf//2+1) complex.
    Mirrors reference psf_convolve_slice/cube (operators/psf.py:8-105):
    zero-pad -> r2c -> * psfhat -> c2r(1/N) -> crop.
    """
    nx, ny = x.shape[-2], x.shape[-1]
    xhat = jnp.fft.rfft2(x, s=(nx_psf, ny_psf), axes=(-2, -1))
    big = jnp.fft.irfft2(xhat * psfhat, s=(nx_psf, ny_psf), axes=(-2, -1))
    return big[..., :nx, :ny]
