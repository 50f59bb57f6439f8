"""Restored-image construction (reference utils/restoration.py:9-151 and
utils/misc.py:123-193 ``convolve2gaussres``).

``restore_image`` convolves the model with the clean beam (Gaussian fit to
the PSF mainlobe) and adds the residual, optionally homogenising the
residual to the target resolution with a Gaussian-ratio kernel in the
Fourier domain.
"""

from __future__ import annotations

import numpy as np

from ..geometry import gaussian_kernel


def _gauss_ft_sq(gausspar, nx_pad, ny_pad):
    """FT of the (unit-sum) rotated Gaussian on the padded grid."""
    x = np.arange(nx_pad) - nx_pad // 2
    y = np.arange(ny_pad) - ny_pad // 2
    xx, yy = np.meshgrid(x, y, indexing="ij")
    g = gaussian_kernel(xx, yy, gausspar, normalise=True)
    return np.fft.rfft2(np.fft.ifftshift(g))


def convolve2gaussres(image, gausspar, gausspari=None, pfrac: float = 0.5):
    """Convolve ``image`` (nband, nx, ny) to the resolution ``gausspar``.

    When ``gausspari`` (the image's intrinsic resolution per band) is given,
    the convolution kernel is the Gaussian ratio ghat/ghati (reference
    convolve2gaussres, utils/misc.py:123-193).
    """
    image = np.asarray(image)
    nband, nx, ny = image.shape
    nx_pad, ny_pad = int(nx * (1 + pfrac)) // 2 * 2, int(ny * (1 + pfrac)) // 2 * 2
    ghat = _gauss_ft_sq(gausspar, nx_pad, ny_pad)
    out = np.zeros_like(image)
    for b in range(nband):
        pad = np.zeros((nx_pad, ny_pad))
        pad[:nx, :ny] = image[b]
        xhat = np.fft.rfft2(pad)
        if gausspari is not None:
            ghati = _gauss_ft_sq(gausspari[b], nx_pad, ny_pad)
            kernel = np.where(np.abs(ghati) > 1e-12, ghat / ghati, ghat)
        else:
            kernel = ghat
        out[b] = np.fft.irfft2(xhat * kernel, s=(nx_pad, ny_pad))[:nx, :ny]
    return out


def restore_image(model, residual, cleanbeam_par, intrinsic_pars=None, wsum: float = 1.0):
    """model conv cleanbeam + residual/wsum (reference restore_image).

    Args:
        model: (nband, nx, ny) model in Jy/pixel.
        residual: (nband, nx, ny) raw residual (divided by wsum here).
        cleanbeam_par: (emaj, emin, pa) in pixels from fitcleanbeam.
        intrinsic_pars: optional per-band PSF params to homogenise the
            residual to the target resolution.
    """
    conv_model = convolve2gaussres(model, cleanbeam_par)
    # restore with unit peak (Jy/beam): scale so a unit point source maps to
    # peak 1 after convolution
    nxk = int(max(cleanbeam_par[0], cleanbeam_par[1]) * 4) + 8
    x = np.arange(-nxk, nxk + 1)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    kern = gaussian_kernel(xx, yy, cleanbeam_par, normalise=True)
    conv_model = conv_model / kern.max()
    resid = residual / wsum
    if intrinsic_pars is not None:
        resid = convolve2gaussres(resid, cleanbeam_par, intrinsic_pars)
    return conv_model + resid
