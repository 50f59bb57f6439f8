"""Primary-beam models and interpolation onto the image grid
(reference utils/beam.py:12-172).

The reference evaluates katbeam (MeerKAT) or FITS beams on a small grid and
regular-grid-interpolates onto the image. katbeam is not in this image; the
same pipeline shape is kept with (a) an analytic cosine-cubed MeerKAT-like
model for simulation/testing and (b) the same small-grid -> image-grid
interpolation for externally supplied beams.
"""

from __future__ import annotations

import numpy as np


def gauss_beam(l_grid, m_grid, freq, diameter: float = 13.5):
    """Gaussian approximation to a dish primary beam at each frequency.

    FWHM ~ 1.18 lambda / D (MeerKAT-ish). Returns (nfreq, nx, ny) or
    (nx, ny) for scalar freq.
    """
    from ..constants import LIGHTSPEED

    freq = np.atleast_1d(freq)
    fwhm = 1.18 * (LIGHTSPEED / freq) / diameter
    sigma = fwhm / (2 * np.sqrt(2 * np.log(2)))
    r2 = l_grid**2 + m_grid**2
    beam = np.exp(-0.5 * r2[None] / sigma[:, None, None] ** 2)
    return beam[0] if beam.shape[0] == 1 else beam


def interp_beam(beam_small, l_small, m_small, l_image, m_image):
    """Regular-grid interpolation of a small-grid beam onto the image grid
    (reference eval_beam, utils/beam.py:75-120)."""
    from scipy.interpolate import RegularGridInterpolator

    interp = RegularGridInterpolator(
        (l_small, m_small), beam_small, bounds_error=False, fill_value=0.0, method="linear"
    )
    pts = np.stack(np.broadcast_arrays(l_image, m_image), axis=-1)
    return interp(pts)


def eval_beam(beam_small, l_small, m_small, xx, yy):
    """Reference-compatible alias (gridder.py:841-848 uses eval_beam)."""
    return interp_beam(beam_small, l_small, m_small, xx, yy)
