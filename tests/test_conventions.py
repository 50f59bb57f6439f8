"""Pin the measurement-operator conventions against a per-pixel loop oracle.

Mirrors the reference's convention tests
(/root/reference/tests/test_hessian_approx.py:44-130): the framework's
degridder must implement

    vis = sum_pix I * exp(-2 pi j (su*u*l + sv*v*m - sw*w*(n-1))/lambda) / n

with l = -l0 + (x - nx/2)*dl, m = m0 + (y - ny/2)*dm and default flips
(False, True, False).
"""

import itertools

import numpy as np
import pytest

from pfb_imaging_tpu.geometry import conventions_signs, good_size, set_image_size, wgridder_conventions
from pfb_imaging_tpu.ops.dft import dirty2vis_dft, vis2dirty_dft

pmp = pytest.mark.parametrize


def explicit_wdegridder(uvw, freqs, lmn, pixel_fluxes, l0=0.0, m0=0.0):
    """The reference's explicit oracle (tests/test_hessian_approx.py:44-68)."""
    vis = np.zeros((len(uvw), len(freqs)), dtype=np.complex128)
    c = 299792458.0
    flip_u, flip_v, flip_w, _, _ = wgridder_conventions(l0, m0)
    signu, signv, signw = conventions_signs(flip_u, flip_v, flip_w)
    for row, (u, v, w) in enumerate(uvw):
        for col, freq in enumerate(freqs):
            for flux, (l_coord, m_coord, n_coord) in zip(pixel_fluxes, lmn):
                wavelength = c / freq
                phase = (signu * u * l_coord + signv * v * m_coord - signw * w * (n_coord - 1)) / wavelength
                vis[row, col] += flux * np.exp(-2j * np.pi * phase) / n_coord
    return vis


def make_uvw(num_ants=50, seed=42):
    rng = np.random.RandomState(seed)
    antenna_1, antenna_2 = np.asarray(list(itertools.combinations(range(num_ants), 2))).T
    antennas = 10e3 * rng.normal(size=(num_ants, 3))
    antennas[:, 2] *= 0.001
    return antennas[antenna_1] - antennas[antenna_2]


@pmp("center_offset", [(0.0, 0.0), (0.1, -0.17), (-0.15, -0.2)])
def test_dft_degridder_conventions(center_offset):
    npix = 128
    pixsize = 0.5 * np.pi / 180 / 3600.0
    l0, m0 = center_offset
    dl = dm = pixsize

    dirty = np.zeros((npix, npix))
    dirty[npix // 2, npix // 2] = 1.0
    dirty[npix // 4, npix // 4] = 1.0

    def pixel_to_lmn(xi, yi):
        l_coord = -l0 + (-npix / 2 + xi) * dl
        m_coord = m0 + (-npix / 2 + yi) * dm
        n_coord = np.sqrt(1.0 - l_coord**2 - m_coord**2)
        return np.asarray([l_coord, m_coord, n_coord])

    lmn = [pixel_to_lmn(npix // 2, npix // 2), pixel_to_lmn(npix // 4, npix // 4)]
    uvw = make_uvw()
    freqs = np.linspace(700e6, 2000e6, 2)

    vis = np.asarray(
        dirty2vis_dft(
            uvw, freqs, dirty, nx=npix, ny=npix, cellx=dl, celly=dm, l0=l0, m0=m0, divide_by_n=True
        )
    )
    vis_explicit = explicit_wdegridder(uvw, freqs, lmn, [1.0, 1.0], l0, m0)

    np.testing.assert_allclose(vis.real, vis_explicit.real, atol=1e-8)
    np.testing.assert_allclose(vis.imag, vis_explicit.imag, atol=1e-8)


def test_dft_adjointness():
    """<vis, R x> == <R^H vis, x> — the gridder pair must be an exact adjoint."""
    rng = np.random.default_rng(0)
    npix = 64
    dl = 1e-5
    uvw = make_uvw(20)
    freqs = np.linspace(700e6, 900e6, 3)
    x = rng.standard_normal((npix, npix))
    vis = rng.standard_normal((uvw.shape[0], 3)) + 1j * rng.standard_normal((uvw.shape[0], 3))
    wgt = rng.uniform(0.5, 2.0, size=vis.shape)

    kw = dict(nx=npix, ny=npix, cellx=dl, celly=dl, l0=0.01, m0=-0.02, divide_by_n=True)
    rx = np.asarray(dirty2vis_dft(uvw, freqs, x, **kw))
    rhv = np.asarray(vis2dirty_dft(uvw, freqs, vis * wgt, **kw))
    lhs = np.vdot(vis * wgt, rx)
    rhs = np.vdot(rhv, x)
    # R^H (w v) pairing: <w v, R x> = <R^H(w v), x>
    np.testing.assert_allclose(lhs.real, rhs.real, rtol=1e-10)


def test_psf_center_equals_wsum():
    """Gridding unit 'visibilities' with weights gives PSF peak = wsum at center."""
    npix = 64
    dl = 1e-5
    uvw = make_uvw(16)
    uvw[:, 2] = 0.0
    freqs = np.linspace(700e6, 900e6, 2)
    nrow, nchan = uvw.shape[0], freqs.size
    wgt = np.random.default_rng(1).uniform(0.5, 2.0, (nrow, nchan))
    vis = np.ones((nrow, nchan), dtype=np.complex128)
    psf = np.asarray(
        vis2dirty_dft(uvw, freqs, vis, wgt=wgt, nx=npix, ny=npix, cellx=dl, celly=dl, divide_by_n=False)
    )
    np.testing.assert_allclose(psf[npix // 2, npix // 2], wgt.sum(), rtol=1e-12)
    assert psf.max() == psf[npix // 2, npix // 2]


def test_good_size():
    assert good_size(100) == 100
    assert good_size(101) == 108
    assert good_size(257) == 270
    for n in [3, 17, 100, 1000, 4097]:
        g = good_size(n)
        assert g >= n and g % 2 == 0
        m = g
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        assert m == 1


def test_set_image_size(ms_meta):
    geo = set_image_size(ms_meta.max_blength, ms_meta.max_freq, 1.0, 2.0)
    assert geo.nx % 2 == 0 and geo.ny % 2 == 0
    assert geo.nx_psf >= 2 * geo.nx - 2
    assert geo.cell_rad == pytest.approx(geo.cell_n / 2.0)
