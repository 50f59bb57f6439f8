"""Hessian stack tests (mirroring reference tests/test_hessian_tree.py and
tests/test_hessian_approx.py:235-309)."""

import itertools

import numpy as np
import pytest

from pfb_imaging_tpu.geometry import set_image_size, taperf, wgridder_conventions
from pfb_imaging_tpu.ops.gridder import plan_wgridder, vis2dirty
from pfb_imaging_tpu.ops.hessian import hess_direct, hessian_psf, hessian_tree_dot, hessian_vis
from pfb_imaging_tpu.ops.psf import psf_convolve, psf_to_psfhat


def make_uvw(num_ants=16, seed=42, scale=8e3):
    rng = np.random.RandomState(seed)
    a1, a2 = np.asarray(list(itertools.combinations(range(num_ants), 2))).T
    antennas = scale * rng.normal(size=(num_ants, 3))
    antennas[:, 2] *= 0.02
    return antennas[a1] - antennas[a2]


def test_delta_psf_is_identity():
    """A delta PSF makes the tree Hessian the identity (ref test_hessian_tree.py:21)."""
    nx = ny = 32
    nx_psf, ny_psf = 64, 64
    psf = np.zeros((1, nx_psf, ny_psf))
    psf[0, nx_psf // 2, ny_psf // 2] = 1.0
    psfhat = np.abs(np.asarray(psf_to_psfhat(psf)))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nx, ny))
    out = np.asarray(hessian_tree_dot(x, psfhat, None, wsum=1.0, nx_psf=nx_psf, ny_psf=ny_psf))
    np.testing.assert_allclose(out, x, atol=1e-12)


def test_eta_is_tikhonov():
    nx = ny = 32
    nx_psf, ny_psf = 64, 64
    psfhat = np.zeros((1, nx_psf, ny_psf // 2 + 1))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((nx, ny))
    out = np.asarray(hessian_tree_dot(x, psfhat, None, wsum=1.0, nx_psf=nx_psf, ny_psf=ny_psf, eta=0.7))
    np.testing.assert_allclose(out, 0.7 * x, atol=1e-13)


def test_two_identical_partitions_equal_one():
    nx = ny = 32
    nx_psf, ny_psf = 64, 64
    rng = np.random.default_rng(2)
    psf = rng.standard_normal((1, nx_psf, ny_psf))
    ph = np.abs(np.asarray(psf_to_psfhat(psf)))
    x = rng.standard_normal((nx, ny))
    one = np.asarray(hessian_tree_dot(x, ph, None, wsum=1.0, nx_psf=nx_psf, ny_psf=ny_psf))
    two = np.asarray(
        hessian_tree_dot(x, np.concatenate([ph, ph]), None, wsum=2.0, nx_psf=nx_psf, ny_psf=ny_psf)
    )
    np.testing.assert_allclose(two, one, rtol=1e-12)


@pytest.mark.parametrize("center_offset", [(0.0, 0.0), (0.05, -0.08)])
def test_psf_hessian_matches_vis_hessian(center_offset, ms_meta):
    """PSF-convolution Hessian ≈ exact vis-space Hessian on a centred delta
    (reference test_hessian, tests/test_hessian_approx.py:235-309)."""
    uvw = make_uvw()
    freq = np.linspace(0.9e9, 1.1e9, 3)
    max_blength = np.max(np.linalg.norm(uvw, axis=1))
    geo = set_image_size(max_blength, freq.max(), 1.5, 2.0, nx=128, ny=128)
    nx, ny, nx_psf, ny_psf = geo.nx, geo.ny, geo.nx_psf, geo.ny_psf
    cell = geo.cell_rad
    l0, m0 = center_offset
    flip_u, flip_v, flip_w, x0, y0 = wgridder_conventions(l0, m0)
    signu = -1.0 if flip_u else 1.0
    signv = -1.0 if flip_v else 1.0
    signx = -1.0 if flip_u else 1.0
    signy = -1.0 if flip_v else 1.0

    # PSF visibilities with the off-centre phase ramp (do_wgridding=False here,
    # matching the reference test)
    freqfactor = -2j * np.pi * freq[None, :] / 299792458.0
    psf_vis = np.exp(freqfactor * (signu * uvw[:, 0:1] * x0 * signx + signv * uvw[:, 1:2] * y0 * signy))

    kw = dict(cellx=cell, celly=cell, l0=l0, m0=m0, epsilon=1e-10, do_wgridding=False, divide_by_n=False)
    plan_psf = plan_wgridder(uvw, freq, nx=nx_psf, ny=ny_psf, **kw)
    psf = np.asarray(vis2dirty(plan_psf, psf_vis))
    psfhat = np.asarray(psf_to_psfhat(psf))

    x = np.zeros((nx, ny))
    x[nx // 2, ny // 2] = 1.0

    plan_im = plan_wgridder(uvw, freq, nx=nx, ny=ny, **kw)
    res1 = np.asarray(hessian_vis(plan_im, x))
    res2 = np.asarray(psf_convolve(x, psfhat, nx_psf, ny_psf))

    scale = np.abs(res2).max()
    np.testing.assert_allclose(res2 / scale, res1 / scale, atol=2e-7)


def test_hess_direct_inverse():
    """For a delta PSF (flat |PSFHAT|) backward exactly inverts forward
    modulo the taper-squared factor (the reference uses mode='backward' as an
    approximate preconditioner inverse, hessian.py:408-432)."""
    nx = ny = 64
    nx_psf, ny_psf = 128, 128
    rng = np.random.default_rng(3)
    psf = np.zeros((nx_psf, ny_psf))
    psf[nx_psf // 2, ny_psf // 2] = 2.5
    ph = np.abs(np.asarray(psf_to_psfhat(psf)))
    taper = taperf((nx, ny), 16)
    x = rng.standard_normal((nx, ny))
    y = np.asarray(hess_direct(x, ph, taper, nx_psf, ny_psf, eta=1.0, mode="forward"))
    # forward = taper * (2.5+1) * (taper*x); delta PSF spreads nothing so the
    # inverse unwinds exactly after dividing out taper^2 twice
    xr = np.asarray(hess_direct(y, ph, taper, nx_psf, ny_psf, eta=1.0, mode="backward"))
    np.testing.assert_allclose(xr, taper**4 * x, atol=1e-10)


def test_hessian_psf_beam_eta():
    nx = ny = 16
    nx_psf, ny_psf = 32, 32
    rng = np.random.default_rng(4)
    psf = np.zeros((nx_psf, ny_psf))
    psf[nx_psf // 2, ny_psf // 2] = 1.0
    ph = np.abs(np.asarray(psf_to_psfhat(psf)))
    beam = rng.uniform(0.5, 1.0, (nx, ny))
    x = rng.standard_normal((nx, ny))
    out = np.asarray(hessian_psf(x, ph, nx_psf, ny_psf, beam=beam, eta=0.3))
    np.testing.assert_allclose(out, beam * (beam * x) + 0.3 * x, atol=1e-12)


def test_hesspsf_idot_inverts_dot(rng):
    """HessPSF.idot(mode=psf) approximately inverts dot; mode=direct agrees
    in the taper interior (reference HessPSF / precond.py:12-154)."""
    import jax.numpy as jnp
    from pfb_imaging_tpu.ops.precond import HessPSF
    from pfb_imaging_tpu.ops.psf import psf_to_psfhat

    nband, nx, nxp = 2, 32, 64
    psf = np.zeros((nband, nxp, nxp))
    psf[:, nxp // 2, nxp // 2] = 1.0
    psf += 0.02 * rng.standard_normal(psf.shape)
    # real point-symmetric PSF (Hermitian uv weights), as in practice —
    # |PSFHAT| == PSFHAT and the direct spectral inverse is meaningful
    psf = 0.5 * (psf + np.roll(psf[:, ::-1, ::-1], (1, 1), axis=(1, 2)))
    ph = np.abs(np.asarray(psf_to_psfhat(jnp.asarray(psf))))
    hp = HessPSF(ph, nxp, nxp, eta=1e-3, cg_tol=1e-10, cg_maxit=300, cg_minit=10, taper_width=8)
    x = jnp.asarray(rng.standard_normal((nband, nx, nx)))
    y = hp.dot(x)
    xr = np.asarray(hp.idot(y, mode="psf"))
    assert np.abs(xr - np.asarray(x)).max() / np.abs(np.asarray(x)).max() < 1e-5
    # direct mode is a crude spectral inverse (reference runs it with
    # eta ~ 1): check it on a spectrally well-conditioned PSF
    psf_d = np.zeros((nband, nxp, nxp))
    psf_d[:, nxp // 2, nxp // 2] = 1.0
    ph_d = np.abs(np.asarray(psf_to_psfhat(jnp.asarray(psf_d))))
    hp_d = HessPSF(ph_d, nxp, nxp, eta=1e-3, taper_width=8)
    yd = hp_d.dot(x)
    xd = np.asarray(hp_d.idot(yd, mode="direct"))
    inner = (slice(None), slice(8, -8), slice(8, -8))
    num = np.abs(xd[inner] - np.asarray(x)[inner]).mean()
    den = np.abs(np.asarray(x)[inner]).mean()
    assert num / den < 0.05
