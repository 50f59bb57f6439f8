"""Validate the FFT wgridder against the explicit DFT oracle.

Mirrors the reference's accuracy methodology (ducc0 wgridder vs explicit DFT
in tests/test_hessian_approx.py) at the requested epsilon.
"""

import itertools

import numpy as np
import pytest

from pfb_imaging_tpu.ops.dft import dirty2vis_dft, vis2dirty_dft
from pfb_imaging_tpu.ops.gridder import dirty2vis, plan_wgridder, vis2dirty

pmp = pytest.mark.parametrize


def make_data(seed=3, num_ants=20, nchan=2, scale=8e3, zscale=300.0):
    rng = np.random.RandomState(seed)
    a1, a2 = np.asarray(list(itertools.combinations(range(num_ants), 2))).T
    antennas = scale * rng.normal(size=(num_ants, 3))
    antennas[:, 2] *= zscale / scale
    uvw = antennas[a1] - antennas[a2]
    freq = np.linspace(0.8e9, 1.2e9, nchan)
    return uvw, freq


@pmp("center", [(0.0, 0.0), (0.05, -0.08)])
@pmp("do_wgridding", [False, True])
def test_dirty2vis_matches_dft(center, do_wgridding):
    l0, m0 = center
    nx = ny = 64
    cell = 2.5e-5  # rad, srf ~2 for this array
    uvw, freq = make_data()
    rng = np.random.default_rng(5)
    img = np.zeros((nx, ny))
    # a few point sources
    for _ in range(5):
        img[rng.integers(0, nx), rng.integers(0, ny)] = rng.uniform(0.5, 2.0)

    kw = dict(nx=nx, ny=ny, cellx=cell, celly=cell, l0=l0, m0=m0, divide_by_n=True)
    plan = plan_wgridder(uvw, freq, epsilon=1e-7, do_wgridding=do_wgridding, **kw)
    vis = np.asarray(dirty2vis(plan, img))
    vis_dft = np.asarray(dirty2vis_dft(uvw, freq, img, **kw))

    if do_wgridding:
        err = np.abs(vis - vis_dft).max() / np.abs(vis_dft).max()
        assert err < 1e-6, f"max rel err {err}"
    else:
        # without the w correction the DFT with w!=0 is approximated only if
        # w phases are negligible; instead compare against a w=0 DFT
        uvw0 = uvw.copy()
        uvw0[:, 2] = 0.0
        vis_dft0 = np.asarray(dirty2vis_dft(uvw0, freq, img, **kw))
        err = np.abs(vis - vis_dft0).max() / np.abs(vis_dft0).max()
        assert err < 1e-6, f"max rel err {err}"


@pmp("do_wgridding", [False, True])
def test_vis2dirty_matches_dft(do_wgridding):
    nx = ny = 64
    cell = 2.5e-5
    uvw, freq = make_data(seed=11)
    if not do_wgridding:
        uvw[:, 2] = 0.0
    rng = np.random.default_rng(6)
    nrow, nchan = uvw.shape[0], freq.size
    vis = rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))
    wgt = rng.uniform(0.5, 2.0, (nrow, nchan))

    kw = dict(nx=nx, ny=ny, cellx=cell, celly=cell, l0=0.02, m0=-0.01, divide_by_n=True)
    plan = plan_wgridder(uvw, freq, epsilon=1e-7, do_wgridding=do_wgridding, **kw)
    dirty = np.asarray(vis2dirty(plan, vis, wgt=wgt))
    dirty_dft = np.asarray(vis2dirty_dft(uvw, freq, vis, wgt=wgt, **kw))
    err = np.abs(dirty - dirty_dft).max() / np.abs(dirty_dft).max()
    assert err < 1e-6, f"max rel err {err}"


def test_gridder_pair_adjoint():
    """<vis, R x> == <R^H vis, x> to machine precision (exact adjointness of
    the gridder pair is structural, independent of the NUFFT approximation)."""
    nx = ny = 32
    cell = 2.5e-5
    uvw, freq = make_data(seed=13, num_ants=12)
    rng = np.random.default_rng(7)
    nrow, nchan = uvw.shape[0], freq.size
    x = rng.standard_normal((nx, ny))
    vis = rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))

    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=ny, cellx=cell, celly=cell, epsilon=1e-7, do_wgridding=True, divide_by_n=True
    )
    rx = np.asarray(dirty2vis(plan, x))
    rhv = np.asarray(vis2dirty(plan, vis))
    np.testing.assert_allclose(np.vdot(vis, rx).real, np.vdot(rhv, x).real, rtol=1e-12)


def test_psf_peak_is_wsum():
    nx = ny = 64
    cell = 2.5e-5
    uvw, freq = make_data(seed=17)
    nrow, nchan = uvw.shape[0], freq.size
    wgt = np.random.default_rng(2).uniform(0.5, 2.0, (nrow, nchan))
    vis = np.ones((nrow, nchan), dtype=np.complex128)
    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=ny, cellx=cell, celly=cell, epsilon=1e-7, do_wgridding=True, divide_by_n=False
    )
    psf = np.asarray(vis2dirty(plan, vis, wgt=wgt))
    assert abs(psf[nx // 2, ny // 2] - wgt.sum()) / wgt.sum() < 1e-7


@pmp("do_wgridding", [False, True])
def test_hostloop_matches_scan_path(do_wgridding):
    """The runtime-portable per-plane host loop is numerically identical to
    the bucketed scan path."""
    from pfb_imaging_tpu.ops.gridder import dirty2vis_hostloop, vis2dirty_hostloop

    nx = ny = 64
    cell = 2.5e-5
    uvw, freq = make_data(seed=23)
    rng = np.random.default_rng(9)
    nrow, nchan = uvw.shape[0], freq.size
    vis = rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))
    wgt = rng.uniform(0.5, 2.0, (nrow, nchan))
    img = rng.standard_normal((nx, ny))

    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=ny, cellx=cell, celly=cell, l0=0.01, m0=-0.02,
        epsilon=1e-7, do_wgridding=do_wgridding, divide_by_n=True,
    )
    d1 = np.asarray(vis2dirty(plan, vis, wgt=wgt))
    d2 = np.asarray(vis2dirty_hostloop(plan, vis, wgt=wgt))
    np.testing.assert_allclose(d2, d1, atol=1e-12 * np.abs(d1).max())
    v1 = np.asarray(dirty2vis(plan, img))
    v2 = np.asarray(dirty2vis_hostloop(plan, img))
    np.testing.assert_allclose(v2, v1, atol=1e-12 * np.abs(v1).max())
