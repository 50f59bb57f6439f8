"""Pallas tiled scatter kernel vs direct accumulation (interpreter mode)."""

import numpy as np
import pytest

from pfb_imaging_tpu.ops.gridder import es_kernel
from pfb_imaging_tpu.ops.gridder_pallas import pallas_scatter_grid, plan_tiles


def direct_scatter(u_loc, v_loc, vre, vim, support, beta, nbig):
    """Oracle: dense loop accumulation of ES stencils."""
    grid = np.zeros((2, nbig, nbig))
    for k in range(u_loc.size):
        i0 = int(np.floor(u_loc[k] - support / 2.0)) + 1
        j0 = int(np.floor(v_loc[k] - support / 2.0)) + 1
        for a in range(support):
            xu = 2.0 * (i0 + a - u_loc[k]) / support
            for b in range(support):
                xv = 2.0 * (j0 + b - v_loc[k]) / support
                w = es_kernel(np.array(xu), beta) * es_kernel(np.array(xv), beta)
                grid[0, (i0 + a) % nbig, (j0 + b) % nbig] += vre[k] * w
                grid[1, (i0 + a) % nbig, (j0 + b) % nbig] += vim[k] * w
    return grid


@pytest.mark.parametrize("nbig", [512, 640])
def test_pallas_scatter_matches_direct(nbig):
    rng = np.random.default_rng(0)
    n, W, beta = 1500, 6, 13.8
    # keep windows off the wrap boundary (plan routes those to fallback)
    u = rng.uniform(W, nbig - W - 1, n)
    v = rng.uniform(W, nbig - W - 1, n)
    vre = rng.standard_normal(n).astype(np.float32)
    vim = rng.standard_normal(n).astype(np.float32)

    tiles = plan_tiles(u, v, W, nbig, nbig)
    assert tiles["fallback"].size == 0
    # gather values into packed order with zero padding
    vre_pad = np.concatenate([vre, [0.0]]).astype(np.float32)[tiles["pad_idx"]]
    vim_pad = np.concatenate([vim, [0.0]]).astype(np.float32)[tiles["pad_idx"]]

    out = np.asarray(
        pallas_scatter_grid(
            tiles["lu8"],
            tiles["fu"],
            tiles["fv"],
            vre_pad,
            vim_pad,
            support=W,
            beta=beta,
            capacity=tiles["capacity"],
            ntx=tiles["ntx"],
            nty=tiles["nty"],
            nbig_x=nbig,
            nbig_y=nbig,
            interpret=True,
        )
    )
    oracle = direct_scatter(u, v, vre, vim, W, beta, nbig)
    np.testing.assert_allclose(out, oracle, atol=2e-5 * np.abs(oracle).max())


def test_plan_tiles_fallback():
    """Wrapping windows are routed to the fallback list."""
    nbig, W = 512, 8
    u = np.array([1.0, 100.0, 510.0, 300.0])  # u=510 -> window wraps
    v = np.array([100.0, 1.0, 100.0, 511.0])
    tiles = plan_tiles(u, v, W, nbig, nbig)
    assert 2 in tiles["fallback"] and 3 in tiles["fallback"]
    # u=1.0 -> i0 = floor(1-4)+1 = -3 -> wraps too
    assert 0 in tiles["fallback"]


def test_vis2dirty_pallas_matches_hostloop():
    """The Pallas scatter path equals the XLA hostloop path (interpret mode)."""
    import itertools

    import jax.numpy as jnp

    from pfb_imaging_tpu.ops.gridder import plan_wgridder, vis2dirty_hostloop
    from pfb_imaging_tpu.ops.gridder_pallas import plan_pallas, vis2dirty_pallas

    rng = np.random.RandomState(3)
    a1, a2 = np.asarray(list(itertools.combinations(range(14), 2))).T
    antennas = 8e3 * rng.normal(size=(14, 3))
    antennas[:, 2] *= 0.03
    uvw = antennas[a1] - antennas[a2]
    freq = np.linspace(0.9e9, 1.1e9, 2)
    nx = 128
    cell = 2.5e-5 / 2

    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell, epsilon=1e-5,
        do_wgridding=True, divide_by_n=False, dtype=np.float32,
    )
    tiles = plan_pallas(plan)
    r2 = np.random.default_rng(1)
    nrow, nchan = uvw.shape[0], freq.size
    vre = jnp.asarray(r2.standard_normal((nrow, nchan)).astype(np.float32))
    vim = jnp.asarray(r2.standard_normal((nrow, nchan)).astype(np.float32))

    ref = np.asarray(vis2dirty_hostloop(plan, vre, vis_im=vim))
    out = np.asarray(vis2dirty_pallas(plan, tiles, vre, vim, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5 * np.abs(ref).max())


def test_vis2dirty_pallas_wstack_matches_hostloop():
    import itertools

    import jax.numpy as jnp

    from pfb_imaging_tpu.ops.gridder import plan_wgridder, vis2dirty_hostloop
    from pfb_imaging_tpu.ops.gridder_pallas import plan_pallas, vis2dirty_pallas_wstack

    rng = np.random.RandomState(3)
    a1, a2 = np.asarray(list(itertools.combinations(range(14), 2))).T
    antennas = 8e3 * rng.normal(size=(14, 3))
    antennas[:, 2] *= 0.03
    uvw = antennas[a1] - antennas[a2]
    freq = np.linspace(0.9e9, 1.1e9, 2)
    nx = 128
    cell = 2.5e-5 / 2

    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell, epsilon=1e-5,
        do_wgridding=True, divide_by_n=False, dtype=np.float32,
    )
    tiles = plan_pallas(plan)
    r2 = np.random.default_rng(1)
    nrow, nchan = uvw.shape[0], freq.size
    vre = jnp.asarray(r2.standard_normal((nrow, nchan)).astype(np.float32))
    vim = jnp.asarray(r2.standard_normal((nrow, nchan)).astype(np.float32))

    ref = np.asarray(vis2dirty_hostloop(plan, vre, vis_im=vim))
    out = np.asarray(vis2dirty_pallas_wstack(plan, tiles, vre, vim, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5 * np.abs(ref).max())


def test_vis2dirty_pallas_grouped_matches_hostloop():
    import itertools

    import jax.numpy as jnp

    from pfb_imaging_tpu.ops.gridder import plan_wgridder, vis2dirty_hostloop
    from pfb_imaging_tpu.ops.gridder_pallas import add_group_flags, plan_pallas, vis2dirty_pallas_grouped

    rng = np.random.RandomState(3)
    a1, a2 = np.asarray(list(itertools.combinations(range(14), 2))).T
    antennas = 8e3 * rng.normal(size=(14, 3))
    antennas[:, 2] *= 0.03
    uvw = antennas[a1] - antennas[a2]
    freq = np.linspace(0.9e9, 1.1e9, 2)
    nx = 128
    cell = 2.5e-5 / 2

    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell, epsilon=1e-5,
        do_wgridding=True, divide_by_n=False, dtype=np.float32,
    )
    tiles = add_group_flags(plan_pallas(plan))
    r2 = np.random.default_rng(1)
    nrow, nchan = uvw.shape[0], freq.size
    vre = jnp.asarray(r2.standard_normal((nrow, nchan)).astype(np.float32))
    vim = jnp.asarray(r2.standard_normal((nrow, nchan)).astype(np.float32))

    ref = np.asarray(vis2dirty_hostloop(plan, vre, vis_im=vim))
    out = np.asarray(vis2dirty_pallas_grouped(plan, tiles, vre, vim, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5 * np.abs(ref).max())


def test_dirty2vis_pallas_matches_hostloop():
    import itertools

    import jax.numpy as jnp

    from pfb_imaging_tpu.ops.gridder import dirty2vis_hostloop, plan_wgridder
    from pfb_imaging_tpu.ops.gridder_pallas import dirty2vis_pallas, plan_pallas

    rng = np.random.RandomState(3)
    a1, a2 = np.asarray(list(itertools.combinations(range(14), 2))).T
    antennas = 8e3 * rng.normal(size=(14, 3))
    antennas[:, 2] *= 0.03
    uvw = antennas[a1] - antennas[a2]
    freq = np.linspace(0.9e9, 1.1e9, 2)
    nx = 128
    cell = 2.5e-5 / 2

    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell, epsilon=1e-5,
        do_wgridding=True, divide_by_n=False, dtype=np.float32,
    )
    tiles = plan_pallas(plan)
    img = jnp.asarray(np.random.default_rng(1).standard_normal((nx, nx)).astype(np.float32))
    ref = np.asarray(dirty2vis_hostloop(plan, img, split=True))
    out = np.asarray(dirty2vis_pallas(plan, tiles, img, split=True, interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5 * np.abs(ref).max())


def test_pallas_backend_wrappers_match_stack(rng):
    """The ``gridder="pallas"`` classic-stack backend surface (round 5,
    VERDICT r4 #5): vis2dirty_scatter / dirty2vis_scatter match the XLA
    classic path bit-for-tolerance on the same plan."""
    import jax.numpy as jnp

    from pfb_imaging_tpu.ops.gridder import dirty2vis, plan_wgridder, vis2dirty
    from pfb_imaging_tpu.ops.gridder_pallas import (
        dirty2vis_scatter,
        tiles_for,
        vis2dirty_scatter,
    )

    import itertools

    r0 = np.random.RandomState(5)
    a1, a2 = np.asarray(list(itertools.combinations(range(10), 2))).T
    antennas = 6e3 * r0.normal(size=(10, 3))
    antennas[:, 2] *= 0.02
    uvw = antennas[a1] - antennas[a2]
    nchan, nx = 2, 64
    nrow = uvw.shape[0]
    freq = np.linspace(1e9, 1.1e9, nchan)
    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=nx, cellx=2.5e-5 / 2, celly=2.5e-5 / 2,
        epsilon=1e-5, do_wgridding=True, dtype=np.float32,
    )
    vis = rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))
    visc = jnp.asarray(vis.astype(np.complex64))
    d_ref = np.asarray(vis2dirty(plan, visc))
    d_pal = np.asarray(vis2dirty_scatter(plan, visc))
    assert np.abs(d_pal - d_ref).max() / np.abs(d_ref).max() < 2e-5
    img = rng.standard_normal((nx, nx)).astype(np.float32)
    v_ref = np.asarray(dirty2vis(plan, jnp.asarray(img)))
    v_pal = np.asarray(dirty2vis_scatter(plan, jnp.asarray(img)))
    assert np.abs(v_pal - v_ref).max() / np.abs(v_ref).max() < 2e-5
    # the tiles cache reuses the layout for the same plan object
    assert tiles_for(plan) is tiles_for(plan)


def test_imager_pallas_backend(tmp_path, rng):
    """End-to-end: core.imager with gridder="pallas" produces the same
    DIRTY/PSF as gridder="stack"."""
    from pfb_imaging_tpu.core.imager import imager
    from pfb_imaging_tpu.core.init import init
    from pfb_imaging_tpu.core.simulate import simulate_vis_store
    from pfb_imaging_tpu.utils.store import TreeStore

    ms = str(tmp_path / "p.ms.tree")
    simulate_vis_store(ms, nant=6, ntime=2, nchan=3, nx=24)
    xds = str(tmp_path / "p.xds")
    init(ms, xds, product="I")
    out_s = str(tmp_path / "s.dt")
    out_p = str(tmp_path / "p.dt")
    common = dict(nband=1, epsilon=1e-5, nx=32, ny=32, psf_oversize=1.5,
                  fits_out=False, double_precision=False)
    imager(xds, out_s, gridder="stack", **common)
    imager(xds, out_p, gridder="pallas", **common)
    ts, tp = TreeStore(out_s), TreeStore(out_p)
    for key in ts.groups():
        a = np.asarray(ts.group(key).read("DIRTY"))
        b = np.asarray(tp.group(key).read("DIRTY"))
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-6, key
