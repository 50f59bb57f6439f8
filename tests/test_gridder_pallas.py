"""Pallas tiled scatter kernel vs direct accumulation (interpreter mode)."""

import numpy as np
import pytest

from pfb_imaging_tpu.ops.gridder_pallas import TILE, pallas_scatter_grid, plan_tiles


def direct_scatter(iu0, iv0, stencils, nbig):
    grid = np.zeros((nbig, nbig))
    W = stencils.shape[-1]
    for k in range(iu0.size):
        grid[iu0[k] : iu0[k] + W, iv0[k] : iv0[k] + W] += stencils[k]
    return grid


@pytest.mark.parametrize("nbig", [512, 600])
def test_pallas_scatter_matches_direct(nbig):
    rng = np.random.default_rng(0)
    n, W = 2000, 6
    # keep windows off the wrap boundary (plan routes those to fallback)
    iu0 = rng.integers(0, nbig - W, n).astype(np.int64)
    iv0 = rng.integers(0, nbig - W, n).astype(np.int64)
    vals_re = rng.standard_normal(n).astype(np.float32)
    vals_im = rng.standard_normal(n).astype(np.float32)
    ku = rng.uniform(0.1, 1.0, (n, W)).astype(np.float32)
    kv = rng.uniform(0.1, 1.0, (n, W)).astype(np.float32)

    tiles = plan_tiles(iu0, iv0, W, nbig, nbig, vals_re, vals_im, ku, kv)
    assert tiles["fallback"].size == 0
    out = np.asarray(
        pallas_scatter_grid(
            tiles["lu"],
            tiles["lv"],
            tiles["contrib_re"],
            tiles["contrib_im"],
            support=W,
            capacity=tiles["capacity"],
            ntx=tiles["ntx"],
            nty=tiles["nty"],
            nbig_x=nbig,
            nbig_y=nbig,
            interpret=True,
        )
    )
    sten_re = vals_re[:, None, None] * (ku[:, :, None] * kv[:, None, :])
    sten_im = vals_im[:, None, None] * (ku[:, :, None] * kv[:, None, :])
    oracle_re = direct_scatter(iu0, iv0, sten_re, nbig)
    oracle_im = direct_scatter(iu0, iv0, sten_im, nbig)
    np.testing.assert_allclose(out[0], oracle_re, atol=1e-4)
    np.testing.assert_allclose(out[1], oracle_im, atol=1e-4)


def test_plan_tiles_fallback():
    """Wrapping windows are routed to the fallback list."""
    nbig, W = 512, 8
    iu0 = np.array([0, nbig - W, nbig - W + 1, 100], dtype=np.int64)
    iv0 = np.array([0, 10, 10, nbig - 2], dtype=np.int64)
    n = iu0.size
    z = np.zeros(n, np.float32)
    k = np.ones((n, W), np.float32)
    tiles = plan_tiles(iu0, iv0, W, nbig, nbig, z, z, k, k)
    assert set(tiles["fallback"]) == {2, 3}
