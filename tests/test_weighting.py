"""Weighting tests (mirroring reference tests/test_weighting.py:14-207)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pfb_imaging_tpu.constants import LIGHTSPEED
from pfb_imaging_tpu.ops.weighting import box_sum_counts, compute_counts, counts_to_weights, filter_extreme_counts


def explicit_counts(uvw, freq, mask, wgt, nx, ny, cellx, celly, usign=1.0, vsign=-1.0):
    """Straight python loop oracle."""
    ncorr, nrow, nchan = wgt.shape
    counts = np.zeros((ncorr, nx, ny))
    u_cell = 1 / (nx * cellx)
    umax = abs(1 / cellx / 2)
    v_cell = 1 / (ny * celly)
    vmax = abs(1 / celly / 2)
    for r in range(nrow):
        for f in range(nchan):
            if not mask[r, f]:
                continue
            cn = freq[f] / LIGHTSPEED
            u = uvw[r, 0] * cn * usign
            v = uvw[r, 1] * cn * vsign
            if v < 0:
                u, v = -u, -v
            iu = int(np.floor((u + umax) / u_cell))
            iv = int(np.floor((v + vmax) / v_cell))
            if iu < 0 or iu >= nx or iv < 0 or iv >= ny:
                continue
            counts[:, iu, iv] += wgt[:, r, f]
    return counts


@pytest.fixture
def data():
    rng = np.random.default_rng(11)
    nrow, nchan, ncorr = 200, 4, 2
    uvw = rng.uniform(-500, 500, (nrow, 3))
    freq = np.linspace(0.9e9, 1.1e9, nchan)
    mask = (rng.uniform(size=(nrow, nchan)) > 0.1).astype(np.uint8)
    wgt = rng.uniform(0.5, 2.0, (ncorr, nrow, nchan))
    cell = 1.0 / (2 * 500 * freq.max() / LIGHTSPEED) / 2
    return uvw, freq, mask, wgt, cell


def test_counts_vs_explicit(data):
    uvw, freq, mask, wgt, cell = data
    nx = ny = 64
    counts = np.asarray(compute_counts(uvw, freq, mask, wgt, nx, ny, cell, cell))
    oracle = explicit_counts(uvw, freq, mask, wgt, nx, ny, cell, cell)
    np.testing.assert_allclose(counts, oracle, rtol=1e-12)
    assert counts.sum() > 0


def test_uniform_weights_flatten_counts(data):
    """Uniform weighting (robust <= -2) then re-counting gives flat counts
    over sampled cells (reference test_weighting.py uniform case)."""
    uvw, freq, mask, wgt, cell = data
    nx = ny = 64
    counts = np.asarray(compute_counts(uvw, freq, mask, wgt, nx, ny, cell, cell))
    w2 = np.asarray(counts_to_weights(counts, uvw, freq, wgt, mask, nx, ny, cell, cell, robust=-2.5))
    counts2 = np.asarray(compute_counts(uvw, freq, mask, w2, nx, ny, cell, cell))
    sampled = counts2[counts > 0]
    np.testing.assert_allclose(sampled, 1.0, rtol=1e-10)


def test_briggs_between_natural_and_uniform(data):
    uvw, freq, mask, wgt, cell = data
    nx = ny = 64
    counts = np.asarray(compute_counts(uvw, freq, mask, wgt, nx, ny, cell, cell))
    sel = mask.astype(bool)
    sums = []
    for robust in (-1.5, 0.0, 1.5):
        w = np.asarray(counts_to_weights(counts.copy(), uvw, freq, wgt.copy(), mask, nx, ny, cell, cell, robust=robust))
        sums.append(w[:, sel].sum())
        # Briggs weights never exceed natural (divide by counts*ssq + 1 >= 1)
        assert (w <= wgt + 1e-12).all()
    # total weight increases monotonically towards natural as robust grows
    assert sums[0] < sums[1] < sums[2]


def test_filter_extreme_counts():
    counts = np.zeros((1, 8, 8))
    counts[0, :4, :4] = 100.0
    counts[0, 5, 5] = 1e-3
    out = np.asarray(filter_extreme_counts(counts, level=10.0))
    med = np.median(counts[counts > 0])
    assert out[0, 5, 5] == pytest.approx(med / 10.0)
    assert (out[0, :4, :4] == 100.0).all()
    assert out[0, 7, 7] == 0.0


def test_box_sum_identities():
    rng = np.random.default_rng(1)
    counts = rng.uniform(size=(2, 16, 16))
    # npix_super=0 is a no-op
    np.testing.assert_allclose(np.asarray(box_sum_counts(counts, 0)), counts)
    out = np.asarray(box_sum_counts(counts, 2))
    # oracle via scipy
    from scipy.ndimage import uniform_filter

    oracle = np.stack([uniform_filter(counts[c], size=5, mode="constant", cval=0.0) * 25 for c in range(2)])
    np.testing.assert_allclose(out, oracle, atol=1e-10)


def test_counts_native_matches_jax(rng):
    """The native histogram/division kernels (counts_nn /
    weights_from_counts, native/plan_kernels.cpp) must reproduce the XLA
    scatter/gather forms exactly (the XLA scatter serialises on TPU —
    92 s at 8192^2/4M vis, BENCH_r03)."""
    import pfb_imaging_tpu.native as native
    from pfb_imaging_tpu.ops.weighting import (
        _compute_counts_jax, _counts_to_weights_jax, compute_counts, counts_to_weights)

    assert native._build_and_load() is not None
    nrow, nchan, nx = 3000, 3, 64
    uvw = rng.uniform(-8000, 8000, (nrow, 3))
    freq = np.linspace(1e9, 1.2e9, nchan)
    mask = (rng.random((nrow, nchan)) > 0.1).astype(np.float64)
    wgt = rng.uniform(0.5, 2.0, (2, nrow, nchan))
    cell = 1e-5
    c_nat = np.asarray(compute_counts(uvw, freq, mask, wgt, nx, nx, cell, cell))
    c_jax = np.asarray(_compute_counts_jax(
        jnp.asarray(uvw), jnp.asarray(freq), jnp.asarray(mask), jnp.asarray(wgt),
        nx, nx, cell, cell))
    np.testing.assert_allclose(c_nat, c_jax, rtol=0, atol=1e-12)
    for robust in (0.0, -2.5):
        w_nat = np.asarray(counts_to_weights(c_nat, uvw, freq, wgt, mask, nx, nx, cell, cell, robust))
        w_jax = np.asarray(_counts_to_weights_jax(
            jnp.asarray(c_jax), jnp.asarray(uvw), jnp.asarray(freq), jnp.asarray(wgt),
            jnp.asarray(mask), nx, nx, cell, cell, robust))
        np.testing.assert_allclose(w_nat, w_jax, rtol=1e-13, atol=0)
