"""Native planning kernels: C++ path vs numpy fallback parity."""

import numpy as np
import pytest

from pfb_imaging_tpu import native


def _numpy_buckets(i0, nw, w_supp):
    perm = np.argsort(i0, kind="stable")
    i0s = i0[perm]
    starts = np.searchsorted(i0s, np.arange(nw) - w_supp + 1, side="left")
    ends = np.searchsorted(i0s, np.arange(nw), side="right")
    return perm, starts, ends - starts


def test_native_builds():
    assert native.have_native(), "C++ planning kernels failed to build"


def test_wplane_buckets_parity():
    rng = np.random.default_rng(0)
    n, nw, w_supp = 10_000, 37, 6
    i0 = rng.integers(0, nw - w_supp + 1, n).astype(np.int64)
    perm, starts, counts = native.wplane_buckets(i0, nw, w_supp)
    perm_np, starts_np, counts_np = _numpy_buckets(i0, nw, w_supp)
    np.testing.assert_array_equal(starts, starts_np)
    np.testing.assert_array_equal(counts, counts_np)
    np.testing.assert_array_equal(perm, perm_np)  # stable sort exact match


def test_uvw_to_pix_parity():
    rng = np.random.default_rng(1)
    nrow, nchan = 500, 4
    uvw = rng.uniform(-100, 100, (nrow, 3))
    freq = np.linspace(1e9, 1.2e9, nchan)
    inv_c = 1.0 / 299792458.0
    args = (uvw, freq, 1.0, -1.0, 1.0, 2.5, 3.5, inv_c, 0.01, -0.02)
    u, v, w, sh = native.uvw_to_pix(*args)
    import os

    os.environ["PFB_TPU_NO_NATIVE"] = "1"
    try:
        native._TRIED = False
        native._LIB = None
        u2, v2, w2, sh2 = native.uvw_to_pix(*args)
    finally:
        del os.environ["PFB_TPU_NO_NATIVE"]
        native._TRIED = False
        native._LIB = None
    np.testing.assert_allclose(u, u2, rtol=1e-14)
    np.testing.assert_allclose(v, v2, rtol=1e-14)
    np.testing.assert_allclose(w, w2, rtol=1e-14)
    np.testing.assert_allclose(sh, sh2, rtol=1e-12)
