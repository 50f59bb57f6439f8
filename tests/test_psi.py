"""Ψ dictionary tests (mirroring reference tests/test_wavelets.py and
tests/test_psi_operator.py: filter-bank values, perfect reconstruction,
exact adjointness, frame bound nu = nbasis)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfb_imaging_tpu.ops.psi import Psi
from pfb_imaging_tpu.ops.wavelets import (
    coeff_size,
    daubechies,
    dwt1d,
    dwt2d_level,
    filter_bank,
    idwt1d,
    idwt2d_level,
    signal_size,
)

pmp = pytest.mark.parametrize


def test_db2_filter_values():
    """Spectral factorisation must reproduce the published db2 filter."""
    expected = np.array([0.48296291314469025, 0.8365163037378079, 0.22414386804185735, -0.12940952255092145])
    np.testing.assert_allclose(daubechies(2), expected, atol=1e-12)


def test_db4_filter_values():
    expected = np.array(
        [
            0.23037781330885523,
            0.7148465705525415,
            0.6308807679295904,
            -0.02798376941698385,
            -0.18703481171888114,
            0.030841381835986965,
            0.032883011666982945,
            -0.010597401784997278,
        ]
    )
    np.testing.assert_allclose(daubechies(4), expected, atol=1e-10)


def test_filter_bank_orthonormality():
    for p in range(1, 9):
        h = daubechies(p)
        assert h.sum() == pytest.approx(np.sqrt(2), abs=1e-12)
        # shift-2 orthonormality
        for s in range(0, p):
            ip = np.dot(h[: len(h) - 2 * s], h[2 * s :])
            assert ip == pytest.approx(1.0 if s == 0 else 0.0, abs=1e-10)


@pmp("base", ["db1", "db4", "db5"])
@pmp("shape", [(128, 256), (512, 128), (37, 53)])
def test_dwt2d_level_roundtrip(base, shape):
    rng = np.random.default_rng(0)
    dl, dh, rl, rh = (jnp.asarray(f) for f in filter_bank(base))
    img = jnp.asarray(rng.standard_normal(shape))
    blk = dwt2d_level(img, dl, dh)
    rec = idwt2d_level(blk, rl, rh, shape[0], shape[1])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-12)


def test_dwt1d_adjointness():
    rng = np.random.default_rng(1)
    dl, dh, rl, rh = (jnp.asarray(f) for f in filter_bank("db3"))
    n, k = 45, 6
    c = coeff_size(n, k)
    x = jnp.asarray(rng.standard_normal(n))
    ya = jnp.asarray(rng.standard_normal(c))
    yd = jnp.asarray(rng.standard_normal(c))
    ca, cd = dwt1d(x, dl, dh)
    lhs = float(jnp.vdot(ya, ca) + jnp.vdot(yd, cd))
    rhs = float(jnp.vdot(idwt1d(ya, yd, rl, rh)[:n], x))
    assert lhs == pytest.approx(rhs, rel=1e-12)


@pmp("bases", [("self",), ("self", "db1", "db2"), ("db1", "db2", "db3", "db4", "db5")])
@pmp("nlevel", [1, 2, 3])
def test_psi_roundtrip_and_adjoint(bases, nlevel):
    rng = np.random.default_rng(2)
    nband, nx, ny = 2, 64, 48
    from pfb_imaging_tpu.ops.wavelets import dwt_max_level, filter_bank

    for b in bases:
        if b != "self" and nlevel > dwt_max_level(min(nx, ny), len(filter_bank(b)[0])):
            pytest.skip(f"{b} does not support {nlevel} levels on ({nx},{ny})")
    psi = Psi(nband, nx, ny, bases=bases, nlevel=nlevel)
    x = jnp.asarray(rng.standard_normal((nband, nx, ny)))
    alpha = psi.dot(x)
    assert alpha.shape == (nband, len(bases), psi.nymax, psi.nxmax)

    # Parseval per basis => hdot(dot(x)) = nbasis * x
    rec = psi.hdot(alpha)
    np.testing.assert_allclose(np.asarray(rec), len(bases) * np.asarray(x), atol=1e-10)

    # exact adjointness <Psi x, y> == <x, Psi^T y>
    y = jnp.asarray(rng.standard_normal(alpha.shape))
    lhs = float(jnp.vdot(alpha, y))
    rhs = float(jnp.vdot(x, psi.hdot(y)))
    assert lhs == pytest.approx(rhs, rel=1e-11)


def test_psi_energy_conservation_per_basis():
    """Each orthonormal basis conserves energy: ||Psi_b x|| == ||x||."""
    rng = np.random.default_rng(3)
    nx, ny = 64, 64
    psi = Psi(1, nx, ny, bases=("db2",), nlevel=3)
    x = jnp.asarray(rng.standard_normal((1, nx, ny)))
    alpha = psi.dot(x)
    assert float(jnp.linalg.norm(alpha)) == pytest.approx(float(jnp.linalg.norm(x)), rel=1e-12)


def test_sara_frame_bound():
    """||Psi Psi^T|| == nbasis (design D3: nu must be nbasis)."""
    from pfb_imaging_tpu.opt.power_method import power_method

    psi = Psi(1, 32, 32, bases=("self", "db1", "db2"), nlevel=2)
    beta, _ = power_method(lambda x: psi.dot(psi.hdot(x)), (1, 3, psi.nymax, psi.nxmax), tol=1e-8, maxit=500)
    assert float(beta) == pytest.approx(3.0, rel=1e-3)


def test_wavelet_convs_pin_matmul_precision():
    """Regression guard (round 5): XLA TPU convolutions default to
    single-pass bf16 operands, which broke the ON-CHIP psi adjoint (the
    primal-dual convergence contract) while every CPU test stayed green.
    The dwt/idwt convs must pin an explicit >=3-pass precision."""
    import inspect

    import pfb_imaging_tpu.ops.wavelets as w

    src = inspect.getsource(w)
    assert src.count("precision=jax.lax.Precision.HIGH") >= 2
