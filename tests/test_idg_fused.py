"""Fused Pallas IDG patch-evaluation kernel (ops/idg_fused.py).

Interpret-mode oracle tests (CPU): kernel vs a dense numpy reference and
plan-level parity of the fused backend against the einsum backend —
the contract ducc0's wgridder pins in the reference
(/root/reference/src/pfb_imaging/operators/gridder.py:37-144).

Parametrised over the supported subgrids: S=16 (PK=8, the eps>=4e-6
tier), S=24 (PK=5, the tight-eps tier), S=32 (PK=4, the wide-field
coarse-lattice tier); and over the matmul precision tiers zpasses=3/6.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfb_imaging_tpu.ops import idg_fused
from pfb_imaging_tpu.ops.gridder_idg import plan_idg, vis2dirty_idg, dirty2vis_idg
from pfb_imaging_tpu.ops.dft import vis2dirty_dft

G = idg_fused.G


def _mk_inputs(rng, S, ng):
    tfac = 2 * np.pi / S
    half = S // 2
    k0 = (S - half) // 2
    duu = (tfac * (k0 + half * rng.random((ng, G)))).astype(np.float32)
    duv = (tfac * (k0 + half * rng.random((ng, G)))).astype(np.float32)
    phu = (0.005 * rng.standard_normal((ng, G))).astype(np.float32)
    phv = (0.005 * rng.standard_normal((ng, G))).astype(np.float32)
    scal = jnp.asarray(np.stack([duu, phu, duv, phv]))
    vre = rng.standard_normal((ng, G)).astype(np.float32)
    vim = rng.standard_normal((ng, G)).astype(np.float32)
    vals = jnp.asarray(np.stack([vre, vim]))
    wcu = np.exp(-2j * np.pi * np.outer(np.arange(S), np.arange(S)) / S) * (
        rng.standard_normal(S) + 1j * rng.standard_normal(S)
    )[None, :]
    wcv = np.exp(-2j * np.pi * np.outer(np.arange(S), np.arange(S)) / S) * (
        rng.standard_normal(S) + 1j * rng.standard_normal(S)
    )[None, :]
    return scal, vals, wcu, wcv


def _oracle_patches(S, scal, vals, wcu, wcv):
    """Dense f64 reference: patches = (wc Zu) diag(V) (wc Zv)^T."""
    xc = np.fft.fftfreq(S) * S
    duu, phu, duv, phv = [np.asarray(a, np.float64) for a in scal]
    Zu = np.exp(1j * (duu[:, None, :] * xc[None, :, None] + phu[:, None, :] * (xc**2)[None, :, None]))
    Zv = np.exp(1j * (duv[:, None, :] * xc[None, :, None] + phv[:, None, :] * (xc**2)[None, :, None]))
    Au = np.einsum("kx,gxv->gkv", wcu, Zu)
    Av = np.einsum("kx,gxv->gkv", wcv, Zv)
    V = np.asarray(vals[0], np.float64) + 1j * np.asarray(vals[1], np.float64)
    return np.einsum("gkv,gv,glv->gkl", Au, V, Av)


@pytest.mark.parametrize("S,zpasses", [(16, 3), (24, 3), (24, 6), (32, 3)])
def test_adjoint_kernel_vs_oracle(S, zpasses):
    rng = np.random.default_rng(7)
    ng = idg_fused.block_groups(S)
    scal, vals, wcu, wcv = _mk_inputs(rng, S, ng)
    wu8 = jnp.asarray(idg_fused.wc_perm_kron(wcu))
    wv8 = jnp.asarray(idg_fused.wc_perm_kron(wcv))
    exp = 2 if zpasses <= 3 else 3
    got = np.asarray(
        idg_fused.patches_from_vals(scal, vals, wu8, wv8, S=S, zpasses=zpasses,
                                    expasses=exp, interpret=True)
    )
    ref = _oracle_patches(S, np.asarray(scal), np.asarray(vals), wcu, wcv)
    err = np.abs((got[0] + 1j * got[1]) - ref).max() / np.abs(ref).max()
    # zpasses=6 must sit at the f32 substrate floor (rotation-power +
    # accumulation ulp), zpasses=3 inside the 3-pass split envelope
    tol = 2e-5 if zpasses == 3 else 2e-6
    assert err < tol, (S, zpasses, err)


@pytest.mark.parametrize("S,zpasses", [(16, 3), (24, 6), (32, 3)])
def test_forward_kernel_is_exact_transpose(S, zpasses):
    """<patches(x), y> == <x, vals(y)> over the real inner product."""
    rng = np.random.default_rng(3)
    ng = idg_fused.block_groups(S)
    scal, vals, wcu, wcv = _mk_inputs(rng, S, ng)
    wu8 = jnp.asarray(idg_fused.wc_perm_kron(wcu))
    wv8 = jnp.asarray(idg_fused.wc_perm_kron(wcv))
    exp = 2 if zpasses <= 3 else 3
    kw = dict(S=S, zpasses=zpasses, expasses=exp, interpret=True)
    pat = idg_fused.patches_from_vals(scal, vals, wu8, wv8, **kw)
    y = jnp.asarray(rng.standard_normal(pat.shape).astype(np.float32))
    yt = jnp.transpose(y, (0, 2, 1, 3)).reshape(2, S, ng * S)
    back = idg_fused.vals_from_patches(yt, scal, wu8, wv8, **kw)
    lhs = float(jnp.vdot(pat.ravel(), y.ravel()))
    rhs = float(jnp.vdot(vals.ravel(), back.ravel()))
    assert abs(lhs - rhs) / abs(lhs) < 2e-5, (lhs, rhs)


@pytest.fixture(scope="module")
def small_problem():
    rng = np.random.default_rng(11)
    nrow, nchan, nx, ny = 120, 3, 96, 96
    uvw = rng.standard_normal((nrow, 3)) * np.array([120.0, 120.0, 18.0])
    freq = np.linspace(1.0e9, 1.3e9, nchan)
    cell = 1.0 / (2 * 160.0 * freq[-1] / 299792458.0)
    vis = (rng.standard_normal((nrow, nchan)) + 1j * rng.standard_normal((nrow, nchan))).astype(
        np.complex128
    )
    wgt = rng.random((nrow, nchan))
    return uvw, freq, cell, vis, wgt, nx, ny


def _plans(small_problem, subgrid=None, epsilon=1e-5, **kw):
    uvw, freq, cell, vis, wgt, nx, ny = small_problem
    common = dict(nx=nx, ny=ny, cellx=cell, celly=cell, epsilon=epsilon,
                  do_wgridding=True, dtype=np.float32, subgrid=subgrid, **kw)
    p_ein = plan_idg(uvw, freq, eval_backend="einsum", **common)
    p_fus = plan_idg(uvw, freq, eval_backend="fused", **common)
    return p_ein, p_fus


@pytest.mark.parametrize("subgrid,epsilon", [(None, 1e-5), (24, 1e-7), (32, 1e-5)])
def test_plan_fused_parity_adjoint(small_problem, subgrid, epsilon):
    uvw, freq, cell, vis, wgt, nx, ny = small_problem
    p_ein, p_fus = _plans(small_problem, subgrid=subgrid, epsilon=epsilon)
    assert p_fus.fused and not p_ein.fused
    assert p_fus.ngroups % idg_fused.block_groups(p_fus.S) == 0
    d_ein = np.asarray(vis2dirty_idg(p_ein, vis, wgt=wgt))
    d_fus = np.asarray(vis2dirty_idg(p_fus, vis, wgt=wgt))
    scale = np.abs(d_ein).max()
    tol = 5e-5 if p_fus.zpasses == 3 else 5e-6
    assert np.abs(d_fus - d_ein).max() / scale < tol


@pytest.mark.parametrize("subgrid,epsilon", [(None, 1e-5), (24, 1e-7)])
def test_plan_fused_parity_forward(small_problem, subgrid, epsilon):
    uvw, freq, cell, vis, wgt, nx, ny = small_problem
    p_ein, p_fus = _plans(small_problem, subgrid=subgrid, epsilon=epsilon)
    rng = np.random.default_rng(5)
    img = rng.standard_normal((nx, ny)).astype(np.float32)
    v_ein = np.asarray(dirty2vis_idg(p_ein, img))
    v_fus = np.asarray(dirty2vis_idg(p_fus, img))
    scale = np.abs(v_ein).max()
    tol = 5e-5 if p_fus.zpasses == 3 else 5e-6
    assert np.abs(v_fus - v_ein).max() / scale < tol


def test_plan_fused_vs_dft_oracle(small_problem):
    """End-to-end accuracy of the fused path against the exact DFT."""
    uvw, freq, cell, vis, wgt, nx, ny = small_problem
    _, p_fus = _plans(small_problem)
    d_fus = np.asarray(vis2dirty_idg(p_fus, vis, wgt=wgt))
    d_dft = np.asarray(
        vis2dirty_dft(uvw, freq, vis, wgt=wgt, nx=nx, ny=ny, cellx=cell, celly=cell)
    )
    assert np.abs(d_fus - d_dft).max() / np.abs(d_dft).max() < 5e-5


def test_plan_fused_s24_vs_dft_oracle(small_problem):
    """The tight-epsilon fused tier (S=24, zpasses=6) against the exact
    DFT: kernel noise must sit at the f32 substrate floor, an order
    below the S=16/zpasses=3 envelope."""
    uvw, freq, cell, vis, wgt, nx, ny = small_problem
    _, p_fus = _plans(small_problem, subgrid=24, epsilon=1e-7)
    assert p_fus.S == 24 and p_fus.zpasses == 6
    d_fus = np.asarray(vis2dirty_idg(p_fus, vis, wgt=wgt))
    d_dft = np.asarray(
        vis2dirty_dft(uvw, freq, vis, wgt=wgt, nx=nx, ny=ny, cellx=cell, celly=cell)
    )
    assert np.abs(d_fus - d_dft).max() / np.abs(d_dft).max() < 4e-6
