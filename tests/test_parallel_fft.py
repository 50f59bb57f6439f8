"""Sharded rfft2 / PSF-convolution parity vs the local implementation.

The distributed-FFT transpose dance (parallel/fft.py) must reproduce
ops.psf.psf_convolve / ops.hessian.hessian_psf to rounding on the virtual
8-device CPU mesh (SURVEY §5.7 — the 8k/16k padded-FFT scaling axis)."""

import numpy as np

import jax
import jax.numpy as jnp

from pfb_imaging_tpu.ops.hessian import hessian_psf
from pfb_imaging_tpu.ops.psf import psf_convolve, psf_to_psfhat
from pfb_imaging_tpu.parallel.fft import hessian_psf_sharded, psf_convolve_sharded, psfhat_transposed
from pfb_imaging_tpu.parallel.mesh import make_mesh


def _setup(rng, nx=64, nxp=128):
    psf = rng.standard_normal((nxp, nxp))
    psfhat = np.abs(np.asarray(psf_to_psfhat(jnp.asarray(psf))))
    x = rng.standard_normal((nx, nx))
    return x, psfhat


def test_psf_convolve_sharded_parity(rng):
    mesh = make_mesh(band=1, row=8)
    x, psfhat = _setup(rng)
    nx, nxp = x.shape[0], psfhat.shape[0]
    ph_t = jnp.asarray(psfhat_transposed(psfhat, mesh.shape["row"]))
    ref = np.asarray(psf_convolve(jnp.asarray(x), jnp.asarray(psfhat), nxp, nxp))
    out = np.asarray(psf_convolve_sharded(mesh, jnp.asarray(x), ph_t, nx, nx, nxp, nxp))
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-10)


def test_hessian_psf_sharded_parity(rng):
    mesh = make_mesh(band=1, row=8)
    x, psfhat = _setup(rng)
    nx, nxp = x.shape[0], psfhat.shape[0]
    beam = rng.uniform(0.5, 1.0, (nx, nx))
    ph_t = jnp.asarray(psfhat_transposed(psfhat, mesh.shape["row"]))
    ref = np.asarray(hessian_psf(jnp.asarray(x), jnp.asarray(psfhat), nxp, nxp, beam=jnp.asarray(beam), eta=1e-3))
    out = np.asarray(
        hessian_psf_sharded(mesh, jnp.asarray(x), ph_t, nxp, nxp, beam=jnp.asarray(beam), eta=1e-3)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-10)


def test_sharded_fft_odd_half_spectrum(rng):
    """ny//2+1 is odd — the padded transposed layout must round-trip."""
    mesh = make_mesh(band=1, row=8)
    x, psfhat = _setup(rng, nx=48, nxp=96)
    nx, nxp = x.shape[0], psfhat.shape[0]
    ph_t = jnp.asarray(psfhat_transposed(psfhat, mesh.shape["row"]))
    ref = np.asarray(psf_convolve(jnp.asarray(x), jnp.asarray(psfhat), nxp, nxp))
    out = np.asarray(psf_convolve_sharded(mesh, jnp.asarray(x), ph_t, nx, nx, nxp, nxp))
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-10)
