"""Isolate the on-chip 8k PD blow-up (CPU-identical wiring is stable):
print u/m magnitudes per phase and the PD growth across maxit settings."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.tree_util import Partial

from pfb_imaging_tpu.core.step import pd_step_sizes
from pfb_imaging_tpu.deconv.pfb import _pfb_grad
from pfb_imaging_tpu.ops.gridder_idg import plan_idg, vis2dirty_idg
from pfb_imaging_tpu.ops.hessian import HessianCube, hess_cube_dot
from pfb_imaging_tpu.ops.psf import psf_to_psfhat
from pfb_imaging_tpu.ops.psi import Psi
from pfb_imaging_tpu.opt.pcg import pcg
from pfb_imaging_tpu.opt.primal_dual import primal_dual_loop
from pfb_imaging_tpu.prox.positivity import positivity
from pfb_imaging_tpu.prox.prox_21m import dual_update as dual_update_21m

np.asarray(jnp.ones((8, 8)) * 2.0)
print("warm", flush=True)

rng = np.random.default_rng(0)
nx, nx_psf = 8192, 10240
nrow, nchan = 1_000_000, 4
cell = 8e-6 / 8
uvw = rng.uniform(-16000, 16000, (nrow, 3))
uvw[:, 2] *= 0.01
freq = np.linspace(1e9, 1.1e9, nchan)
plan_im = plan_idg(uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
                   epsilon=1e-7, do_wgridding=True, divide_by_n=False, dtype=np.float32)
print("planned", flush=True)
wgt_j = jnp.ones((nrow, nchan), jnp.float32)
pv = jnp.ones((nrow, nchan), jnp.float32)
psf8k = vis2dirty_idg(plan_im, pv, wgt=wgt_j, vis_im=jnp.zeros_like(pv))
o = (nx_psf - nx) // 2
pad_psf = jax.jit(
    lambda p: jnp.zeros((nx_psf, nx_psf), jnp.float32).at[o : o + nx, o : o + nx].set(p)
)
abspsfhat = jax.jit(lambda p: jnp.abs(psf_to_psfhat(p)))(pad_psf(psf8k)[None, None])
wsum = float(nrow * nchan)
print("psf peak/wsum:", float(jnp.max(psf8k)) / wsum,
      "|psfhat|max/wsum:", float(jnp.max(abspsfhat)) / wsum, flush=True)

key = jax.random.PRNGKey(0)
vr = 1.0 + 0.3 * jax.random.normal(key, (nrow, nchan), jnp.float32)
vi = 0.3 * jax.random.normal(jax.random.split(key)[0], (nrow, nchan), jnp.float32)
dirty0 = vis2dirty_idg(plan_im, vr, wgt=wgt_j, vis_im=vi).astype(jnp.bfloat16)
print("dirty max/wsum:", float(jnp.abs(dirty0.astype(jnp.float32)).max()) / wsum, flush=True)

psi = Psi(1, nx, nx, bases=("self", "db1", "db2"), nlevel=2)
hess = HessianCube.build(abspsfhat, np.full(1, wsum, np.float32), 1e-3, nx_psf, nx_psf)
sigma, tau = pd_step_sizes(hessnorm=1.2, gamma=1.0, nu=float(psi.nbasis))
print("sigma tau:", sigma, tau, flush=True)
inv_wsum = jnp.asarray(np.full(1, 1.0 / wsum, np.float32))


@jax.jit
def fwd_cg(hess, dirty_b, update_b, inv_wsum):
    res = (dirty_b.astype(jnp.float32) * inv_wsum[0])[None]
    u = pcg(Partial(hess_cube_dot, hess), res,
            x0=update_b.astype(jnp.float32)[None], tol=0.0, maxit=10, minit=10)
    return u


u = fwd_cg(hess, dirty0, jnp.zeros((nx, nx), jnp.bfloat16), inv_wsum)
print("u: max", float(jnp.abs(u).max()), "rms", float(jnp.sqrt(jnp.mean(u * u))),
      "finite", bool(jnp.isfinite(u).all()), flush=True)

# Hessian matvec sanity on a unit delta
delta = jnp.zeros((1, nx, nx), jnp.float32).at[0, nx // 2, nx // 2].set(1.0)
hd = jax.jit(hess_cube_dot)(hess, delta)
print("H delta: centre", float(hd[0, nx // 2, nx // 2]), "max", float(jnp.abs(hd).max()),
      "finite", bool(jnp.isfinite(hd).all()), flush=True)

lam = jnp.full(1, 1e-3, jnp.float32)
dual0 = jnp.zeros((1, psi.nbasis, psi.nymax, psi.nxmax), jnp.float32)
l1w = jnp.ones((psi.nbasis, psi.nymax, psi.nxmax), jnp.float32)
model0 = jnp.zeros((nx, nx), jnp.float32)

for maxit in (1, 3, 10):
    @jax.jit
    def bwd_pd(hess, model_b, u, dual0, l1w, lam, maxit=maxit):
        aop = Partial(hess_cube_dot, hess)
        xtilde = model_b[None] + u
        grad = Partial(_pfb_grad, aop, xtilde, 1.0)
        m, _, _, _ = primal_dual_loop(
            model_b[None], dual0, lam, l1w,
            jnp.full(1, sigma, jnp.float32), jnp.full(1, tau, jnp.float32), grad,
            psi_dot=psi.dot, psi_hdot=psi.hdot, primal_prox=positivity,
            dual_update=dual_update_21m, tol=0.0, maxit=maxit,
        )
        return m[0]

    t0 = time.time()
    m = bwd_pd(hess, model0, u, dual0, l1w, lam)
    print(f"PD maxit={maxit}: m max {float(jnp.abs(m).max()):.4e} "
          f"rms {float(jnp.sqrt(jnp.mean(m * m))):.4e} "
          f"finite {bool(jnp.isfinite(m).all())} ({time.time()-t0:.1f}s)", flush=True)
