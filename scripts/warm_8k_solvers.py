"""Compile-warm the three 8k solver programs (fwd_cg / bwd_pd / resid_up)
with NO kill budget: the tunnel's compile service degrades to ~30+ min per
large program at times, and a budget kill mid-compile loses the cache
write — the round-4 trap. Run once; every later bench run hits cache.

Mirrors stage_major8k16's exact shapes/statics (scripts/bench_child.py)
for ONE band and ONE cycle.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

from jax.tree_util import Partial

from pfb_imaging_tpu.core.step import pd_step_sizes
from pfb_imaging_tpu.deconv.pfb import _pfb_grad
from pfb_imaging_tpu.ops.gridder_idg import (
    hessian_vis_idg,
    plan_idg,
    to_group_layout,
    vis2dirty_idg,
)
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
t0 = time.time()
plan_im = plan_idg(uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
                   epsilon=1e-7, do_wgridding=True, divide_by_n=False, dtype=np.float32)
print(f"plan {time.time()-t0:.1f}s", flush=True)
cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))

wgt_j = jnp.ones((nrow, nchan), jnp.float32)
pv = jnp.ones((nrow, nchan), jnp.float32)
t0 = time.time()
psf8k = vis2dirty_idg(plan_im, pv, wgt=wgt_j, vis_im=jnp.zeros_like(pv))
o = (nx_psf - nx) // 2
pad_psf = jax.jit(
    lambda p: jnp.zeros((nx_psf, nx_psf), jnp.float32).at[o : o + nx, o : o + nx].set(p)
)
abspsfhat = jax.jit(lambda p: jnp.abs(psf_to_psfhat(p)))(pad_psf(psf8k)[None, None])
np.asarray(cks(abspsfhat[0, 0, :1, :1]))
print(f"psf {time.time()-t0:.1f}s", flush=True)

vr = jax.random.normal(jax.random.PRNGKey(0), (nrow, nchan), jnp.float32)
vi = jax.random.normal(jax.random.PRNGKey(1), (nrow, nchan), jnp.float32)
dirty0 = vis2dirty_idg(plan_im, vr, wgt=wgt_j, vis_im=vi).astype(jnp.bfloat16)
np.asarray(cks(dirty0.astype(jnp.float32)))

psi = Psi(1, nx, nx, bases=("self", "db1", "db2"), nlevel=2)
hess = HessianCube.build(abspsfhat, np.full(1, float(nrow * nchan), np.float32), 1e-3, nx_psf, nx_psf)
wsum = float(nrow * nchan)
hessnorm = float(jnp.max(abspsfhat)) / wsum * 1.05 + 1e-3
sigma, tau = pd_step_sizes(hessnorm=hessnorm, gamma=1.0, nu=float(psi.nbasis))
sig_a = jnp.asarray(np.full(1, sigma, np.float32))
tau_a = jnp.asarray(np.full(1, tau, np.float32))
lam = jnp.full(1, 1e-3, jnp.float32)
wgt_g = to_group_layout(plan_im, wgt_j)
dual0 = jnp.zeros((1, psi.nbasis, psi.nymax, psi.nxmax), jnp.float32)
l1w = jnp.ones((psi.nbasis, psi.nymax, psi.nxmax), jnp.float32)
inv_wsum = jnp.asarray(np.full(1, 1.0 / (nrow * nchan), np.float32))


@jax.jit
def fwd_cg(hess, dirty_b, update_b, inv_wsum):
    res = (dirty_b.astype(jnp.float32) * inv_wsum[0])[None]
    u = pcg(Partial(hess_cube_dot, hess), res,
            x0=update_b.astype(jnp.float32)[None], tol=0.0, maxit=10, minit=10)
    return u


@jax.jit
def bwd_pd(hess, model_b, u, dual0, l1w, lam, sig_a, tau_a):
    aop = Partial(hess_cube_dot, hess)
    xtilde = model_b[None] + u
    grad = Partial(_pfb_grad, aop, xtilde, 1.0)
    m, _, _, _ = primal_dual_loop(
        model_b[None], dual0, lam, l1w,
        sig_a, tau_a, grad,
        psi_dot=psi.dot, psi_hdot=psi.hdot, primal_prox=positivity,
        dual_update=dual_update_21m, tol=0.0, maxit=10,
    )
    return m[0]


@partial(jax.jit, donate_argnums=(0,))
def resid_up(dirty_b, m, wgt_g, plan):
    conv = hessian_vis_idg(plan, m, wgt_g=wgt_g)
    return (dirty_b.astype(jnp.float32) - conv).astype(jnp.bfloat16)


def attempt(name, f, tries=4):
    for k in range(tries):
        t0 = time.time()
        try:
            out = f()
            print(f"{name} compile+run {time.time()-t0:.1f}s (attempt {k+1})", flush=True)
            return out
        except Exception as e:  # transient tunnel/broken-pipe: retry
            print(f"{name} attempt {k+1} failed after {time.time()-t0:.1f}s: "
                  f"{repr(e)[:200]}", flush=True)
            time.sleep(10)
    raise RuntimeError(f"{name}: all attempts failed")


model_b = jnp.zeros((nx, nx), jnp.float32)
update_b = jnp.zeros((nx, nx), jnp.bfloat16)
u = attempt("fwd_cg", lambda: (lambda x: (np.asarray(cks(x[:, :1, :1])), x)[1])(fwd_cg(hess, dirty0, update_b, inv_wsum)))
model_b = attempt("bwd_pd", lambda: (lambda x: (np.asarray(cks(x[:1, :1])), x)[1])(bwd_pd(hess, model_b, u, dual0, l1w, lam, sig_a, tau_a)))
dirty0 = attempt("resid_up", lambda: (lambda x: (np.asarray(cks(x[:1, :1].astype(jnp.float32))), x)[1])(resid_up(dirty0, model_b, wgt_g, plan_im)))
# one timed steady-state cycle
t0 = time.time()
u = fwd_cg(hess, dirty0, u[0].astype(jnp.bfloat16), inv_wsum)
model_b = bwd_pd(hess, model_b, u, dual0, l1w, lam, sig_a, tau_a)
dirty0 = resid_up(dirty0, model_b, wgt_g, plan_im)
np.asarray(cks(dirty0[:1, :1].astype(jnp.float32)))
print(f"steady band-cycle {time.time()-t0:.1f}s -> x16 bands = "
      f"{(time.time()-t0)*16:.0f}s/major-cycle", flush=True)
