"""Profile the widefield (wplanes) vis2dirty phases on the real TPU
(VERDICT r4 #3: close the wide-field throughput cliff; target >= 10 Mvis/s
at the bench config: 1024^2, 0.03 rad, |w| <= 2200, 2M vis, eps 1e-5)."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pfb_imaging_tpu.ops.gridder_idg import (  # noqa: E402
    _idg_accumulate_bins,
    _idg_finish,
    _idg_patches_uv,
    _idg_prepare,
    plan_idg,
    vis2dirty_idg,
)

rng = np.random.default_rng(0)
nx = 1024
cell = 0.03 / nx
nvis, nchan = 2_000_000, 4
nrow = nvis // nchan
uvw = np.empty((nrow, 3))
uvw[:, 0] = rng.uniform(-8000, 8000, nrow)
uvw[:, 1] = rng.uniform(-8000, 8000, nrow)
uvw[:, 2] = rng.uniform(-2200, 2200, nrow)
freq = np.linspace(0.9e9, 1.1e9, nchan)

np.asarray(jnp.ones((8, 8)) * 2.0)
print("warm", flush=True)

t0 = time.time()
plan = plan_idg(uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
                epsilon=1e-5, do_wgridding=True, dtype=np.float32)
print(f"plan_sec={time.time()-t0:.1f} ngroups={plan.ngroups} nplanes={plan.nbins} "
      f"S={plan.S} half={plan.half} nbig={plan.nbig_x} Ws={plan.w_support} "
      f"slots/vis={plan.ngroups * plan.G / nvis:.1f} windowed={plan.windowed}",
      flush=True)

cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))
vr = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
vi = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
sc = jax.jit(lambda a, s: a * s[0])
scal = lambda v: jnp.asarray(np.full(1, v, np.float32))  # noqa: E731

t0 = time.time()
np.asarray(cks(vis2dirty_idg(plan, vr, vis_im=vi)))
print(f"v2d compile+run: {time.time()-t0:.1f}s", flush=True)
for rep in range(3):
    t0 = time.time()
    np.asarray(cks(vis2dirty_idg(plan, sc(vr, scal(1.0 + 1e-6 * rep)), vis_im=vi)))
    dt = time.time() - t0
    print(f"v2d run {rep}: {dt*1e3:.0f} ms ({nvis/dt/1e6:.1f} Mvis/s)", flush=True)


def timed(name, f):
    out = f()
    lf = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(cks(jnp.abs(lf.astype(jnp.float32))))
    t0 = time.time()
    for _ in range(3):
        out = f()
        lf = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(cks(jnp.abs(lf.astype(jnp.float32))))
    print(f"{name}: {(time.time()-t0)/3*1e3:.0f} ms", flush=True)
    return out


vals = timed("prepare", lambda: _idg_prepare(plan, vr, vi, None, None))
patches = timed("patches(eval)", lambda: _idg_patches_uv(plan, vals))
acc = timed("accumulate(assembly+FFT)", lambda: _idg_accumulate_bins(plan, patches))
timed("finish(crop+corr)", lambda: _idg_finish(plan, acc))
