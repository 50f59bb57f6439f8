"""Profile the 8k/4M-vis IDG planning + grid phase (VERDICT r4 #4).

Breaks the major8k16 stage's plan_sec (82.8 s captured) and grid_sec
(35.4 s = ~2.1 s per 4M-vis vis2dirty call at 8192^2) into phases so
docs/perf.md can carry a roofline row reconciling the 8k rate with the
55 Mvis/s 1024^2 rate.

Run on the real TPU (one device process at a time).
"""

import cProfile
import io
import pstats
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
nrow, nchan, nx = 1_000_000, 4, 8192
cell = 8e-6 / 8
uvw = rng.uniform(-16000, 16000, (nrow, 3))
uvw[:, 2] *= 0.01
freq = np.linspace(1e9, 1.1e9, nchan)

# absorb potential poisoned claim
np.asarray(jnp.ones((8, 8)) * 2.0)
print("warm", flush=True)

t0 = time.time()
prof = cProfile.Profile()
prof.enable()
plan = plan_idg(
    uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
    epsilon=1e-7, do_wgridding=True, divide_by_n=False, dtype=np.float32,
)
prof.disable()
print(f"plan_sec={time.time()-t0:.1f} ngroups={plan.ngroups} nbins={plan.nbins} "
      f"S={plan.S} nbig={plan.nbig_x} fused={plan.fused}", flush=True)
s = io.StringIO()
pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(40)
print(s.getvalue(), flush=True)

cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))
vr = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
vi = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
sc = jax.jit(lambda a, s: a * s[0])
scal = lambda v: jnp.asarray(np.full(1, v, np.float32))  # noqa: E731

# full call, compile + timed
t0 = time.time()
np.asarray(cks(vis2dirty_idg(plan, vr, vis_im=vi)))
print(f"v2d compile+run: {time.time()-t0:.1f}s", flush=True)
for rep in range(3):
    t0 = time.time()
    np.asarray(cks(vis2dirty_idg(plan, sc(vr, scal(1.0 + 1e-6 * rep)), vis_im=vi)))
    print(f"v2d run {rep}: {time.time()-t0:.2f}s", flush=True)

# phase split: prepare (sort/gather) / patches (eval) / accumulate
# (assembly + big FFT) / finish (crop + correction)
vals = _idg_prepare(plan, vr, vi, None, None)
np.asarray(cks(vals[0] if isinstance(vals, tuple) else vals))


def timed(name, f, *a):
    out = f(*a)
    lf = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(cks(jnp.abs(lf.astype(jnp.float32)) if lf.dtype != jnp.float32 else lf))
    t0 = time.time()
    for rep in range(2):
        out = f(*a)
        lf = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(cks(jnp.abs(lf.astype(jnp.float32)) if lf.dtype != jnp.float32 else lf))
    print(f"{name}: {(time.time()-t0)/2*1e3:.0f} ms", flush=True)
    return out


vals = timed("prepare", lambda: _idg_prepare(plan, vr, vi, None, None))
patches = timed("patches(eval)", lambda: _idg_patches_uv(plan, vals))
acc = timed("accumulate(assembly+FFT)", lambda: _idg_accumulate_bins(plan, patches))
timed("finish(crop+corr)", lambda: _idg_finish(plan, acc))
