"""Is the 3-pass one-hot quarter matmul the fastest way to split patches
into half x half quarters, or does a slice/reshape relayout beat it?
(widefield accumulate phase hunt, round 5)."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

np.asarray(jnp.ones((8, 8)) * 2.0)
S, half = 32, 16
rows = 258048  # 2 * nb * latt at the widefield config
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((rows, S * S)).astype(np.float32))
cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))
sc = jax.jit(lambda a, s: a * s[0])
scal = lambda v: jnp.asarray(np.full(1, v, np.float32))  # noqa: E731

from pfb_imaging_tpu.ops.gridder_idg import (  # noqa: E402
    _mm_onehot_pre,
    _sel_quarter,
    _split3_bf16,
)


@jax.jit
def via_matmul(x):
    split = _split3_bf16(x)
    out = []
    for a in range(2):
        for b in range(2):
            sel = _sel_quarter(S, half, a, b, jnp.bfloat16)
            out.append(_mm_onehot_pre(split, sel))
    return sum(o.sum() for o in out).reshape(1)


@jax.jit
def via_slice(x):
    x3 = x.reshape(rows, S, S)
    out = []
    for a in range(2):
        for b in range(2):
            q = x3[:, a * half : (a + 1) * half, b * half : (b + 1) * half]
            out.append(q.reshape(rows, half * half))
    return sum(o.sum() for o in out).reshape(1)


def timed(name, f):
    np.asarray(f(sc(x, scal(1.0))))
    t0 = time.time()
    for i in range(3):
        np.asarray(f(sc(x, scal(1.0 + 1e-6 * i))))
    print(f"{name}: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)


timed("one-hot matmul (3-pass bf16)", via_matmul)
timed("slice/reshape", via_slice)

# the global scatter that precedes it
bid = jnp.asarray(rng.integers(0, 129024, rows).astype(np.int32))


@jax.jit
def scat(x):
    return jnp.zeros((129025, S * S), jnp.float32).at[bid].add(x).sum().reshape(1)


timed("row scatter-add 258k x 1024", scat)

idx = jnp.asarray(rng.integers(0, rows, rows).astype(np.int32))


@jax.jit
def gath(x):
    return x[idx].sum().reshape(1)


timed("row gather 258k x 1024", gath)
