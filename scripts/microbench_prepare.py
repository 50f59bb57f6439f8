"""Where do the widefield prepare's 116 ms go? (round-5 widefield hunt)

Phases: (a) original->sorted per-vis gather of (nvis, 2) rows (TRAILING-2
LANES ARE PADDED TO 128 on TPU — suspect), (b) packed-row build, (c)
packed window gather, (d) phase multiply."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

np.asarray(jnp.ones((8, 8)) * 2.0)
rng = np.random.default_rng(0)
nvis = 2_000_000
ng, G, WP = 174560, 128, 8
npack = -(-nvis // WP) + G // WP

sort_idx = jnp.asarray(rng.permutation(nvis).astype(np.int32))
win_start = jnp.asarray((rng.integers(0, nvis - G, ng) // WP * WP).astype(np.int32))
pre = jnp.asarray(rng.standard_normal((ng, G)).astype(np.float32))
pim = jnp.asarray(rng.standard_normal((ng, G)).astype(np.float32))
wre = jnp.asarray(rng.standard_normal(nvis).astype(np.float32))
wim = jnp.asarray(rng.standard_normal(nvis).astype(np.float32))
cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))
sc = jax.jit(lambda a, s: a * s[0])
scal = lambda v: jnp.asarray(np.full(1, v, np.float32))  # noqa: E731

from pfb_imaging_tpu.ops.gridder_idg import _window_gather  # noqa: E402


@jax.jit
def cur_sort2(wre, wim):
    rows = jnp.stack([wre, wim], axis=-1)
    srows = rows[sort_idx]
    return jnp.sum(srows).reshape(1)


@jax.jit
def alt_sort1(wre, wim):
    sre = wre[sort_idx]
    sim = wim[sort_idx]
    return (jnp.sum(sre) + jnp.sum(sim)).reshape(1)


@jax.jit
def full_current(wre, wim):
    rows = jnp.stack([wre, wim], axis=-1)
    srows = rows[sort_idx]
    packed = jnp.zeros((npack * WP, 2), jnp.float32).at[:nvis].set(srows)
    g = _window_gather(packed.reshape(npack, WP * 2), win_start, G, 2)
    vre = g[..., 0] * pre + g[..., 1] * pim
    vim = g[..., 1] * pre - g[..., 0] * pim
    return jnp.sum(vre).reshape(1) + jnp.sum(vim).reshape(1)


@jax.jit
def full_alt(wre, wim):
    """1-D sort gathers; pack re/im as SEPARATE packed tables; two
    width-1 window gathers."""
    sre = jnp.zeros(npack * WP, jnp.float32).at[:nvis].set(wre[sort_idx])
    sim = jnp.zeros(npack * WP, jnp.float32).at[:nvis].set(wim[sort_idx])
    gre = _window_gather(sre.reshape(npack, WP), win_start, G, 1)[..., 0]
    gim = _window_gather(sim.reshape(npack, WP), win_start, G, 1)[..., 0]
    vre = gre * pre + gim * pim
    vim = gim * pre - gre * pim
    return jnp.sum(vre).reshape(1) + jnp.sum(vim).reshape(1)


def timed(name, f):
    np.asarray(f(wre, wim))
    t0 = time.time()
    for i in range(3):
        np.asarray(f(sc(wre, scal(1.0 + 1e-6 * i)), wim))
    print(f"{name}: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)


timed("sort-gather (nvis,2) rows [current]", cur_sort2)
timed("sort-gather 2x 1-D [alt]", alt_sort1)
timed("full prepare [current]", full_current)
timed("full prepare [alt width-1]", full_alt)
