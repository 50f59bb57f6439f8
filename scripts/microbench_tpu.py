"""Microbenchmarks of the IDG-gridder building blocks on the real TPU.

Run standalone (ONE tpu process at a time — docs/tpu-runtime-notes.md):
    python scripts/microbench_tpu.py [out.json]

Measures, at IDG-realistic shapes:
  * batched small matmuls (the per-group subgrid DFT) at several
    (ngroups, S, G) and precisions,
  * batched small fft2 (subgrid FFTs),
  * big-grid fft2 (per-w-plane cost),
  * gather with monotone and random indices (stream padding / unsort),
  * block scatter-add (patch -> lattice assembly) vs segment_sum,
  * complex cumprod (rotation-power phase matrices),
  * large cumsum (sorted-segment-reduction alternative).

Methodology per tpu-runtime-notes: chained distinct inputs + (1,)-f32
checksum fetch; results appended to the JSON file as they land.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = sys.argv[1] if len(sys.argv) > 1 else "microbench_results.json"
NREP = 4
RESULTS = {}


def emit(key, obj):
    RESULTS[key] = obj
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(RESULTS, f, indent=1)
    os.replace(tmp, OUT)
    print(f"{key}: {obj}", flush=True)


cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))


def scal(v):
    return jnp.asarray(np.full(1, v, np.float32))


def timed(call, nrep=NREP):
    def chain():
        acc = None
        for i in range(nrep):
            d = call(i)
            acc = d if acc is None else acc + d
        return np.asarray(cks(acc))

    chain()
    t0 = time.time()
    chain()
    return (time.time() - t0) / nrep


def guard(name, fn):
    try:
        t0 = time.time()
        fn()
        print(f"[{name} done in {time.time() - t0:.1f}s]", flush=True)
    except Exception as e:
        emit(name + "_error", repr(e)[:300])


def main():
    t0 = time.time()
    np.asarray(jnp.ones((8, 8)) * 2.0)
    emit("warmup_sec", round(time.time() - t0, 1))
    rng = np.random.default_rng(0)

    # ── batched small matmul: (ng, S, G) @ (ng, G, S) ────────────────
    def bmm():
        for ng, S, G in [(65536, 16, 64), (65536, 16, 128), (16384, 32, 64), (8192, 32, 32), (512, 128, 128)]:
            a = jnp.asarray(rng.standard_normal((ng, S, G)).astype(np.float32))
            b = jnp.asarray(rng.standard_normal((ng, G, S)).astype(np.float32))
            for prec in ["default", "highest"]:
                f = jax.jit(lambda x, y, s, p=prec: jnp.einsum("nsg,ngt->nst", x * s[0], y, precision=p))
                dt = timed(lambda i: f(a, b, scal(1 + 1e-6 * i)))
                flops = 2 * ng * S * G * S
                emit(f"bmm_{ng}x{S}x{G}_{prec}", {"ms": dt * 1e3, "tflops": flops / dt / 1e12})

    guard("bmm", bmm)

    # ── batched small fft2 ───────────────────────────────────────────
    def bfft():
        for ng, S in [(65536, 16), (16384, 32)]:
            a = jnp.asarray(rng.standard_normal((ng, S, S)).astype(np.float32))
            b = jnp.asarray(rng.standard_normal((ng, S, S)).astype(np.float32))
            f = jax.jit(lambda x, y, s: jnp.abs(jnp.fft.fft2(jax.lax.complex(x * s[0], y))))
            dt = timed(lambda i: f(a, b, scal(1 + 1e-6 * i)))
            emit(f"bfft2_{ng}x{S}", {"ms": dt * 1e3})

    guard("bfft", bfft)

    # ── big fft2 (per-w-plane cost) ──────────────────────────────────
    def bigfft():
        for n in [2048, 4096]:
            a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
            f = jax.jit(lambda x, s: jnp.abs(jnp.fft.fft2(jax.lax.complex(x * s[0], x))))
            dt = timed(lambda i: f(a, scal(1 + 1e-6 * i)))
            emit(f"fft2_{n}", {"ms": dt * 1e3})

    guard("bigfft", bigfft)

    # ── gather: monotone vs random indices ───────────────────────────
    def gathers():
        n = 1 << 22  # 4M
        table = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        idx_mono = np.sort(rng.integers(0, n, n)).astype(np.int32)
        idx_rand = rng.permutation(n).astype(np.int32)
        for name, idx in [("monotone", idx_mono), ("random", idx_rand)]:
            ij = jnp.asarray(idx)
            f = jax.jit(lambda t, ix, s: (t * s[0])[ix])
            dt = timed(lambda i: f(table, ij, scal(1 + 1e-6 * i)))
            emit(f"gather_{name}_4M", {"ms": dt * 1e3, "gelem_per_s": n / dt / 1e9})

    guard("gathers", gathers)

    # ── block scatter-add: lattice.at[bid].add(patches) ──────────────
    def blockscatter():
        ng, S, nb = 65536, 16, 65537
        patches = jnp.asarray(rng.standard_normal((ng, S, S)).astype(np.float32))
        bid = np.sort(rng.integers(0, nb, ng)).astype(np.int32)
        bj = jnp.asarray(bid)
        f = jax.jit(lambda p, ix, s: jnp.zeros((nb, S, S), jnp.float32).at[ix].add(p * s[0]))
        dt = timed(lambda i: f(patches, bj, scal(1 + 1e-6 * i)))
        emit("blockscatter_64kx16x16_to_64k", {"ms": dt * 1e3})
        g = jax.jit(lambda p, ix, s: jax.ops.segment_sum(p * s[0], ix, num_segments=nb))
        dt = timed(lambda i: g(patches, bj, scal(1 + 1e-6 * i)))
        emit("segmentsum_64kx16x16_to_64k", {"ms": dt * 1e3})

    guard("blockscatter", blockscatter)

    # ── complex cumprod (rotation-power phase build) ─────────────────
    def cumprods():
        m, n = 16, 1 << 19  # (S/2, ngroups*G)
        th = rng.standard_normal(n).astype(np.float32)
        c = jnp.asarray(np.cos(th))
        s_ = jnp.asarray(np.sin(th))
        f = jax.jit(
            lambda cc, ss, s: jnp.abs(
                jnp.cumprod(jnp.broadcast_to(jax.lax.complex(cc * s[0], ss)[None], (m, n)), axis=0)
            )
        )
        dt = timed(lambda i: f(c, s_, scal(1 + 1e-6 * i)))
        emit("cumprod_16x512k_c64", {"ms": dt * 1e3})

    guard("cumprods", cumprods)

    # ── large cumsum ─────────────────────────────────────────────────
    def cumsums():
        n = 1 << 25  # 32M
        a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        f = jax.jit(lambda x, s: jnp.cumsum(x * s[0]))
        dt = timed(lambda i: f(a, scal(1 + 1e-6 * i)))
        emit("cumsum_32M", {"ms": dt * 1e3})

    guard("cumsums", cumsums)

    # ── transcendentals: exp throughput ──────────────────────────────
    def exps():
        n = 1 << 23  # 8M
        a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        f = jax.jit(lambda x, s: jnp.exp(-jnp.abs(x * s[0])))
        dt = timed(lambda i: f(a, scal(1 + 1e-6 * i)))
        emit("exp_8M", {"ms": dt * 1e3, "gelem_per_s": n / dt / 1e9})
        g = jax.jit(lambda x, s: jnp.cos(x * s[0]) + jnp.sin(x))
        dt = timed(lambda i: g(a, scal(1 + 1e-6 * i)))
        emit("cossin_8M", {"ms": dt * 1e3, "gelem_per_s": n / dt / 1e9})

    guard("exps", exps)


if __name__ == "__main__":
    main()
