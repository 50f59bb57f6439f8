"""Wide-field (many w-bin) IDG gridding on the real TPU: dense vs compact
per-bin assembly (the docs/perf.md scaling caveat).

Run standalone (ONE tpu process at a time — docs/tpu-runtime-notes.md):
    python scripts/bench_widefield.py [out.json]

A ~0.03 rad field at 1024 pixels with |w| up to ~2000 lambda forces the
plan into the size-classed ``lax.scan`` assembly path (O(100) w-bins).
The dense overlap-add costs ~(bucket-lattice area) per bin regardless of
occupancy; the compact path scatters patch quarters straight into the
blocked grid, cost ~(groups in bin). Methodology per tpu-runtime-notes:
chained distinct inputs + (1,)-f32 checksum fetch.
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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = sys.argv[1] if len(sys.argv) > 1 else "widefield_results.json"
NREP = 3
RESULTS = {}


def emit(key, obj):
    RESULTS[key] = obj
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(RESULTS, f, indent=1)
    os.replace(tmp, OUT)
    print(f"{key}: {obj}", flush=True)


cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))


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


def main():
    t0 = time.time()
    np.asarray(jnp.ones((8, 8)) * 2.0)
    emit("warmup_sec", round(time.time() - t0, 1))

    from pfb_imaging_tpu.ops import gridder_idg as gi

    nx = 1024
    cell = 0.03 / nx
    nvis = 2_000_000
    nchan = 4
    nrow = nvis // nchan
    rng = np.random.default_rng(7)
    uvw = np.empty((nrow, 3))
    uvw[:, 0] = rng.uniform(-8000, 8000, nrow)
    uvw[:, 1] = rng.uniform(-8000, 8000, nrow)
    uvw[:, 2] = rng.uniform(-2200, 2200, nrow)
    freq = np.linspace(0.9e9, 1.1e9, nchan)

    t0 = time.time()
    plan = gi.plan_idg(
        uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell,
        epsilon=1e-5, do_wgridding=True, dtype=np.float32,
    )
    emit("plan", {"sec": round(time.time() - t0, 1), "nbins": plan.nbins,
                  "ngroups": plan.ngroups, "nvis": nvis})

    vr = rng.standard_normal((nrow, nchan)).astype(np.float32)
    vi = rng.standard_normal((nrow, nchan)).astype(np.float32)
    vre = [jnp.asarray(vr + i) for i in range(NREP)]
    vim = [jnp.asarray(vi) for _ in range(NREP)]
    img = rng.standard_normal((nx, nx)).astype(np.float32)
    imgs = [jnp.asarray(img + 0.01 * i) for i in range(NREP)]

    batched_gate = gi._batched_bins_ok

    def _no_batch(p):
        return False

    for mode in ("batched", "compact", "dense"):
        if mode == "batched":
            gi._batched_bins_ok = batched_gate
            if not batched_gate(plan):
                emit("vis2dirty_batched", {"skipped": "gate rejects this plan"})
                continue
        else:
            gi._batched_bins_ok = _no_batch
            gi._COMPACT_FACTOR = gi._COMPACT_FACTOR if mode == "compact" else 0
        jax.clear_caches()
        tg = timed(lambda i: gi.vis2dirty_idg(plan, vre[i], vis_im=vim[i]))
        emit(f"vis2dirty_{mode}", {"ms": round(tg * 1e3, 1),
                                   "mvis_per_s": round(nvis / tg / 1e6, 1)})
        td = timed(lambda i: gi.dirty2vis_idg(plan, imgs[i], split=True))
        emit(f"dirty2vis_{mode}", {"ms": round(td * 1e3, 1),
                                   "mvis_per_s": round(nvis / td / 1e6, 1)})
    gi._batched_bins_ok = batched_gate

    # phase breakdown (batched path): prepare gather / eval / accumulate.
    # The plan travels as a pytree ARGUMENT (the module functions are
    # already jitted) — closing over it would embed ~0.5 GB of constants
    # in the remote-compile request (HTTP 413 through the tunnel).
    jax.clear_caches()
    tp = timed(lambda i: gi._idg_prepare(plan, vre[i], vim[i], None, None)[0])
    vals = [gi._idg_prepare(plan, vre[i], vim[i], None, None) for i in range(NREP)]
    te = timed(lambda i: gi._idg_patches_uv(plan, vals[i])[0])
    pats = [gi._idg_patches_uv(plan, vals[i]) for i in range(NREP)]
    ta = timed(lambda i: gi._idg_accumulate_bins(plan, pats[i]).real)
    emit("phases", {"prepare_ms": round(tp * 1e3, 1), "eval_ms": round(te * 1e3, 1),
                    "accumulate_ms": round(ta * 1e3, 1)})

    # production residual path: Hessian round trip (wplanes plans take
    # the per-vis weights in ORIGINAL layout — the weight applies to the
    # replica SUM, hessian_vis_idg docstring)
    wgt = jnp.asarray(rng.uniform(0.5, 1.5, (nrow, nchan)).astype(np.float32))
    wgt_h = wgt if plan.w_support > 1 else gi.to_group_layout(plan, wgt)
    th = timed(lambda i: gi.hessian_vis_idg(plan, imgs[i], wgt_g=wgt_h))
    emit("hessian_roundtrip", {"ms": round(th * 1e3, 1),
                               "mvis_per_s_roundtrip": round(nvis / th / 1e6, 1)})


if __name__ == "__main__":
    main()
