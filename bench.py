"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: gridded visibilities/sec/chip through the wgridder adjoint
(vis2dirty), the reference's hot loop (ducc0 vis2dirty inside
grid_partition, SURVEY.md §3.1). Secondary numbers (degrid throughput,
Hessian matvec, PCG iters/sec) go to stderr; the driver contract is the
single JSON line on stdout.

Methodology notes for this environment (axon-tunnelled TPU):
  * per-call blocking is unreliable and identical dispatches may be elided
    remotely, so each measurement is a host loop over nrep calls with
    *distinct* inputs whose outputs are summed into one array; a single
    scalar fetch at the end forces the whole chain. The reported time is
    total/nrep and is an upper bound per call (includes dispatch overhead).
  * complex64 device->host transfers are unimplemented — only f32 crosses
    the boundary.

``vs_baseline``: the reference publishes no vis/sec number (BASELINE.md —
its wall-clock numbers are whole-pipeline on a fat CPU node), so the
baseline is the reference substrate's order of magnitude: ducc0's
multi-threaded CPU wgridder sustains ~1e7-1e8 gridded vis/s on a server
node; we normalise against 5e7.
"""

import json
import sys
import time

import numpy as np

BASELINE_VIS_PER_SEC = 5e7
NREP = 4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fetch(thunk, tries: int = 4):
    """Dispatch + transfer with retries — the tunnelled TPU backend throws
    transient UNIMPLEMENTED errors on device->host transfers."""
    for attempt in range(tries):
        try:
            return np.asarray(thunk())
        except Exception as e:
            log(f"transfer attempt {attempt + 1} failed ({type(e).__name__}); retrying")
            time.sleep(2.0 * (attempt + 1))
    return np.asarray(thunk())


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pfb_imaging_tpu.ops.gridder import dirty2vis, plan_wgridder, vis2dirty
    from pfb_imaging_tpu.ops.hessian import HessianCube, hess_cube_dot
    from pfb_imaging_tpu.ops.psf import psf_to_psfhat
    from pfb_imaging_tpu.opt.pcg import pcg

    rng = np.random.default_rng(0)

    # ── headline: wgridder vis2dirty throughput ──────────────────────
    nrow, nchan, nx = 200_000, 4, 1024
    uvw = rng.uniform(-2000, 2000, (nrow, 3))
    uvw[:, 2] *= 0.01
    freq = np.linspace(1e9, 1.1e9, nchan)
    cell = 8.0e-6
    t0 = time.time()
    plan = plan_wgridder(
        uvw, freq, nx=nx, ny=nx, cellx=cell, celly=cell, epsilon=1e-5,
        do_wgridding=True, divide_by_n=False, dtype=np.float32,
    )
    log(f"plan: {time.time() - t0:.1f}s (nw={plan.nw}, support={plan.support}, cap={plan.capacity})")

    vr = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
    # scalars cross host->device as shape-(1,) arrays: 0-d transfers are
    # unimplemented on this backend
    make_vis = jax.jit(lambda vr, vi, s: jax.lax.complex(vr * s[0], vi))
    scal = lambda v: jnp.asarray(np.full(1, v, np.float32))  # noqa: E731
    checksum = jax.jit(lambda a: jnp.sum(a * a).reshape(1))

    t0 = time.time()
    fetch(lambda: checksum(vis2dirty(plan, make_vis(vr, vi, scal(1.0)))))
    log(f"vis2dirty compile+first: {time.time() - t0:.1f}s")

    def grid_chain():
        acc = None
        for i in range(NREP):
            d = vis2dirty(plan, make_vis(vr, vi, scal(1.0 + 1e-6 * i)))
            acc = d if acc is None else acc + d
        return checksum(acc)

    fetch(grid_chain)  # warm the acc-chain shapes
    t0 = time.time()
    fetch(grid_chain)
    dt_grid = (time.time() - t0) / NREP
    vis_per_sec = nrow * nchan / dt_grid
    log(f"vis2dirty: {dt_grid * 1e3:.2f} ms/call -> {vis_per_sec / 1e6:.1f} Mvis/s")

    # ── secondary: degrid throughput ─────────────────────────────────
    try:
        img = jnp.asarray(rng.standard_normal((nx, nx)).astype(np.float32))

        def degrid_chain():
            acc = None
            for i in range(NREP):
                v = dirty2vis(plan, img * scal(1.0 + 1e-6 * i)[0])
                acc = v if acc is None else acc + v
            return checksum(jnp.abs(acc))

        fetch(degrid_chain)
        t0 = time.time()
        fetch(degrid_chain)
        dt_degrid = (time.time() - t0) / NREP
        log(f"dirty2vis: {dt_degrid * 1e3:.2f} ms/call -> {nrow * nchan / dt_degrid / 1e6:.1f} Mvis/s")
    except Exception as e:
        log(f"degrid metric failed: {e!r}")

    # ── secondary: PSF-Hessian matvec + PCG iters/sec at 4k ──────────
    try:
        nxh = 4096
        psf = rng.standard_normal((1, 1, 2 * nxh, 2 * nxh)).astype(np.float32)
        ph = jax.jit(lambda p: jnp.abs(psf_to_psfhat(p)))(jnp.asarray(psf))
        hess = HessianCube.build(ph, np.ones(1, np.float32), 1e-5, 2 * nxh, 2 * nxh)
        x = jnp.asarray(rng.standard_normal((1, nxh, nxh)).astype(np.float32))
        hdot = jax.jit(hess_cube_dot)

        def hess_chain():
            acc = None
            for i in range(NREP):
                y = hdot(hess, x + scal(1e-6 * i)[0])
                acc = y if acc is None else acc + y
            return checksum(acc)

        fetch(hess_chain)
        t0 = time.time()
        fetch(hess_chain)
        dt_hess = (time.time() - t0) / NREP
        log(f"hessian matvec {nxh}: {dt_hess * 1e3:.1f} ms")

        niter = 10

        @jax.jit
        def pcg_run(hess, b):
            u = pcg(jax.tree_util.Partial(hess_cube_dot, hess), b, tol=0.0, maxit=niter, minit=niter)
            return jnp.sum(u * u).reshape(1)

        fetch(lambda: pcg_run(hess, x))
        t0 = time.time()
        fetch(lambda: pcg_run(hess, x * scal(1.0000001)[0]))
        dt_pcg = time.time() - t0
        log(f"pcg {niter} iters at {nxh}: {dt_pcg:.2f}s -> {niter / dt_pcg:.1f} iters/s")
    except Exception as e:  # secondary metrics must not sink the headline
        log(f"secondary metrics failed: {e!r}")

    print(
        json.dumps(
            {
                "metric": "gridded_visibilities_per_sec_per_chip",
                "value": round(vis_per_sec, 1),
                "unit": "vis/s",
                "vs_baseline": round(vis_per_sec / BASELINE_VIS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
