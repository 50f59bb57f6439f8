"""Benchmark child: runs metric stages in ONE process, appending each
result to the JSON results file as soon as it lands.

The parent (bench.py) polls the results file and prints the headline line
the moment the "gridder" stage appears — later stages (or a hung tunnel)
can never block the headline. One process total = one tunnel warmup and
one poisoned-claim absorption (docs/tpu-runtime-notes.md).

Methodology per tpu-runtime-notes: execution is deferred to a device->host
transfer, so every timing chains NREP *distinct* inputs and fetches a
(1,)-shaped f32 checksum.
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

OUT_PATH = sys.argv[1]
STAGES = sys.argv[2].split(",") if len(sys.argv) > 2 else ["grid", "hess", "psi"]
STAGES = [s for s in STAGES if s]
NREP = int(os.environ.get("BENCH_NREP", "4"))

RESULTS = {}


def emit(key, obj):
    RESULTS[key] = obj
    tmp = OUT_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(RESULTS, f)
    os.replace(tmp, OUT_PATH)
    print(f"[child] {key}: {json.dumps(obj)[:200]}", file=sys.stderr, flush=True)


def scal(v):
    return jnp.asarray(np.full(1, v, np.float32))


cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))


def timed_chain(call, nrep=NREP):
    """Mean seconds per call over a chained, checksum-synchronised run."""

    def chain():
        acc = None
        for i in range(nrep):
            d = call(i)
            acc = d if acc is None else acc + d
        return np.asarray(cks(acc))

    chain()  # compile + warm
    t0 = time.time()
    chain()
    return (time.time() - t0) / nrep


def main():
    t_start = time.time()
    # absorb a poisoned device claim from a previously killed process
    np.asarray(jnp.ones((8, 8)) * 2.0)
    emit("warmup", {"sec": round(time.time() - t_start, 1), "devices": str(jax.devices())[:100]})
    rng = np.random.default_rng(0)

    if "grid" in STAGES:
        stage_grid(rng)
    if "grid4k" in STAGES:
        stage_grid4k(rng)
    if "shard1" in STAGES:
        stage_shard1(rng)
    if "degrid" in STAGES:
        stage_degrid(rng)
    if "hess" in STAGES:
        stage_hess(rng)
    if "hess8k" in STAGES:
        stage_hess8k(rng)
    if "psi" in STAGES:
        stage_psi(rng)
    if "major" in STAGES:
        stage_major(rng)


def _coords(rng, nrow, nchan):
    uvw = rng.uniform(-16000, 16000, (nrow, 3))
    uvw[:, 2] *= 0.01
    freq = np.linspace(1e9, 1.1e9, nchan)
    return uvw, freq


def _geom(nx):
    return dict(nx=nx, ny=nx, cellx=8e-6 * 1024 / nx, celly=8e-6 * 1024 / nx)


def stage_grid(rng):
    """Headline: vis2dirty throughput at 1024^2, 4M vis."""
    nrow, nchan, nx = 1_000_000, 4, 1024
    uvw, freq = _coords(rng, nrow, nchan)
    vr = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
    sc = jax.jit(lambda a, s: a * s[0])

    grid_call, kernel, nbins = None, None, 0
    try:
        from pfb_imaging_tpu.ops.gridder_idg import plan_idg, vis2dirty_idg

        plan = plan_idg(uvw, freq, epsilon=1e-5, do_wgridding=True, divide_by_n=False, dtype=np.float32, **_geom(nx))
        nbins = plan.nbins
        grid_call = lambda i: vis2dirty_idg(plan, sc(vr, scal(1.0 + 1e-6 * i)), vis_im=vi)  # noqa: E731
        kernel = "idg"
        np.asarray(cks(grid_call(0)))
    except Exception as e:  # pragma: no cover - fallback ladder
        print("idg path failed:", repr(e)[:300], file=sys.stderr, flush=True)
        grid_call = None
    if grid_call is None:
        from pfb_imaging_tpu.ops.gridder import plan_wgridder, vis2dirty_hostloop

        plan = plan_wgridder(
            uvw, freq, epsilon=1e-5, do_wgridding=True, divide_by_n=False, dtype=np.float32, **_geom(nx)
        )
        nbins = plan.nw
        grid_call = lambda i: vis2dirty_hostloop(plan, sc(vr, scal(1.0 + 1e-6 * i)), vis_im=vi)  # noqa: E731
        kernel = "xla_hostloop"
        np.asarray(cks(grid_call(0)))

    dt = timed_chain(grid_call)
    emit(
        "gridder",
        {
            "name": "wgridder_vis2dirty",
            "kernel": kernel,
            "vis_per_sec": nrow * nchan / dt,
            "ms_per_call": dt * 1e3,
            "nx": nx,
            "nvis": nrow * nchan,
            "nw": int(nbins),
        },
    )

    # zero-gather group-layout variant (the production residual path)
    if kernel == "idg":
        try:
            from pfb_imaging_tpu.ops.gridder_idg import _idg_prepare, vis2dirty_idg_grouped

            vals0 = _idg_prepare(plan, vr, vi, None, None)
            gcall = lambda i: vis2dirty_idg_grouped(plan, sc(vals0, scal(1.0 + 1e-6 * i)))  # noqa: E731
            np.asarray(cks(gcall(0)))
            dtg = timed_chain(gcall)
            emit(
                "gridder_grouped",
                {"vis_per_sec": nrow * nchan / dtg, "ms_per_call": dtg * 1e3},
            )
        except Exception as e:  # pragma: no cover
            print("grouped path failed:", repr(e)[:300], file=sys.stderr, flush=True)


def stage_grid4k(rng):
    """Target-scale gridding: 4096^2 image, 8M vis (VERDICT round-1 #10)."""
    from pfb_imaging_tpu.ops.gridder_idg import plan_idg, vis2dirty_idg

    nrow, nchan, nx = 2_000_000, 4, 4096
    uvw, freq = _coords(rng, nrow, nchan)
    plan = plan_idg(uvw, freq, epsilon=1e-5, do_wgridding=True, divide_by_n=False, dtype=np.float32, **_geom(nx))
    vr = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
    sc = jax.jit(lambda a, s: a * s[0])
    call = lambda i: vis2dirty_idg(plan, sc(vr, scal(1.0 + 1e-6 * i)), vis_im=vi)  # noqa: E731
    np.asarray(cks(call(0)))
    dt = timed_chain(call, nrep=2)
    emit(
        "gridder_4k",
        {"vis_per_sec": nrow * nchan / dt, "ms_per_call": dt * 1e3, "nx": nx, "nvis": nrow * nchan,
         "nbins": int(plan.nbins), "ngroups": int(plan.ngroups)},
    )


def stage_shard1(rng):
    """Prove the SPMD sharded-IDG code path executes on the real runtime
    (1-device mesh; the 8-device parity lives in tests/test_parallel.py)."""
    from pfb_imaging_tpu.parallel.mesh import make_mesh
    from pfb_imaging_tpu.parallel.sharded import plan_idg_sharded, sharded_vis2dirty_idg

    nrow, nchan, nx = 100_000, 2, 512
    uvw, freq = _coords(rng, nrow, nchan)
    stacked, rows = plan_idg_sharded(
        uvw, freq, 1, epsilon=1e-5, do_wgridding=True, divide_by_n=False, dtype=np.float32, **_geom(nx)
    )
    mesh = make_mesh(band=1, row=1)
    vr = jnp.asarray(rng.standard_normal((1, rows, nchan)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((1, rows, nchan)).astype(np.float32))
    out = sharded_vis2dirty_idg(mesh, stacked, vr, vi)
    s = float(np.asarray(cks(out))[0])
    emit("sharded_idg_1dev", {"ok": bool(np.isfinite(s) and s > 0), "checksum": s, "nx": nx})


def stage_degrid(rng):
    nrow, nchan, nx = 1_000_000, 4, 1024
    uvw, freq = _coords(rng, nrow, nchan)
    img = jnp.asarray(rng.standard_normal((nx, nx)).astype(np.float32))
    sc = jax.jit(lambda a, s: a * s[0])
    try:
        from pfb_imaging_tpu.ops.gridder_idg import dirty2vis_idg, plan_idg

        plan = plan_idg(uvw, freq, epsilon=1e-5, do_wgridding=True, divide_by_n=False, dtype=np.float32, **_geom(nx))
        call = lambda i: dirty2vis_idg(plan, sc(img, scal(1.0 + 1e-6 * i)), split=True)  # noqa: E731
        kernel = "idg"
        np.asarray(cks(call(0)))
    except Exception as e:
        print("idg degrid failed:", repr(e)[:300], file=sys.stderr, flush=True)
        from pfb_imaging_tpu.ops.gridder import dirty2vis_hostloop, plan_wgridder

        plan = plan_wgridder(
            uvw, freq, epsilon=1e-5, do_wgridding=True, divide_by_n=False, dtype=np.float32, **_geom(nx)
        )
        call = lambda i: dirty2vis_hostloop(plan, sc(img, scal(1.0 + 1e-6 * i)), split=True)  # noqa: E731
        kernel = "xla_hostloop"
        np.asarray(cks(call(0)))
    dt = timed_chain(call)
    emit(
        "degrid",
        {
            "name": "wgridder_dirty2vis",
            "kernel": kernel,
            "vis_per_sec": nrow * nchan / dt,
            "ms_per_call": dt * 1e3,
            "nx": nx,
        },
    )


def stage_hess(rng):
    from pfb_imaging_tpu.opt.pcg import pcg
    from pfb_imaging_tpu.ops.hessian import HessianCube, hess_cube_dot
    from pfb_imaging_tpu.ops.psf import psf_to_psfhat

    nxh = 4096
    psf = rng.standard_normal((1, 1, 2 * nxh, 2 * nxh)).astype(np.float32)
    ph = jax.jit(lambda p: jnp.abs(psf_to_psfhat(p)))(jnp.asarray(psf))
    hess = HessianCube.build(ph, np.ones(1, np.float32), 1e-5, 2 * nxh, 2 * nxh)
    x = jnp.asarray(rng.standard_normal((1, nxh, nxh)).astype(np.float32))
    hd = jax.jit(hess_cube_dot)
    dt = timed_chain(lambda i: hd(hess, x + scal(1e-6 * i)[0]))
    res = {"name": "hessian_matvec", "ms": dt * 1e3, "nx": nxh}
    niter = 10
    prun = jax.jit(
        lambda h, b: jnp.sum(
            pcg(jax.tree_util.Partial(hess_cube_dot, h), b, tol=0.0, maxit=niter, minit=niter) ** 2
        ).reshape(1)
    )
    np.asarray(prun(hess, x))
    t0 = time.time()
    np.asarray(prun(hess, x * scal(1.0000001)[0]))
    res["pcg_iters_per_sec"] = niter / (time.time() - t0)
    emit("hessian", res)


def stage_hess8k(rng):
    """BASELINE.md target scale: PSF Hessian + PCG at 8192^2 (16k padded)."""
    from pfb_imaging_tpu.opt.pcg import pcg
    from pfb_imaging_tpu.ops.hessian import HessianCube, hess_cube_dot

    nxh = 8192
    nxp = 2 * nxh
    # |PSFHAT| built on-device to avoid a 0.5 GB host transfer
    key = jax.random.PRNGKey(0)
    ph = jax.jit(lambda k: jnp.abs(jax.random.normal(k, (1, 1, nxp, nxp // 2 + 1))) + 0.1)(key)
    hess = HessianCube.build(ph, np.ones(1, np.float32), 1e-5, nxp, nxp)
    x = jax.jit(lambda k: jax.random.normal(k, (1, nxh, nxh)))(jax.random.PRNGKey(1))
    hd = jax.jit(hess_cube_dot)
    dt = timed_chain(lambda i: hd(hess, x + scal(1e-6 * i)[0]), nrep=2)
    res = {"name": "hessian_matvec_8k", "ms": dt * 1e3, "nx": nxh}
    niter = 5
    prun = jax.jit(
        lambda h, b: jnp.sum(
            pcg(jax.tree_util.Partial(hess_cube_dot, h), b, tol=0.0, maxit=niter, minit=niter) ** 2
        ).reshape(1)
    )
    np.asarray(prun(hess, x))
    t0 = time.time()
    np.asarray(prun(hess, x * scal(1.0000001)[0]))
    res["pcg_iters_per_sec"] = niter / (time.time() - t0)
    emit("hessian8k", res)


def stage_psi(rng):
    from pfb_imaging_tpu.ops.psi import Psi

    nx = 2048
    psi = Psi(nband=1, nx=nx, ny=nx, bases=("self", "db1", "db2", "db3", "db4", "db5"), nlevel=3)
    x = jnp.asarray(rng.standard_normal((1, nx, nx)).astype(np.float32))
    pd = jax.jit(psi.dot)
    a0 = pd(x)
    ph = jax.jit(psi.hdot)
    dt_dot = timed_chain(lambda i: pd(x + scal(1e-6 * i)[0]))
    dt_hdot = timed_chain(lambda i: ph(a0 + scal(1e-6 * i)[0]))
    emit("psi", {"name": "psi_2048", "dot_ms": dt_dot * 1e3, "hdot_ms": dt_hdot * 1e3, "nx": nx})


def stage_major(rng):
    """Full PFB major-cycle step (CG forward + SARA PD backward) at the
    VERDICT-mandated production scale: 2048^2, 4 bands, 6-basis SARA
    (reference topology: core/sara.py band workers; here ONE jitted
    program, core/step.py:pfb_major_step)."""
    from functools import partial

    from pfb_imaging_tpu.core.step import pd_step_sizes, pfb_major_step
    from pfb_imaging_tpu.ops.hessian import HessianCube
    from pfb_imaging_tpu.ops.psi import Psi

    nband, nx = 4, 2048
    nxp = 2 * nx
    cg_maxit, pd_maxit = 10, 20
    # |PSFHAT| built on-device (a delta-dominated PSF keeps CG well posed)
    ph = jax.jit(
        lambda k: 0.05 * jnp.abs(jax.random.normal(k, (nband, 1, nxp, nxp // 2 + 1))) + 1.0
    )(jax.random.PRNGKey(0))
    hess = HessianCube.build(ph, np.ones(nband, np.float32), 1e-5, nxp, nxp)
    psi = Psi(nband, nx, nx, bases=("self", "db1", "db2", "db3", "db4", "db5"), nlevel=3)
    residual = jax.jit(lambda k: 0.01 * jax.random.normal(k, (nband, nx, nx)))(jax.random.PRNGKey(1))
    model = jnp.zeros((nband, nx, nx), jnp.float32)
    update = jnp.zeros((nband, nx, nx), jnp.float32)
    dual = jnp.zeros((nband, psi.nbasis, psi.nymax, psi.nxmax), jnp.float32)
    l1weight = jnp.ones((psi.nbasis, psi.nymax, psi.nxmax), jnp.float32)
    sigma, tau = pd_step_sizes(hessnorm=1.2, gamma=1.0, nu=float(psi.nbasis))
    step = partial(
        pfb_major_step,
        psi=psi,
        gamma=jnp.full(1, 1.0, jnp.float32),
        sigma=jnp.full(1, sigma, jnp.float32),
        tau=jnp.full(1, tau, jnp.float32),
        cg_tol=0.0,
        cg_maxit=cg_maxit,
        cg_minit=cg_maxit,
        pd_tol=0.0,
        pd_maxit=pd_maxit,
        pos=True,
    )
    lam = jnp.full(1, 1e-3, jnp.float32)

    def call(i):
        m, u, d = step(hess, residual * (1.0 + 1e-6 * i), model, update, dual, l1weight, lam)
        return jnp.sum(jnp.abs(u)).reshape(1) + jnp.sum(jnp.abs(m)).reshape(1)

    np.asarray(call(0))  # compile + warm
    t0 = time.time()
    np.asarray(call(1))
    dt = time.time() - t0
    emit(
        "major_cycle",
        {
            "name": "pfb_major_step_2048_4band",
            "sec_per_major_cycle": dt,
            "nx": nx,
            "nband": nband,
            "cg_iters": cg_maxit,
            "pd_iters": pd_maxit,
        },
    )


if __name__ == "__main__":
    main()
