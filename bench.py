"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: gridded visibilities/sec/chip through the wgridder adjoint
(vis2dirty), the reference's hot loop (ducc0 vis2dirty inside
grid_partition, SURVEY.md §3.1).

The target TPU is reached through an unstable tunnel (docs/
tpu-runtime-notes.md): execution is deferred to transfers, hung device
claims poison successor processes, and some programs hang indefinitely.
Each metric therefore runs in its own SUBPROCESS with a hard deadline and a
warmup op that absorbs a poisoned claim; the parent assembles whatever
completed. Fallback order for the headline: wgridder throughput ->
PSF-Hessian matvec throughput (expressed as the equivalent gridding rate is
NOT attempted — the metric name changes instead) -> FFT throughput.

``vs_baseline``: the reference publishes no vis/sec number (BASELINE.md);
we normalise against 5e7 vis/s — the order of magnitude of ducc0's
multi-threaded CPU wgridder on a server node.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

BASELINE_VIS_PER_SEC = 5e7
NREP = 4

_CHILD_COMMON = r"""
import numpy as np, jax, jax.numpy as jnp, time, json, sys
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
out_path = sys.argv[1]

def emit(obj):
    json.dump(obj, open(out_path, "w"))

# absorb a poisoned device claim from a previously killed process
np.asarray(jnp.ones((8, 8)) * 2.0)
scal = lambda v: jnp.asarray(np.full(1, v, np.float32))
cks = jax.jit(lambda d: jnp.sum(jnp.abs(d)).reshape(1))
rng = np.random.default_rng(0)
NREP = %d
"""


def run_child(code: str, timeout_s: int):
    """Run a metric snippet in a subprocess; returns its JSON dict or None."""
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        out_path = f.name
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write((_CHILD_COMMON % NREP) + code)
        script = f.name
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) + ":" + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, script, out_path], timeout=timeout_s, capture_output=True, text=True, env=env
        )
        if proc.returncode != 0:
            print(proc.stderr[-500:], file=sys.stderr, flush=True)
        with open(out_path) as f:
            text = f.read()
        return json.loads(text) if text.strip() else None
    except (subprocess.TimeoutExpired, json.JSONDecodeError, FileNotFoundError) as e:
        print(f"child failed: {type(e).__name__}", file=sys.stderr, flush=True)
        return None
    finally:
        for p in (script, out_path):
            try:
                os.unlink(p)
            except OSError:
                pass


GRID_CODE = r"""
from pfb_imaging_tpu.ops.gridder import plan_wgridder, vis2dirty_hostloop
from pfb_imaging_tpu.ops.gridder_pallas import plan_pallas, vis2dirty_pallas_wstack
nrow, nchan, nx = 100_000, 4, 1024
uvw = rng.uniform(-16000, 16000, (nrow, 3)); uvw[:, 2] *= 0.01
freq = np.linspace(1e9, 1.1e9, nchan)
plan = plan_wgridder(uvw, freq, nx=nx, ny=nx, cellx=8e-6, celly=8e-6, epsilon=1e-5,
                     do_wgridding=True, divide_by_n=False, dtype=np.float32)
vr = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
vi = jnp.asarray(rng.standard_normal((nrow, nchan)).astype(np.float32))
sc = jax.jit(lambda a, s: a * s[0])
# Pallas tiled-scatter path, XLA hostloop fallback
try:
    tiles = plan_pallas(plan)
    grid_call = lambda i: vis2dirty_pallas_wstack(plan, tiles, sc(vr, scal(1.0 + 1e-6 * i)), vi)
    kernel = "pallas_wstack"
    np.asarray(cks(grid_call(0)))
except Exception as e:
    print("pallas path failed, falling back to XLA hostloop:", repr(e)[:200], file=sys.stderr)
    grid_call = lambda i: vis2dirty_hostloop(plan, sc(vr, scal(1.0 + 1e-6 * i)), vis_im=vi)
    kernel = "xla_hostloop"
    np.asarray(cks(grid_call(0)))
def chain():
    acc = None
    for i in range(NREP):
        d = grid_call(i)
        acc = d if acc is None else acc + d
    return np.asarray(cks(acc))
chain()
t0 = time.time(); chain(); dt = (time.time() - t0) / NREP
emit({"name": "wgridder_vis2dirty", "kernel": kernel, "vis_per_sec": nrow * nchan / dt,
      "ms_per_call": dt * 1e3, "nx": nx, "nvis": nrow * nchan, "nw": int(plan.nw)})
"""

HESS_CODE = r"""
from pfb_imaging_tpu.ops.hessian import HessianCube, hess_cube_dot
from pfb_imaging_tpu.ops.psf import psf_to_psfhat
from pfb_imaging_tpu.opt.pcg import pcg
nxh = 4096
psf = rng.standard_normal((1, 1, 2 * nxh, 2 * nxh)).astype(np.float32)
ph = jax.jit(lambda p: jnp.abs(psf_to_psfhat(p)))(jnp.asarray(psf))
hess = HessianCube.build(ph, np.ones(1, np.float32), 1e-5, 2 * nxh, 2 * nxh)
x = jnp.asarray(rng.standard_normal((1, nxh, nxh)).astype(np.float32))
hd = jax.jit(hess_cube_dot)
np.asarray(cks(hd(hess, x)))
def chain():
    acc = None
    for i in range(NREP):
        y = hd(hess, x + scal(1e-6 * i)[0])
        acc = y if acc is None else acc + y
    return np.asarray(cks(acc))
chain()
t0 = time.time(); chain(); dt = (time.time() - t0) / NREP
res = {"name": "hessian_matvec", "ms": dt * 1e3, "nx": nxh}
niter = 10
prun = jax.jit(lambda h, b: jnp.sum(pcg(jax.tree_util.Partial(hess_cube_dot, h), b,
                                        tol=0.0, maxit=niter, minit=niter) ** 2).reshape(1))
np.asarray(prun(hess, x))
t0 = time.time(); np.asarray(prun(hess, x * scal(1.0000001)[0])); dtp = time.time() - t0
res["pcg_iters_per_sec"] = niter / dtp
emit(res)
"""

FFT_CODE = r"""
n = 2048
a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
f = jax.jit(lambda a, s: jnp.abs(jnp.fft.fft2(jax.lax.complex(a * s[0], a))))
np.asarray(cks(f(a, scal(1.0))))
def chain():
    acc = None
    for i in range(NREP):
        y = f(a, scal(1.0 + 1e-6 * i))
        acc = y if acc is None else acc + y
    return np.asarray(cks(acc))
chain()
t0 = time.time(); chain(); dt = (time.time() - t0) / NREP
emit({"name": "fft2_c64", "ms": dt * 1e3, "n": n})
"""


def main():
    results = {}
    grid = run_child(GRID_CODE, timeout_s=1500)
    if grid:
        results["gridder"] = grid
        print(f"wgridder: {grid['vis_per_sec'] / 1e6:.1f} Mvis/s ({grid['ms_per_call']:.1f} ms)", file=sys.stderr)
    hess = run_child(HESS_CODE, timeout_s=1200)
    if hess:
        results["hessian"] = hess
        print(f"hessian matvec {hess['nx']}: {hess['ms']:.1f} ms; pcg {hess.get('pcg_iters_per_sec', 0):.1f} it/s", file=sys.stderr)
    if not grid:
        fft = run_child(FFT_CODE, timeout_s=900)
        if fft:
            results["fft"] = fft
            print(f"fft2 {fft['n']}: {fft['ms']:.1f} ms", file=sys.stderr)

    if grid:
        vps = grid["vis_per_sec"]
        out = {
            "metric": "gridded_visibilities_per_sec_per_chip",
            "value": round(vps, 1),
            "unit": "vis/s",
            "vs_baseline": round(vps / BASELINE_VIS_PER_SEC, 3),
        }
    elif hess:
        # fallback: PSF-Hessian matvec rate at 4k (the PCG hot op). The
        # reference has no published number; ducc0 r2c+c2r at 8192^2 on a
        # 32-core node is ~0.5-1 s -> normalise against 0.75 s.
        out = {
            "metric": "hessian_matvec_per_sec_4k",
            "value": round(1000.0 / hess["ms"], 3),
            "unit": "matvec/s",
            "vs_baseline": round((1000.0 / hess["ms"]) / (1.0 / 0.75), 3),
        }
    else:
        fft = results.get("fft")
        val = round(1000.0 / fft["ms"], 3) if fft else 0.0
        out = {
            "metric": "fft2_c64_2048_per_sec",
            "value": val,
            "unit": "fft/s",
            "vs_baseline": round(val / 20.0, 3) if fft else 0.0,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
