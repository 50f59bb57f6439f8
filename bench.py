"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: gridded visibilities/sec/chip through the wgridder adjoint
(vis2dirty), the reference's hot loop (ducc0 vis2dirty inside
grid_partition, SURVEY.md §3.1).

Design (round 2, after BENCH_r01 timed out before emitting its JSON):
  * ONE child process runs all stages (one tunnel warmup, one
    poisoned-claim absorption) and appends each stage's result to a JSON
    file the moment it lands (scripts/bench_child.py).
  * The parent POLLS that file and prints the headline line as soon as the
    gridder stage appears — a hung later stage can never block it.
  * Hard wall budgets: headline fallback fires at HEADLINE_DEADLINE, the
    child is killed at TOTAL_BUDGET, and the parent always exits 0 with
    exactly one JSON line on stdout.

``vs_baseline``: the reference publishes no vis/sec number (BASELINE.md);
we normalise against 5e7 vis/s — the order of magnitude of ducc0's
multi-threaded CPU wgridder on a server node.

Extra stage results (degrid, Hessian/PCG, Psi) go to BENCH_DETAILS.json +
stderr for the perf ledger (docs/perf.md).
"""

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_VIS_PER_SEC = 5e7
HEADLINE_DEADLINE = float(os.environ.get("BENCH_HEADLINE_DEADLINE", "720"))
TOTAL_BUDGET = float(os.environ.get("BENCH_TOTAL_BUDGET", "2400"))

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS_PATH = os.path.join(HERE, ".bench_results.json")
DETAILS_PATH = os.path.join(HERE, "BENCH_DETAILS.json")


def read_results():
    try:
        with open(RESULTS_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def headline_from(results, allow_fallback=True):
    # Headline (round 5, VERDICT #8): the REFERENCE-DEFAULT epsilon=1e-7
    # vis2dirty rate — apples-to-apples with ducc0's stock precision
    # (reference core/grid.py:50) now that it beats baseline there.
    grid7 = results.get("gridder_default")
    if grid7:
        vps = grid7["vis_per_sec"]
        return {
            "metric": "gridded_visibilities_per_sec_per_chip",
            "value": round(vps, 1),
            "unit": "vis/s",
            "vs_baseline": round(vps / BASELINE_VIS_PER_SEC, 3),
            "epsilon": grid7.get("epsilon", 1e-7),
        }
    if not allow_fallback:
        return None
    grid = results.get("gridder")
    if grid:
        vps = grid["vis_per_sec"]
        return {
            "metric": "gridded_visibilities_per_sec_per_chip",
            "value": round(vps, 1),
            "unit": "vis/s",
            "vs_baseline": round(vps / BASELINE_VIS_PER_SEC, 3),
            "epsilon": grid.get("epsilon", 1e-5),
        }
    hess = results.get("hessian")
    if hess:
        # fallback: PSF-Hessian matvec rate at 4k (the PCG hot op); a ducc0
        # r2c+c2r round trip at 8192^2 on a 32-core node is ~0.75 s.
        return {
            "metric": "hessian_matvec_per_sec_4k",
            "value": round(1000.0 / hess["ms"], 3),
            "unit": "matvec/s",
            "vs_baseline": round((1000.0 / hess["ms"]) / (1.0 / 0.75), 3),
        }
    return None


def main():
    try:
        os.unlink(RESULTS_PATH)
    except OSError:
        pass
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + ":" + env.get("PYTHONPATH", "")
    stages = env.get(
        "BENCH_STAGES",
        # priority order: the budget kill truncates the tail. grid7 runs
        # FIRST (it carries the round-5 headline, the reference-default
        # epsilon=1e-7 rate); major8k16 is the BASELINE.md end-to-end
        # target (8k x 8k, 16 bands, grid -> PCG -> SARA) and widefield
        # follows so both always land in the capture (VERDICT r4 #1).
        "grid7,grid,major8k16,widefield,gridver,grid4k,mbres,shard1,degrid,hess8k,psi,major,hess",
    )
    child = subprocess.Popen(
        [sys.executable, os.path.join(HERE, "scripts", "bench_child.py"), RESULTS_PATH, stages],
        env=env,
        stdout=sys.stderr,
        stderr=sys.stderr,
        start_new_session=True,
    )

    t0 = time.time()
    printed = False
    details_written = ""

    def print_headline(out):
        nonlocal printed
        if not printed and out is not None:
            print(json.dumps(out), flush=True)
            printed = True

    def write_details(results):
        # incremental (round 5, VERDICT r4 weak #1b): a parent-level kill
        # must never leave a stale details file on disk
        nonlocal details_written
        blob = json.dumps(results, indent=1)
        if blob != details_written and results:
            try:
                with open(DETAILS_PATH + ".tmp", "w") as f:
                    f.write(blob)
                os.replace(DETAILS_PATH + ".tmp", DETAILS_PATH)
                details_written = blob
            except OSError:
                pass

    while True:
        elapsed = time.time() - t0
        results = read_results()
        write_details(results)
        if not printed and results.get("gridder_default"):
            print_headline(headline_from(results, allow_fallback=False))
        if child.poll() is not None:
            break
        if elapsed > HEADLINE_DEADLINE and not printed:
            # the headline stage never landed; take whatever fallback
            # exists now and keep the child running for the rest
            print_headline(headline_from(results))
        if elapsed > TOTAL_BUDGET:
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except OSError:
                pass
            break
        time.sleep(2.0)

    results = read_results()
    print_headline(headline_from(results))
    if not printed:
        # last resort: never exit without the one JSON line
        print(
            json.dumps(
                {"metric": "gridded_visibilities_per_sec_per_chip", "value": 0.0, "unit": "vis/s", "vs_baseline": 0.0}
            ),
            flush=True,
        )
    write_details(results)
    for key in (
        "gridder",
        "gridder_grouped",
        "gridder_default",
        "gridder_verify",
        "gridder_4k",
        "sharded_idg_1dev",
        "degrid",
        "hessian",
        "hessian8k",
        "psi",
        "major_cycle",
        "widefield",
        "major8k16",
        "multiband_residual",
    ):
        if key in results:
            print(f"{key}: {json.dumps(results[key])}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
