"""Tracing and per-phase timing (SURVEY.md §5.1).

The reference embeds phase timers in every hot loop (pcg_numba, primal_dual
etc.) and ships bottom-up profiling scripts with static SIMD/ASM inspection
of numba output. The TPU equivalents here:

  * ``PhaseTimer`` — accumulating wall-clock phase timers with the
    reference's fraction-of-total report format;
  * ``trace`` — context manager around ``jax.profiler`` emitting a
    perfetto-compatible trace directory;
  * ``lowering_text``/``cost_analysis`` — replaces ASM inspection: dump the
    StableHLO/compiled text and XLA's FLOP/byte estimates for a jitted
    function, used to sanity-check that kernels lower the way we think.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Accumulating named phase timers (reference opt/pcg.py:139-185 style).

    Usage::
        t = PhaseTimer()
        with t("grid"): ...
        with t("fft"): ...
        t.report(log.info)
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def __call__(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t

    def report(self, emit=print) -> None:
        ttot = time.time() - self._t0
        emit(f"timing breakdown (fraction of {ttot:.3f}s):")
        acc = 0.0
        for name, v in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            emit(f"  {name:<14} {v / ttot:.3f}")
            acc += v
        emit(f"  {'accounted':<14} {acc / ttot:.3f}")


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block (view with perfetto/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def lowering_text(fn, *args, **kwargs) -> str:
    """StableHLO for a jittable function at the given argument shapes."""
    import jax

    return jax.jit(fn).lower(*args, **kwargs).as_text()


def device_memory_stats() -> list[dict]:
    """Per-device memory telemetry (the TPU analogue of the reference's
    per-worker rss/peak reporting, SURVEY §5.5 — band_worker.py:184-198).

    Returns one dict per local device with bytes_in_use / peak_bytes_in_use
    when the backend exposes them.
    """
    import jax

    out = []
    for d in jax.local_devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out.append(
            {
                "device": str(d),
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        )
    return out


def memory_line() -> str:
    """One-line memory telemetry for driver progress logs (the reference
    prints per-task {pid, rss_gb, peak_gb} in every progress line,
    core/imager.py:574-583 / memory-and-ray.md:75-92): host peak RSS plus
    device HBM where the backend exposes it."""
    import os

    parts = [f"pid={os.getpid()}"]
    try:
        import resource

        parts.append(
            f"rss_peak={resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20:.2f}GB"
        )
    except Exception:
        pass
    for d in device_memory_stats():
        if d.get("bytes_in_use"):
            parts.append(f"hbm={d['bytes_in_use'] / 2**30:.2f}GB")
        if d.get("peak_bytes_in_use"):
            parts.append(f"hbm_peak={d['peak_bytes_in_use'] / 2**30:.2f}GB")
    return " ".join(parts)


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA cost analysis (flops, bytes accessed) for a jitted function —
    the roofline numbers the build plan calls for per kernel."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}
