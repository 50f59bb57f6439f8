"""Bring-up sanitizers (SURVEY §5.2).

The reference's concurrency/numerics safety is by-construction (disjoint
zarr subtrees, Ray read-only deserialisation as an accidental write
detector — design D11). The TPU-native equivalents:

  * ``bringup_checks()``: a context manager enabling jax's NaN/Inf debug
    traps (every jitted program re-checked, failures raise at the emitting
    op) — the numerics sanitizer for new kernels;
  * ``assert_no_host_sync(fn)``: wraps a function and fails if it
    triggers implicit device->host transfers (catching accidental
    synchronisation points in solver loops).

Single-writer checkpoint discipline is enforced structurally by TreeStore
(writers own disjoint subtrees, utils/store.py).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def bringup_checks(nans: bool = True, infs: bool = False):
    """Enable NaN (and optionally Inf) traps inside jitted programs."""
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    try:
        jax.config.update("jax_debug_nans", bool(nans))
        jax.config.update("jax_debug_infs", bool(infs))
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


@contextmanager
def assert_no_host_sync():
    """Fail on implicit device->host transfers inside the context.

    Explicit np.asarray / .block_until_ready are still allowed; jax's
    transfer guard flags only *implicit* conversions (e.g. a traced value
    leaking into python control flow between dispatches).
    """
    with jax.transfer_guard_device_to_host("disallow"):
        yield
