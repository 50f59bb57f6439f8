"""Multi-host (multi-process) runtime: DCN-spanning meshes + host-local IO.

The reference scales across hosts with a Ray head + workers reading their
own data (reference ``init_ray``/``set_client``, __init__.py:73-178;
band workers read their band's partitions, band_worker.py:61-106). The
TPU-native equivalent (SURVEY §2.5 comm backends; BASELINE.md names a
2-host v5e slice):

* ``jax.distributed.initialize`` joins the processes into one runtime —
  ``jax.devices()`` then spans every host and a ``Mesh`` over it lays the
  band/row axes across ICI within a host and DCN between hosts;
* each process LOADS ONLY ITS SHARD: ``stream_band_stack``
  (parallel/mesh.py) iterates the sharding's *addressable* device map, so
  under multi-host it touches exactly the bands this host owns — the
  reference's D10 (band workers read their own data) falls out of the
  sharding;
* results come back per host through ``addressable_shards``: the owner of
  each band writes its TreeStore node (single-writer preserved), with a
  cross-host barrier before completion stamps.

Tested by spawning real processes over the CPU backend
(tests/test_multihost.py), the same way the reference tests distributed
behaviour on a local Ray instance (reference tests/conftest.py:181-208).
"""

from __future__ import annotations

import os

import numpy as np

import jax

__all__ = [
    "init_distributed",
    "is_multihost",
    "process_index",
    "process_count",
    "owned_items",
    "owned_band_slices",
    "global_band_array",
    "barrier",
    "fetch_band_slices",
]


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join this process into the multi-host runtime.

    Arguments default to the ``PFB_COORDINATOR`` / ``PFB_NUM_PROCESSES`` /
    ``PFB_PROCESS_ID`` environment variables (and below those, JAX's own
    auto-detection for TPU pods, where ``jax.distributed.initialize()``
    needs no arguments at all). Call once, before any other device use.
    """
    kw = {}
    ca = coordinator_address or os.environ.get("PFB_COORDINATOR")
    npr = num_processes if num_processes is not None else os.environ.get("PFB_NUM_PROCESSES")
    pid = process_id if process_id is not None else os.environ.get("PFB_PROCESS_ID")
    if ca is not None:
        kw["coordinator_address"] = ca
    if npr is not None:
        kw["num_processes"] = int(npr)
    if pid is not None:
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def owned_items(items, pid: int | None = None, nproc: int | None = None) -> list:
    """Round-robin assignment of work items (bands, partitions) to this
    process — the reference's per-worker task split. Deterministic and
    disjoint-covering across processes."""
    pid = jax.process_index() if pid is None else pid
    nproc = jax.process_count() if nproc is None else nproc
    return [it for i, it in enumerate(items) if i % nproc == pid]


def owned_band_slices(arr) -> list[tuple[int, np.ndarray]]:
    """(band_index, host_value) pairs for the bands of a band-sharded
    global array that live on THIS host — the write-back path: each host
    persists exactly the nodes it owns.

    ``arr`` is a jax.Array whose axis 0 is sharded over the mesh 'band'
    axis (possibly with further sharding on later axes: row-sharded
    image axes are gathered per band here).
    """
    out: dict[int, list] = {}
    for shard in arr.addressable_shards:
        sl = shard.index[0]
        b0 = sl.start or 0
        data = np.asarray(shard.data)
        for i in range(data.shape[0]):
            out.setdefault(b0 + i, []).append((shard.index[1:], data[i]))
    merged = []
    tail = arr.shape[1:]
    for b, pieces in sorted(out.items()):
        # assemble the band's full (possibly row-sharded) image from the
        # host's pieces; bands not fully addressable here would leave
        # holes — the band axis owns the host split, so they never are
        full = np.zeros(tail, np.asarray(pieces[0][1]).dtype)
        for idx, piece in pieces:
            full[idx] = piece
        merged.append((b, full))
    return merged


def global_band_array(mesh, loaders, shape_tail, dtype, spec=None):
    """Band-sharded global array where THIS process loads only its bands
    (thin multi-host-documenting alias of ``stream_band_stack``)."""
    from .mesh import stream_band_stack

    return stream_band_stack(mesh, loaders, shape_tail, dtype, spec=spec)


def barrier(name: str = "pfb") -> None:
    """Cross-host sync point (before completion stamps / shared writes)."""
    if is_multihost():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def fetch_band_slices(arr) -> list[tuple[int, np.ndarray]]:
    """Alias of ``owned_band_slices`` (name used by the drivers)."""
    return owned_band_slices(arr)


def host_gather(arr) -> np.ndarray:
    """``np.asarray`` that also works for non-fully-addressable global
    arrays: gathers every shard to every host (the driver-side cube sizes
    are image-scale — D10 keeps the heavy gridded products sharded)."""
    if not is_multihost() or getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def allsum(x) -> np.ndarray:
    """Sum a host-local numpy array across processes (disjoint per-host
    band contributions -> the full cube on every host)."""
    x = np.asarray(x)
    if not is_multihost():
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x)).sum(axis=0)


def spanning_devices(n: int) -> list:
    """``n`` devices spread round-robin across processes.

    ``jax.devices()`` orders devices process-major, so a small mesh built
    from its prefix would land entirely on process 0 and the other hosts
    would hold no addressable shard of any band. Interleaving by process
    keeps every host inside the mesh whenever n >= process_count.
    """
    by_proc: dict[int, list] = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    order = []
    cols = max(len(v) for v in by_proc.values())
    for i in range(cols):
        for p in sorted(by_proc):
            if i < len(by_proc[p]):
                order.append(by_proc[p][i])
    if n > len(order):
        raise ValueError(f"need {n} devices, have {len(order)}")
    return order[:n]
