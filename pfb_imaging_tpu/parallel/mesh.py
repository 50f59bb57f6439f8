"""Mesh construction and cube shardings."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(band: int | None = None, row: int = 1, devices=None) -> Mesh:
    """Create a ('band', 'row') mesh.

    Args:
        band: size of the band axis (defaults to all devices / row).
        row: size of the row axis.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if band is None:
        band = n // row
    if band * row > n:
        raise ValueError(f"mesh {band}x{row} needs {band * row} devices, have {n}")
    dev = np.asarray(devices[: band * row]).reshape(band, row)
    return Mesh(dev, ("band", "row"))


def band_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (nband, ...) image cubes: band axis over the 'band' mesh axis."""
    return NamedSharding(mesh, P("band"))


def shard_cube(mesh: Mesh, cube):
    """Place an (nband, ...) array with its band axis sharded."""
    return jax.device_put(cube, band_sharding(mesh))
