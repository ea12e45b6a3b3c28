"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_layer: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """2-D mesh with ('data', 'layer') axes.

    Single-host: `devices` are the local chips. Multi-host: call
    `jax.distributed.initialize()` first and pass `jax.devices()`;
    lay 'data' along the slower (DCN) direction and 'layer' along ICI so
    the factor all-gathers after the Z-step ride the fast links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_layer
    arr = np.asarray(devices[: n_data * n_layer]).reshape(n_data, n_layer)
    return Mesh(arr, ("data", "layer"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def layer_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("layer", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x, mesh: Optional[Mesh]):
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))


def constrain_layer_stack(x, mesh: Optional[Mesh]):
    """Shard a [L, ...] stacked bucket over the 'layer' axis (pads when L
    is not divisible — GSPMD handles uneven shards)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, layer_sharding(mesh, x.ndim))


def constrain_replicated(x, mesh: Optional[Mesh]):
    """Force x back to replicated layout (one collective)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, replicated(mesh))
