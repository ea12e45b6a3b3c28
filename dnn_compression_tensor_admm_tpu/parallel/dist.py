"""Multi-host bootstrap + cross-process metric reduction.

Replaces the reference's NCCL/SLURM rendezvous (utils.py:216-236) and
`SmoothedValue.synchronize_between_processes` (utils.py:36-47).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX. Reads env (SLURM or explicit vars) like
    the reference's init_distributed_mode (utils.py:217-227) when args are
    absent; single-process no-op otherwise. Returns topology info."""
    if coordinator is None:
        coordinator = os.environ.get("JAX_COORDINATOR")
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
    if coordinator and num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_index=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_reduce_metrics(metrics: dict, mesh=None) -> dict:
    """Global mean of scalar metrics across all devices/processes (the
    reference's metric all-reduce, utils.py:40-47). Inside a jitted
    sharded step this is free (values already global); this helper covers
    host-side aggregation of per-process numpy scalars."""
    if jax.process_count() == 1:
        return metrics
    return gather_mean_metrics(metrics)


def gather_mean_metrics(metrics: dict) -> dict:
    """Cross-process mean via `process_allgather` (works single-process
    too: the gather axis then has length 1). Split out of
    `all_reduce_metrics` so the gather path is testable without a real
    multi-host launch."""
    from jax.experimental import multihost_utils
    vals = jnp.asarray([float(metrics[k]) for k in sorted(metrics)])
    gathered = np.asarray(multihost_utils.process_allgather(vals))
    if gathered.ndim == 1:  # single-process allgather returns the row itself
        gathered = gathered[None]
    mean = gathered.mean(axis=0)
    return {k: float(mean[i]) for i, k in enumerate(sorted(metrics))}


def shard_dataset_global(x: np.ndarray, y: np.ndarray, mesh) -> tuple:
    """Build globally-sharded dataset arrays over the mesh 'data' axis.

    The reference gives each DDP rank a DistributedSampler slice of one
    shared dataset (datasets.py:87-100). Here the HBM-resident dataset is
    a single global array sharded over 'data': every process passes its
    contiguous per-process slice and `jax.make_array_from_process_local_data`
    assembles the global view (rows not divisible by the shard count are
    dropped, like drop_last). Under a single process this is equivalent to
    a sharded device_put, so it is exercised by the virtual-mesh tests.
    """
    import math
    from jax.sharding import NamedSharding, PartitionSpec as P
    n_data = mesh.shape["data"]
    pc, pi = jax.process_count(), jax.process_index()
    # rows must split evenly across BOTH the data shards and the
    # contributing processes (n_data and process_count need not divide
    # each other, e.g. 2 hosts with --layer-shards 8 -> n_data=1)
    unit = math.lcm(n_data, pc)
    n = (x.shape[0] // unit) * unit
    x, y = x[:n], y[:n]
    sx = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    sy = NamedSharding(mesh, P("data"))
    per = n // pc
    lo, hi = pi * per, (pi + 1) * per
    gx = jax.make_array_from_process_local_data(sx, np.ascontiguousarray(x[lo:hi]),
                                                global_shape=x.shape)
    gy = jax.make_array_from_process_local_data(sy, np.ascontiguousarray(y[lo:hi]),
                                                global_shape=y.shape)
    return gx, gy


def make_global_batch_fn(mesh, batch_size: int):
    """Assembler for the STREAMING input path on a mesh: each process's
    loader yields its local slice of the global batch, and
    `jax.make_array_from_process_local_data` builds the globally-sharded
    batch over the mesh 'data' axis (the role DistributedSampler +
    DataLoader play in the reference, datasets.py:87-100). Single-process
    it degenerates to a sharded device_put, so the virtual 8-device mesh
    exercises the identical code path (tests/test_dist.py)."""
    import math
    from jax.sharding import NamedSharding, PartitionSpec as P
    pc = jax.process_count()
    n_data = mesh.shape["data"]
    # the global batch must divide over the 'data' axis AND assemble from
    # equal per-process slices (divisible by both, i.e. by the lcm —
    # max() alone passes e.g. batch 6 with pc=6, n_data=4)
    if batch_size % math.lcm(n_data, pc) != 0:
        raise ValueError(
            f"--batch-size {batch_size} must be divisible by "
            f"lcm(data axis {n_data}, processes {pc}) = "
            f"{math.lcm(n_data, pc)}")
    sy = NamedSharding(mesh, P("data"))
    sx_cache = {}

    def to_global(xb: np.ndarray, yb: np.ndarray):
        xb = np.ascontiguousarray(xb)
        yb = np.ascontiguousarray(yb)
        sx = sx_cache.get(xb.ndim)
        if sx is None:
            sx = sx_cache[xb.ndim] = NamedSharding(
                mesh, P("data", *([None] * (xb.ndim - 1))))
        gx = jax.make_array_from_process_local_data(
            sx, xb, global_shape=(xb.shape[0] * pc,) + xb.shape[1:])
        gy = jax.make_array_from_process_local_data(
            sy, yb, global_shape=(yb.shape[0] * pc,))
        return gx, gy

    return to_global


def partition_shard_paths(paths, process_index: int, process_count: int,
                          seed: int = 0):
    """Split DCTA shards across processes (DistributedSampler role).

    Returns (paths, seed, stride, offset) for NativeLoader. With at least
    one file per process, files are split round-robin (stride 1). With
    fewer files than processes, every process opens all files and the
    loader serves the DISJOINT sample rows process_index::process_count
    of the global index (native/dataloader.cc strided partition) —
    independent shuffles alone would give overlapping global batches."""
    if process_count <= 1:
        return list(paths), seed, 1, 0
    if len(paths) < process_count:
        return list(paths), seed, process_count, process_index
    return list(paths)[process_index::process_count], seed, 1, 0


def replicate_state_global(state, mesh):
    """Turn identical process-local TrainState arrays into replicated
    global arrays over `mesh`, so a jitted step over a multi-process mesh
    accepts them (jit over non-addressable devices rejects process-local
    inputs). Single-process it is a replicated device_put (testable on
    the virtual mesh)."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    specs = jax.tree.map(lambda _: P(), state)
    return multihost_utils.host_local_array_to_global_array(state, mesh, specs)
