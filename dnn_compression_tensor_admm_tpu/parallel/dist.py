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
    vals = jnp.asarray([float(metrics[k]) for k in sorted(metrics)])
    summed = jax.experimental.multihost_utils.process_allgather(vals)
    mean = np.mean(np.asarray(summed), axis=0)
    return {k: float(mean[i]) for i, k in enumerate(sorted(metrics))}
