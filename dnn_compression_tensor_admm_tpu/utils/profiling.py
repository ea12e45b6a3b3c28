"""Tracing / profiling utilities (SURVEY.md §5: the reference has only
wall-clock meters, utils.py:115-159; here: real device traces + per-phase
counters).

* `trace(logdir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace of everything inside.
* `PhaseTimer` — cheap named wall-clock accounting for the ADMM phases
  (X-step scan / Z-step / U-step / eval), printed as one JSON line.
* `device_sync(tree)` — a barrier that actually drains the device queue.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np


def device_sync(tree=None):
    """Drain the device execution queue before reading the wall clock.

    `jax.block_until_ready` does NOT reliably wait for device completion
    under the axon PJRT plugin (measured: a 67 s program "blocks" in
    5.7 ms; a host fetch of the same output takes the full 67 s). A
    host transfer is the only dependable barrier, so sync by fetching
    one scalar derived from the pytree (or a fresh trivial computation,
    which the in-order execution stream serializes behind all prior
    enqueued work)."""
    if tree is not None:
        leaves = [x for x in jax.tree.leaves(tree)
                  if isinstance(x, jax.Array)]
        if leaves:
            np.asarray(jax.device_get(leaves[0].ravel()[:1] if leaves[0].ndim
                                      else leaves[0]))
            return tree
    np.asarray(jax.jit(lambda: jax.numpy.zeros(()))())
    return tree


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_ms": round(1000 * self.totals[name] /
                                        max(1, self.counts[name]), 3)}
                for name in self.totals}

    def log(self, print_fn=print):
        print_fn(json.dumps({"phase_timings": self.summary()}))
