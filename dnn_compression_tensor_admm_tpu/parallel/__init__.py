"""Distribution: device mesh, sharding specs, multi-host metrics.

Replaces the reference's NCCL/DDP machinery (utils.py:216-236,
engines.py:152-159) with a `jax.sharding.Mesh` carrying two axes:

* ``data``  — batch (gradient) parallelism; grads reduce over ICI inside
  the one compiled train step (no user-level all-reduce code).
* ``layer`` — the Z-projection's vmap-bucketed layer stacks are sharded
  over this axis (the north-star design from BASELINE.json: data-parallel
  X-step, layer-sharded Z-step, all-gathered factors).
"""

from .mesh import make_mesh, batch_sharding, layer_sharding, replicated
