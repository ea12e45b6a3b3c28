"""L2 ADMM compression engine.

The augmented-Lagrangian loop of the reference (admm.py:15-149), re-built
TPU-first: ADMM state (Z, U) is a first-class, checkpointable pytree; the
per-epoch Z-projection runs entirely on device, with layers bucketed by
projection signature and batched via vmap (optionally sharded over a
`layer` mesh axis); the penalty is a fused tree reduction inside the
jitted train step.
"""

from .engine import (
    AdmmState, ProjectionProgram, build_program, admm_init, admm_update,
    admm_grad_add, admm_penalty, adjust_rho,
)
from .regularizers import orthogonal_penalty
