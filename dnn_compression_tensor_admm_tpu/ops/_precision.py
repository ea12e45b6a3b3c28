"""Full-precision matmul helper for numerics-critical decomposition code.

TPU matmuls default to bfloat16 inputs on the MXU; the factorization /
projection kernels must run at float32 accuracy (three-pass bf16 is used
automatically by HIGHEST precision), while the training forward/backward
path keeps the fast default.
"""

import jax
import jax.numpy as jnp


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
