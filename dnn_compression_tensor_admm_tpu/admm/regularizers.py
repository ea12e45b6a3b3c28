"""Auxiliary regularizers for factorized fine-tuning.

`orthogonal_penalty` is the reference's double-soft-orthogonality loss
(orthogonal.py:9-20): for every first/last factor P it adds
``0.5 * rho * ||P P^T - I||^2`` (the reference name-matches 'first'/'last'
parameters of factorized layers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers.common import canonical_param_name


def orthogonal_penalty(params, rho) -> jax.Array:
    """Sum soft-orthogonality penalties over factor matrices.

    Matches parameters whose name ends with 'first_factor' or
    'last_factor' (2-D). For P [r, n] with r <= n the penalty is on the
    r x r Gram ``P P^T``; for tall matrices on ``P^T P``.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for keypath, arr in flat:
        path = tuple(getattr(k, "key", None) for k in keypath)
        name = canonical_param_name([p for p in path if p is not None])
        if not (name.endswith("first_factor") or name.endswith("last_factor")):
            continue
        if arr.ndim != 2:
            continue
        p = arr.astype(jnp.float32)
        if p.shape[0] > p.shape[1]:
            p = p.T
        gram = p @ p.T
        eye = jnp.eye(gram.shape[0], dtype=gram.dtype)
        total = total + jnp.sum((gram - eye) ** 2)
    return 0.5 * rho * total
