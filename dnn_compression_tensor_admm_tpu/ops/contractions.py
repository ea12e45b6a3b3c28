"""Fused contraction helpers for factorized-layer forwards.

TPU-first re-expression of the reference's reshape/transpose-heavy
`torch.mm` chains (TTConv.py:130-153, TTLinear.py:75-93): instead of
contracting TT cores against *activations* one core at a time, the tiny
cores are first merged into one (or two) small matrices — negligible
FLOPs, done once per step and fused by XLA — and the activation touches
only large, MXU-shaped matmuls. The math is identical; only the
contraction schedule changes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ._precision import mm


def merge_tt_cores(cores: Sequence[jax.Array]) -> jax.Array:
    """Contract a chain of TT cores [r_i, n_i, r_{i+1}] into a 3-D tensor
    ``[r_first, prod(n_i), r_last]``."""
    t = cores[0]
    for core in cores[1:]:
        r = core.shape[0]
        t = mm(t.reshape(-1, r), core.reshape(r, -1))
    r_first = cores[0].shape[0]
    r_last = cores[-1].shape[-1]
    return t.reshape(r_first, -1, r_last)


def merge_tt_matrix(cores: Sequence[jax.Array]) -> jax.Array:
    """Merge a boundary-rank-1-free chain into a 2-D matrix.

    For an 'out' chain (r_first == 1): returns [prod(n), r_last].
    For an 'in' chain (r_last == 1): returns [r_first, prod(n)].
    For a full rank-1/rank-1 chain: [prod(n_out_side), ...] caller reshapes.
    """
    t = merge_tt_cores(cores)
    r0, n, r1 = t.shape
    if r0 == 1:
        return t.reshape(n, r1)
    if r1 == 1:
        return t.reshape(r0, n)
    raise ValueError(f"chain has open ranks on both ends: {t.shape}")
