"""Tensor-Train decomposition (TT-SVD) and reconstruction, on device.

Semantics match the reference's host-side implementation
(reference: ttd.py:10-43) with one deliberate change: the reference
mutates the rank list at runtime when a singular spectrum is shorter than
the requested rank (ttd.py:18-19). Runtime-dependent shapes are hostile
to XLA, so the clamp is resolved *statically* by `clamp_tt_ranks` — the
bound only depends on shapes, never on data — and every consumer
(layers, ADMM projections, configs) uses the clamped ranks.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ._precision import mm
from .svd import truncated_left_sv


def clamp_tt_ranks(tt_shapes: Sequence[int], tt_ranks: Sequence[int]) -> list[int]:
    """Statically clamp TT ranks to feasible values.

    Mirrors the data-independent part of the reference's runtime clamp
    (ttd.py:18-19): at sweep step i the unfolding is
    ``[r_i * n_i, prod(n_{i+1:})]`` so ``r_{i+1} <= min(r_i * n_i, prod rest)``.
    """
    shapes = list(tt_shapes)
    ranks = list(tt_ranks)
    d = len(shapes)
    if len(ranks) != d + 1:
        raise ValueError(f"need {d + 1} ranks for order-{d} TT, got {len(ranks)}")
    for i in range(d - 1):
        rows = ranks[i] * shapes[i]
        cols = math.prod(shapes[i + 1:]) * ranks[d]
        ranks[i + 1] = min(ranks[i + 1], rows, cols)
    return ranks


def ten2tt(x: jax.Array, tt_shapes: Sequence[int], tt_ranks: Sequence[int],
           method: str = "svd") -> list[jax.Array]:
    """TT-SVD sweep: factorize `x` into TT cores ``[r_i, n_i, r_{i+1}]``.

    Sequential truncated SVDs over unfoldings (reference: ttd.py:10-31).
    `method='gram'` swaps each SVD for a Gram-eigh subspace solve (fast
    path for the ADMM Z-step). Pass ranks through `clamp_tt_ranks` first
    or let this function do it (idempotent).
    """
    shapes = list(tt_shapes)
    ranks = clamp_tt_ranks(shapes, tt_ranks)
    d = len(shapes)
    t = jnp.reshape(x, (-1,))
    cores = []
    for i in range(d - 1):
        t = t.reshape(ranks[i] * shapes[i], -1)
        u = truncated_left_sv(t, ranks[i + 1], method=method)  # [rows, r_{i+1}]
        cores.append(u.reshape(ranks[i], shapes[i], ranks[i + 1]))
        # Residual carried to the next sweep step: s @ vt == u^T @ t for
        # orthonormal u spanning the dominant subspace.
        t = mm(u.T, t)
    cores.append(t.reshape(ranks[d - 1], shapes[d - 1], ranks[d]))
    return cores


def tt2ten(tt_cores: Sequence[jax.Array], tt_shapes: Sequence[int]) -> jax.Array:
    """Reconstruct the full tensor from TT cores (reference: ttd.py:34-43)."""
    t = tt_cores[0]
    for core in tt_cores[1:]:
        rank = core.shape[0]
        t = mm(t.reshape(-1, rank), core.reshape(rank, -1))
    return t.reshape(tuple(tt_shapes))


def tt_project(x: jax.Array, tt_shapes: Sequence[int], tt_ranks: Sequence[int],
               method: str = "svd") -> jax.Array:
    """Project `x` onto the set of tensors with TT ranks <= `tt_ranks`.

    ten2tt followed by tt2ten, reshaped back to `x`'s shape — the TT
    Z-step building block (reference: admm.py:91-111).
    """
    cores = ten2tt(x.reshape(tuple(tt_shapes)), tt_shapes, tt_ranks, method=method)
    return tt2ten(cores, tt_shapes).reshape(x.shape)
