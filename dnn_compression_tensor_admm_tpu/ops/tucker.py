"""Partial Tucker (Tucker-2) decomposition via HOSVD init + HOOI sweeps.

On-device replacement for the reference's `tensorly.partial_tucker(...,
modes=[0, 1], init='svd')` calls (reference: admm.py:113-127,
TKConv.py:78-84, TKLinear.py:46-51). tensorly runs ALS (HOOI) to a
convergence tolerance; for XLA we run a *fixed* number of HOOI sweeps
inside a `lax.fori_loop` — HOOI converges geometrically and a handful of
sweeps reaches float32 parity with tensorly's result on conv-sized
tensors (verified in tests/test_tucker.py).

Conventions (matching tensorly): for `modes=(0, 1)` and `rank=(r0, r1)`
the result is ``core [r0, r1, *rest]`` and factors ``[U0 [n0, r0],
U1 [n1, r1]]`` with ``x ~= core x_0 U0 x_1 U1``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ._precision import mm
from .svd import truncated_left_sv


def _unfold(x: jax.Array, mode: int) -> jax.Array:
    return jnp.moveaxis(x, mode, 0).reshape(x.shape[mode], -1)


def _mode_dot_t(x: jax.Array, u: jax.Array, mode: int) -> jax.Array:
    """Contract mode `mode` of `x` with `u.T` (u: [n_mode, r])."""
    moved = jnp.moveaxis(x, mode, -1)
    out = mm(moved, u)  # [..., r]
    return jnp.moveaxis(out, -1, mode)


def partial_tucker(x: jax.Array, rank: Sequence[int], modes: Sequence[int] = (0, 1),
                   n_iter: int = 10, method: str = "svd"):
    """Tucker decomposition over a subset of modes (HOSVD + HOOI).

    Returns ``(core, factors)`` with factors ordered like `modes`.
    `method` selects the subspace solver per mode ('svd' exact,
    'gram' Gram-eigh fast path).
    """
    modes = list(modes)
    ranks = [min(r, x.shape[m]) for r, m in zip(rank, modes)]

    def left_sv_padded(a, r):
        # The HOOI sweep unfolds the OTHER-modes-contracted tensor, whose
        # width can fall below the requested rank (e.g. out_rank >
        # in_rank*kh*kw on small/1x1 kernels). The extra basis columns are
        # then zero-padded: u @ u.T is unchanged, and factor shapes stay
        # at the spec's ranks (static across fori_loop iterations, and
        # parity with the reference's stored factor shapes).
        eff = min(r, a.shape[0], a.shape[1])
        u = truncated_left_sv(a, eff, method=method)
        if u.shape[1] < r:
            u = jnp.pad(u, ((0, 0), (0, r - u.shape[1])))
        return u

    # --- HOSVD init: dominant left subspace of each mode unfolding.
    factors = [left_sv_padded(_unfold(x, m), r)
               for m, r in zip(modes, ranks)]

    # --- HOOI sweeps (fixed count, jit-friendly: factor shapes are static).
    def sweep(_, factors):
        factors = list(factors)
        for k, m in enumerate(modes):
            y = x
            for j, mj in enumerate(modes):
                if j != k:
                    y = _mode_dot_t(y, factors[j], mj)
            factors[k] = left_sv_padded(_unfold(y, m), ranks[k])
        return tuple(factors)

    if n_iter > 0:
        factors = list(jax.lax.fori_loop(0, n_iter, sweep, tuple(factors)))

    core = x
    for u, m in zip(factors, modes):
        core = _mode_dot_t(core, u, m)
    return core, factors


def tucker_to_tensor(core: jax.Array, factors: Sequence[jax.Array],
                     modes: Sequence[int] = (0, 1)) -> jax.Array:
    """Reconstruct from a partial Tucker decomposition."""
    x = core
    for u, m in zip(factors, modes):
        moved = jnp.moveaxis(x, m, -1)
        x = jnp.moveaxis(mm(moved, u.T), -1, m)
    return x


def tucker2_project(x: jax.Array, out_rank: int, in_rank: int,
                    n_iter: int = 10, method: str = "svd") -> jax.Array:
    """Project `x` onto tensors with mode-0/mode-1 multilinear ranks.

    The Tucker-2 Z-step building block (reference: admm.py:113-127).
    """
    core, factors = partial_tucker(x, (out_rank, in_rank), modes=(0, 1),
                                   n_iter=n_iter, method=method)
    return tucker_to_tensor(core, factors, modes=(0, 1))
