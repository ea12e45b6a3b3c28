"""Fused batched dominant-left-subspace kernel (TT/SVD Z-step hot op).

One `pallas_call` computes, per layer of a [L, rows, cols] stack, the
top-`r` left singular subspace of the slice: Gram matrix + orthogonal
iteration with Newton-Schulz orthogonalization — all MXU matmuls held in
VMEM for the whole iteration (the XLA 'subspace' path lowers each
Cholesky-QR sweep to separate batched-cholesky / triangular-solve
kernels with HBM round-trips in between; see `ops/svd.py`).

This is the building block of the batched TT-SVD sweep
(`tt_project_batched` below), which accelerates the reference's
host-side sequential TT-SVD (ttd.py:10-31, called from the ADMM Z-step
at admm.py:91-111). The sweep's inter-step reshapes and the final TT
reconstruction stay in XLA (single batched matmuls, already
MXU-efficient); only the iterative subspace solve — many small
back-to-back matmuls XLA cannot fuse — lives in the kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tucker_kernel import _orth_iter, _VMEM_BUDGET_BYTES, _dot


def pallas_subspace_supported(shape, dtype=jnp.float32) -> bool:
    """True if a [L, rows, cols] stack fits the kernel's VMEM plan."""
    if len(shape) != 3:
        return False
    _, rows, cols = shape
    itemsize = jnp.dtype(dtype).itemsize
    x_bytes = 2 * rows * cols * itemsize      # double-buffered input block
    scratch = 4 * (rows * rows + rows * cols) * 4  # gram + f32 iterates
    return x_bytes + scratch < _VMEM_BUDGET_BYTES


def _subspace_kernel(t_ref, q_ref, *, r: int, iters: int, ns_iters: int):
    """Per-layer fused solve. t_ref: [1, rows, cols] -> q_ref: [1, rows, r]."""
    t = t_ref[0].astype(jnp.float32)
    g = _dot(t, t.T)
    q0 = jnp.eye(t.shape[0], r, dtype=jnp.float32)
    q = _orth_iter(g, q0, iters, ns_iters)
    q_ref[0] = q.astype(q_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r", "iters", "ns_iters",
                                             "interpret"))
def dominant_left_subspace_batched(t: jax.Array, r: int, *, iters: int = 8,
                                   ns_iters: int = 12,
                                   interpret: bool = False) -> jax.Array:
    """Batched top-`r` left singular subspace. t: [L, rows, cols] -> [L, rows, r].

    Full-rank requests return broadcast identities (projection exact, no
    solve needed) — mirrors `truncated_left_sv`'s static full-rank path.
    """
    l, rows, cols = t.shape
    r = min(r, rows, cols)
    if r == rows:
        eye = jnp.eye(rows, dtype=t.dtype)
        return jnp.broadcast_to(eye, (l, rows, rows))
    kernel = functools.partial(_subspace_kernel, r=r, iters=iters,
                               ns_iters=ns_iters)
    return pl.pallas_call(
        kernel,
        grid=(l,),
        in_specs=[pl.BlockSpec((1, rows, cols), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, r), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, rows, r), t.dtype),
        interpret=interpret,
    )(t)


def tt_supported_pallas(l: int, numel: int, tt_shapes: Sequence[int],
                        tt_ranks: Sequence[int], dtype=jnp.float32) -> bool:
    """True if every sweep step's unfolding fits the subspace kernel."""
    from ..ttd import clamp_tt_ranks
    shapes = list(tt_shapes)
    if math.prod(shapes) != numel:
        return False
    ranks = clamp_tt_ranks(shapes, tt_ranks)
    for i in range(len(shapes) - 1):
        rows = ranks[i] * shapes[i]
        cols = math.prod(shapes[i + 1:]) * ranks[-1]
        if ranks[i + 1] < min(rows, cols) and \
                not pallas_subspace_supported((l, rows, cols), dtype):
            return False
    return True


def tt_project_batched(x: jax.Array, tt_shapes: Sequence[int],
                       tt_ranks: Sequence[int], *, iters: int = 6,
                       interpret: bool = False) -> jax.Array:
    """Batched TT projection. x: [L, numel] -> Z [L, numel].

    TT-SVD sweep (reference ttd.py:10-31) batched over layers: per step,
    the fused Pallas subspace kernel finds the dominant left subspace of
    every layer's unfolding at once; the carried residual and the final
    TT reconstruction (tt2ten, ttd.py:34-43) are single batched XLA
    matmuls.
    """
    from ..ttd import clamp_tt_ranks
    l = x.shape[0]
    shapes = list(tt_shapes)
    ranks = clamp_tt_ranks(shapes, tt_ranks)
    d = len(shapes)
    t = x.reshape(l, ranks[0] * shapes[0], -1)
    cores = []
    for i in range(d - 1):
        rows = ranks[i] * shapes[i]
        t = t.reshape(l, rows, -1)
        u = dominant_left_subspace_batched(t, ranks[i + 1], iters=iters,
                                           interpret=interpret)
        cores.append(u)                              # [L, r_i*n_i, r_{i+1}]
        t = jnp.einsum("lrc,lrk->lkc", t, u,
                       precision=jax.lax.Precision.HIGHEST)  # residual
    cores.append(t)                                  # [L, r_{d-1}, n_{d-1}*r_d]
    rec = cores[0]
    for i in range(1, d):
        c = cores[i].reshape(l, ranks[i], -1)        # [L, r_i, n_i*r_{i+1}]
        rec = jnp.einsum("lmr,lrn->lmn", rec.reshape(l, -1, ranks[i]), c,
                         precision=jax.lax.Precision.HIGHEST)
    return rec.reshape(l, -1)
