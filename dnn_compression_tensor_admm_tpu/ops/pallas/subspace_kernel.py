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

from .tucker_kernel import _orth_iter, _ns_inv_sqrt, _VMEM_BUDGET_BYTES, _dot


# Mosaic's stack allocator can hold ~2x the analytic working set live
# across unrolled iterations; raise the scoped-vmem ceiling well past the
# 16 MB default so the gate's estimate (with margin) is what binds.
_SCOPED_VMEM_LIMIT = 64 * 1024 * 1024


def pallas_subspace_supported(shape, dtype=jnp.float32) -> bool:
    """True if a [L, rows, cols] stack fits the kernel's VMEM plan.

    The kernel iterates on the Gram matrix of the SMALLER side (see
    `_subspace_kernel`), so the estimate uses min(rows, cols)^2 — a tall
    [720, 128] unfolding costs a 128x128 gram, not 720x720.
    """
    if len(shape) != 3:
        return False
    _, rows, cols = shape
    m = min(rows, cols)
    itemsize = jnp.dtype(dtype).itemsize
    x_bytes = 2 * rows * cols * itemsize      # double-buffered input block
    scratch = 4 * (m * m + rows * cols) * 4   # gram + f32 iterates
    # 2x safety factor vs the raised scoped limit (measured: Mosaic's
    # actual stack use ran ~2x the analytic estimate on resnet50 shapes).
    return x_bytes + 2 * scratch < min(_VMEM_BUDGET_BYTES, _SCOPED_VMEM_LIMIT // 2)


def _subspace_kernel(t_ref, q_ref, *, r: int, iters: int, ns_iters: int):
    """Per-layer fused solve. t_ref: [1, rows, cols] -> q_ref: [1, rows, r].

    Iterates on the Gram of the smaller side: for tall unfoldings
    (rows > cols) the right Gram t^T t is [cols, cols]; its dominant
    subspace V lifts to the left subspace via orth(t V). This keeps the
    iteration working set at min(rows,cols)^2 instead of rows^2 —
    resnet50's [720, 128] unfolding otherwise blows the Mosaic stack.
    """
    t = t_ref[0].astype(jnp.float32)
    rows, cols = t.shape
    if rows <= cols:
        g = _dot(t, t.T)
        q0 = jnp.eye(rows, r, dtype=jnp.float32)
        q = _orth_iter(g, q0, iters, ns_iters)
    else:
        g = _dot(t.T, t)
        v0 = jnp.eye(cols, r, dtype=jnp.float32)
        v = _orth_iter(g, v0, iters, ns_iters)
        y = _dot(t, v)                      # [rows, r] spans top-left subspace
        s = _dot(y.T, y)                    # one NS orthonormalization of y
        q = _dot(y, _ns_inv_sqrt(s, ns_iters))
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
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_LIMIT),
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
