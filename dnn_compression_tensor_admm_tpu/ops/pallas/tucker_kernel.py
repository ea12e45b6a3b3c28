"""Fused Tucker-2 subspace-iteration kernel (the ADMM Z-step hot op).

One `pallas_call` performs, per layer of a vmap bucket, the ENTIRE
HOSVD-init + HOOI-sweep factor solve in VMEM: Gram matrices, orthogonal
iteration, and Newton-Schulz orthogonalization are all MXU matmuls —
no Cholesky, no triangular solves, no HBM round-trips between the
iterations (the XLA path lowers each `cholqr` sweep to separate
batched-cholesky / triangular-solve kernels with HBM traffic in
between; see `ops/svd.py`).

Math (per layer): given x viewed as K slices X_k = x[k] of shape
[O, I] (K = kh*kw for convs, 1 for linears):

* mode-0 Gram    G0 = sum_k X_k X_k^T          (unfold0 @ unfold0^T)
* mode-1 Gram    G1 = sum_k X_k^T X_k
* U0 = orth-iter(G0, r0), U1 = orth-iter(G1, r1)        [HOSVD init]
* HOOI sweep (warm-started):
    G0' = sum_k (X_k U1)(X_k U1)^T ; U0 <- orth-iter(G0', r0)
    G1' = sum_k (U0^T X_k)^T (U0^T X_k) ; U1 <- orth-iter(G1', r1)
* reconstruction Z_k = U0 (U0^T X_k U1) U1^T happens OUTSIDE the
  kernel as one batched XLA matmul chain (MXU-efficient one-shot).

Orthogonalization: Q <- Y (Y^T Y)^{-1/2} with the inverse square root
by Newton-Schulz iteration on S/tr(S) (eigenvalues in (0, 1] after a
small ridge => NS converges). This replaces Cholesky-QR with pure
matmuls, the TPU-native choice.

Reference semantics being accelerated: tensorly.partial_tucker(...,
modes=[0,1]) inside the reference's ADMM update (admm.py:113-127),
which runs on host CPU there.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget gate: x block is double-buffered by the grid pipeline.
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32 MXU matmul. `precision=HIGHEST` is load-bearing: the MXU
    truncates f32 inputs to bf16 at DEFAULT precision, which is enough to
    (a) break exactness on full-rank (identity-factor) layers and (b)
    destabilize the Newton-Schulz inverse-sqrt iteration on
    ill-conditioned Gram matrices."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def pallas_tk_supported(shape: Tuple[int, ...], dtype=jnp.float32) -> bool:
    """True if a [L, K, O, I] bucket fits the kernel's VMEM plan."""
    if len(shape) != 4:
        return False
    _, k, o, i = shape
    itemsize = jnp.dtype(dtype).itemsize
    x_bytes = 2 * k * o * i * itemsize  # double-buffered input block
    scratch = 4 * (o * o + i * i) * 4   # grams + iterates (f32)
    return x_bytes + scratch < _VMEM_BUDGET_BYTES


def _ns_inv_sqrt(s: jax.Array, iters: int) -> jax.Array:
    """Newton-Schulz iteration for S^{-1/2}, S symmetric PSD [r, r].

    Returns approximately S^{-1/2} (exact on the well-conditioned
    dominant eigenspace; near-null directions are damped by the ridge).
    """
    r = s.shape[0]
    eye = jnp.eye(r, dtype=jnp.float32)
    c = jnp.trace(s) + 1e-30
    t = s / c + 1e-6 * eye
    y, z = t, eye
    for _ in range(iters):
        w = 0.5 * (3.0 * eye - _dot(z, y))
        y = _dot(y, w)
        z = _dot(w, z)
    return z * jax.lax.rsqrt(c)


def _orth_iter(g: jax.Array, q: jax.Array, iters: int, ns_iters: int) -> jax.Array:
    """Orthogonal (subspace) iteration: Q <- orth(G Q), `iters` times."""
    for _ in range(iters):
        y = _dot(g, q)
        s = _dot(y.T, y)
        q = _dot(y, _ns_inv_sqrt(s, ns_iters))
    return q


def _tk_factor_kernel(x_ref, u0_ref, u1_ref, *, k: int, r0: int, r1: int,
                      init_iters: int, sweeps: int, sweep_iters: int,
                      ns_iters: int):
    """Per-layer fused factor solve. x_ref: [1, K, O, I]."""
    o = x_ref.shape[2]
    i = x_ref.shape[3]
    xs = [x_ref[0, kk].astype(jnp.float32) for kk in range(k)]  # K x [O, I]

    def gram0(ms):  # sum_k M_k M_k^T
        acc = jnp.zeros((ms[0].shape[0], ms[0].shape[0]), jnp.float32)
        for m in ms:
            acc = acc + _dot(m, m.T)
        return acc

    def gram1(ms):  # sum_k M_k^T M_k
        acc = jnp.zeros((ms[0].shape[1], ms[0].shape[1]), jnp.float32)
        for m in ms:
            acc = acc + _dot(m.T, m)
        return acc

    # --- HOSVD init
    if r0 < o:
        u0 = _orth_iter(gram0(xs), jnp.eye(o, r0, dtype=jnp.float32),
                        init_iters, ns_iters)
    else:
        u0 = jnp.eye(o, dtype=jnp.float32)
    if r1 < i:
        u1 = _orth_iter(gram1(xs), jnp.eye(i, r1, dtype=jnp.float32),
                        init_iters, ns_iters)
    else:
        u1 = jnp.eye(i, dtype=jnp.float32)

    # --- HOOI sweeps, warm-started from the previous factors
    for _ in range(sweeps):
        if r0 < o:
            m0 = [_dot(xk, u1) for xk in xs]
            u0 = _orth_iter(gram0(m0), u0, sweep_iters, ns_iters)
        if r1 < i:
            m1 = [_dot(u0.T, xk) for xk in xs]
            u1 = _orth_iter(gram1(m1), u1, sweep_iters, ns_iters)

    u0_ref[0] = u0.astype(u0_ref.dtype)
    u1_ref[0] = u1.astype(u1_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "r0", "r1", "init_iters", "sweeps", "sweep_iters", "ns_iters", "interpret"))
def tucker2_factors_batched(x: jax.Array, r0: int, r1: int, *,
                            init_iters: int = 8, sweeps: int = 2,
                            sweep_iters: int = 3, ns_iters: int = 12,
                            interpret: bool = False):
    """Batched Tucker-2 factor solve. x: [L, K, O, I] -> (U0 [L,O,r0], U1 [L,I,r1])."""
    l, k, o, i = x.shape
    r0 = min(r0, o)
    r1 = min(r1, i)
    kernel = functools.partial(
        _tk_factor_kernel, k=k, r0=r0, r1=r1, init_iters=init_iters,
        sweeps=sweeps, sweep_iters=sweep_iters, ns_iters=ns_iters)
    u0, u1 = pl.pallas_call(
        kernel,
        grid=(l,),
        in_specs=[pl.BlockSpec((1, k, o, i), lambda j: (j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, o, r0), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i, r1), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((l, o, r0), x.dtype),
            jax.ShapeDtypeStruct((l, i, r1), x.dtype),
        ),
        # Mosaic stack use runs ~2x the analytic estimate on large blocks
        # (measured on resnet50 TT unfoldings); raise the 16 MB default so
        # the conservative support gates are what bind, not the compiler.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return u0, u1


def tucker2_project_batched(x: jax.Array, r0: int, r1: int, *,
                            interpret: bool = False, **solver_kw) -> jax.Array:
    """Batched Tucker-2 projection. x: [L, K, O, I] -> Z same shape.

    Factors from the fused Pallas solve; reconstruction as one XLA
    batched matmul chain: Z_k = U0 (U0^T X_k U1) U1^T.
    """
    u0, u1 = tucker2_factors_batched(x, r0, r1, interpret=interpret, **solver_kw)
    # core: [L, K, r0, r1]
    xf = x.astype(jnp.float32)
    u0f = u0.astype(jnp.float32)
    u1f = u1.astype(jnp.float32)
    core = jnp.einsum("lkoi,lor,lis->lkrs", xf, u0f, u1f, optimize=True,
                      precision=jax.lax.Precision.HIGHEST)
    z = jnp.einsum("lkrs,lor,lis->lkoi", core, u0f, u1f, optimize=True,
                   precision=jax.lax.Precision.HIGHEST)
    return z.astype(x.dtype)
