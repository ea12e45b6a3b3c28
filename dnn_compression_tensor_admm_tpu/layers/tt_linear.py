"""Tensor-Train linear layer (reference TTLinearM / TTLinearR).

The dense weight [out_features, in_features] is TT-factorized over
``out_shapes + in_shapes`` (reference TTLinear.py:29-43, 61-67).
Parameters: ``core_0 .. core_{d-1}`` with core_i [r_i, n_i, r_{i+1}].

mode='factorized' fuses the reference's sequential per-core activation
chain (TTLinear.py:75-93) into two matmuls split at the out/in boundary
rank m: ``y = (x @ B^T) @ A^T`` with A = merge(out cores) [O, m] and
B = merge(in cores) [m, I]. Identical math; the merges cost
O(sum r·n·r) << one activation matmul and XLA fuses them.
mode='reconstruct' builds W = A @ B (TTLinear.py:151-160).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import TTLinearSpec
from ..ops.contractions import merge_tt_matrix
from ..ops.ttd import ten2tt


class TTLinear(nn.Module):
    in_features: int
    out_features: int
    spec: TTLinearSpec
    use_bias: bool = True
    mode: str = "factorized"  # 'factorized' (ref M) | 'reconstruct' (ref R)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        spec = self.spec
        assert spec.out_features == self.out_features
        assert spec.in_features == self.in_features
        init = nn.initializers.xavier_uniform()
        self.cores = [
            self.param(f"core_{i}", init,
                       (spec.tt_ranks[i], spec.tt_shapes[i], spec.tt_ranks[i + 1]))
            for i in range(len(spec.tt_shapes))
        ]
        self.bias = (self.param("bias", nn.initializers.zeros, (self.out_features,))
                     if self.use_bias else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        oo = self.spec.out_order
        a = merge_tt_matrix(self.cores[:oo])   # [O, m]
        b = merge_tt_matrix(self.cores[oo:])   # [m, I]
        if self.dtype is not None:
            x, a, b = x.astype(self.dtype), a.astype(self.dtype), b.astype(self.dtype)
        if self.mode == "reconstruct":
            w = a @ b                           # [O, I]
            y = jnp.einsum("...i,oi->...o", x, w)
        else:
            y = jnp.einsum("...i,mi->...m", x, b)
            y = jnp.einsum("...m,om->...o", y, a)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    @staticmethod
    def factorize_dense(dense_w: jax.Array, spec: TTLinearSpec,
                        dense_b: Optional[jax.Array] = None,
                        method: str = "svd") -> dict:
        """Params from a dense [O, I] weight (reference TTLinear.py:61-67)."""
        cores = ten2tt(dense_w.reshape(spec.tt_shapes), spec.tt_shapes,
                       spec.tt_ranks, method=method)
        params = {f"core_{i}": c for i, c in enumerate(cores)}
        if dense_b is not None:
            params["bias"] = dense_b
        return params
