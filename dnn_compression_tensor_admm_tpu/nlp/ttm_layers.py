"""TT-matrix (TTM) format layers: 4-D cores [r_i, m_i, n_i, r_{i+1}].

The TTM format factorizes W [prod(m), prod(n)] with *paired* input/output
modes per core (reference: xcompression/transformer/TTMLinear.py:37-40,
TTMEmbedding.py). On TPU the linear reconstructs W via a chain of tiny
matmuls, transposes the interleaved (m_i, n_i) axes apart, and runs one
dense matmul — XLA fuses the reconstruction; the embedding gathers each
core at the token's mixed-radix digit and chain-contracts per token.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class TTMLinear(nn.Module):
    """y = x @ W with W [in=prod(input_tt_shape), out=prod(output_tt_shape)]
    in TTM format (reference TTMLinear.forward, TTMLinear.py:61-72)."""
    input_tt_shape: Tuple[int, ...]
    output_tt_shape: Tuple[int, ...]
    tt_ranks: Tuple[int, ...]
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d = len(self.input_tt_shape)
        assert len(self.output_tt_shape) == d and len(self.tt_ranks) == d + 1
        init = nn.initializers.xavier_uniform()
        self.cores = [
            self.param(f"core_{i}", init,
                       (self.tt_ranks[i], self.input_tt_shape[i],
                        self.output_tt_shape[i], self.tt_ranks[i + 1]))
            for i in range(d)
        ]
        self.bias = (self.param("bias", nn.initializers.zeros,
                                (math.prod(self.output_tt_shape),))
                     if self.use_bias else None)

    def _weight(self) -> jax.Array:
        d = len(self.cores)
        res = self.cores[0]
        for i in range(1, d):
            res = res.reshape(-1, self.tt_ranks[i]) @ \
                self.cores[i].reshape(self.tt_ranks[i], -1)
        inter = []
        for m, n in zip(self.input_tt_shape, self.output_tt_shape):
            inter += [m, n]
        res = res.reshape(inter)
        perm = list(range(0, 2 * d, 2)) + list(range(1, 2 * d, 2))
        res = jnp.transpose(res, perm)
        return res.reshape(math.prod(self.input_tt_shape),
                           math.prod(self.output_tt_shape))

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self._weight()
        if self.dtype is not None:
            x, w = x.astype(self.dtype), w.astype(self.dtype)
        y = x @ w
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


class TTMEmbedding(nn.Module):
    """TTM embedding: vocab factored over input modes, feature dim over
    output modes; lookup = per-digit core gather + per-token chain
    contraction (reference TTMEmbedding.py:95-124)."""
    input_tt_shape: Tuple[int, ...]
    output_tt_shape: Tuple[int, ...]
    tt_ranks: Tuple[int, ...]
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        d = len(self.input_tt_shape)
        init = nn.initializers.xavier_uniform()
        self.cores = [
            self.param(f"core_{i}", init,
                       (self.tt_ranks[i], self.input_tt_shape[i],
                        self.output_tt_shape[i], self.tt_ranks[i + 1]))
            for i in range(d)
        ]
        radices = []
        acc = 1
        for s in reversed(self.input_tt_shape[1:]):
            acc *= s
            radices.append(acc)
        self._radices = tuple(reversed(radices))

    def __call__(self, ids: jax.Array) -> jax.Array:
        flat = ids.reshape(-1)
        digits = []
        rem = flat
        for f in self._radices:
            digits.append(rem // f)
            rem = rem % f
        digits.append(rem)
        # gather: core_i[:, digit, :, :] -> [T, r_i, n_i, r_{i+1}]
        res = None
        for i, core in enumerate(self.cores):
            g = jnp.take(core, digits[i], axis=1).transpose(1, 0, 2, 3)
            if res is None:
                res = g  # [T, r0, n0, r1]
            else:
                # [T, r0, N, r_i] x [T, r_i, n_i, r_{i+1}]
                res = jnp.einsum("tapb,tbqc->tapqc", res, g)
                t, a, p, q, c = res.shape
                res = res.reshape(t, a, p * q, c)
        # boundary ranks are 1
        y = res[:, 0, :, 0]
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y.reshape(ids.shape + (math.prod(self.output_tt_shape),))
