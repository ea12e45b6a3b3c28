"""TT-factorized embedding with tensorized index lookup.

Re-design of xcompression/transformer/TTEmbedding.py:91-118 for TPU:
the vocab axis is factored into `input_tt_shape` and the embedding axis
into `output_tt_shape`; a token id is split mixed-radix over the input
shapes, each input core is gathered at its digit, and the gathered
slices chain-contract into a per-token [1, r_mid] vector which then hits
the merged output chain [r_mid, embed_dim]. All gathers are `jnp.take`
(one per input core, batched over tokens) and the reduce is a short
einsum chain — no host work, fully jit/vmap-safe.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.contractions import merge_tt_matrix
from ..ops.ttd import clamp_tt_ranks
from .factorization import compute_ranks_tt, split_to_factors


class TTEmbedding(nn.Module):
    """TT embedding table: [prod(input_shape), prod(output_shape)].

    `cores[i]` for the input shapes have layout [r_i, n_i, r_{i+1}];
    output cores continue the chain. Rank selection mirrors the reference:
    explicit `tt_ranks` or solved from `compression_ratio`.
    """
    num_embeddings: int
    features: int
    input_tt_shape: Optional[Tuple[int, ...]] = None
    output_tt_shape: Optional[Tuple[int, ...]] = None
    tt_ranks: Optional[Tuple[int, ...]] = None
    compression_ratio: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        in_shape = tuple(self.input_tt_shape or split_to_factors(self.num_embeddings, 3))
        out_shape = tuple(self.output_tt_shape or split_to_factors(self.features, 2))
        assert math.prod(in_shape) >= self.num_embeddings
        assert math.prod(out_shape) == self.features
        shapes = in_shape + out_shape
        if self.tt_ranks is not None:
            ranks = list(self.tt_ranks)
        else:
            ratio = self.compression_ratio or 4.0
            ranks = compute_ranks_tt(shapes, ratio)
        ranks = clamp_tt_ranks(shapes, ranks)
        self._in_shape = in_shape
        self._out_shape = out_shape
        self._ranks = tuple(ranks)
        init = nn.initializers.xavier_uniform()
        self.cores = [
            self.param(f"core_{i}", init, (ranks[i], shapes[i], ranks[i + 1]))
            for i in range(len(shapes))
        ]
        # mixed-radix place values for the input digits (TTEmbedding.py:91-97)
        radices = []
        acc = 1
        for s in reversed(in_shape[1:]):
            acc *= s
            radices.append(acc)
        self._radices = tuple(reversed(radices))  # len(in_shape) - 1

    def __call__(self, ids: jax.Array) -> jax.Array:
        flat = ids.reshape(-1)
        # mixed-radix digit split
        digits = []
        rem = flat
        for f in self._radices:
            digits.append(rem // f)
            rem = rem % f
        digits.append(rem)

        n_in = len(self._in_shape)
        # gather per input core: core_i[:, digit_i, :] -> [T, r_i, r_{i+1}]
        gathered = [jnp.take(self.cores[i], digits[i], axis=1).transpose(1, 0, 2)
                    for i in range(n_in)]
        red = gathered[0]
        for g in gathered[1:]:
            red = jnp.einsum("tab,tbc->tac", red, g)   # [T, 1, r_mid]
        red = red[:, 0, :]                              # [T, r_mid]
        out_mat = merge_tt_matrix(self.cores[n_in:])    # [features, r_mid]? or [r_mid, features]
        # output chain has r_first = r_mid (>1) and r_last = 1 -> [r_mid, features]
        y = red @ out_mat
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y.reshape(ids.shape + (self.features,))

    @staticmethod
    def num_params(in_shape, out_shape, ranks) -> int:
        shapes = tuple(in_shape) + tuple(out_shape)
        return sum(ranks[i] * shapes[i] * ranks[i + 1] for i in range(len(shapes)))
