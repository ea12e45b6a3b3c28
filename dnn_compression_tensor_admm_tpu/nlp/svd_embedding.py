"""SVD-factorized embedding (xcompression/transformer/SVDEmbedding.py):
table = A [vocab, r] @ B [r, features]; lookup is a gather into A then a
small matmul — the factorization used for BERT word embeddings in the
reference's compressed models (compressed_modeling_tt.py:293-298)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .factorization import compute_rank_svd


class SVDEmbedding(nn.Module):
    num_embeddings: int
    features: int
    rank: Optional[int] = None
    compression_ratio: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        r = self.rank or compute_rank_svd(self.num_embeddings, self.features,
                                          self.compression_ratio or 4.0)
        init = nn.initializers.normal(stddev=0.02)
        self.first = self.param("first_factor", init, (self.num_embeddings, r))
        self.last = self.param("last_factor", init, (r, self.features))

    def __call__(self, ids: jax.Array) -> jax.Array:
        y = jnp.take(self.first, ids, axis=0) @ self.last
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y
