"""Low-rank (SVD) linear layer (reference admm.py:141-149 projection;
xcompression/transformer/SVDLinear.py layer).

Parameters: ``first_factor`` [r, I], ``last_factor`` [O, r].
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import SVDSpec
from ..ops.svd import truncated_svd


class SVDLinear(nn.Module):
    in_features: int
    out_features: int
    spec: SVDSpec
    use_bias: bool = True
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        r = self.spec.rank
        init = nn.initializers.xavier_uniform()
        self.first_factor = self.param("first_factor", init, (r, self.in_features))
        self.last_factor = self.param("last_factor", init, (self.out_features, r))
        self.bias = (self.param("bias", nn.initializers.zeros, (self.out_features,))
                     if self.use_bias else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        first, last = self.first_factor, self.last_factor
        if self.dtype is not None:
            x = x.astype(self.dtype)
            first, last = first.astype(self.dtype), last.astype(self.dtype)
        if self.mode == "reconstruct":
            w = jnp.einsum("or,ri->oi", last, first)
            y = jnp.einsum("...i,oi->...o", x, w)
        else:
            y = jnp.einsum("...i,ri->...r", x, first)
            y = jnp.einsum("...r,or->...o", y, last)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    @staticmethod
    def factorize_dense(dense_w: jax.Array, spec: SVDSpec,
                        dense_b: Optional[jax.Array] = None) -> dict:
        u, s, vt = truncated_svd(dense_w, spec.rank)
        rs = jnp.sqrt(s)
        params = {"last_factor": u * rs[None, :], "first_factor": rs[:, None] * vt}
        if dense_b is not None:
            params["bias"] = dense_b
        return params
