"""Tucker-2 linear layer (reference TKLinearM / TKLinearR).

Parameters (partial Tucker of [O, I] over both modes,
reference TKLinear.py:46-51):

* ``first_factor`` — [r_in, I]
* ``core``         — [r_out, r_in]
* ``last_factor``  — [O, r_out]

mode='chain' = three stacked matmuls (TKLinear.py:66-71);
mode='reconstruct' rebuilds W (TKLinear.py:117-122).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import TKSpec
from ..ops.tucker import partial_tucker


class TKLinear(nn.Module):
    in_features: int
    out_features: int
    spec: TKSpec
    use_bias: bool = True
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        spec = self.spec.clamped((self.out_features, self.in_features))
        r_out, r_in = spec.out_rank, spec.in_rank
        init = nn.initializers.xavier_uniform()
        self.first_factor = self.param("first_factor", init, (r_in, self.in_features))
        self.core = self.param("core", init, (r_out, r_in))
        self.last_factor = self.param("last_factor", init, (self.out_features, r_out))
        self.bias = (self.param("bias", nn.initializers.zeros, (self.out_features,))
                     if self.use_bias else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        first, core, last = self.first_factor, self.core, self.last_factor
        if self.dtype is not None:
            x = x.astype(self.dtype)
            first, core, last = (first.astype(self.dtype), core.astype(self.dtype),
                                 last.astype(self.dtype))
        if self.mode == "reconstruct":
            w = jnp.einsum("oa,ab,bi->oi", last, core, first)
            y = jnp.einsum("...i,oi->...o", x, w)
        else:
            y = jnp.einsum("...i,bi->...b", x, first)
            y = jnp.einsum("...b,ab->...a", y, core)
            y = jnp.einsum("...a,oa->...o", y, last)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    @staticmethod
    def factorize_dense(dense_w: jax.Array, spec: TKSpec,
                        dense_b: Optional[jax.Array] = None,
                        n_iter: int = 10, method: str = "svd") -> dict:
        spec = spec.clamped(dense_w.shape)
        core, (last, first) = partial_tucker(
            dense_w, (spec.out_rank, spec.in_rank), modes=(0, 1),
            n_iter=n_iter, method=method)
        params = {"first_factor": first.T, "core": core, "last_factor": last}
        if dense_b is not None:
            params["bias"] = dense_b
        return params
