"""Low-rank (SVD) conv layer for 1x1 convs (reference SVDConv2dR/C/M).

The reference only instantiates these on 1x1 kernels (it squeezes the
spatial dims, SVDConv.py:89-96; MobileNetV2 pointwise convs and ResNet
downsample 1x1s, resnet_inet_tt.py:44-53). Parameters:

* ``first_factor`` — [r, I]
* ``last_factor``  — [O, r]

mode='chain' (ref C/M: two stacked 1x1 convs == two feature matmuls);
mode='reconstruct' (ref R: rebuild [O, I] then one matmul).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import SVDSpec
from ..ops.svd import truncated_svd
from .common import IntOrPair, _pair


class SVDConv2d(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: IntOrPair = 1
    spec: SVDSpec = None
    stride: IntOrPair = 1
    padding: IntOrPair = 0
    use_bias: bool = True
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kh, kw = _pair(self.kernel_size)
        if (kh, kw) != (1, 1):
            raise ValueError("SVDConv2d supports 1x1 kernels (as in the reference)")
        r = self.spec.rank
        init = nn.initializers.xavier_uniform()
        self.first_factor = self.param("first_factor", init, (r, self.in_channels))
        self.last_factor = self.param("last_factor", init, (self.out_channels, r))
        self.bias = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
                     if self.use_bias else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        first, last = self.first_factor, self.last_factor
        if self.dtype is not None:
            x = x.astype(self.dtype)
            first, last = first.astype(self.dtype), last.astype(self.dtype)
        sh, sw = _pair(self.stride)
        if (sh, sw) != (1, 1):
            x = x[:, ::sh, ::sw, :]  # 1x1 conv with stride == subsample
        if self.mode == "reconstruct":
            w = jnp.einsum("or,ri->oi", last, first)
            y = jnp.einsum("bhwi,oi->bhwo", x, w)
        else:
            y = jnp.einsum("bhwi,ri->bhwr", x, first)
            y = jnp.einsum("bhwr,or->bhwo", y, last)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    @staticmethod
    def factorize_dense(dense_w_oihw: jax.Array, spec: SVDSpec,
                        dense_b: Optional[jax.Array] = None) -> dict:
        """Truncated-SVD init from a dense [O, I, 1, 1] kernel with the
        singular values split sqrt-balanced across both factors
        (reference folds full `s` into one side, SVDConv.py:89-96 —
        function-space equivalent, better conditioned for fine-tuning)."""
        o, i = dense_w_oihw.shape[0], dense_w_oihw.shape[1]
        u, s, vt = truncated_svd(dense_w_oihw.reshape(o, i), spec.rank)
        rs = jnp.sqrt(s)
        params = {"last_factor": u * rs[None, :], "first_factor": rs[:, None] * vt}
        if dense_b is not None:
            params["bias"] = dense_b
        return params
