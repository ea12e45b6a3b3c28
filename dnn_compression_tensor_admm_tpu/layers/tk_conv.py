"""Tucker-2 conv layer (covers the reference's TKConv2dC / TKConv2dM / TKConv2dR).

Parameters (Tucker-2 of the dense OIHW kernel over modes (O, I),
reference TKConv.py:78-84):

* ``first_factor`` — [r_in, I]   (mode-1 factor, transposed)
* ``core_kernel``  — HWIO [kh, kw, r_in, r_out]
* ``last_factor``  — [O, r_out]  (mode-0 factor)

mode='chain' is the C/M variants (1x1 -> core conv -> 1x1; on NHWC TPU
the 1x1 convs are plain feature matmuls, so C and M are literally the
same program — reference TKConv.py:93-98 vs 205-222). mode='reconstruct'
is the R variant (TKConv.py:313-325).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import TKSpec
from ..ops.tucker import partial_tucker
from .common import IntOrPair, _pair, conv2d


class TKConv2d(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: IntOrPair
    spec: TKSpec
    stride: IntOrPair = 1
    padding: IntOrPair = 0
    use_bias: bool = True
    mode: str = "chain"  # 'chain' (ref C/M) | 'reconstruct' (ref R)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kh, kw = _pair(self.kernel_size)
        spec = self.spec.clamped((self.out_channels, self.in_channels, kh, kw))
        r_out, r_in = spec.out_rank, spec.in_rank
        init = nn.initializers.xavier_uniform()
        self.first_factor = self.param("first_factor", init, (r_in, self.in_channels))
        self.core_kernel = self.param("core_kernel", init, (kh, kw, r_in, r_out))
        self.last_factor = self.param("last_factor", init, (self.out_channels, r_out))
        self.bias = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
                     if self.use_bias else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        first, core, last = self.first_factor, self.core_kernel, self.last_factor
        if self.dtype is not None:
            x = x.astype(self.dtype)
            first, core, last = (first.astype(self.dtype), core.astype(self.dtype),
                                 last.astype(self.dtype))
        if self.mode == "reconstruct":
            # w_hwio[h,w,i,o] = sum_{a,b} last[o,a] core[h,w,b,a] first[b,i]
            w = jnp.einsum("oa,hwba,bi->hwio", last, core, first)
            y = conv2d(x, w, self.stride, self.padding)
        else:
            y = jnp.einsum("bhwi,ri->bhwr", x, first)
            y = conv2d(y, core, self.stride, self.padding)
            y = jnp.einsum("bhwr,or->bhwo", y, last)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    @staticmethod
    def factorize_dense(dense_w_oihw: jax.Array, spec: TKSpec,
                        dense_b: Optional[jax.Array] = None,
                        n_iter: int = 10, method: str = "svd") -> dict:
        """Params from a dense OIHW kernel via partial Tucker
        (the `dense_w=` init protocol, reference TKConv.py:78-84)."""
        spec = spec.clamped(dense_w_oihw.shape)
        core, (last, first) = partial_tucker(
            dense_w_oihw, (spec.out_rank, spec.in_rank), modes=(0, 1),
            n_iter=n_iter, method=method)
        params = {
            "first_factor": first.T,                       # [r_in, I]
            "core_kernel": jnp.transpose(core, (2, 3, 1, 0)),  # HWIO
            "last_factor": last,                           # [O, r_out]
        }
        if dense_b is not None:
            params["bias"] = dense_b
        return params
