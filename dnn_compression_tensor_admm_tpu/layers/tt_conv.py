"""Tensor-Train conv layer (covers the reference's TTConv2dM and TTConv2dR).

Weight tensorization: the dense kernel [O, I, kh, kw] is viewed as
``[O, kh*kw, I]`` and TT-factorized over shapes
``out_shapes + (kh*kw,) + in_shapes`` (reference: TTConv.py:96-109,
admm.py:91-101). Parameters:

* ``out_core_i`` — [r_i, out_shape_i, r_{i+1}], r_0 = 1
* ``core_kernel`` — HWIO [kh, kw, r_in0, r_outL] (the middle TT core,
  reshaped into a conv kernel; reference stores OIHW, TTConv.py:83)
* ``in_core_i`` — [r_i, in_shape_i, r_{i+1}], r_last = 1

mode='factorized' re-fuses the reference's per-core activation chain
(TTConv.py:130-153) into: one [BHW, I]x[I, r_in0] matmul (merged in
chain), the small conv, one [BHW, r_outL]x[r_outL, O] matmul (merged out
chain). mode='reconstruct' rebuilds the dense kernel (TTConv.py:313-333)
— both modes share the same parameters (unlike the reference, whose R
variant uses a different middle-core layout, TTConv.py:286-288; sharing
one layout lets a checkpoint switch modes freely).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import TTConvSpec
from ..ops.contractions import merge_tt_matrix
from ..ops.ttd import ten2tt
from .common import IntOrPair, _pair, conv2d


class TTConv2d(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: IntOrPair
    spec: TTConvSpec
    stride: IntOrPair = 1
    padding: IntOrPair = 0
    use_bias: bool = True
    mode: str = "factorized"  # 'factorized' (ref M) | 'reconstruct' (ref R)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        spec = self.spec
        kh, kw = _pair(self.kernel_size)
        assert spec.out_channels == self.out_channels, (spec, self.out_channels)
        assert spec.in_channels == self.in_channels
        assert spec.filter_dim == kh * kw
        init = nn.initializers.xavier_uniform()
        self.out_cores = [
            self.param(f"out_core_{i}", init,
                       (spec.out_ranks[i], spec.out_shapes[i], spec.out_ranks[i + 1]))
            for i in range(len(spec.out_shapes))
        ]
        r_in0 = spec.in_ranks[0]
        r_outL = spec.out_ranks[-1]
        self.core_kernel = self.param("core_kernel", init, (kh, kw, r_in0, r_outL))
        self.in_cores = [
            self.param(f"in_core_{i}", init,
                       (spec.in_ranks[i], spec.in_shapes[i], spec.in_ranks[i + 1]))
            for i in range(len(spec.in_shapes))
        ]
        self.bias = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
                     if self.use_bias else None)

    def _cast(self, *arrs):
        if self.dtype is None:
            return arrs
        return tuple(a.astype(self.dtype) for a in arrs)

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.mode == "reconstruct":
            return self._forward_reconstruct(x)
        return self._forward_factorized(x)

    def _forward_factorized(self, x: jax.Array) -> jax.Array:
        spec = self.spec
        # merged in-chain: [r_in0, I]; merged out-chain: [O, r_outL]
        b_in = merge_tt_matrix(self.in_cores) if self.in_cores else None
        a_out = merge_tt_matrix(self.out_cores)
        core, = (self.core_kernel,)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            core, a_out = (core.astype(self.dtype), a_out.astype(self.dtype))
            b_in = None if b_in is None else b_in.astype(self.dtype)
        y = x if b_in is None else jnp.einsum("bhwi,ri->bhwr", x, b_in)
        y = conv2d(y, core, self.stride, self.padding)
        y = jnp.einsum("bhwr,or->bhwo", y, a_out)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    def _forward_reconstruct(self, x: jax.Array) -> jax.Array:
        spec = self.spec
        kh, kw = _pair(self.kernel_size)
        a_out = merge_tt_matrix(self.out_cores)                     # [O, r_a]
        core = self.core_kernel.reshape(kh * kw, spec.in_ranks[0], spec.out_ranks[-1])
        # w[o, f, i] = sum_{a,b} a_out[o,a] core[f,b,a] b_in[b,i]
        w = jnp.einsum("oa,fba->ofb", a_out, core)
        if self.in_cores:
            b_in = merge_tt_matrix(self.in_cores)                   # [r_b, I]
            w = jnp.einsum("ofb,bi->ofi", w, b_in)
        w = w.reshape(self.out_channels, kh, kw, self.in_channels)
        w = jnp.transpose(w, (1, 2, 3, 0))                          # HWIO
        if self.dtype is not None:
            x, w = x.astype(self.dtype), w.astype(self.dtype)
        y = conv2d(x, w, self.stride, self.padding)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    @staticmethod
    def factorize_dense(dense_w_oihw: jax.Array, spec: TTConvSpec,
                        dense_b: Optional[jax.Array] = None,
                        method: str = "svd") -> dict:
        """Build this module's param dict from a dense OIHW kernel
        (the `dense_w=` init protocol, reference TTConv.py:96-109)."""
        o, i, kh, kw = dense_w_oihw.shape
        w = dense_w_oihw.reshape(o, i, kh * kw).transpose(0, 2, 1)  # [O, f, I]
        cores = ten2tt(w, spec.tt_shapes, spec.tt_ranks, method=method)
        params = {}
        oo = spec.out_order
        for j in range(oo):
            params[f"out_core_{j}"] = cores[j]
        mid = cores[oo]  # [r_a, f, r_b]
        params["core_kernel"] = jnp.transpose(mid, (1, 2, 0)).reshape(
            kh, kw, spec.in_ranks[0], spec.out_ranks[-1])
        for j in range(oo + 1, len(cores)):
            params[f"in_core_{j - oo - 1}"] = cores[j]
        if dense_b is not None:
            params["bias"] = dense_b
        return params
