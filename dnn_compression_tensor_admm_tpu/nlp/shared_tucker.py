"""Cross-layer shared Tucker factorization of a BERT encoder
(reference: TuckerWeights / TuckerWeights_Plus,
xcompression/transformer/modeling.py:781-1258).

All L layers' 12 d x d weight blocks (q, k, v, attention output, the
FFN-in [4D, D] as 4 row-blocks and FFN-out [D, 4D] as 4 column-blocks)
are factorized jointly:

    block[b] ~= left @ core_b @ right,   core_b = sum_i factor_layer[b, i] * core[i]

with shared `left` [D, r_c] / `right` [r_d, D] factors, a per-block
mixing vector over a small `core` bank [r_layer, r_c, r_d], and dense
per-block biases. The encoder applies every projection through the
shared bottleneck (modeling.py:854-886), so activations touch only
[D, r] matmuls plus tiny core contractions — MXU-friendly.

Also provided: HOOI init from a dense encoder (`factorize_encoder`),
the progressive rank-shrink `step()` (modeling.py:843-852) and the
last-slice l2 regularizer used to drive ranks down during training.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.svd import truncated_left_sv
from .bert import BertConfig


@dataclasses.dataclass(frozen=True)
class SharedTuckerConfig:
    rank_layer: int = 60       # core-bank size over L*12 blocks
    rank_condim: int = 384     # r_c (left)
    rank_dim: int = 384        # r_d (right)


class SharedTuckerEncoderLayer(nn.Module):
    """One encoder layer whose six projections read from the shared
    factors (passed in as arguments, owned by the parent)."""
    cfg: BertConfig
    layer_idx: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, cores, left, right, biases,
                 deterministic=True):
        c = self.cfg
        h_heads = c.num_heads
        D = c.hidden_size
        hd = D // h_heads
        B, N, _ = x.shape
        C = cores  # [12, r_c, r_d] for this layer
        bias = biases  # [9, D]

        def proj(h, j):
            return jnp.einsum("...D,Dk,kr,rE->...E", h, left, C[j], right) + bias[j]

        q = proj(x, 0).reshape(B, N, h_heads, hd).transpose(0, 2, 1, 3)
        k = proj(x, 1).reshape(B, N, h_heads, hd).transpose(0, 2, 1, 3)
        v = proj(x, 2).reshape(B, N, h_heads, hd).transpose(0, 2, 1, 3)
        scores = (q @ jnp.swapaxes(k, -1, -2)) * (hd ** -0.5)
        scores = scores.astype(jnp.float32) + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        att = proj(ctx, 3)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="attention.output.LayerNorm")(x + att)
        # FFN-in: kernel [D, 4D] as 4 column blocks; y_i = h @ left @ C_i @ right
        inner = jnp.einsum("...D,Dk,akr,rE->...aE", x, left, C[4:8], right)
        inner = inner.reshape(B, N, 4 * D) + bias[4:8].reshape(-1)
        inner = nn.gelu(inner, approximate=False)
        # FFN-out: W2^T [4D, D] = 4 row blocks; y = sum_i h_i @ left @ C_i @ right
        hi = inner.reshape(B, N, 4, D)
        out = jnp.einsum("...aD,Dk,akr,rE->...E", hi, left, C[8:12], right)
        out = out + bias[8]
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output.LayerNorm")(x + out)
        return y, scores


class SharedTuckerBertEncoder(nn.Module):
    """The L-layer encoder with one shared factor set (modeling.py:805-812)."""
    cfg: BertConfig
    tucker: SharedTuckerConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        c, t = self.cfg, self.tucker
        D = c.hidden_size
        L = c.num_layers
        init = nn.initializers.normal(0.02)
        left = self.param("factor_left", init, (D, t.rank_condim))
        right = self.param("factor_right", init, (t.rank_dim, D))
        factor_layer = self.param("factor_layer", init, (L * 12, t.rank_layer))
        core = self.param("core", init, (t.rank_layer, t.rank_condim, t.rank_dim))
        biases = self.param("bias", nn.initializers.zeros, (L, 9, D))
        # per-block cores: [L*12, r_c, r_d]
        cores = jnp.einsum("ikl,bi->bkl", core, factor_layer).reshape(
            L, 12, t.rank_condim, t.rank_dim)
        hidden_states = [x]
        attentions = []
        for l in range(L):
            x, att = SharedTuckerEncoderLayer(
                c, l, self.dtype, name=f"layer.{l}")(
                x, mask, cores[l], left, right, biases[l], deterministic)
            hidden_states.append(x)
            attentions.append(att)
        return x, hidden_states, attentions

    @staticmethod
    def rank_regularizer(params, lam: float = 1.0):
        """l2 of the trailing rank slices — pushing them to zero makes the
        progressive shrink lossless (modeling.py:838-841)."""
        core = params["core"]
        left = params["factor_left"]
        right = params["factor_right"]
        return lam * (jnp.sum(core[:, -1, :] ** 2) + jnp.sum(core[:, :, -1] ** 2)
                      + jnp.sum(left[:, -1] ** 2) + jnp.sum(right[-1, :] ** 2))

    @staticmethod
    def shrink_rank(params):
        """Drop the last r_c/r_d column (reference `step()`,
        modeling.py:843-852). Returns new params dict."""
        p = dict(params)
        p["core"] = params["core"][:, :-1, :-1]
        p["factor_left"] = params["factor_left"][:, :-1]
        p["factor_right"] = params["factor_right"][:-1, :]
        return p


def stack_encoder_blocks(encoder_params, num_layers: int) -> jnp.ndarray:
    """Collect the [L*12, D, D] block stack from a dense BertModel param
    tree (modeling.py get_weights_from_encoder). Flax Dense kernels are
    [in, out]; blocks are stored as [D, D] with out-dim last."""
    blocks = []
    for l in range(num_layers):
        lp = encoder_params[f"encoder.layer.{l}"]
        q = lp["attention.self.query"]["kernel"]
        k = lp["attention.self.key"]["kernel"]
        v = lp["attention.self.value"]["kernel"]
        ao = lp["attention.output.dense"]["kernel"]
        w1 = lp["intermediate.dense"]["kernel"]     # [D, 4D]
        w2 = lp["output.dense"]["kernel"]           # [4D, D]
        D = q.shape[0]
        blocks += [q, k, v, ao]
        # W1^T [4D, D] row blocks  (torch W1 is [4D, D]; flax kernel [D, 4D])
        blocks += [w1.T[i * D:(i + 1) * D, :].T for i in range(4)]
        # W2^T [D, 4D] column blocks
        blocks += [w2[i * D:(i + 1) * D, :] for i in range(4)]
    return jnp.stack(blocks)  # [L*12, D, D]


def factorize_encoder(block_stack: jnp.ndarray, tucker: SharedTuckerConfig,
                      n_iter: int = 5):
    """HOOI of the block stack onto (rank_layer, rank_condim, rank_dim);
    returns the shared-factor param dict (biases zero-filled by caller)."""
    t = block_stack  # [B, D, D]
    ranks = (tucker.rank_layer, tucker.rank_condim, tucker.rank_dim)
    f0 = truncated_left_sv(t.reshape(t.shape[0], -1), ranks[0])
    f1 = truncated_left_sv(jnp.moveaxis(t, 1, 0).reshape(t.shape[1], -1), ranks[1])
    f2 = truncated_left_sv(jnp.moveaxis(t, 2, 0).reshape(t.shape[2], -1), ranks[2])
    for _ in range(n_iter):
        y = jnp.einsum("bxy,xk,yl->bkl", t, f1, f2)
        f0 = truncated_left_sv(y.reshape(t.shape[0], -1), ranks[0])
        y = jnp.einsum("bxy,bi,yl->xil", t, f0, f2)
        f1 = truncated_left_sv(y.reshape(t.shape[1], -1), ranks[1])
        y = jnp.einsum("bxy,bi,xk->yik", t, f0, f1)
        f2 = truncated_left_sv(y.reshape(t.shape[2], -1), ranks[2])
    core = jnp.einsum("bxy,bi,xk,yl->ikl", t, f0, f1, f2)
    return {"core": core, "factor_layer": f0, "factor_left": f1,
            "factor_right": f2.T}
