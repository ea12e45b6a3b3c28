"""BERT modeling, dense and compressed (the reference's
xcompression/transformer/modeling.py + 16 compressed_modeling* variants,
collapsed into one substitution-driven implementation).

Canonical parameter names follow the BERT state dict
('encoder.layer.N.attention.self.query.weight', ...). A
`BertCompressionPlan` replaces the reference's per-ratio hardcoded
variants (e.g. compressed_modeling_tt_57.py:353-360): every encoder
linear is swapped for a TT/SVD layer with ranks solved from the target
compression ratio, and the word embedding for an SVD or TT embedding.
Outputs include all hidden states and attention scores, as required by
the two-stage distillation (task_distill.py:806-840).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import SVDSpec, TTLinearSpec
from ..layers import SVDLinear, TTLinear
from .factorization import svd_spec_from_ratio, tt_linear_spec_from_ratio
from .ket_embedding import KetEmbedding, KetXSEmbedding
from .svd_embedding import SVDEmbedding
from .tt_embedding import TTEmbedding


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    attn_dropout: float = 0.1
    layer_norm_eps: float = 1e-12


@dataclasses.dataclass(frozen=True)
class BertCompressionPlan:
    """Ratio-driven compression of a BERT encoder.

    linear_format: 'tt' | 'svd' | None — applied to the six encoder
    linears per layer (query/key/value, attention output, intermediate,
    output). embedding_format: 'svd' | 'tt' | 'ket' | 'ketxs' | None —
    word embedding ('ket'/'ketxs' are the reference's word2ket
    Kronecker embeddings, embedding_utils.py:96-332).
    """
    linear_format: Optional[str] = None
    linear_ratio: float = 2.0
    tt_dim: int = 2
    embedding_format: Optional[str] = None
    embedding_ratio: float = 4.0
    embedding_order: int = 4  # ket/ketxs Kronecker order


def _linear(cfg_plan: Optional[BertCompressionPlan], in_f: int, out_f: int,
            name: str, dtype=None):
    if cfg_plan is None or cfg_plan.linear_format is None:
        return nn.Dense(out_f, dtype=dtype,
                        kernel_init=nn.initializers.normal(0.02), name=name)
    if cfg_plan.linear_format == "tt":
        spec = tt_linear_spec_from_ratio(in_f, out_f, cfg_plan.linear_ratio,
                                         cfg_plan.tt_dim)
        return TTLinear(in_f, out_f, spec, dtype=dtype, name=name)
    if cfg_plan.linear_format == "svd":
        spec = svd_spec_from_ratio(in_f, out_f, cfg_plan.linear_ratio)
        return SVDLinear(in_f, out_f, spec, dtype=dtype, name=name)
    raise ValueError(cfg_plan.linear_format)


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    plan: Optional[BertCompressionPlan] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic=True):
        c = self.cfg
        init = nn.initializers.normal(0.02)
        if self.plan is not None and self.plan.embedding_format == "svd":
            word = SVDEmbedding(c.vocab_size, c.hidden_size,
                                compression_ratio=self.plan.embedding_ratio,
                                name="word_embeddings")(input_ids)
        elif self.plan is not None and self.plan.embedding_format == "tt":
            word = TTEmbedding(c.vocab_size, c.hidden_size,
                               compression_ratio=self.plan.embedding_ratio,
                               name="word_embeddings")(input_ids)
        elif self.plan is not None and self.plan.embedding_format == "ket":
            word = KetEmbedding(c.vocab_size, c.hidden_size,
                                order=self.plan.embedding_order,
                                compression_ratio=self.plan.embedding_ratio,
                                name="word_embeddings")(input_ids)
        elif self.plan is not None and self.plan.embedding_format == "ketxs":
            word = KetXSEmbedding(c.vocab_size, c.hidden_size,
                                  order=self.plan.embedding_order,
                                  compression_ratio=self.plan.embedding_ratio,
                                  name="word_embeddings")(input_ids)
        else:
            table = self.param("word_embeddings.weight", init,
                               (c.vocab_size, c.hidden_size))
            word = jnp.take(table, input_ids, axis=0)
        pos_table = self.param("position_embeddings.weight", init,
                               (c.max_position, c.hidden_size))
        type_table = self.param("token_type_embeddings.weight", init,
                                (c.type_vocab_size, c.hidden_size))
        seq_len = input_ids.shape[-1]
        y = word + pos_table[None, :seq_len] + jnp.take(type_table, token_type_ids, axis=0)
        y = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="LayerNorm")(y)
        y = nn.Dropout(self.cfg.dropout)(y, deterministic=deterministic)
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y


class BertLayer(nn.Module):
    cfg: BertConfig
    plan: Optional[BertCompressionPlan] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        c = self.cfg
        h = c.num_heads
        hd = c.hidden_size // h
        B, N, D = x.shape
        q = _linear(self.plan, D, D, "attention.self.query", self.dtype)(x)
        k = _linear(self.plan, D, D, "attention.self.key", self.dtype)(x)
        v = _linear(self.plan, D, D, "attention.self.value", self.dtype)(x)
        q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        scores = (q @ jnp.swapaxes(k, -1, -2)) * (hd ** -0.5)
        scores = scores.astype(jnp.float32) + mask  # [B, h, N, N]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        probs = nn.Dropout(c.attn_dropout)(probs, deterministic=deterministic)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        att_out = _linear(self.plan, D, D, "attention.output.dense", self.dtype)(ctx)
        att_out = nn.Dropout(c.dropout)(att_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="attention.output.LayerNorm")(x + att_out)
        inter = _linear(self.plan, D, c.intermediate_size, "intermediate.dense",
                        self.dtype)(x)
        inter = nn.gelu(inter, approximate=False)
        out = _linear(self.plan, c.intermediate_size, D, "output.dense",
                      self.dtype)(inter)
        out = nn.Dropout(c.dropout)(out, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, name="output.LayerNorm")(x + out)
        return y, scores


class BertModel(nn.Module):
    cfg: BertConfig
    plan: Optional[BertCompressionPlan] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        c = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
        y = BertEmbeddings(c, self.plan, self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        hidden_states = [y]
        attentions = []
        for i in range(c.num_layers):
            y, att = BertLayer(c, self.plan, self.dtype,
                               name=f"encoder.layer.{i}")(y, mask, deterministic)
            hidden_states.append(y)
            attentions.append(att)
        pooled = nn.tanh(nn.Dense(c.hidden_size,
                                  kernel_init=nn.initializers.normal(0.02),
                                  name="pooler.dense")(y[:, 0].astype(jnp.float32)))
        return {"sequence_output": y, "pooled_output": pooled,
                "hidden_states": hidden_states, "attentions": attentions}


class BertForSequenceClassification(nn.Module):
    cfg: BertConfig
    num_labels: int = 2
    plan: Optional[BertCompressionPlan] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        out = BertModel(self.cfg, self.plan, self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic)
        pooled = nn.Dropout(self.cfg.dropout)(out["pooled_output"],
                                              deterministic=deterministic)
        logits = nn.Dense(self.num_labels,
                          kernel_init=nn.initializers.normal(0.02),
                          name="classifier")(pooled)
        out["logits"] = logits
        return out


class BertForQuestionAnswering(nn.Module):
    cfg: BertConfig
    plan: Optional[BertCompressionPlan] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        out = BertModel(self.cfg, self.plan, self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic)
        logits = nn.Dense(2, kernel_init=nn.initializers.normal(0.02),
                          name="qa_outputs")(out["sequence_output"].astype(jnp.float32))
        out["start_logits"] = logits[..., 0]
        out["end_logits"] = logits[..., 1]
        return out
