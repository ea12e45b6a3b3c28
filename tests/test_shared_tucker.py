"""Shared-Tucker encoder: forward, dense-init fidelity, rank shrink."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.nlp.bert import BertConfig, BertModel
from dnn_compression_tensor_admm_tpu.nlp.shared_tucker import (
    SharedTuckerBertEncoder, SharedTuckerConfig, factorize_encoder,
    stack_encoder_blocks)

CFG = BertConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
                 intermediate_size=128, max_position=16, dropout=0.0,
                 attn_dropout=0.0)


def _mask(b, n):
    return jnp.zeros((b, 1, 1, n), jnp.float32)


class TestSharedTucker:
    def test_forward_shapes(self):
        enc = SharedTuckerBertEncoder(CFG, SharedTuckerConfig(10, 16, 16))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
        v = enc.init(jax.random.PRNGKey(1), x, _mask(2, 8))
        y, hs, atts = jax.jit(lambda v, x: enc.apply(v, x, _mask(2, 8)))(v, x)
        assert y.shape == (2, 8, 32)
        assert len(hs) == 3 and len(atts) == 2

    def test_param_sharing_compresses(self):
        enc = SharedTuckerBertEncoder(CFG, SharedTuckerConfig(10, 16, 16))
        x = jnp.zeros((1, 8, 32))
        v = enc.init(jax.random.PRNGKey(0), x, _mask(1, 8))
        n = sum(a.size for a in jax.tree.leaves(v))
        dense_blocks = CFG.num_layers * 12 * 32 * 32
        assert n < dense_blocks  # shared factors beat the raw block stack

    def test_full_rank_factorization_reconstructs_blocks(self):
        bert = BertModel(CFG)
        ids = jnp.ones((1, 8), jnp.int32)
        bv = bert.init(jax.random.PRNGKey(0), ids)
        stack = stack_encoder_blocks(bv["params"], CFG.num_layers)
        assert stack.shape == (24, 32, 32)
        t = SharedTuckerConfig(rank_layer=24, rank_condim=32, rank_dim=32)
        fac = factorize_encoder(stack, t, n_iter=2)
        rec = jnp.einsum("ikl,bi->bkl", fac["core"], fac["factor_layer"])
        rec = jnp.einsum("bkl,xk,lE->bxE", rec, fac["factor_left"],
                         fac["factor_right"])
        err = float(jnp.linalg.norm(rec - stack) / jnp.linalg.norm(stack))
        assert err < 1e-3, err

    def test_truncated_factorization_reasonable(self):
        bert = BertModel(CFG)
        ids = jnp.ones((1, 8), jnp.int32)
        bv = bert.init(jax.random.PRNGKey(0), ids)
        stack = stack_encoder_blocks(bv["params"], CFG.num_layers)
        t = SharedTuckerConfig(rank_layer=12, rank_condim=24, rank_dim=24)
        fac = factorize_encoder(stack, t, n_iter=4)
        rec = jnp.einsum("ikl,bi->bkl", fac["core"], fac["factor_layer"])
        rec = jnp.einsum("bkl,xk,lE->bxE", rec, fac["factor_left"],
                         fac["factor_right"])
        err = float(jnp.linalg.norm(rec - stack) / jnp.linalg.norm(stack))
        assert err < 0.9

    def test_shrink_rank_and_regularizer(self):
        enc = SharedTuckerBertEncoder(CFG, SharedTuckerConfig(10, 16, 16))
        x = jnp.zeros((1, 8, 32))
        v = enc.init(jax.random.PRNGKey(0), x, _mask(1, 8))
        p = v["params"]
        reg = float(SharedTuckerBertEncoder.rank_regularizer(p))
        assert reg > 0
        p2 = SharedTuckerBertEncoder.shrink_rank(p)
        assert p2["core"].shape == (10, 15, 15)
        assert p2["factor_left"].shape == (32, 15)
        assert p2["factor_right"].shape == (15, 32)
