"""word2ket Kronecker embeddings (reference embedding_utils.py:96-332)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.nlp.ket_embedding import (
    EarlyStopping, KetEmbedding, KetXSEmbedding, fit_ket_to_dense,
    ket_rank_from_ratio)


class TestKetEmbedding:
    @pytest.mark.parametrize("order", [2, 4, 8])
    def test_gather_forward_matches_full_table(self, order):
        """The fused gather-first forward must equal a lookup into the
        materialized table (reference forward = F.embedding(get_weights()),
        embedding_utils.py:195-204)."""
        m = KetEmbedding(num_embeddings=37, features=24, order=order, rank=3)
        ids = jnp.asarray(np.random.RandomState(0).randint(0, 37, (2, 5)))
        v = m.init(jax.random.PRNGKey(0), ids)
        y = m.apply(v, ids)
        table = m.apply(v, method=m.full_table)
        assert y.shape == (2, 5, 24)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(table)[np.asarray(ids)],
                                   rtol=1e-5, atol=1e-5)

    def test_compression_ratio_honored(self):
        V, D, ratio = 30522, 768, 10.0
        r = ket_rank_from_ratio(V, D, order=2, ratio=ratio)
        params = 2 * r * V * int(np.ceil(D ** 0.5))
        assert V * D / params >= ratio

    def test_grad_flows(self):
        m = KetEmbedding(num_embeddings=16, features=8, order=2, rank=2)
        ids = jnp.arange(4)
        v = m.init(jax.random.PRNGKey(0), ids)
        g = jax.grad(lambda p: m.apply({"params": p}, ids).sum())(v["params"])
        assert float(jnp.abs(g["weight_leafs"]).sum()) > 0


class TestKetXSEmbedding:
    @pytest.mark.parametrize("order", [2, 3, 4])
    def test_digit_gather_matches_kron_table(self, order):
        """Mixed-radix row decomposition must reproduce the truncated
        Kronecker table exactly (reference get_weights,
        embedding_utils.py:287-295)."""
        m = KetXSEmbedding(num_embeddings=30, features=10, order=order, rank=2)
        ids = jnp.asarray(np.random.RandomState(1).randint(0, 30, (7,)))
        v = m.init(jax.random.PRNGKey(1), ids)
        y = m.apply(v, ids)
        table = m.apply(v, method=m.full_table)
        assert table.shape == (30, 10)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(table)[np.asarray(ids)],
                                   rtol=1e-5, atol=1e-5)

    def test_much_smaller_than_dense(self):
        m = KetXSEmbedding(num_embeddings=30522, features=768, order=4, rank=4)
        ids = jnp.zeros((1,), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        n = v["params"]["weight_leafs"].size
        assert 30522 * 768 / n > 100  # XS: both dims factorized


class TestFitAndEarlyStopping:
    def test_early_stopping_patience(self):
        es = EarlyStopping(patience=2)
        assert not es.step(1.0)
        assert not es.step(0.5)     # improved
        assert not es.step(0.6)     # bad 1
        assert es.step(0.7)         # bad 2 -> stop
        assert EarlyStopping(patience=3).step(float("nan")) is False  # first sets best
        es2 = EarlyStopping(patience=3)
        es2.step(1.0)
        assert es2.step(float("nan"))  # nan after best -> stop

    def test_fit_reduces_mse(self):
        """reference BaseEmbedding.initialize (embedding_utils.py:77-93)."""
        rng = np.random.RandomState(0)
        # low-rank-ish target so the fit can make progress
        dense = rng.randn(12, 4).astype(np.float32) @ rng.randn(4, 9).astype(np.float32)
        m = KetEmbedding(num_embeddings=12, features=9, order=2, rank=4)
        v0 = m.init(jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32))
        mse0 = float(jnp.mean((m.apply(v0, method=m.full_table) - dense) ** 2))
        v, loss = fit_ket_to_dense(m, dense, steps=200, lr=0.05)
        assert loss < mse0 * 0.5, (loss, mse0)

    def test_fit_default_lr(self):
        """Default lr must make steady progress too (advisor r1)."""
        rng = np.random.RandomState(1)
        dense = rng.randn(12, 4).astype(np.float32) @ rng.randn(4, 9).astype(np.float32)
        m = KetEmbedding(num_embeddings=12, features=9, order=2, rank=4)
        v0 = m.init(jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32))
        mse0 = float(jnp.mean((m.apply(v0, method=m.full_table) - dense) ** 2))
        v, loss = fit_ket_to_dense(m, dense, steps=300)
        assert loss < mse0 * 0.5, (loss, mse0)


class TestBertKetPlan:
    def test_bert_forward_with_ket_embeddings(self):
        from dnn_compression_tensor_admm_tpu.nlp.bert import (
            BertCompressionPlan, BertConfig, BertModel)
        for fmt in ("ket", "ketxs"):
            cfg = BertConfig(vocab_size=100, hidden_size=16, num_layers=1,
                             num_heads=2, intermediate_size=32, max_position=16)
            plan = BertCompressionPlan(embedding_format=fmt,
                                       embedding_ratio=4.0, embedding_order=2)
            model = BertModel(cfg, plan=plan)
            ids = jnp.zeros((2, 8), jnp.int32)
            mask = jnp.ones((2, 8), jnp.int32)
            v = model.init(jax.random.PRNGKey(0), ids, mask, ids * 0)
            out = model.apply(v, ids, mask, ids * 0)
            assert out["hidden_states"][-1].shape == (2, 8, 16)
