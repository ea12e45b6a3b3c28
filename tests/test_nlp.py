"""NLP subsystem tests: factorization solvers, TT/SVD embeddings, BERT
dense+compressed, distillation losses."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.nlp import (
    get_factors, split_to_factors, compute_ranks_tt, compute_rank_svd,
    tt_linear_spec_from_ratio,
    TTEmbedding, SVDEmbedding,
    BertConfig, BertForSequenceClassification, BertForQuestionAnswering,
    BertCompressionPlan,
    attention_hidden_distill_loss, soft_logits_loss)
from dnn_compression_tensor_admm_tpu.models.decompose import count_params


class TestFactorization:
    def test_prime_factors(self):
        assert sorted(get_factors(768)) == [2] * 8 + [3]
        assert get_factors(7) == [7]
        assert math.prod(get_factors(30522)) == 30522

    def test_split_preserves_product(self):
        for n in (768, 3072, 30522, 512, 1000):
            for d in (2, 3):
                fs = split_to_factors(n, d)
                assert len(fs) == d and math.prod(fs) == n, (n, d, fs)

    def test_split_balanced(self):
        fs = split_to_factors(768, 2)
        assert max(fs) / min(fs) < 3, fs  # e.g. [32, 24]

    def test_tt_ranks_hit_ratio(self):
        shapes = [32, 24, 32, 24]
        for ratio in (2, 10, 50):
            ranks = compute_ranks_tt(shapes, ratio)
            params = sum(ranks[i] * shapes[i] * ranks[i + 1]
                         for i in range(len(shapes)))
            target = math.prod(shapes) / ratio
            assert params <= target * 1.1, (ratio, params, target)

    def test_svd_rank_formula(self):
        assert compute_rank_svd(768, 768, 2.0) == int(768 * 768 / (2 * 1536))

    def test_spec_from_ratio(self):
        spec = tt_linear_spec_from_ratio(768, 3072, 10.0, dim=2)
        assert spec.out_features == 3072 and spec.in_features == 768


class TestEmbeddings:
    def test_svd_embedding_shapes_and_compression(self):
        m = SVDEmbedding(1000, 64, compression_ratio=4.0)
        ids = jnp.asarray([[1, 2, 3], [4, 5, 999]])
        v = m.init(jax.random.PRNGKey(0), ids)
        y = m.apply(v, ids)
        assert y.shape == (2, 3, 64)
        assert count_params(v["params"]) < 1000 * 64 / 3

    def test_tt_embedding_matches_materialized_table(self):
        m = TTEmbedding(num_embeddings=120, features=16,
                        input_tt_shape=(5, 4, 6), output_tt_shape=(4, 4),
                        tt_ranks=(1, 4, 4, 4, 4, 1))
        ids = jnp.arange(120).reshape(1, -1)
        v = m.init(jax.random.PRNGKey(0), ids)
        y = jax.jit(m.apply)(v, ids)[0]  # [120, 16]
        # materialize the full table by looking up every id — internal
        # consistency: row i equals the chain contraction at digit(i)
        from dnn_compression_tensor_admm_tpu.ops.ttd import tt2ten
        cores = [v["params"][f"core_{i}"] for i in range(5)]
        full = tt2ten(cores, (5, 4, 6, 4, 4)).reshape(120, 16)
        np.testing.assert_allclose(np.asarray(y), np.asarray(full), atol=1e-4)

    def test_tt_embedding_auto_shapes(self):
        m = TTEmbedding(num_embeddings=30522, features=64,
                        compression_ratio=20.0)
        ids = jnp.asarray([[0, 17, 30521]])
        v = m.init(jax.random.PRNGKey(0), ids)
        y = m.apply(v, ids)
        assert y.shape == (1, 3, 64)
        assert count_params(v["params"]) < 30522 * 64 / 5


def _tiny_cfg():
    return BertConfig(vocab_size=200, hidden_size=32, num_layers=2,
                      num_heads=2, intermediate_size=64, max_position=32)


class TestBert:
    def test_dense_forward_names(self):
        cfg = _tiny_cfg()
        m = BertForSequenceClassification(cfg, num_labels=3)
        ids = jnp.ones((2, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        out = m.apply(v, ids)
        assert out["logits"].shape == (2, 3)
        assert len(out["hidden_states"]) == 3 and len(out["attentions"]) == 2
        p = v["params"]["bert"]
        assert "attention.self.query" in p["encoder.layer.0"]
        assert "word_embeddings.weight" in p["embeddings"]

    def test_compressed_is_smaller_and_runs(self):
        cfg = _tiny_cfg()
        dense = BertForSequenceClassification(cfg, num_labels=3)
        plan = BertCompressionPlan(linear_format="tt", linear_ratio=4.0,
                                   embedding_format="svd", embedding_ratio=4.0)
        comp = BertForSequenceClassification(cfg, num_labels=3, plan=plan)
        ids = jnp.ones((2, 8), jnp.int32)
        dv = dense.init(jax.random.PRNGKey(0), ids)
        cv = comp.init(jax.random.PRNGKey(0), ids)
        assert count_params(cv["params"]) < count_params(dv["params"])
        out = jax.jit(lambda v, i: comp.apply(v, i))(cv, ids)
        assert out["logits"].shape == (2, 3)

    def test_qa_head(self):
        cfg = _tiny_cfg()
        m = BertForQuestionAnswering(cfg)
        ids = jnp.ones((2, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        out = m.apply(v, ids)
        assert out["start_logits"].shape == (2, 8)

    def test_attention_mask_effective(self):
        cfg = _tiny_cfg()
        m = BertForSequenceClassification(cfg)
        ids = jnp.ones((1, 8), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), ids)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]])
        out = m.apply(v, ids, attention_mask=mask)
        att = out["attentions"][0]  # [B, h, N, N] scores w/ mask added
        assert float(att[0, 0, 0, -1]) < -1e8


class TestDistill:
    def test_stage1_zero_for_identical(self):
        atts = [jax.random.normal(jax.random.PRNGKey(i), (2, 2, 8, 8))
                for i in range(2)]
        reps = [jax.random.normal(jax.random.PRNGKey(10 + i), (2, 8, 32))
                for i in range(3)]
        a, r = attention_hidden_distill_loss(atts, atts, reps, reps)
        assert float(a) == 0.0 and float(r) == 0.0

    def test_stage1_layer_mapping_6_to_2(self):
        t_atts = [jnp.full((1, 1, 4, 4), float(i)) for i in range(6)]
        s_atts = [jnp.full((1, 1, 4, 4), 2.0), jnp.full((1, 1, 4, 4), 5.0)]
        t_reps = [jnp.zeros((1, 4, 8))] * 7
        s_reps = [jnp.zeros((1, 4, 8))] * 3
        a, r = attention_hidden_distill_loss(s_atts, t_atts, s_reps, t_reps)
        assert float(a) == 0.0  # students match teacher layers 2 and 5

    def test_stage2_zero_at_equal_logits(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (4, 5))
        l_eq = soft_logits_loss(logits, logits)
        l_diff = soft_logits_loss(logits, -logits)
        assert float(l_diff) > float(l_eq)
