"""Pregeneration, general distillation, SQuAD harness tests."""

import numpy as np

from dnn_compression_tensor_admm_tpu.nlp.bert import BertConfig, BertCompressionPlan
from dnn_compression_tensor_admm_tpu.nlp.general_distill import (
    GeneralDistillConfig, run_general_distillation)
from dnn_compression_tensor_admm_tpu.nlp.pregenerate import (
    pregenerate_mlm_examples, synthetic_corpus)
from dnn_compression_tensor_admm_tpu.nlp.squad import (
    SquadConfig, run_squad, synthetic_squad, convert_squad)
from dnn_compression_tensor_admm_tpu.nlp.tokenization import (
    WordPieceTokenizer, build_vocab_from_texts)

_TINY = BertConfig(vocab_size=0, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, max_position=64, dropout=0.0,
                   attn_dropout=0.0)


class TestPregenerate:
    def test_masking_rule(self):
        texts = synthetic_corpus(16)
        tok = WordPieceTokenizer(build_vocab_from_texts(texts))
        d = pregenerate_mlm_examples(texts, tok, max_seq_length=64, seed=0)
        assert d["input_ids"].shape == (16, 64)
        assert d["masked_positions"].shape == (16, 20)
        # masked targets are real token ids where positions valid
        valid = d["masked_positions"][0] >= 0
        assert valid.sum() >= 1
        assert (d["masked_ids"][0][valid] >= 0).all()
        # at least one input position actually replaced by [MASK]
        mask_id = tok.vocab["[MASK]"]
        assert (d["input_ids"] == mask_id).sum() > 0


class TestGeneralDistill:
    def test_loss_decreases(self):
        cfg = GeneralDistillConfig(
            max_seq_length=32, batch_size=16, epochs=3, lr=1e-3,
            n_synthetic_docs=64, bert=_TINY,
            plan=BertCompressionPlan(linear_format="tt", linear_ratio=2.0),
            print_fn=lambda *a: None)
        variables, hist = run_general_distillation(cfg)
        assert hist[-1]["loss"] < hist[0]["loss"]


class TestSquad:
    def test_feature_conversion_spans(self):
        ex = synthetic_squad(8, 0)
        tok = WordPieceTokenizer(build_vocab_from_texts(
            [e.context for e in ex] + [e.question for e in ex]))
        d = convert_squad(ex, tok, 64)
        assert d["input_ids"].shape == (8, 64)
        # most synthetic answers are inside the window -> nonzero spans
        assert (d["start_positions"] > 0).mean() > 0.7
        assert (d["end_positions"] >= d["start_positions"]).all()

    def test_qa_training_learns_synthetic_rule(self):
        cfg = SquadConfig(max_seq_length=64, batch_size=16, epochs=4,
                          lr=1e-3, n_synthetic=128, bert=_TINY,
                          print_fn=lambda *a: None)
        variables, hist = run_squad(cfg)
        assert hist[-1]["exact_match"] > 0.5, hist
