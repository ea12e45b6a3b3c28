"""General (pretraining-corpus) distillation (the reference's
xcompression/general_distill.py:423-453): attention + hidden-state MSE
between compressed student and dense teacher over masked-LM shards —
no task labels involved."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .bert import BertCompressionPlan, BertConfig, BertModel
from .distill import attention_hidden_distill_loss
from .pregenerate import pregenerate_mlm_examples, synthetic_corpus
from .task_distill import _batches, _bert_adam
from .tokenization import WordPieceTokenizer, build_vocab_from_texts


@dataclasses.dataclass
class GeneralDistillConfig:
    max_seq_length: int = 128
    batch_size: int = 32
    epochs: int = 1
    lr: float = 1e-4
    warmup_frac: float = 0.1
    seed: int = 0
    n_synthetic_docs: int = 256
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    plan: BertCompressionPlan = dataclasses.field(
        default_factory=lambda: BertCompressionPlan(linear_format="tt",
                                                    linear_ratio=2.0))
    grad_accum_steps: int = 1  # reference general_distill.py grad-accum path
    print_fn: Callable = print


def run_general_distillation(cfg: GeneralDistillConfig, texts=None,
                             teacher_variables=None):
    """Returns (student_variables, history)."""
    log = cfg.print_fn
    texts = texts or synthetic_corpus(cfg.n_synthetic_docs, cfg.seed)
    tok = WordPieceTokenizer(build_vocab_from_texts(texts))
    data = pregenerate_mlm_examples(texts, tok, cfg.max_seq_length,
                                    seed=cfg.seed)
    data = {k: v for k, v in data.items()
            if k in ("input_ids", "attention_mask", "token_type_ids")}
    data["labels"] = np.zeros(len(data["input_ids"]), np.int32)  # batcher key
    bert_cfg = dataclasses.replace(cfg.bert, vocab_size=len(tok.vocab))

    teacher = BertModel(bert_cfg)
    student = BertModel(bert_cfg, plan=cfg.plan)
    sample = {k: jnp.asarray(v[:2]) for k, v in data.items() if k != "labels"}
    if teacher_variables is None:
        teacher_variables = teacher.init(jax.random.PRNGKey(cfg.seed),
                                         sample["input_ids"],
                                         sample["attention_mask"],
                                         sample["token_type_ids"])
    student_variables = student.init(jax.random.PRNGKey(cfg.seed + 1),
                                     sample["input_ids"],
                                     sample["attention_mask"],
                                     sample["token_type_ids"])

    steps = max(1, len(data["input_ids"]) // cfg.batch_size) * cfg.epochs
    steps = max(1, steps // cfg.grad_accum_steps)
    tx = _bert_adam(cfg.lr, steps, cfg.warmup_frac, cfg.grad_accum_steps)
    opt = tx.init(student_variables["params"])

    @jax.jit
    def step(params, opt, b, key):
        t_out = teacher.apply(teacher_variables, b["input_ids"],
                              b["attention_mask"], b["token_type_ids"])

        def loss_fn(p):
            s_out = student.apply({"params": p}, b["input_ids"],
                                  b["attention_mask"], b["token_type_ids"],
                                  deterministic=False,
                                  rngs={"dropout": key})
            att, rep = attention_hidden_distill_loss(
                s_out["attentions"], t_out["attentions"],
                s_out["hidden_states"], t_out["hidden_states"])
            return att + rep
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    rng = jax.random.PRNGKey(cfg.seed + 2)
    nprng = np.random.RandomState(cfg.seed)
    params = student_variables["params"]
    history = []
    for ep in range(cfg.epochs):
        t0 = time.time()
        losses = []
        for b in _batches(data, cfg.batch_size, nprng):
            rng, k = jax.random.split(rng)
            params, opt, l = step(params, opt, b, k)
            losses.append(float(l))
        row = {"epoch": ep + 1, "loss": float(np.mean(losses)),
               "time_s": time.time() - t0}
        history.append(row)
        log(row)
    return {"params": params}, history
