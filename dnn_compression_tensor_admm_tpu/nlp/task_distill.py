"""Task-specific two-stage distillation harness (the reference's
xcompression/task_distill.py:1045-1285 main flow).

Pipeline: teacher (dense BERT, fine-tuned on the task) -> student
(compressed BERT via `BertCompressionPlan`, optionally initialized by
factorizing the teacher's weights) -> stage 1: attention+hidden MSE vs
teacher (task_distill.py:806-828) -> stage 2: soft-CE on logits
(task_distill.py:832-840) -> GLUE metric eval.

Both stages run as one jitted train step each; the optimizer is AdamW
with warmup-linear decay (BertAdam semantics, optimization.py:183-301).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..train.losses import cross_entropy
from .bert import (BertCompressionPlan, BertConfig,
                   BertForSequenceClassification)
from .distill import attention_hidden_distill_loss, soft_logits_loss
from .optimization import bert_adam
from .glue import (PROCESSORS, convert_examples, glue_metric,
                   synthetic_examples)
from .tokenization import WordPieceTokenizer, build_vocab_from_texts


@dataclasses.dataclass
class DistillConfig:
    task: str = "sst-2"
    data_dir: Optional[str] = None        # None -> synthetic corpus
    vocab_path: Optional[str] = None
    max_seq_length: int = 128             # reference default (task_distill.py)
    batch_size: int = 32
    stage1_epochs: int = 1
    stage2_epochs: int = 1
    lr_stage1: float = 5e-5
    lr_stage2: float = 3e-5
    warmup_frac: float = 0.1
    seed: int = 0
    n_synthetic: int = 512
    teacher_epochs: int = 4      # synthetic-mode teacher fine-tune budget
    teacher_lr: float = 1e-3
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    plan: BertCompressionPlan = dataclasses.field(
        default_factory=lambda: BertCompressionPlan(
            linear_format="tt", linear_ratio=2.0, embedding_format="svd",
            embedding_ratio=4.5))
    temperature: float = 1.0
    grad_accum_steps: int = 1  # reference task_distill.py:843-846
    print_fn: Callable = print


def _bert_adam(lr, total_steps, warmup_frac, grad_accum_steps=1):
    """Faithful BertAdam (see nlp/optimization.py): no bias correction,
    per-parameter grad clipping, warmup-linear schedule
    (reference optimization.py:183-301, task_distill.py:843-846)."""
    return bert_adam(lr, schedule="warmup_linear", warmup=warmup_frac,
                     t_total=total_steps, grad_accum_steps=grad_accum_steps)


def _batches(data: Dict[str, np.ndarray], batch: int, rng: np.random.RandomState):
    n = len(data["labels"])
    order = rng.permutation(n)
    for i in range(0, n - batch + 1, batch):
        idx = order[i:i + batch]
        yield {k: jnp.asarray(v[idx]) for k, v in data.items()}


def prepare_task_data(cfg: DistillConfig):
    proc = PROCESSORS[cfg.task]
    if cfg.data_dir:
        train_ex = proc.get_examples(cfg.data_dir, "train")
        dev_ex = proc.get_examples(cfg.data_dir, "dev")
    else:
        train_ex = synthetic_examples(cfg.task, cfg.n_synthetic, cfg.seed)
        dev_ex = synthetic_examples(cfg.task, cfg.n_synthetic // 4, cfg.seed + 1)
    if cfg.vocab_path:
        tok = WordPieceTokenizer.from_file(cfg.vocab_path)
    else:
        texts = [e.text_a for e in train_ex] + \
                [e.text_b for e in train_ex if e.text_b]
        tok = WordPieceTokenizer(build_vocab_from_texts(texts))
    train = convert_examples(train_ex, tok, cfg.max_seq_length, proc.labels,
                             regression=proc.regression)
    dev = convert_examples(dev_ex, tok, cfg.max_seq_length, proc.labels,
                           regression=proc.regression)
    return train, dev, tok, proc


def run_task_distillation(cfg: DistillConfig, teacher_variables=None):
    """Returns (student_variables, history). `teacher_variables`: a trained
    dense BERT checkpoint; if None a teacher is briefly fine-tuned on the
    task first (synthetic-corpus mode)."""
    log = cfg.print_fn
    train, dev, tok, proc = prepare_task_data(cfg)
    vocab_size = max(len(tok.vocab), int(train["input_ids"].max()) + 1)
    bert_cfg = dataclasses.replace(cfg.bert, vocab_size=vocab_size)
    # regression (STS-B): 1-logit head, MSE against the float label
    # (reference task_distill.py:628-632, 835-837)
    regression = proc.regression
    n_labels = 1 if regression else len(proc.labels)

    teacher = BertForSequenceClassification(bert_cfg, num_labels=n_labels)
    student = BertForSequenceClassification(bert_cfg, num_labels=n_labels,
                                            plan=cfg.plan)
    rng = jax.random.PRNGKey(cfg.seed)
    sample = {k: jnp.asarray(v[:2]) for k, v in train.items()}

    def t_apply(v, b, det=True, rngs=None):
        return teacher.apply(v, b["input_ids"], b["attention_mask"],
                             b["token_type_ids"], deterministic=det, rngs=rngs)

    def s_apply(v, b, det=True, rngs=None):
        return student.apply(v, b["input_ids"], b["attention_mask"],
                             b["token_type_ids"], deterministic=det, rngs=rngs)

    if teacher_variables is None:
        teacher_variables = teacher.init(rng, sample["input_ids"],
                                         sample["attention_mask"],
                                         sample["token_type_ids"])
        # brief task fine-tune so the teacher carries signal
        steps = max(1, len(train["labels"]) // cfg.batch_size) * cfg.teacher_epochs
        tx = _bert_adam(cfg.teacher_lr, steps, cfg.warmup_frac)
        opt = tx.init(teacher_variables["params"])

        @jax.jit
        def t_step(params, opt, b, key):
            def loss_fn(p):
                out = t_apply({"params": p}, b, det=False,
                              rngs={"dropout": key})
                if regression:
                    return jnp.mean((out["logits"].ravel()
                                     - b["labels"]) ** 2)
                return cross_entropy(out["logits"], b["labels"])
            l, g = jax.value_and_grad(loss_fn)(params)
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, l

        nprng = np.random.RandomState(cfg.seed)
        params = teacher_variables["params"]
        for ep in range(cfg.teacher_epochs):
            for b in _batches(train, cfg.batch_size, nprng):
                rng, k = jax.random.split(rng)
                params, opt, l = t_step(params, opt, b, k)
        teacher_variables = {"params": params}
        log(f"teacher fine-tuned, last loss {float(l):.4f}")

    student_variables = student.init(jax.random.PRNGKey(cfg.seed + 2),
                                     sample["input_ids"],
                                     sample["attention_mask"],
                                     sample["token_type_ids"])

    history = []

    # teacher dev score first: the baseline the distilled student is
    # judged against (the reference prints it via do_eval on the teacher,
    # task_distill.py:1235-1285)
    @jax.jit
    def teacher_eval_step(b):
        out = t_apply(teacher_variables, b)
        if regression:
            return out["logits"].ravel()
        return jnp.argmax(out["logits"], -1)

    t_preds, t_labels = [], []
    for b in _batches(dev, cfg.batch_size, np.random.RandomState(0)):
        t_preds.append(np.asarray(teacher_eval_step(b)))
        t_labels.append(np.asarray(b["labels"]))
    trow = {"stage": 0, "teacher": True,
            **glue_metric(cfg.task, np.concatenate(t_preds),
                          np.concatenate(t_labels))}
    history.append(trow); log(trow)

    # ---- stage 1: attention + hidden MSE (pred_distill=False) ------------
    steps1 = max(1, len(train["labels"]) // cfg.batch_size) * cfg.stage1_epochs
    steps1 = max(1, steps1 // cfg.grad_accum_steps)  # optimizer updates, not micro-batches
    tx1 = _bert_adam(cfg.lr_stage1, steps1, cfg.warmup_frac, cfg.grad_accum_steps)
    opt1 = tx1.init(student_variables["params"])

    @jax.jit
    def stage1_step(params, opt, b, key):
        t_out = t_apply(teacher_variables, b)
        def loss_fn(p):
            s_out = s_apply({"params": p}, b, det=False, rngs={"dropout": key})
            att, rep = attention_hidden_distill_loss(
                s_out["attentions"], t_out["attentions"],
                s_out["hidden_states"], t_out["hidden_states"])
            return att + rep
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx1.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    nprng = np.random.RandomState(cfg.seed + 3)
    params = student_variables["params"]
    for ep in range(cfg.stage1_epochs):
        t0 = time.time()
        losses = []
        for b in _batches(train, cfg.batch_size, nprng):
            rng, k = jax.random.split(rng)
            params, opt1, l = stage1_step(params, opt1, b, k)
            losses.append(float(l))
        row = {"stage": 1, "epoch": ep + 1, "loss": float(np.mean(losses)),
               "time_s": time.time() - t0}
        history.append(row); log(row)

    # ---- stage 2: soft logits CE (pred_distill=True) ----------------------
    steps2 = max(1, len(train["labels"]) // cfg.batch_size) * cfg.stage2_epochs
    steps2 = max(1, steps2 // cfg.grad_accum_steps)
    tx2 = _bert_adam(cfg.lr_stage2, steps2, cfg.warmup_frac, cfg.grad_accum_steps)
    opt2 = tx2.init(params)

    @jax.jit
    def stage2_step(params, opt, b, key):
        t_out = t_apply(teacher_variables, b)
        def loss_fn(p):
            s_out = s_apply({"params": p}, b, det=False, rngs={"dropout": key})
            if regression:
                # reference task_distill.py:835-837: regression stage 2
                # fits the float labels directly with MSE
                return jnp.mean((s_out["logits"].ravel()
                                 - b["labels"]) ** 2)
            return soft_logits_loss(s_out["logits"], t_out["logits"],
                                    cfg.temperature)
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx2.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def eval_step(params, b):
        out = s_apply({"params": params}, b)
        if regression:
            return out["logits"].ravel()
        return jnp.argmax(out["logits"], -1)

    for ep in range(cfg.stage2_epochs):
        t0 = time.time()
        losses = []
        for b in _batches(train, cfg.batch_size, nprng):
            rng, k = jax.random.split(rng)
            params, opt2, l = stage2_step(params, opt2, b, k)
            losses.append(float(l))
        preds, labels = [], []
        for b in _batches(dev, cfg.batch_size, np.random.RandomState(0)):
            preds.append(np.asarray(eval_step(params, b)))
            labels.append(np.asarray(b["labels"]))
        m = glue_metric(cfg.task, np.concatenate(preds), np.concatenate(labels))
        row = {"stage": 2, "epoch": ep + 1, "loss": float(np.mean(losses)),
               "time_s": time.time() - t0, **m}
        history.append(row); log(row)

    return {"params": params}, history
