"""Two-stage TinyBERT-style distillation losses (task_distill.py:806-840).

Stage 1 (`pred_distill=False`): MSE between student and teacher attention
scores (large negative masked positions zeroed, task_distill.py:817-822)
plus MSE between hidden states (embeddings included), 1:1 layer mapping
when depths match or strided mapping otherwise.

Stage 2 (`pred_distill=True`): soft cross-entropy between student logits
and teacher logits at temperature T (soft_cross_entropy,
task_distill.py:721-724).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _zero_masked(att):
    # reference: torch.where(att <= -1e2, 0, att) (task_distill.py:817-822)
    return jnp.where(att <= -1e2, 0.0, att)


def attention_hidden_distill_loss(student_atts: Sequence[jax.Array],
                                  teacher_atts: Sequence[jax.Array],
                                  student_reps: Sequence[jax.Array],
                                  teacher_reps: Sequence[jax.Array]):
    """Returns (att_loss, rep_loss). Layer mapping: every
    len(teacher)/len(student)-th teacher layer (task_distill.py:808-815)."""
    ns, nt = len(student_atts), len(teacher_atts)
    assert nt % ns == 0, (ns, nt)
    k = nt // ns
    att_loss = 0.0
    for i, s in enumerate(student_atts):
        t = teacher_atts[(i + 1) * k - 1]
        att_loss += jnp.mean((_zero_masked(s) - _zero_masked(t)) ** 2)
    rep_loss = 0.0
    # hidden states include the embedding output: ns+1 student reps
    for i, s in enumerate(student_reps):
        t = teacher_reps[i * k]
        rep_loss += jnp.mean((s.astype(jnp.float32) - t.astype(jnp.float32)) ** 2)
    return att_loss, rep_loss


def soft_logits_loss(student_logits, teacher_logits, temperature: float = 1.0):
    """Soft cross-entropy -sum(softmax(t/T) * log_softmax(s/T)), mean over
    batch (task_distill.py:721-724)."""
    T = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / T, axis=-1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T, axis=-1)
    return -jnp.mean(jnp.sum(t * s, axis=-1))
