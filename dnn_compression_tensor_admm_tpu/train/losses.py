"""Losses: smoothed CE, soft-target CE (mixup), knowledge distillation.

Reference: timm LabelSmoothingCrossEntropy / SoftTargetCrossEntropy
selection (engines.py:183-189) and DistillationLoss (losses.py:5-61).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, smoothing: float = 0.0):
    """Mean CE against int labels, with optional label smoothing."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if smoothing > 0.0:
        off = smoothing / num_classes
        on = 1.0 - smoothing + off
        tgt = jax.nn.one_hot(labels, num_classes) * (on - off) + off
        return -jnp.mean(jnp.sum(tgt * logp, axis=-1))
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def soft_target_cross_entropy(logits, soft_targets):
    """Mean CE against probability targets (mixup path)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))


def distillation_loss(base_loss, student_logits, teacher_logits,
                      kind: str, alpha: float, tau: float):
    """Blend base loss with a distillation term (reference losses.py:47-61).

    kind='soft': KL(student/T || teacher/T) * T^2, normalized per element
    like the reference's `reduction='sum' / numel` (losses.py:51-56).
    kind='hard': CE against the teacher's argmax (losses.py:57-58).
    """
    if kind == "none":
        return base_loss
    s = student_logits.astype(jnp.float32)
    t = teacher_logits.astype(jnp.float32)
    if kind == "soft":
        T = tau
        logp_s = jax.nn.log_softmax(s / T, axis=-1)
        logp_t = jax.nn.log_softmax(t / T, axis=-1)
        p_t = jnp.exp(logp_t)
        kl = jnp.sum(p_t * (logp_t - logp_s))
        dist = kl * (T * T) / s.size
    elif kind == "hard":
        dist = cross_entropy(s, jnp.argmax(t, axis=-1))
    else:
        raise ValueError(kind)
    return base_loss * (1.0 - alpha) + dist * alpha
