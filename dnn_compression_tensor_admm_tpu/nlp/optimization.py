"""BertAdam and warmup schedules (reference
xcompression/transformer/optimization.py:35-301), as optax components.

BertAdam differs from textbook AdamW in three load-bearing ways
(optimization.py:258-292):

* **no bias correction** — m and v are used raw from step 0;
* **per-parameter gradient clipping** — each tensor's grad is clipped to
  `max_grad_norm` by its own L2 norm (not a global norm);
* **decoupled weight decay added to the Adam update before the lr
  multiply** — update = m/(sqrt(v)+eps) + wd*p, then p -= lr_t * update.

The schedule multiplies lr by a factor in [0, 1] as a function of
progress = step / t_total (optimization.py:35-181).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# --- warmup schedules (multiplier on lr, progress in [0, 1]) --------------

def warmup_linear(warmup: float, t_total: int) -> optax.Schedule:
    """Linear 0->1 over `warmup` fraction, then linear 1->0
    (WarmupLinearSchedule, optimization.py:162-171)."""
    def fn(step):
        p = jnp.minimum(step / max(1, t_total), 1.0)
        return jnp.where(p < warmup, p / max(warmup, 1e-8),
                         jnp.maximum((p - 1.0) / min(warmup - 1.0, -1e-8), 0.0))
    return fn


def warmup_constant(warmup: float, t_total: int) -> optax.Schedule:
    """Linear 0->1 over `warmup` fraction, then constant 1
    (WarmupConstantSchedule, optimization.py:151-159)."""
    def fn(step):
        p = jnp.minimum(step / max(1, t_total), 1.0)
        return jnp.where(p < warmup, p / max(warmup, 1e-8), 1.0)
    return fn


def warmup_cosine(warmup: float, t_total: int, cycles: float = 0.5) -> optax.Schedule:
    """Linear 0->1 over `warmup`, then cosine decay
    (WarmupCosineSchedule, optimization.py:84-109)."""
    def fn(step):
        p = jnp.minimum(step / max(1, t_total), 1.0)
        q = (p - warmup) / max(1.0 - warmup, 1e-8)
        return jnp.where(p < warmup, p / max(warmup, 1e-8),
                         0.5 * (1.0 + jnp.cos(math.pi * cycles * 2.0 * q)))
    return fn


def warmup_cosine_hard_restarts(warmup: float, t_total: int,
                                cycles: float = 1.0) -> optax.Schedule:
    """Cosine with `cycles` hard restarts after warmup
    (WarmupCosineWithHardRestartsSchedule, optimization.py:111-127)."""
    assert cycles >= 1.0
    def fn(step):
        p = jnp.minimum(step / max(1, t_total), 1.0)
        q = (p - warmup) / max(1.0 - warmup, 1e-8)
        return jnp.where(p < warmup, p / max(warmup, 1e-8),
                         0.5 * (1.0 + jnp.cos(math.pi * ((cycles * q) % 1.0))))
    return fn


SCHEDULES = {
    None: lambda warmup, t_total: (lambda step: jnp.asarray(1.0)),
    "none": lambda warmup, t_total: (lambda step: jnp.asarray(1.0)),
    "warmup_linear": warmup_linear,
    "warmup_constant": warmup_constant,
    "warmup_cosine": warmup_cosine,
    "warmup_cosine_hard_restarts": warmup_cosine_hard_restarts,
}


# --- BertAdam --------------------------------------------------------------

class BertAdamState(NamedTuple):
    step: jax.Array
    m: optax.Updates
    v: optax.Updates


def bert_adam(lr: float, *, schedule: Optional[str] = "warmup_linear",
              warmup: float = -1.0, t_total: int = -1,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
              weight_decay: float = 0.01,
              max_grad_norm: float = 1.0,
              grad_accum_steps: int = 1) -> optax.GradientTransformation:
    """The vendored BertAdam (reference optimization.py:183-301).

    With t_total <= 0 the lr multiplier is constant 1 (reference
    `get_lr` returns base lr). `grad_accum_steps > 1` wraps in
    optax.MultiSteps (reference task_distill.py:843-846 divides loss
    and steps every N batches).

    Weight decay skips biases and LayerNorm params (reference
    task_distill.py:759-762 'no_decay' grouping; in flax those leaves
    are named 'bias' and 'scale').
    """
    if t_total > 0:
        sched = SCHEDULES[schedule](max(warmup, 0.0), t_total)
    else:
        sched = lambda step: jnp.asarray(1.0)

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros([], jnp.int32), m=z,
                             v=jax.tree.map(jnp.zeros_like, params))

    def clip_leaf(g):
        if max_grad_norm <= 0:
            return g
        n = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
        scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(n, 1e-12))
        return g * scale

    def decays(path) -> bool:
        leaf = str(getattr(path[-1], "key", path[-1])) if path else ""
        return leaf not in ("bias", "scale")

    def update(grads, state, params):
        if params is None:
            raise ValueError("bert_adam needs params for weight decay")
        grads = jax.tree.map(clip_leaf, grads)
        m = jax.tree.map(lambda mi, g: b1 * mi + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda vi, g: b2 * vi + (1 - b2) * g * g, state.v, grads)
        lr_t = lr * sched(state.step)
        updates = jax.tree_util.tree_map_with_path(
            lambda path, mi, vi, p: -lr_t * (
                mi / (jnp.sqrt(vi) + eps)
                + (weight_decay if decays(path) else 0.0) * p),
            m, v, params)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    tx = optax.GradientTransformation(init, update)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
