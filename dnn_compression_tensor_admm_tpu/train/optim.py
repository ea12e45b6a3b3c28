"""Optimizers and LR schedules (optax), plus Riemannian SGD for Stiefel
factors.

Reference: timm create_optimizer/create_scheduler (engines.py:176-180;
defaults: SGD-momentum 0.9, wd 1e-4, cosine schedule, lr 0.1 scaled by
world size, parse_args.py:30-68) and geoopt RiemannianSGD/Adam for the
'stf*' manifold models (engines.py:167-174).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def make_schedule(kind: str, base_lr: float, epochs: int, steps_per_epoch: int,
                  warmup_epochs: int = 0, min_lr: float = 1e-5,
                  decay_epochs: int = 30, decay_rate: float = 0.1):
    total = max(1, epochs * steps_per_epoch)
    warm = warmup_epochs * steps_per_epoch
    if kind == "cosine":
        if warm > 0:
            return optax.warmup_cosine_decay_schedule(
                init_value=1e-6, peak_value=base_lr, warmup_steps=warm,
                decay_steps=total, end_value=min_lr)
        return optax.cosine_decay_schedule(base_lr, total, alpha=min_lr / base_lr)
    if kind == "step":
        bounds = {i * decay_epochs * steps_per_epoch: decay_rate
                  for i in range(1, max(1, epochs // decay_epochs) + 1)}
        return optax.piecewise_constant_schedule(base_lr, bounds)
    if kind == "constant":
        return optax.constant_schedule(base_lr)
    raise ValueError(kind)


def make_optimizer(opt: str, schedule, *, momentum: float = 0.9,
                   weight_decay: float = 1e-4, clip_grad: Optional[float] = None,
                   stiefel: bool = False):
    """SGD-momentum / nesterov / adamw with decoupled-from-loss weight decay
    applied like torch SGD (added to the gradient, i.e. L2)."""
    txs = []
    if clip_grad is not None:
        txs.append(optax.clip_by_global_norm(clip_grad))
    if weight_decay > 0 and opt in ("momentum", "sgd"):
        txs.append(optax.add_decayed_weights(weight_decay))
    if opt == "momentum":
        txs.append(optax.sgd(schedule, momentum=momentum, nesterov=False))
    elif opt == "sgd":
        txs.append(optax.sgd(schedule, momentum=momentum, nesterov=True))
    elif opt == "adamw":
        txs.append(optax.adamw(schedule, weight_decay=weight_decay))
    elif opt == "adam":
        txs.append(optax.adam(schedule))
    else:
        raise ValueError(opt)
    tx = optax.chain(*txs)
    if stiefel:
        tx = _with_stiefel(tx, schedule, momentum, weight_decay)
    return tx


# --- Riemannian SGD on the Stiefel manifold -------------------------------
# Replaces geoopt.RiemannianSGD for the Stf* layers (StfTKConv.py:69-73):
# factor params are kept (column-)orthonormal by projecting the euclidean
# gradient to the tangent space and retracting via QR after the update.

def _is_stiefel_path(path) -> bool:
    keys = [getattr(k, "key", "") for k in path]
    return any(str(k) in ("first_factor", "last_factor") for k in keys)


def _tangent_project(w, g):
    """Project euclidean grad onto the tangent space of the Stiefel
    manifold at w (canonical metric): g - w sym(w^T g)."""
    tall = w.shape[0] >= w.shape[1]
    a = w if tall else w.T
    ga = g if tall else g.T
    wtg = a.T @ ga
    sym = 0.5 * (wtg + wtg.T)
    t = ga - a @ sym
    return t if tall else t.T


def _retract(w):
    """QR retraction back onto the manifold (sign-fixed)."""
    tall = w.shape[0] >= w.shape[1]
    a = w if tall else w.T
    q, r = jnp.linalg.qr(a)
    d = jnp.sign(jnp.diagonal(r))
    q = q * jnp.where(d == 0, 1.0, d)[None, :]
    return q if tall else q.T


def riemannian_sgd(schedule, momentum: float = 0.9):
    """Minimal Riemannian SGD: tangent-projected momentum + QR retraction.
    Applied only to 2-D 'first_factor'/'last_factor' params."""

    def init(params):
        return {"mu": jax.tree.map(jnp.zeros_like, params), "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        lr = schedule(state["count"]) if callable(schedule) else schedule
        flat_g = jax.tree_util.tree_flatten_with_path(grads)[0]
        flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_m = jax.tree_util.tree_flatten_with_path(state["mu"])[0]
        treedef = jax.tree_util.tree_structure(grads)
        new_u, new_m = [], []
        for (pa, g), (_, p), (_, m) in zip(flat_g, flat_p, flat_m):
            if _is_stiefel_path(pa) and g.ndim == 2:
                rg = _tangent_project(p, g)
                m2 = momentum * m + rg
                upd = _retract(p - lr * m2) - p  # delta that lands on manifold
            else:
                m2 = momentum * m + g
                upd = -lr * m2
            new_u.append(upd)
            new_m.append(m2)
        updates = jax.tree_util.tree_unflatten(treedef, new_u)
        mu = jax.tree_util.tree_unflatten(treedef, new_m)
        return updates, {"mu": mu, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def _with_stiefel(base_tx, schedule, momentum, weight_decay):
    """Route Stiefel factor params through riemannian_sgd, rest through
    the base optimizer."""
    def label(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        labs = ["stiefel" if (_is_stiefel_path(pa) and a.ndim == 2) else "base"
                for pa, a in flat]
        return jax.tree_util.tree_unflatten(treedef, labs)
    return optax.multi_transform(
        {"base": base_tx, "stiefel": riemannian_sgd(schedule, momentum)}, label)
