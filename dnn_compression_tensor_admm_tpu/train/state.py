"""Train state: one checkpointable pytree for the whole pipeline.

Unlike the reference checkpoint dict (engines.py:333-347), ADMM duals
(U, Z) are part of the state and survive resume (the reference loses
them — SURVEY.md §5 'Checkpoint/resume').
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..admm import AdmmState


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    admm: Optional[AdmmState]
    ema_params: Any          # None when EMA disabled
    rng: jax.Array

    def variables(self, use_ema: bool = False):
        p = self.ema_params if (use_ema and self.ema_params is not None) else self.params
        v = {"params": p}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, tx, rng, sample_input, *, admm_state=None,
                       ema: bool = False, train_kwarg: bool = True):
    init_rng, state_rng = jax.random.split(rng)
    if train_kwarg:
        variables = model.init(init_rng, sample_input, train=False)
    else:
        variables = model.init(init_rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        admm=admm_state,
        # real copy: ema must not alias params (donated buffers)
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        rng=state_rng,
    )
