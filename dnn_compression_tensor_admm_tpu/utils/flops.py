"""Analytic FLOPs/params accounting via XLA cost analysis.

The reference hand-computes per-layer FLOPs in every factorized layer
(`forward_flops`, TTConv.py:155-195, TKConv.py:111-134); here the compiled
program itself is measured, so the numbers reflect what actually runs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def model_flops_params(model, variables, input_shape) -> dict:
    x = jnp.zeros(input_shape)
    fn = lambda v, x: model.apply(v, x, train=False)
    lowered = jax.jit(fn).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns per-device list
        cost = cost[0]
    n_params = sum(int(math.prod(a.shape))
                   for a in jax.tree.leaves(variables.get("params", variables)))
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
        "params": n_params,
    }
