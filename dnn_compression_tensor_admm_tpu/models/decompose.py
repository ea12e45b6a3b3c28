"""Decompose: dense checkpoint -> factorized checkpoint, as a pure
params->params transform.

The reference folds decomposition into layer constructors (`dense_w=`
protocol, e.g. TKConv.py:78-84) and rebuilds each model twin
(resnet_cifar_tt.py:207-229). Here the decomposition is a standalone
function over param pytrees: factorize every plan-targeted kernel, copy
everything else through — so phase 2 of the pipeline (SURVEY.md §3.2)
is `variables_ft = decompose_params(variables_admm, plan)`.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..configs.hp import RankPlan, SVDSpec, TKSpec, TTConvSpec, TTLinearSpec
from ..layers import SVDConv2d, SVDLinear, TKConv2d, TKLinear, TTConv2d, TTLinear
from ..layers.common import canonical_param_name


def _name_to_path_map(params) -> Dict[str, tuple]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, _ in flat:
        path = tuple(getattr(k, "key", None) for k in keypath)
        out[canonical_param_name(path)] = path
    return out


def _factorize(spec, w, is_conv: bool, method: str, n_iter: int) -> dict:
    if is_conv:
        w_oihw = jnp.transpose(w, (3, 2, 0, 1))
        if isinstance(spec, TTConvSpec):
            return TTConv2d.factorize_dense(w_oihw, spec, method=method)
        if isinstance(spec, TKSpec):
            return TKConv2d.factorize_dense(w_oihw, spec, n_iter=n_iter, method=method)
        if isinstance(spec, SVDSpec):
            return SVDConv2d.factorize_dense(w_oihw, spec)
    else:
        w_oi = w.T  # flax Dense stores [in, out]
        if isinstance(spec, TTLinearSpec):
            return TTLinear.factorize_dense(w_oi, spec, method=method)
        if isinstance(spec, TKSpec):
            return TKLinear.factorize_dense(w_oi, spec, n_iter=n_iter, method=method)
        if isinstance(spec, SVDSpec):
            return SVDLinear.factorize_dense(w_oi, spec)
    raise TypeError(f"bad spec {type(spec)} for ndim={w.ndim}")


def decompose_params(variables, plan: RankPlan, *, method: str = "svd",
                     n_iter: int = 10):
    """Transform a dense model's variables into the factorized model's.

    `variables` is the full flax collection dict ({'params': ...,
    'batch_stats': ...}); non-param collections pass through unchanged
    (the reference copies bn/linear weights the same way,
    resnet_cifar_tt.py:224-229).
    """
    params = jax.tree.map(lambda a: a, variables["params"])  # shallow-ish copy
    name_to_path = _name_to_path_map(params)
    for name in plan.names():
        if name not in name_to_path:
            raise KeyError(f"plan layer {name!r} not present in dense params")
        path = name_to_path[name]
        parent = params
        for k in path[:-1]:
            parent = parent[k]
        w = parent.pop(path[-1])
        spec = plan.spec(name)
        parent.update(_factorize(spec, w, w.ndim == 4, method, n_iter))
    out = dict(variables)
    out["params"] = params
    return out


def count_params(tree) -> int:
    return sum(int(math.prod(a.shape)) for a in jax.tree.leaves(tree))


def compression_ratio(dense_variables, compressed_variables) -> float:
    """Dense/compressed parameter-count ratio (the reference reports this
    in every model file's __main__ smoke block, resnet_cifar_tt.py:403-439)."""
    return count_params(dense_variables["params"]) / count_params(
        compressed_variables["params"])
