"""Automatic rank planning for vision models.

The reference only ships hand-tuned hp_dicts for a subset of the
(model, format, ratio) grid; `utils.get_hp_dict` (reference
utils.py:258-400) returns None for everything else, so registered
builders like `tkc_resnet20` cannot actually be instantiated there.
Here any dense model in the registry can be compressed at an arbitrary
numeric ratio: the planner walks the model's parameter shapes
(via `jax.eval_shape`, no real compute) and solves per-layer ranks that
hit the target parameter ratio, reusing the reference's own
rank-from-ratio machinery (xcompression/transformer/TTLinear.py:106-135,
SVDLinear.py:27) generalized to convs and Tucker-2.

Policy (mirrors the hand-tuned plans' shape):
* convs on RGB input (stems) and classifier heads are left dense;
* depthwise convs (in_channels == 1 per group) are left dense;
* 1x1 convs under TK/TT fall back to plain SVD, the reference's own
  rule for rank lists of length 1 (resnet_inet_tt.py:44-53);
* layers too small to benefit (< `min_params`) are left dense.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from .hp import RankPlan, SVDSpec, TKSpec, TTConvSpec, TTLinearSpec

_HEAD_NAMES = frozenset({"fc.weight", "head.weight", "classifier.weight",
                         "classifier.1.weight", "head.fc.weight",
                         "linear.weight"})

_CIFAR_MODELS = frozenset({"resnet20", "resnet32", "resnet56",
                           "densenet40", "densenet100", "mobilenetv2_cifar"})


def _input_size(model: str) -> int:
    return 32 if (model in _CIFAR_MODELS or "cifar" in model) else 224


@functools.lru_cache(maxsize=32)
def layer_inventory(model: str) -> Tuple[Tuple[str, Tuple[int, ...]], ...]:
    """Canonical (name, logical weight shape) for each compressible layer.

    Conv shapes are reported as [O, I, kh, kw] (reference state-dict
    layout), linear as [out, in]. Uses `jax.eval_shape` so even
    ImageNet-scale models cost no real compute or memory.
    """
    from ..layers.common import canonical_param_name
    from ..models.registry import create_model

    net = create_model(model)
    sz = _input_size(model)
    x = jnp.zeros((1, sz, sz, 3), jnp.float32)

    def init_fn(rng):
        try:
            return net.init(rng, x, train=False)
        except TypeError:
            return net.init(rng, x)

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    out: List[Tuple[str, Tuple[int, ...]]] = []
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(
            shapes["params"])[0]:
        path = tuple(getattr(k, "key", None) for k in keypath)
        if path[-1] != "kernel":
            continue
        name = canonical_param_name(path)
        if "downsample" in name:
            # residual projection branches are never compressed: no
            # reference hp dict carries a 'downsample' key, and the zoo
            # builders construct them as plain convs
            # (resnet_inet_tt.py:57-455)
            continue
        if leaf.ndim == 4:                       # flax HWIO
            kh, kw, cin, cout = leaf.shape
            if cin <= 3:                         # stem / depthwise
                continue
            out.append((name, (cout, cin, kh, kw)))
        elif leaf.ndim == 2:                     # flax [in, out]
            cin, cout = leaf.shape
            if name in _HEAD_NAMES or name.split(".")[-2:] == ["head", "weight"]:
                continue
            out.append((name, (cout, cin)))
    return tuple(out)


def _tk_ranks(o: int, i: int, k: int, ratio: float) -> TKSpec:
    """Solve alpha in  alpha*(O^2+I^2) + alpha^2*O*I*k = O*I*k/ratio,
    then (out_rank, in_rank) = alpha*(O, I). Params of a Tucker-2 conv
    are O*ro + I*ri + ro*ri*k (reference TKConv.py:111-134)."""
    a = float(o * i * k)
    b = float(o * o + i * i)
    c = float(o * i * k) / ratio
    alpha = (-b + math.sqrt(b * b + 4.0 * a * c)) / (2.0 * a)
    ro = max(1, round(alpha * o))
    ri = max(1, round(alpha * i))
    return TKSpec(min(ro, o), min(ri, i))


def _tt_ranks(shapes: Tuple[int, ...], ratio: float) -> Tuple[int, ...]:
    """Largest clamp-aware uniform TT rank with params <= prod(shapes)/ratio.

    The reference's `compute_ranks_tt` (TTLinear.py:106-135) solves the
    unclamped quadratic, which overshoots once edge ranks hit the
    prefix/suffix-product caps (ttd.py:18-19); here the caps are part of
    the objective so the achieved ratio tracks the target.
    """
    d = len(shapes)
    caps = [min(math.prod(shapes[:j]), math.prod(shapes[j:]))
            for j in range(d + 1)]
    target = math.prod(shapes) / ratio

    def params(r: int) -> int:
        rv = [min(c, r) for c in caps]
        return sum(shapes[j] * rv[j] * rv[j + 1] for j in range(d))

    lo, hi = 1, max(caps)
    while lo < hi:                       # largest r with params(r) <= target
        mid = (lo + hi + 1) // 2
        if params(mid) <= target:
            lo = mid
        else:
            hi = mid - 1
    return tuple(min(c, lo) for c in caps)


def _svd_rank(in_f: int, out_f: int, ratio: float) -> SVDSpec:
    from ..nlp.factorization import compute_rank_svd
    return SVDSpec(min(compute_rank_svd(in_f, out_f, ratio),
                       in_f, out_f))


def auto_rank_plan(model: str, fmt: str, ratio: float, *,
                   tt_type: str = "general", dim: int = 2,
                   min_params: int = 4096) -> RankPlan:
    """Build a RankPlan for any registry model at a numeric target ratio."""
    from ..nlp.factorization import split_to_factors

    ratio = float(ratio)
    if ratio <= 1.0:
        raise ValueError(f"auto plan needs ratio > 1, got {ratio}")
    layers: Dict[str, object] = {}
    for name, shape in layer_inventory(model):
        if math.prod(shape) < min_params:
            continue
        if len(shape) == 4:
            o, i, kh, kw = shape
            k = kh * kw
            if fmt == "svd" or (k == 1 and fmt in ("tk", "tt")):
                layers[name] = _svd_rank(i * k, o, ratio)
            elif fmt == "tk":
                layers[name] = _tk_ranks(o, i, k, ratio)
            elif fmt == "tt":
                if tt_type == "special":
                    shapes = (o, k, i)
                else:
                    shapes = tuple(split_to_factors(o, dim) + [k]
                                   + split_to_factors(i, dim))
                layers[name] = TTConvSpec.create(shapes, _tt_ranks(shapes, ratio), o)
            else:
                raise ValueError(f"unknown format {fmt!r}")
        else:
            o, i = shape
            if fmt == "svd":
                layers[name] = _svd_rank(i, o, ratio)
            elif fmt == "tk":
                layers[name] = _tk_ranks(o, i, 1, ratio)
            elif fmt == "tt":
                shapes = tuple(split_to_factors(o, dim)
                               + split_to_factors(i, dim))
                layers[name] = TTLinearSpec.create(shapes, _tt_ranks(shapes, ratio), o)
            else:
                raise ValueError(f"unknown format {fmt!r}")
    if not layers:
        raise ValueError(f"auto plan found no compressible layers in {model}")
    return RankPlan(fmt, layers)
