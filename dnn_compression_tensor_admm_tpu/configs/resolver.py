"""Rank-plan registry: (model, format, ratio, tt_type) -> RankPlan.

Replaces the reference's `utils.get_hp_dict` if/elif import ladder
(utils.py:258-400). Plans self-register via `register_plan` from the
per-model config modules in this package.
"""

from __future__ import annotations

import importlib
import re
from typing import Callable, Dict, Tuple

from .hp import RankPlan

_REGISTRY: Dict[Tuple[str, str, str, str], Callable[[], RankPlan]] = {}

# Model modules register their plans on import (lazy, to keep import light;
# model code knows the architectural facts — e.g. per-stage channel counts —
# needed to type the raw rank tables).
_PLAN_MODULES = [
    "dnn_compression_tensor_admm_tpu.models.resnet_cifar",
    "dnn_compression_tensor_admm_tpu.models.resnet_inet",
    "dnn_compression_tensor_admm_tpu.models.vit",
    "dnn_compression_tensor_admm_tpu.models.mobilenetv2",
    "dnn_compression_tensor_admm_tpu.models.mobilenetv2_cifar",
    "dnn_compression_tensor_admm_tpu.models.densenet",
    "dnn_compression_tensor_admm_tpu.models.vgg",
]
_LOADED = False


def register_plan(model: str, fmt: str, ratio: str, tt_type: str = "general"):
    """Decorator: register a zero-arg plan builder."""
    def deco(fn):
        _REGISTRY[(model, fmt, str(ratio), tt_type)] = fn
        return fn
    return deco


def _load_all():
    global _LOADED
    if _LOADED:
        return
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass
    _LOADED = True


def strip_format_prefix(model: str) -> str:
    """'tkc_resnet32' -> 'resnet32' (reference: utils.py:259-261)."""
    return re.sub(r"^(tt|tk|svd|stftk)(r|m|c)?_", "", model)


def get_rank_plan(model: str, fmt: str, ratio: str, tt_type: str = "general") -> RankPlan:
    """Resolve the plan for a model name (with or without format prefix).

    Hand-tuned reference tables win; any other numeric ratio falls back
    to the automatic rank planner (the reference's get_hp_dict instead
    returns None there, utils.py:397-400, leaving its own registered
    builders like tkc_resnet20 un-instantiable).
    """
    _load_all()
    base = strip_format_prefix(model)
    key = (base, fmt, str(ratio), tt_type)
    if key in _REGISTRY:
        try:
            return _REGISTRY[key]()
        except KeyError:
            pass  # registered combo with no reference table: try auto plan
    try:
        numeric = float(ratio)
    except (TypeError, ValueError):
        numeric = None
    if numeric is not None and numeric > 1.0:
        from .auto_plan import auto_rank_plan
        try:
            return auto_rank_plan(base, fmt, numeric, tt_type=tt_type)
        except KeyError:
            pass  # unknown base model: fall through to the catalog error
    avail = sorted(k for k in _REGISTRY if k[0] == base)
    raise KeyError(f"no rank plan for {key}; available for {base}: {avail}")
