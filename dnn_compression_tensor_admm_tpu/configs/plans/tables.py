"""Builders that turn the extracted reference rank tables into RankPlans.

`reference_hp.json` holds the mechanically-extracted hyper-parameter
data from the reference's hp_dicts/ package (see its _provenance key).
These builders apply the reference's interpretation rules:

* TK entries are ``[out_rank, in_rank]`` (hp_dicts/tk_resnet32_hp.py:7-37).
* A rank list of length 1 inside a TK/TT plan means "use plain SVD for
  this layer" (resnet_inet_tt.py:44-53).
* TT entries pair `ranks` with `tt_shapes`; the out/in split is derived
  from the layer's output width (TTConv.py:51-59, TTLinear.py:32-38).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Callable

from ..hp import RankPlan, SVDSpec, TKSpec, TTConvSpec, TTLinearSpec

_JSON = os.path.join(os.path.dirname(__file__), "reference_hp.json")


@functools.lru_cache(maxsize=1)
def reference_tables() -> dict:
    with open(_JSON) as f:
        return json.load(f)


def table_entry(fmt: str, model: str, ratio: str, tt_type: str = "general") -> dict:
    t = reference_tables()
    try:
        return t[fmt][model][f"{ratio}|{tt_type}"]
    except KeyError:
        avail = sorted(t.get(fmt, {}).get(model, {}))
        raise KeyError(
            f"no reference table for {fmt}/{model}/{ratio}/{tt_type}; have {avail}")


def _svd_rank(r) -> int:
    return r if isinstance(r, int) else r[0]


def build_tk_plan(model: str, ratio: str) -> RankPlan:
    e = table_entry("tk", model, ratio)
    layers = {}
    for name, r in e["ranks"].items():
        if isinstance(r, int) or len(r) == 1:
            layers[name] = SVDSpec(_svd_rank(r))
        else:
            layers[name] = TKSpec(int(r[0]), int(r[1]))
    return RankPlan("tk", layers)


def build_svd_plan(model: str, ratio: str) -> RankPlan:
    e = table_entry("svd", model, ratio)
    return RankPlan("svd", {n: SVDSpec(_svd_rank(r)) for n, r in e["ranks"].items()})


def build_tt_conv_plan(model: str, ratio: str, tt_type: str,
                       out_channels_fn: Callable[[str], int]) -> RankPlan:
    e = table_entry("tt", model, ratio, tt_type)
    layers = {}
    for name, ranks in e["ranks"].items():
        if isinstance(ranks, int) or len(ranks) == 1:
            layers[name] = SVDSpec(_svd_rank(ranks))
            continue
        shapes = e["tt_shapes"][name]
        layers[name] = TTConvSpec.create(tuple(shapes), tuple(ranks),
                                         out_channels_fn(name))
    return RankPlan("tt", layers)


def build_tt_linear_plan(model: str, ratio: str, tt_type: str,
                         out_features_fn: Callable[[str], int]) -> RankPlan:
    e = table_entry("tt", model, ratio, tt_type)
    layers = {}
    for name, ranks in e["ranks"].items():
        if isinstance(ranks, int) or len(ranks) == 1:
            layers[name] = SVDSpec(_svd_rank(ranks))
            continue
        shapes = e["tt_shapes"][name]
        layers[name] = TTLinearSpec.create(tuple(shapes), tuple(ranks),
                                           out_features_fn(name))
    return RankPlan("tt", layers)
