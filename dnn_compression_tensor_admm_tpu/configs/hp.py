"""Typed per-layer rank specifications.

The reference carries rank hyper-parameters as loose dicts on
`HyperParamsDict*` classes (`ranks`, `tt_shapes`, `in/out_tt_shapes`,
e.g. hp_dicts/tt_resnet32_hp.py:10-207) and re-derives the out/in split
inside every layer constructor (TTConv.py:51-68). Here the split and the
static rank clamp are resolved once, at config time, so every consumer
(layers, ADMM projections, FLOPs accounting) sees one immutable,
hashable spec.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Optional, Tuple

from ..ops.ttd import clamp_tt_ranks


@dataclasses.dataclass(frozen=True)
class TTConvSpec:
    """TT factorization of a conv kernel [O, I, kh, kw].

    The TT tensorization is ``[out_shapes..., kh*kw, in_shapes...]`` with
    prod(out_shapes) == O and prod(in_shapes) == I (reference:
    admm.py:91-101, TTConv.py:49-68).
    """
    tt_shapes: Tuple[int, ...]
    tt_ranks: Tuple[int, ...]
    out_order: int  # number of leading shapes that multiply to out_channels

    @property
    def out_shapes(self) -> Tuple[int, ...]:
        return self.tt_shapes[:self.out_order]

    @property
    def filter_dim(self) -> int:
        return self.tt_shapes[self.out_order]

    @property
    def in_shapes(self) -> Tuple[int, ...]:
        return self.tt_shapes[self.out_order + 1:]

    @property
    def out_ranks(self) -> Tuple[int, ...]:
        return self.tt_ranks[:self.out_order + 1]

    @property
    def in_ranks(self) -> Tuple[int, ...]:
        return self.tt_ranks[self.out_order + 1:]

    @property
    def out_channels(self) -> int:
        return math.prod(self.out_shapes)

    @property
    def in_channels(self) -> int:
        return math.prod(self.in_shapes) if self.in_shapes else 1

    @staticmethod
    def create(tt_shapes, tt_ranks, out_channels) -> "TTConvSpec":
        """Derive the out/in split by prefix-product scan (TTConv.py:51-59)
        and clamp ranks statically (ttd.py:18-19 made static)."""
        shapes = tuple(tt_shapes)
        channels = 1
        out_order = None
        for i, s in enumerate(shapes):
            channels *= s
            if channels == out_channels:
                out_order = i + 1
                break
        if out_order is None:
            raise ValueError(f"tt_shapes {shapes} have no prefix with product {out_channels}")
        ranks = tuple(clamp_tt_ranks(shapes, tt_ranks))
        return TTConvSpec(shapes, ranks, out_order)


@dataclasses.dataclass(frozen=True)
class TTLinearSpec:
    """TT factorization of a linear weight [out_features, in_features].

    Tensorization ``[out_shapes..., in_shapes...]`` (reference:
    TTLinear.py:29-43, admm.py:103-111).
    """
    tt_shapes: Tuple[int, ...]
    tt_ranks: Tuple[int, ...]
    out_order: int

    @property
    def out_shapes(self) -> Tuple[int, ...]:
        return self.tt_shapes[:self.out_order]

    @property
    def in_shapes(self) -> Tuple[int, ...]:
        return self.tt_shapes[self.out_order:]

    @property
    def out_features(self) -> int:
        return math.prod(self.out_shapes)

    @property
    def in_features(self) -> int:
        return math.prod(self.in_shapes)

    @property
    def mid_rank(self) -> int:
        """TT rank at the out/in boundary — the effective bottleneck width."""
        return self.tt_ranks[self.out_order]

    @staticmethod
    def create(tt_shapes, tt_ranks, out_features) -> "TTLinearSpec":
        shapes = tuple(tt_shapes)
        channels = 1
        out_order = None
        for i, s in enumerate(shapes):
            channels *= s
            if channels == out_features:
                out_order = i + 1
                break
        if out_order is None:
            raise ValueError(f"tt_shapes {shapes} have no prefix with product {out_features}")
        ranks = tuple(clamp_tt_ranks(shapes, tt_ranks))
        return TTLinearSpec(shapes, ranks, out_order)


@dataclasses.dataclass(frozen=True)
class TKSpec:
    """Tucker-2 ranks for a conv kernel or linear weight: (out_rank, in_rank).

    Reference stores these as 2-lists ``ranks[name] = [out, in]``
    (hp_dicts/tk_resnet32_hp.py:7-37).
    """
    out_rank: int
    in_rank: int

    def clamped(self, weight_shape) -> "TKSpec":
        """Clamp to feasible multilinear ranks for a given logical weight
        shape [O, I, ...] (mode-k rank <= n_k and <= prod of the rest)."""
        dims = list(weight_shape)
        rest0 = math.prod(dims[1:])
        rest1 = dims[0] * math.prod(dims[2:])
        return TKSpec(min(self.out_rank, dims[0], rest0),
                      min(self.in_rank, dims[1], rest1))


@dataclasses.dataclass(frozen=True)
class SVDSpec:
    """Plain low-rank (matrix SVD) spec, used for 1x1 convs and linears."""
    rank: int


LayerSpec = object  # union of the four spec types above


@dataclasses.dataclass(frozen=True)
class RankPlan:
    """Per-layer compression plan for one model at one compression ratio.

    `layers` maps canonical parameter names (reference state-dict style,
    e.g. 'layer1.0.conv1.weight') to specs. `fmt` is 'tt' | 'tk' | 'svd';
    a layer's own spec type wins when it differs (the reference mixes SVD
    convs into TT plans when a rank list has length 1, resnet_inet_tt.py:44-53).
    """
    fmt: str
    layers: Mapping[str, LayerSpec]

    def spec(self, name: str) -> Optional[LayerSpec]:
        return self.layers.get(name)

    def __contains__(self, name: str) -> bool:
        return name in self.layers

    def names(self):
        return self.layers.keys()
