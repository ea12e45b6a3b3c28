"""Layer-substitution: pick dense vs factorized modules from a RankPlan.

One mechanism serves the whole zoo — the reference instead duplicates
every model file with a hand-written compressed twin that swaps layers
iff the name is in the hp dict (resnet_cifar_tt.py:40-65,
vit_tt.py:33-94, mobilenetv2_tt.py:68-134).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..configs.hp import RankPlan, SVDSpec, TKSpec, TTConvSpec, TTLinearSpec
from ..layers import SVDConv2d, SVDLinear, TKConv2d, TKLinear, TTConv2d, TTLinear

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def make_conv(in_ch: int, out_ch: int, kernel_size, *, stride=1, padding=0,
              plan: Optional[RankPlan], mode: str, key: str, name: str,
              use_bias: bool = False, dtype=None) -> nn.Module:
    """Dense conv, or the factorized layer the plan prescribes for `key`.

    `key` is the canonical dense parameter name ('layer1.0.conv1.weight');
    a layer participates iff the key is in the plan (the reference's
    `if name in hp_dict.ranks` gate, resnet_cifar_tt.py:47-58).
    """
    spec = plan.spec(key) if plan is not None else None
    if spec is None:
        k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
        p = (padding, padding) if isinstance(padding, int) else padding
        return nn.Conv(out_ch, k, strides=stride,
                       padding=[(p[0], p[0]), (p[1], p[1])],
                       use_bias=use_bias, kernel_init=_KAIMING,
                       dtype=dtype, name=name)
    common = dict(stride=stride, padding=padding, use_bias=use_bias,
                  dtype=dtype, name=name)
    if isinstance(spec, TTConvSpec):
        tt_mode = "reconstruct" if mode == "reconstruct" else "factorized"
        return TTConv2d(in_ch, out_ch, kernel_size, spec, mode=tt_mode, **common)
    if isinstance(spec, TKSpec):
        tk_mode = "reconstruct" if mode == "reconstruct" else "chain"
        return TKConv2d(in_ch, out_ch, kernel_size, spec, mode=tk_mode, **common)
    if isinstance(spec, SVDSpec):
        svd_mode = "reconstruct" if mode == "reconstruct" else "chain"
        return SVDConv2d(in_ch, out_ch, kernel_size, spec, mode=svd_mode, **common)
    raise TypeError(f"bad conv spec for {key}: {type(spec)}")


def make_linear(in_f: int, out_f: int, *, plan: Optional[RankPlan], mode: str,
                key: str, name: str, use_bias: bool = True, dtype=None) -> nn.Module:
    spec = plan.spec(key) if plan is not None else None
    if spec is None:
        return nn.Dense(out_f, use_bias=use_bias, kernel_init=_KAIMING,
                        dtype=dtype, name=name)
    common = dict(use_bias=use_bias, dtype=dtype, name=name)
    if isinstance(spec, TTLinearSpec):
        m = "reconstruct" if mode == "reconstruct" else "factorized"
        return TTLinear(in_f, out_f, spec, mode=m, **common)
    if isinstance(spec, TKSpec):
        m = "reconstruct" if mode == "reconstruct" else "chain"
        return TKLinear(in_f, out_f, spec, mode=m, **common)
    if isinstance(spec, SVDSpec):
        m = "reconstruct" if mode == "reconstruct" else "chain"
        return SVDLinear(in_f, out_f, spec, mode=m, **common)
    raise TypeError(f"bad linear spec for {key}: {type(spec)}")
