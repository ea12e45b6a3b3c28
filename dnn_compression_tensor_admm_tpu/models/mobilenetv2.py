"""MobileNetV2 (ImageNet), dense and compressed.

Architecture parity with the reference's own implementation
(mobilenetv2.py:44-128): conv3x3 stem, 17 inverted residual blocks
(cfgs mobilenetv2.py:93-101), 1x1 head conv, classifier. Canonical
parameter names follow that file: 'features.N.conv.{0,3,6}.weight'
(pw / dw / pw-linear; {0,3} for the t=1 block), head 'conv.0.weight'.

The reference's three mobilenetv2 rank tables use three different
naming schemes (its tt table is keyed by torchvision names, the tk
table by timm names, the svd table by the reference's own — a
consequence of loading pretrained weights from different sources).
The plan builders below remap all of them onto the one canonical
naming, so one model serves every format.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import RankPlan
from ..configs.resolver import get_rank_plan
from .registry import register_model
from .substitute import make_conv, _KAIMING

# (expand_ratio t, out_channels c, num_blocks n, stride s) — mobilenetv2.py:93-101
_CFGS = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
         (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
_BLOCKS_PER_STAGE = [n for _, _, n, _ in _CFGS]


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    expand: int
    prefix: str  # 'features.N'
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.inp * self.expand
        y = x
        if self.expand != 1:
            y = make_conv(self.inp, hidden, 1, plan=self.plan, mode=self.mode,
                          key=f"{self.prefix}.conv.0.weight", name="conv.0",
                          dtype=self.dtype)(y)
            y = _bn(train, self.dtype, "conv.1")(y)
            y = _relu6(y)
            dw_name, pwl_name = "conv.3", "conv.6"
            bn2, bn3 = "conv.4", "conv.7"
        else:
            dw_name, pwl_name = "conv.0", "conv.3"
            bn2, bn3 = "conv.1", "conv.4"
        # depthwise 3x3 (never factorized: grouped convs are outside every
        # reference rank table)
        y = nn.Conv(hidden, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
                    name=dw_name)(y)
        y = _bn(train, self.dtype, bn2)(y)
        y = _relu6(y)
        y = make_conv(hidden, self.oup, 1, plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.{pwl_name}.weight", name=pwl_name,
                      dtype=self.dtype)(y)
        y = _bn(train, self.dtype, bn3)(y)
        if self.stride == 1 and self.inp == self.oup:
            return x + y
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(32, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
                    name="features.0.0")(x)
        y = _bn(train, self.dtype, "features.0.1")(y)
        y = _relu6(y)
        inp = 32
        idx = 1
        for t, c, n, s in _CFGS:
            for i in range(n):
                stride = s if i == 0 else 1
                prefix = f"features.{idx}"
                y = InvertedResidual(inp, c, stride, t, prefix, plan=self.plan,
                                     mode=self.mode, dtype=self.dtype,
                                     name=prefix)(y, train=train)
                inp = c
                idx += 1
        y = make_conv(320, 1280, 1, plan=self.plan, mode=self.mode,
                      key="conv.0.weight", name="conv.0", dtype=self.dtype)(y)
        y = _bn(train, self.dtype, "conv.1")(y)
        y = _relu6(y)
        y = jnp.mean(y, axis=(1, 2))
        return nn.Dense(self.num_classes, name="classifier")(y.astype(jnp.float32))


# --- table-key remapping onto canonical names ------------------------------

def _feat_index(stage: int, block: int) -> int:
    return 1 + sum(_BLOCKS_PER_STAGE[:stage]) + block


def remap_tt_key(k: str) -> str:
    """torchvision naming -> canonical (tt table)."""
    if k == "conv.0.weight":
        return k
    parts = k.split(".")  # features.N.conv.X(.Y).weight
    n = int(parts[1])
    if parts[2] == "0":  # torchvision head: features.18.0.weight
        return "conv.0.weight"
    tail = ".".join(parts[2:])
    expand1 = (n == 1)
    table = ({"conv.0.0.weight": "conv.0.weight", "conv.1.weight": "conv.3.weight"}
             if expand1 else
             {"conv.0.0.weight": "conv.0.weight", "conv.1.0.weight": "conv.3.weight",
              "conv.2.weight": "conv.6.weight"})
    return f"features.{n}.{table[tail]}"


def remap_tk_key(k: str) -> str:
    """timm naming -> canonical (tk table)."""
    if k == "conv_head.weight":
        return "conv.0.weight"
    parts = k.split(".")  # blocks.S.B.conv_xx.weight
    s, b, kind = int(parts[1]), int(parts[2]), parts[3]
    n = _feat_index(s, b)
    expand1 = (s == 0)
    conv = {"conv_pw": "conv.0", "conv_dw": ("conv.0" if expand1 else "conv.3"),
            "conv_pwl": ("conv.3" if expand1 else "conv.6")}[kind]
    return f"features.{n}.{conv}.weight"


def _register_plans():
    from ..configs.hp import RankPlan as RP
    from ..configs.plans import build_svd_plan, build_tk_plan, build_tt_conv_plan
    from ..configs.resolver import register_plan

    def _remap(plan: RP, remap) -> RP:
        return RP(plan.fmt, {remap(k): v for k, v in plan.layers.items()})

    def _out_ch(name: str) -> int:
        # every tt-compressed conv is a 1x1: out width from the canonical name
        if name == "conv.0.weight":
            return 1280
        n = int(name.split(".")[1])
        idx = 1
        inp = 32
        for t, c, nn_, s in _CFGS:
            for i in range(nn_):
                if idx == n:
                    kind = name.split(".")[3]
                    if t == 1:
                        return c  # conv.3 = pw-linear
                    return inp * t if kind == "0" else c
                inp_prev = inp
                inp = c
                idx += 1
        raise KeyError(name)

    register_plan("mobilenetv2", "tk", "2")(
        lambda: _remap(build_tk_plan("mobilenetv2", "2"), remap_tk_key))
    register_plan("mobilenetv2", "svd", "2")(
        lambda: build_svd_plan("mobilenetv2", "2"))
    register_plan("mobilenetv2", "tt", "2")(
        lambda: _remap(build_tt_conv_plan("mobilenetv2", "2", "general",
                                          lambda k: _out_ch(remap_tt_key(k))),
                       remap_tt_key))


_register_plans()


def _build(*, num_classes=1000, fmt=None, mode="chain", ratio="2",
           tt_type="general", plan=None, dtype=None):
    if fmt is not None and plan is None:
        plan = get_rank_plan("mobilenetv2", "tk" if fmt == "stftk" else fmt,
                             ratio, tt_type)
    return MobileNetV2(num_classes=num_classes, plan=plan, mode=mode, dtype=dtype)


@register_model
def mobilenetv2(**kw):
    return _build(**kw)
