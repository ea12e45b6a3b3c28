"""DenseNet — CIFAR (densenet40/100) and ImageNet (densenet121/201/264),
dense and compressed.

CIFAR parity (densenet_cifar.py:10-157): pre-activation BasicBlock
(bn-relu-conv3x3-concat) or BottleneckBlock, reduction-0.5 transitions,
names 'block{1,2,3}.layer.{i}.conv{1,2}.weight', 'trans{1,2}.conv1.weight'.
ImageNet parity (densenet_inet_tt.py, torchvision naming):
'features.denseblock{b}.denselayer{l}.conv{1,2}.weight',
'features.transition{b}.conv.weight', stem 'features.conv0'.
The reference grad-checkpoints bottleneck functions
(densenet_inet_tt.py:80-99); here `jax.checkpoint` wraps the dense-layer
body for the same memory/recompute trade.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import RankPlan
from ..configs.resolver import get_rank_plan
from .registry import register_model
from .substitute import make_conv, _KAIMING


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


# --------------------------- CIFAR variant ---------------------------------

class _CifarDenseLayer(nn.Module):
    in_planes: int
    growth: int
    bottleneck: bool
    prefix: str
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(_bn(train, self.dtype, "bn1")(x))
        if self.bottleneck:
            inter = 4 * self.growth
            y = make_conv(self.in_planes, inter, 1, plan=self.plan,
                          mode=self.mode, key=f"{self.prefix}.conv1.weight",
                          name="conv1", dtype=self.dtype)(y)
            y = nn.relu(_bn(train, self.dtype, "bn2")(y))
            y = make_conv(inter, self.growth, 3, padding=1, plan=self.plan,
                          mode=self.mode, key=f"{self.prefix}.conv2.weight",
                          name="conv2", dtype=self.dtype)(y)
        else:
            y = make_conv(self.in_planes, self.growth, 3, padding=1,
                          plan=self.plan, mode=self.mode,
                          key=f"{self.prefix}.conv1.weight", name="conv1",
                          dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetCifar(nn.Module):
    depth: int
    growth: int
    bottleneck: bool
    num_classes: int = 10
    reduction: float = 0.5
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = (self.depth - 4) // 3
        if self.bottleneck:
            n //= 2
        in_planes = 2 * self.growth
        y = nn.Conv(in_planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_KAIMING, dtype=self.dtype, name="conv1")(x)
        for b in (1, 2, 3):
            for i in range(n):
                prefix = f"block{b}.layer.{i}"
                y = _CifarDenseLayer(in_planes, self.growth, self.bottleneck,
                                     prefix, plan=self.plan, mode=self.mode,
                                     dtype=self.dtype, name=prefix)(y, train=train)
                in_planes += self.growth
            if b < 3:
                out_planes = int(math.floor(in_planes * self.reduction))
                prefix = f"trans{b}"
                y = nn.relu(_bn(train, self.dtype, f"{prefix}.bn1")(y))
                y = make_conv(in_planes, out_planes, 1, plan=self.plan,
                              mode=self.mode, key=f"{prefix}.conv1.weight",
                              name=f"{prefix}.conv1", dtype=self.dtype)(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
                in_planes = out_planes
        y = nn.relu(_bn(train, self.dtype, "bn1")(y))
        y = jnp.mean(y, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(y.astype(jnp.float32))


# --------------------------- ImageNet variant ------------------------------

class _InetDenseLayer(nn.Module):
    in_planes: int
    growth: int
    prefix: str
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(_bn(train, self.dtype, "norm1")(x))
        y = make_conv(self.in_planes, 4 * self.growth, 1, plan=self.plan,
                      mode=self.mode, key=f"{self.prefix}.conv1.weight",
                      name="conv1", dtype=self.dtype)(y)
        y = nn.relu(_bn(train, self.dtype, "norm2")(y))
        y = make_conv(4 * self.growth, self.growth, 3, padding=1,
                      plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv2.weight", name="conv2",
                      dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetInet(nn.Module):
    block_config: tuple
    growth: int = 32
    num_classes: int = 1000
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None
    remat: bool = True  # reference grad-checkpoints (densenet_inet_tt.py:80-99)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(2 * self.growth, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
                    name="features.conv0")(x)
        y = nn.relu(_bn(train, self.dtype, "features.norm0")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        in_planes = 2 * self.growth
        layer_cls = nn.remat(_InetDenseLayer, static_argnums=(2,)) if self.remat \
            else _InetDenseLayer
        for b, n in enumerate(self.block_config, start=1):
            for l in range(1, n + 1):
                prefix = f"features.denseblock{b}.denselayer{l}"
                y = layer_cls(in_planes, self.growth, prefix, plan=self.plan,
                              mode=self.mode, dtype=self.dtype,
                              name=prefix)(y, train)
                in_planes += self.growth
            if b < len(self.block_config):
                prefix = f"features.transition{b}"
                y = nn.relu(_bn(train, self.dtype, f"{prefix}.norm")(y))
                y = make_conv(in_planes, in_planes // 2, 1, plan=self.plan,
                              mode=self.mode, key=f"{prefix}.conv.weight",
                              name=f"{prefix}.conv", dtype=self.dtype)(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
                in_planes //= 2
        y = nn.relu(_bn(train, self.dtype, "features.norm5")(y))
        y = jnp.mean(y, axis=(1, 2))
        return nn.Dense(self.num_classes, name="classifier")(y.astype(jnp.float32))


def _register_plans():
    from ..configs.plans import build_tk_plan
    from ..configs.resolver import register_plan
    for m in ("densenet40", "densenet100", "densenet121", "densenet201",
              "densenet264"):
        register_plan(m, "tk", "2")(lambda m=m: build_tk_plan(m, "2"))


_register_plans()


def _plan_for(base, fmt, ratio, tt_type):
    return get_rank_plan(base, "tk" if fmt == "stftk" else fmt, ratio, tt_type)


@register_model
def densenet40(*, num_classes=10, fmt=None, mode="chain", ratio="2",
               tt_type="general", plan=None, dtype=None):
    if fmt is not None and plan is None:
        plan = _plan_for("densenet40", fmt, ratio, tt_type)
    return DenseNetCifar(depth=40, growth=16, bottleneck=False,
                         num_classes=num_classes, reduction=0.5, plan=plan,
                         mode=mode, dtype=dtype)


@register_model
def densenet100(*, num_classes=10, fmt=None, mode="chain", ratio="2",
                tt_type="general", plan=None, dtype=None):
    if fmt is not None and plan is None:
        plan = _plan_for("densenet100", fmt, ratio, tt_type)
    return DenseNetCifar(depth=100, growth=12, bottleneck=False,
                         num_classes=num_classes, reduction=0.5, plan=plan,
                         mode=mode, dtype=dtype)


def _inet(block_config, base, *, num_classes=1000, fmt=None, mode="chain",
          ratio="2", tt_type="general", plan=None, dtype=None):
    if fmt is not None and plan is None:
        plan = _plan_for(base, fmt, ratio, tt_type)
    return DenseNetInet(block_config=block_config, num_classes=num_classes,
                        plan=plan, mode=mode, dtype=dtype)


@register_model
def densenet121(**kw):
    return _inet((6, 12, 24, 16), "densenet121", **kw)


@register_model
def densenet201(**kw):
    return _inet((6, 12, 48, 32), "densenet201", **kw)


@register_model
def densenet264(**kw):
    return _inet((6, 12, 64, 48), "densenet264", **kw)
