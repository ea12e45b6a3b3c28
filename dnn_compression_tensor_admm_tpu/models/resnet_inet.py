"""ImageNet ResNet-18/34/50 (torchvision topology), dense and compressed.

Architecture parity with the reference (resnet_inet_tt.py:57-455):
7x7/2 stem + 3x3/2 maxpool, four stages of BasicBlock (18/34) or
Bottleneck v1.5 (50, stride on the 3x3), dense 1x1 downsample branches
(never compressed — no 'downsample' keys exist in any reference hp dict),
global avgpool, fc head. Parameter names reproduce the torchvision
state-dict keys ('layer1.0.conv1.weight', 'fc.weight', ...) used by the
rank tables. The reference's SVD fallback for 1x1 convs whose rank list
has length 1 (resnet_inet_tt.py:44-53) is realized in the plan builder
(configs/plans/tables.py).
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


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    in_planes: int
    planes: int
    stride: int
    prefix: str
    has_downsample: bool
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = make_conv(self.in_planes, self.planes, 3, stride=self.stride,
                      padding=1, plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv1.weight", name="conv1",
                      dtype=self.dtype)(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = make_conv(self.planes, self.planes, 3, stride=1, padding=1,
                      plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv2.weight", name="conv2",
                      dtype=self.dtype)(y)
        y = _bn(train, self.dtype, "bn2")(y)
        if self.has_downsample:
            sc = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                         kernel_init=_KAIMING, dtype=self.dtype,
                         name="downsample.0")(x)
            sc = _bn(train, self.dtype, "downsample.1")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class Bottleneck(nn.Module):
    in_planes: int
    planes: int
    stride: int
    prefix: str
    has_downsample: bool
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.planes
        out_ch = self.planes * 4
        y = make_conv(self.in_planes, width, 1, stride=1, padding=0,
                      plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv1.weight", name="conv1",
                      dtype=self.dtype)(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = make_conv(width, width, 3, stride=self.stride, padding=1,
                      plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv2.weight", name="conv2",
                      dtype=self.dtype)(y)
        y = _bn(train, self.dtype, "bn2")(y)
        y = nn.relu(y)
        y = make_conv(width, out_ch, 1, stride=1, padding=0,
                      plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv3.weight", name="conv3",
                      dtype=self.dtype)(y)
        y = _bn(train, self.dtype, "bn3")(y)
        if self.has_downsample:
            sc = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                         kernel_init=_KAIMING, dtype=self.dtype,
                         name="downsample.0")(x)
            sc = _bn(train, self.dtype, "downsample.1")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNet(nn.Module):
    block: type
    num_blocks: tuple
    num_classes: int = 1000
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
                    name="conv1")(x)
        y = _bn(train, self.dtype, "bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        in_planes = 64
        exp = self.block.expansion
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                                self.num_blocks), start=1):
            for i in range(n):
                stride = 2 if (stage > 1 and i == 0) else 1
                has_ds = stride != 1 or in_planes != planes * exp
                prefix = f"layer{stage}.{i}"
                y = self.block(in_planes, planes, stride, prefix, has_ds,
                               plan=self.plan, mode=self.mode,
                               dtype=self.dtype, name=prefix)(y, train=train)
                in_planes = planes * exp
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(self.num_classes, kernel_init=_KAIMING, name="fc")(
            y.astype(jnp.float32))
        return y


# stage -> planes; conv index -> out-channel rule (resnet_inet_tt.py:188-216)
def _inet_out_channels(block_expansion: int):
    def fn(name: str) -> int:
        parts = name.split(".")
        stage = int(parts[0][len("layer"):])
        planes = 64 * (2 ** (stage - 1))
        conv = parts[2]
        if block_expansion == 4 and conv == "conv3":
            return planes * 4
        return planes
    return fn


def _build(block, num_blocks, model_base, *, num_classes=1000, fmt=None,
           mode="chain", ratio="2", tt_type="general", plan=None, dtype=None):
    if fmt is not None and plan is None:
        plan_fmt = "tk" if fmt == "stftk" else fmt
        plan = get_rank_plan(model_base, plan_fmt, ratio, tt_type)
    return ResNet(block=block, num_blocks=tuple(num_blocks),
                  num_classes=num_classes, plan=plan, mode=mode, dtype=dtype)


def _register_inet_plans():
    from ..configs.plans import build_tk_plan, build_tt_conv_plan
    from ..configs.resolver import register_plan

    for model, exp in (("resnet18", 1), ("resnet34", 1), ("resnet50", 4)):
        for ratio in ("2", "3", "4", "5", "10", "sc"):
            register_plan(model, "tk", ratio)(
                lambda m=model, r=ratio: build_tk_plan(m, r))
            for tt_type in ("general", "special"):
                register_plan(model, "tt", ratio, tt_type)(
                    lambda m=model, r=ratio, t=tt_type, e=exp:
                    build_tt_conv_plan(m, r, t, _inet_out_channels(e)))


_register_inet_plans()


@register_model
def resnet18(**kw):
    return _build(BasicBlock, [2, 2, 2, 2], "resnet18", **kw)


@register_model
def resnet34(**kw):
    return _build(BasicBlock, [3, 4, 6, 3], "resnet34", **kw)


@register_model
def resnet50(**kw):
    return _build(Bottleneck, [3, 4, 6, 3], "resnet50", **kw)
