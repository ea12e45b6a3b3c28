"""CIFAR ResNet-20/32/56 (option-A shortcut), dense and compressed.

Architecture parity with the reference (resnet_cifar.py:31-134): 3x3
stem to 16 channels, three stages of BasicBlocks at 16/32/64 with
stride-2 transitions, option-A shortcut (stride-2 subsample + zero-pad
channels, resnet_cifar.py:47-48), global average pool, linear head.
Layout is NHWC (TPU-native); parameter paths reproduce the reference's
state-dict names ('layer1.0.conv1.weight', ...) so rank plans and ADMM
target selection are keyed identically.

Compressed variants (reference resnet_cifar_tt.py) come from the shared
substitution mechanism: any conv whose canonical name is in the plan is
swapped for the factorized layer.
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


class BasicBlock(nn.Module):
    in_planes: int
    planes: int
    stride: int
    prefix: str  # canonical name prefix, e.g. 'layer1.0'
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv1 = make_conv(self.in_planes, self.planes, 3, stride=self.stride,
                          padding=1, plan=self.plan, mode=self.mode,
                          key=f"{self.prefix}.conv1.weight", name="conv1",
                          dtype=self.dtype)
        conv2 = make_conv(self.planes, self.planes, 3, stride=1, padding=1,
                          plan=self.plan, mode=self.mode,
                          key=f"{self.prefix}.conv2.weight", name="conv2",
                          dtype=self.dtype)
        y = conv1(x)
        self.sow("intermediates", f"{self.prefix}.conv1", y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = conv2(y)
        self.sow("intermediates", f"{self.prefix}.conv2", y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        if self.stride != 1 or self.in_planes != self.planes:
            # option-A shortcut (resnet_cifar.py:47-48): subsample + zero-pad C
            sc = x[:, ::2, ::2, :]
            pad = self.planes // 4
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        else:
            sc = x
        return nn.relu(y + sc)


class ResNetCifar(nn.Module):
    num_blocks: tuple
    num_classes: int = 10
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_KAIMING, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        in_planes = 16
        for stage, (planes, n) in enumerate(zip((16, 32, 64), self.num_blocks), start=1):
            for i in range(n):
                stride = 2 if (stage > 1 and i == 0) else 1
                prefix = f"layer{stage}.{i}"
                y = BasicBlock(in_planes, planes, stride, prefix,
                               plan=self.plan, mode=self.mode, dtype=self.dtype,
                               name=prefix)(y, train=train)
                in_planes = planes
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(self.num_classes, kernel_init=_KAIMING, name="linear")(
            y.astype(jnp.float32))
        return y


def _build(num_blocks, *, num_classes=10, fmt=None, mode="chain", ratio="3",
           tt_type="general", plan=None, dtype=None, model_base=None):
    if fmt is not None and plan is None:
        plan_fmt = "tk" if fmt == "stftk" else fmt
        plan = get_rank_plan(model_base, plan_fmt, ratio, tt_type)
    return ResNetCifar(num_blocks=tuple(num_blocks), num_classes=num_classes,
                       plan=plan, mode=mode, dtype=dtype)


# --- rank-plan registration (tables: hp_dicts/tk_resnet32_hp.py,
# tt_resnet32_hp.py, tk/tt_resnet56_hp.py via configs/plans/reference_hp.json)

_STAGE_PLANES = {"layer1": 16, "layer2": 32, "layer3": 64}


def _cifar_out_channels(name: str) -> int:
    return _STAGE_PLANES[name.split(".")[0]]


def _register_cifar_plans():
    from ..configs.plans import build_tk_plan, build_tt_conv_plan
    from ..configs.resolver import register_plan

    # Register every ratio the reference supports; the table lookup raises
    # a clear KeyError for unsupported combinations (utils.py:277-307).
    for model in ("resnet20", "resnet32", "resnet56"):
        for ratio in ("1.5", "2", "3", "5"):
            register_plan(model, "tk", ratio)(
                lambda m=model, r=ratio: build_tk_plan(m, r))
            register_plan(model, "tt", ratio)(
                lambda m=model, r=ratio: build_tt_conv_plan(
                    m, r, "general", _cifar_out_channels))


_register_cifar_plans()


@register_model
def resnet20(**kw):
    return _build([3, 3, 3], model_base="resnet20", **kw)


@register_model
def resnet32(**kw):
    return _build([5, 5, 5], model_base="resnet32", **kw)


@register_model
def resnet56(**kw):
    return _build([9, 9, 9], model_base="resnet56", **kw)
