"""MobileNetV2 for CIFAR, dense and compressed.

Architecture parity with the reference (mobilenetv2_cifar.py:10-120):
3x3 stem at stride 1, 17 BaseBlocks (expand-conv1 1x1 / dw-conv2 3x3 /
project-conv3 1x1, names 'bottlenecks.N.conv{1,2,3}'), 1x1 head 'conv1',
fc head. The tk/svd rank tables key 'bottlenecks.N.conv{1,3}.weight'
directly (hp_dicts/tk_mobilenetv2_cifar_hp.py) — no remapping needed.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..configs.hp import RankPlan
from ..configs.resolver import get_rank_plan
from .registry import register_model
from .substitute import make_conv, _KAIMING

# (in, out, t, downsample) — mobilenetv2_cifar.py:63-80
_BLOCKS = [(32, 16, 1, False), (16, 24, 6, False), (24, 24, 6, False),
           (24, 32, 6, False), (32, 32, 6, False), (32, 32, 6, False),
           (32, 64, 6, True), (64, 64, 6, False), (64, 64, 6, False),
           (64, 64, 6, False), (64, 96, 6, False), (96, 96, 6, False),
           (96, 96, 6, False), (96, 160, 6, True), (160, 160, 6, False),
           (160, 160, 6, False), (160, 320, 6, False)]


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class BaseBlock(nn.Module):
    inp: int
    oup: int
    t: int
    downsample: bool
    prefix: str
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = 2 if self.downsample else 1
        c = self.inp * self.t
        y = make_conv(self.inp, c, 1, plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv1.weight", name="conv1",
                      dtype=self.dtype)(x)
        y = _relu6(_bn(train, self.dtype, "bn1")(y))
        y = nn.Conv(c, (3, 3), strides=stride, padding=[(1, 1), (1, 1)],
                    feature_group_count=c, use_bias=False, kernel_init=_KAIMING,
                    dtype=self.dtype, name="conv2")(y)
        y = _relu6(_bn(train, self.dtype, "bn2")(y))
        y = make_conv(c, self.oup, 1, plan=self.plan, mode=self.mode,
                      key=f"{self.prefix}.conv3.weight", name="conv3",
                      dtype=self.dtype)(y)
        y = _bn(train, self.dtype, "bn3")(y)
        if (not self.downsample) and self.inp == self.oup:
            return x + y
        return y


class MobileNetV2Cifar(nn.Module):
    num_classes: int = 10
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=_KAIMING, dtype=self.dtype, name="conv0")(x)
        y = _relu6(_bn(train, self.dtype, "bn0")(y))
        for i, (inp, oup, t, ds) in enumerate(_BLOCKS):
            prefix = f"bottlenecks.{i}"
            y = BaseBlock(inp, oup, t, ds, prefix, plan=self.plan,
                          mode=self.mode, dtype=self.dtype, name=prefix)(y, train=train)
        # 1x1 head IS a compression target when the plan names it
        # (reference mobilenetv2_cifar_tt.py:105-111)
        y = make_conv(_BLOCKS[-1][1], 1280, 1, plan=self.plan,
                      mode=self.mode, key="conv1.weight", name="conv1",
                      dtype=self.dtype)(y)
        y = _relu6(_bn(train, self.dtype, "bn1")(y))
        y = jnp.mean(y, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(y.astype(jnp.float32))


def _register_plans():
    from ..configs.plans import build_svd_plan, build_tk_plan
    from ..configs.resolver import register_plan
    register_plan("mobilenetv2_cifar", "tk", "2")(
        lambda: build_tk_plan("mobilenetv2_cifar", "2"))
    register_plan("mobilenetv2_cifar", "svd", "2")(
        lambda: build_svd_plan("mobilenetv2_cifar", "2"))


_register_plans()


@register_model
def mobilenetv2_cifar(*, num_classes=10, fmt=None, mode="chain", ratio="2",
                      tt_type="general", plan=None, dtype=None):
    if fmt is not None and plan is None:
        plan = get_rank_plan("mobilenetv2_cifar", "tk" if fmt == "stftk" else fmt,
                             ratio, tt_type)
    return MobileNetV2Cifar(num_classes=num_classes, plan=plan, mode=mode,
                            dtype=dtype)
