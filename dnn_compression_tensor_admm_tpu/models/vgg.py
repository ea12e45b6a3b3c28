"""VGG-16 (timm topology, optional BN), dense and compressed.

Parity with the reference (vgg_tt.py:47-252): features convs named by
flat index ('features.{i}.weight', pools advance the index), then the
timm 'pre_logits' ConvMlp head — fc1 as a 7x7 conv (TK-substitutable,
key 'pre_logits.fc1.weight') and fc2 as a 1x1 conv (SVD-substitutable,
'pre_logits.fc2.weight') — then 'head.fc'. The tk_vgg16(_bn) rank tables
cover the 13 feature convs; the pre_logits keys participate when a plan
provides them (TenConvMlp gate, vgg_tt.py:63-77).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..configs.hp import RankPlan
from ..configs.resolver import get_rank_plan
from .registry import register_model
from .substitute import make_conv, _KAIMING

_CFG16 = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M"]


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class VGG(nn.Module):
    cfg: tuple
    use_bn: bool
    num_classes: int = 1000
    plan: Optional[RankPlan] = None
    mode: str = "chain"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        idx = 0
        in_ch = 3
        for v in self.cfg:
            if v == "M":
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                idx += 1
                continue
            y = make_conv(in_ch, v, 3, padding=1, plan=self.plan,
                          mode=self.mode, key=f"features.{idx}.weight",
                          name=f"features.{idx}", use_bias=True,
                          dtype=self.dtype)(y)
            idx += 1
            if self.use_bn:
                y = _bn(train, self.dtype, f"features.{idx}")(y)
                idx += 1
            y = nn.relu(y)
            idx += 1  # relu occupies an index in the torch Sequential
            in_ch = v
        # pre_logits ConvMlp (vgg_tt.py:56-91): 7x7 conv fc1 + 1x1 fc2
        y = make_conv(512, 4096, 7, plan=self.plan, mode=self.mode,
                      key="pre_logits.fc1.weight", name="pre_logits.fc1",
                      use_bias=True, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = make_conv(4096, 4096, 1, plan=self.plan, mode=self.mode,
                      key="pre_logits.fc2.weight", name="pre_logits.fc2",
                      use_bias=True, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = jnp.mean(y, axis=(1, 2))
        return nn.Dense(self.num_classes, kernel_init=_KAIMING,
                        name="head.fc")(y.astype(jnp.float32))


def _register_plans():
    from ..configs.plans import build_tk_plan
    from ..configs.resolver import register_plan
    for m in ("vgg16", "vgg16_bn"):
        for ratio in ("2", "10"):
            register_plan(m, "tk", ratio)(lambda m=m, r=ratio: build_tk_plan(m, r))


_register_plans()


def _build(base, use_bn, *, num_classes=1000, fmt=None, mode="chain",
           ratio="2", tt_type="general", plan=None, dtype=None):
    if fmt is not None and plan is None:
        plan = get_rank_plan(base, "tk" if fmt == "stftk" else fmt, ratio, tt_type)
    return VGG(cfg=tuple(_CFG16), use_bn=use_bn, num_classes=num_classes,
               plan=plan, mode=mode, dtype=dtype)


@register_model
def vgg16(**kw):
    return _build("vgg16", False, **kw)


@register_model
def vgg16_bn(**kw):
    return _build("vgg16_bn", True, **kw)
