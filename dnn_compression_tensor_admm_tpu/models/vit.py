"""ViT / DeiT with TT/TK-factorized attention+MLP linears.

Architecture parity with the reference (vit_tt.py:33-131, built on timm
VisionTransformer): per-block qkv / proj / fc1 / fc2 are swapped for
factorized linears iff their canonical name is in the plan; patch embed,
norms, cls token, pos embed and head stay dense. Canonical names follow
the timm state dict ('blocks.0.attn.qkv.weight', ...), matching the rank
tables (hp_dicts/tt_deit_tiny_patch16_224_hp.py:7-115).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.hp import RankPlan
from ..configs.resolver import get_rank_plan
from .registry import register_model
from .substitute import make_linear

_TRUNC = nn.initializers.truncated_normal(stddev=0.02)


def _drop_path(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask / keep


class Attention(nn.Module):
    dim: int
    num_heads: int
    prefix: str
    plan: Optional[RankPlan] = None
    mode: str = "factorized"
    qkv_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, D = x.shape
        h = self.num_heads
        hd = D // h
        qkv_l = make_linear(D, 3 * D, plan=self.plan, mode=self.mode,
                            key=f"{self.prefix}.qkv.weight", name="qkv",
                            use_bias=self.qkv_bias, dtype=self.dtype)
        proj_l = make_linear(D, D, plan=self.plan, mode=self.mode,
                             key=f"{self.prefix}.proj.weight", name="proj",
                             dtype=self.dtype)
        qkv = qkv_l(x).reshape(B, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # [B, h, N, hd]
        attn = (q @ jnp.swapaxes(k, -2, -1)) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        return proj_l(y)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    prefix: str
    drop_path: float = 0.0
    plan: Optional[RankPlan] = None
    mode: str = "factorized"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, f"{self.prefix}.attn",
                      plan=self.plan, mode=self.mode, dtype=self.dtype,
                      name="attn")(y, deterministic)
        rng = None if deterministic else self.make_rng("dropout")
        x = x + _drop_path(y, self.drop_path, deterministic, rng)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = make_linear(self.dim, hidden, plan=self.plan, mode=self.mode,
                        key=f"{self.prefix}.mlp.fc1.weight", name="mlp.fc1",
                        dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = make_linear(hidden, self.dim, plan=self.plan, mode=self.mode,
                        key=f"{self.prefix}.mlp.fc2.weight", name="mlp.fc2",
                        dtype=self.dtype)(y)
        rng = None if deterministic else self.make_rng("dropout")
        return x + _drop_path(y, self.drop_path, deterministic, rng)


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    plan: Optional[RankPlan] = None
    mode: str = "factorized"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        D = self.embed_dim
        n_patch = (self.img_size // self.patch_size) ** 2
        y = nn.Conv(D, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID", dtype=self.dtype,
                    name="patch_embed.proj")(x)
        y = y.reshape(B, -1, D)
        cls = self.param("cls_token", _TRUNC, (1, 1, D))
        pos = self.param("pos_embed", _TRUNC, (1, n_patch + 1, D))
        y = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)).astype(y.dtype), y], axis=1)
        y = y + pos.astype(y.dtype)
        import numpy as _np
        dpr = [float(r) for r in _np.linspace(0, self.drop_path_rate, self.depth)]
        for i in range(self.depth):
            y = Block(D, self.num_heads, self.mlp_ratio, f"blocks.{i}",
                      drop_path=dpr[i], plan=self.plan, mode=self.mode,
                      dtype=self.dtype, name=f"blocks.{i}")(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = nn.Dense(self.num_classes, kernel_init=_TRUNC, name="head")(
            y[:, 0].astype(jnp.float32))
        return y


_VIT_CFGS = {
    # name: (embed_dim, depth, heads)
    "deit_tiny_patch16_224": (192, 12, 3),
    "deit_small_patch16_224": (384, 12, 6),
    "vit_small_patch16_224": (384, 12, 6),
}


def _vit_out_features(embed_dim: int):
    def fn(name: str) -> int:
        if name.endswith("qkv.weight"):
            return 3 * embed_dim
        if name.endswith("fc1.weight"):
            return 4 * embed_dim
        return embed_dim  # proj, fc2
    return fn


def _register_vit_plans():
    from ..configs.plans import build_tk_plan, build_tt_linear_plan
    from ..configs.resolver import register_plan

    for model, (dim, _, _) in _VIT_CFGS.items():
        for ratio in ("2", "3"):
            register_plan(model, "tt", ratio)(
                lambda m=model, r=ratio, d=dim:
                build_tt_linear_plan(m, r, "general", _vit_out_features(d)))
            register_plan(model, "tk", ratio)(
                lambda m=model, r=ratio: build_tk_plan(m, r))


_register_vit_plans()


def _build_vit(name, *, num_classes=1000, fmt=None, mode="factorized",
               ratio="2", tt_type="general", plan=None, dtype=None,
               drop_path_rate=0.1):
    dim, depth, heads = _VIT_CFGS[name]
    if fmt is not None and plan is None:
        plan = get_rank_plan(name, fmt, ratio, tt_type)
        mode = "reconstruct" if mode == "reconstruct" else "factorized"
    return VisionTransformer(embed_dim=dim, depth=depth, num_heads=heads,
                             num_classes=num_classes,
                             drop_path_rate=drop_path_rate, plan=plan,
                             mode=mode, dtype=dtype)


@register_model
def deit_tiny_patch16_224(**kw):
    return _build_vit("deit_tiny_patch16_224", **kw)


@register_model
def deit_small_patch16_224(**kw):
    return _build_vit("deit_small_patch16_224", **kw)


@register_model
def vit_small_patch16_224(**kw):
    return _build_vit("vit_small_patch16_224", **kw)
