"""Shared conv/naming helpers for the layer library."""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(x: jax.Array, kernel_hwio: jax.Array, stride: IntOrPair = 1,
           padding: IntOrPair = 0, dilation: IntOrPair = 1,
           groups: int = 1) -> jax.Array:
    """NHWC conv with explicit integer padding (PyTorch-style semantics,
    TPU-native layout). Kernel layout HWIO."""
    s = _pair(stride)
    p = _pair(padding)
    d = _pair(dilation)
    return jax.lax.conv_general_dilated(
        x, kernel_hwio,
        window_strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def canonical_param_name(path: Sequence[str]) -> str:
    """Map a flax param path to the reference's state-dict naming.

    ('layer1.0', 'conv1', 'kernel') -> 'layer1.0.conv1.weight', so rank
    plans are keyed identically to the reference hp_dicts
    (hp_dicts/tk_resnet32_hp.py:7-37).
    """
    parts = [str(p) for p in path]
    if parts and parts[-1] == "kernel":
        parts[-1] = "weight"
    if parts and parts[-1] == "scale":  # batchnorm/layernorm gamma
        parts[-1] = "weight"
    return ".".join(parts)


def param_path_from_name(name: str) -> Tuple[str, ...]:
    """Best-effort inverse of `canonical_param_name` for whole-module keys."""
    return tuple(name.split("."))


def hwio_to_oihw(k: jax.Array) -> jax.Array:
    return jnp.transpose(k, (3, 2, 0, 1))


def oihw_to_hwio(k: jax.Array) -> jax.Array:
    return jnp.transpose(k, (2, 3, 1, 0))
