"""Deployable-artifact export (the role of the reference's ONNX exporters,
convert_onnx_resnet.py:66-78 / convert_onnx_vit.py:73-85).

TPU-native equivalent: serialize the jitted inference function to a
portable StableHLO artifact via `jax.export` — loadable from any process
with jax installed (`load_serialized`), no Python model code needed, and
runnable on CPU/GPU/TPU. Weights are baked in as constants, exactly like
an ONNX graph."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_model(model, variables, input_shape: Sequence[int],
                 path: Optional[str] = None, input_dtype=jnp.float32) -> bytes:
    """Serialize `model.apply(variables, x, train=False)` at a fixed input
    shape. Returns the serialized bytes (and writes them to `path`)."""
    x = jnp.zeros(tuple(input_shape), input_dtype)

    def infer(x):
        return model.apply(variables, x, train=False)

    exported = jax_export.export(jax.jit(infer))(
        jax.ShapeDtypeStruct(x.shape, x.dtype))
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes):
    """Deserialize an exported artifact; returns an object whose `.call(x)`
    runs the model."""
    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    return jax_export.deserialize(blob)
