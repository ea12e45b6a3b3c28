"""Deployable-artifact export (the role of the reference's ONNX exporters,
convert_onnx_resnet.py:66-78 / convert_onnx_vit.py:73-85).

Two formats:

* StableHLO via `jax.export` (`export_model`) — the TPU-native artifact:
  loadable from any process with jax installed (`load_exported`), no
  Python model code needed, runnable on CPU/GPU/TPU, weights baked in as
  constants exactly like an ONNX graph.
* TF SavedModel via jax2tf (`export_savedmodel`) — the cross-runtime
  bridge for non-XLA consumers: a SavedModel converts to ONNX with one
  offline `python -m tf2onnx.convert --saved-model DIR --output m.onnx`
  (tf2onnx is not installed in this zero-egress environment, so the
  final hop runs wherever the artifact is consumed)."""

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


def export_savedmodel(model, variables, input_shape: Sequence[int],
                      path: str, input_dtype=jnp.float32) -> str:
    """Write a TF SavedModel of `model.apply(variables, x, train=False)`
    (ONNX-convertible via tf2onnx; reference exporters produce opset-17
    ONNX directly, convert_onnx_resnet.py:66-78)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover - env without TF
        raise RuntimeError(
            "SavedModel export needs tensorflow + jax2tf in the "
            "environment; use the StableHLO export (`export_model`) "
            "otherwise") from e

    def infer(x):
        return model.apply(variables, x, train=False)

    tf_fn = tf.function(
        jax2tf.convert(infer, with_gradient=False),
        autograph=False,
        input_signature=[tf.TensorSpec(tuple(input_shape),
                                       tf.as_dtype(jnp.dtype(input_dtype)),
                                       name="input")])
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, path,
                        signatures={"serving_default": tf_fn})
    return path


def load_exported(path_or_bytes):
    """Deserialize an exported artifact; returns an object whose `.call(x)`
    runs the model."""
    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    return jax_export.deserialize(blob)
