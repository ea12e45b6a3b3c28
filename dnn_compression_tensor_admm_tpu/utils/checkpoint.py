"""Checkpointing: single-file msgpack for model variables (the role of the
reference's `*_model.pt`, engines.py:345-347) and orbax for full training
state incl. optimizer, EMA and ADMM duals (the reference's
`*_checkpoint.pth` drops ADMM state — engines.py:333-344, SURVEY.md §5)."""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.serialization
import jax
import jax.numpy as jnp


def load_any_variables(path: str, template_fn=None):
    """Read model variables from either this framework's msgpack or a
    PyTorch ``.pth``/``.pt`` state dict (the reference's checkpoint
    format — resnet_cifar_tt.py:365-374, main.py:79-90). For torch files
    `template_fn()` must supply the flax variables template the tensors
    are mapped onto (name + OIHW→HWIO layout mapping,
    utils/torch_import.py)."""
    if path.endswith((".pth", ".pt")):
        if template_fn is None:
            raise ValueError("torch checkpoints need a model template")
        from .torch_import import load_torch_state_dict, torch_to_variables
        return torch_to_variables(load_torch_state_dict(path), template_fn())
    return load_variables(path)


def save_variables(path: str, variables) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = flax.serialization.msgpack_serialize(
        jax.tree.map(lambda a: jax.device_get(a), variables))
    with open(path, "wb") as f:
        f.write(data)


def load_variables(path: str):
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def save_train_state(ckpt_dir: str, state, extra: Optional[dict] = None) -> None:
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        ckptr.save(ckpt_dir, payload, force=True)


def load_train_state(ckpt_dir: str, template_state, extra_template: Optional[dict] = None):
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        payload = {"state": template_state}
        if extra_template:
            payload["extra"] = extra_template
        out = ckptr.restore(ckpt_dir, payload)
    return (out["state"], out.get("extra"))
