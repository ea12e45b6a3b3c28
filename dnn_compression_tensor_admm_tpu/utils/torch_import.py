"""PyTorch dense-checkpoint interop.

The reference's decompose phase consumes *torch* state dicts — every zoo
builder does ``dense_dict = torch.load(path)`` (e.g.
resnet_cifar_tt.py:365-374, main.py:79-90, vit_tt.py:151-158) and copies
tensors by name. This module lets reference users bring those exact
checkpoints (and torchvision/timm pretrained weights) into this
framework:

- :func:`load_torch_state_dict` reads a ``.pth``/``.pt`` file into a
  flat ``{name: np.ndarray}`` dict. It uses torch when available and
  otherwise falls back to a TORCH-FREE reader (zipfile + restricted
  unpickler + numpy) — the data path of this framework never requires
  torch.
- :func:`torch_to_variables` maps that dict onto a flax variables
  template: reference state-dict names are already this repo's canonical
  param names (layers/common.py::canonical_param_name), so the mapping
  is mechanical — OIHW→HWIO for conv kernels, [out,in]→[in,out] for
  linear kernels, ``weight/bias/running_mean/running_var`` →
  ``scale|kernel/bias/mean/var``.
- :func:`variables_to_torch` is the inverse (export a repo model under
  torch naming), which makes the mapping round-trip testable without any
  reference checkpoint on disk.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import jax
import numpy as np

# torch storage-type name -> numpy dtype (the keys appear as globals in
# the checkpoint pickle stream: torch.FloatStorage etc.)
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially (numpy has no bf16)
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    """Placeholder for a torch storage inside the pickle stream."""

    def __init__(self, dtype_name: str, key: str):
        self.dtype_name = dtype_name
        self.key = key


def _rebuild_tensor(storage: _StorageRef, storage_offset, size, stride,
                    *unused) -> dict:
    return {"storage": storage, "offset": storage_offset, "size": tuple(size),
            "stride": tuple(stride)}


class _RestrictedUnpickler(pickle.Unpickler):
    """Only the handful of globals a weights-only torch checkpoint needs;
    anything else (arbitrary code objects) is refused."""

    _ALLOWED = {
        ("collections", "OrderedDict"): dict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
        ("torch.serialization", "_get_layout"): lambda name: None,
    }

    def find_class(self, module: str, name: str):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return name  # dtype marker consumed by persistent_load
        if module == "torch" and name == "Size":
            return tuple
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} "
            "(weights-only checkpoint reader)")

    def persistent_load(self, pid):
        # ('storage', <StorageType str>, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        return _StorageRef(str(pid[1]), str(pid[2]))


def _materialize(obj: Any, read_record) -> Any:
    """Replace tensor placeholders with numpy arrays."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if isinstance(v, dict) and "storage" in v and "stride" in v:
                out[str(k)] = _to_numpy(v, read_record)
            elif isinstance(v, dict):
                out[str(k)] = _materialize(v, read_record)
            else:
                out[str(k)] = v
        return out
    return obj


def _to_numpy(t: dict, read_record) -> np.ndarray:
    ref: _StorageRef = t["storage"]
    name = ref.dtype_name
    raw = read_record(ref.key)
    if name == "BFloat16Storage":
        # numpy lacks bf16: widen via the uint16 bit pattern
        u16 = np.frombuffer(raw, dtype=np.uint16)
        arr = (u16.astype(np.uint32) << 16).view(np.float32)
    else:
        dtype = _STORAGE_DTYPES.get(name)
        if dtype is None:
            raise ValueError(f"unsupported torch storage type {name}")
        arr = np.frombuffer(raw, dtype=dtype)
    itemsize = arr.itemsize
    return np.lib.stride_tricks.as_strided(
        arr[t["offset"]:], shape=t["size"],
        strides=tuple(s * itemsize for s in t["stride"]),
        writeable=False).copy()


def load_torch_state_dict(path: str, prefer_torch: bool = True) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` checkpoint into ``{name: np.ndarray}``.

    Handles the zip format (torch >= 1.6). Checkpoints that wrap the
    state dict (``{'state_dict': ...}``, ``{'model': ...}``) are
    unwrapped. Uses torch when importable (exercises torch's own reader,
    incl. legacy formats); always falls back to the torch-free path.
    """
    if prefer_torch:
        try:
            import torch
            obj = torch.load(path, map_location="cpu", weights_only=True)
            return _flatten_torch(obj)
        except ImportError:
            pass
        except Exception:
            # torch importable but its reader failed (weights_only kwarg
            # absent before 1.13, UnpicklingError on wrapped non-tensor
            # objects, ...): the restricted zip reader below handles the
            # standard zip format regardless — fall through rather than
            # surface torch's error for a file we can read ourselves
            pass
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = next(n for n in names if n.endswith("data.pkl"))
        root = pkl[: -len("data.pkl")]

        def read_record(key: str) -> bytes:
            return zf.read(f"{root}data/{key}")

        up = _RestrictedUnpickler(io.BytesIO(zf.read(pkl)))
        obj = _materialize(up.load(), read_record)
    return _flatten_torch(obj)


def _flatten_torch(obj: Any) -> Dict[str, np.ndarray]:
    for key in ("state_dict", "model", "model_state"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu()
            if str(v.dtype) == "torch.bfloat16":
                v = v.float()
            v = v.numpy()
        if isinstance(v, np.ndarray):
            out[str(k)] = v
    return out


# ---------------------------------------------------------------------------
# name/layout mapping torch state dict <-> flax variables


def _template_entries(variables):
    """Yield (collection, path_tuple, torch_name, leaf) for every leaf."""
    for coll in variables:
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for kp, leaf in flat:
            path = tuple(str(k.key) for k in kp)
            yield coll, path, _torch_name(coll, path), leaf


def _torch_name(coll: str, path) -> str:
    """Flax (collection, path) -> reference/torch state-dict name."""
    parts = list(path)
    leaf = parts[-1]
    if coll == "batch_stats":
        parts[-1] = {"mean": "running_mean", "var": "running_var"}.get(leaf, leaf)
    else:
        parts[-1] = {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
    return ".".join(parts)


def _to_flax_layout(arr: np.ndarray, path, leaf_shape) -> np.ndarray:
    # only the two KNOWN torch<->flax layout differences are transformed;
    # anything else must already match exactly — a silent reshape here
    # would scramble same-element-count layout mismatches into valid-
    # looking garbage weights
    if path[-1] == "kernel":
        if arr.ndim == 4:           # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:         # linear [out,in] -> [in,out]
            arr = arr.T
    return arr


def _to_torch_layout(arr: np.ndarray, path) -> np.ndarray:
    if path[-1] == "kernel":
        if arr.ndim == 4:           # HWIO -> OIHW
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2:
            arr = arr.T
    return arr


def torch_to_variables(state_dict: Dict[str, np.ndarray], template,
                       strict: bool = True):
    """Map a torch state dict onto a flax variables template (same tree
    structure/dtypes as ``template``, values from ``state_dict``).

    ``strict`` requires every template leaf to be found; non-strict skips
    missing entries (keeps the template init — e.g. a new classifier
    head), like ``load_state_dict(strict=False)``.
    """
    used, missing = set(), []
    new = {c: dict() for c in template}

    def set_leaf(coll, path, value):
        node = new[coll]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for coll, path, tname, leaf in _template_entries(template):
        if tname not in state_dict:
            missing.append(tname)
            set_leaf(coll, path, leaf)
            continue
        arr = np.asarray(state_dict[tname])
        arr = _to_flax_layout(arr, path, leaf.shape)
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{tname}: torch shape {state_dict[tname].shape} "
                             f"maps to {arr.shape}, template has {leaf.shape}")
        set_leaf(coll, path, arr.astype(np.asarray(leaf).dtype))
        used.add(tname)
    if strict and missing:
        raise KeyError(f"torch checkpoint is missing {len(missing)} "
                       f"parameters, e.g. {missing[:5]}")
    unused = [k for k in state_dict
              if k not in used and not k.endswith("num_batches_tracked")]
    if strict and unused:
        raise KeyError(f"torch checkpoint has {len(unused)} unmapped "
                       f"tensors, e.g. {unused[:5]}")
    return new


def variables_to_torch(variables) -> Dict[str, np.ndarray]:
    """Export flax variables under torch/reference state-dict naming."""
    out = {}
    for _, path, tname, leaf in _template_entries(variables):
        out[tname] = _to_torch_layout(np.asarray(leaf), path)
    return out


def save_torch_state_dict(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    """Write ``state_dict`` as a torch-loadable ``.pth`` (requires torch,
    which the round-trip test uses as the ground-truth serializer)."""
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state_dict.items()}, path)
