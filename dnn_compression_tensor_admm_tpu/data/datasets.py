"""Dataset loading: CIFAR-10/100 (python-pickle batch format), MNIST (idx),
and a deterministic synthetic fallback for machines without datasets.

The reference reads these through torchvision (datasets.py:142-239);
here the binary formats are parsed directly (no torch dependency on the
data path) into numpy uint8 arrays, which then move to device whole
(see device_pipeline.py).
"""

from __future__ import annotations

import dataclasses
import gzip
import os
import pickle
import struct
import tarfile
from typing import Optional, Tuple

import numpy as np

CIFAR10_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR10_STD = (0.2470, 0.2435, 0.2616)
CIFAR100_MEAN = (0.5071, 0.4865, 0.4409)
CIFAR100_STD = (0.2673, 0.2564, 0.2762)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DatasetInfo:
    name: str
    num_classes: int
    input_size: int
    mean: Tuple[float, ...]
    std: Tuple[float, ...]


_INFO = {
    "cifar10": DatasetInfo("cifar10", 10, 32, CIFAR10_MEAN, CIFAR10_STD),
    "cifar100": DatasetInfo("cifar100", 100, 32, CIFAR100_MEAN, CIFAR100_STD),
    "mnist": DatasetInfo("mnist", 10, 28, (0.1307,), (0.3081,)),
    "imagenet": DatasetInfo("imagenet", 1000, 224, IMAGENET_MEAN, IMAGENET_STD),
}


def _split_synthetic(name: str):
    """-> (base_name, mode) where mode is None | 'easy' | 'hard'."""
    if name.startswith("synthetic-hard-"):
        return name[len("synthetic-hard-"):], "hard"
    if name.startswith("synthetic-"):
        return name[len("synthetic-"):], "easy"
    return name, None


def dataset_info(name: str) -> DatasetInfo:
    return _INFO[_split_synthetic(name)[0]]


def _load_cifar10(data_dir: str, train: bool):
    """cifar-10-batches-py pickle format (as unpacked by torchvision)."""
    base = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(base):
        tgz = os.path.join(data_dir, "cifar-10-python.tar.gz")
        if os.path.exists(tgz):
            with tarfile.open(tgz) as tf:
                tf.extractall(data_dir)
    files = ([f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"])
    xs, ys = [], []
    for fn in files:
        with open(os.path.join(base, fn), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys.extend(d[b"labels"])
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NHWC
    return np.ascontiguousarray(x), np.asarray(ys, dtype=np.int32)


def _load_cifar100(data_dir: str, train: bool):
    base = os.path.join(data_dir, "cifar-100-python")
    fn = "train" if train else "test"
    with open(os.path.join(base, fn), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(x), np.asarray(d[b"fine_labels"], dtype=np.int32)


def _load_mnist(data_dir: str, train: bool):
    prefix = "train" if train else "t10k"
    def rd(path):
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rb") as f:
            return f.read()
    for ext in ("", ".gz"):
        ip = os.path.join(data_dir, f"{prefix}-images-idx3-ubyte{ext}")
        lp = os.path.join(data_dir, f"{prefix}-labels-idx1-ubyte{ext}")
        if os.path.exists(ip):
            break
    img = rd(ip); lab = rd(lp)
    _, n, h, w = struct.unpack(">IIII", img[:16])
    x = np.frombuffer(img, dtype=np.uint8, offset=16).reshape(n, h, w, 1)
    y = np.frombuffer(lab, dtype=np.uint8, offset=8).astype(np.int32)
    return x, y


def _synthetic(info: DatasetInfo, train: bool, n: Optional[int] = None,
               hard: bool = False):
    """Deterministic learnable synthetic data: class-conditional low-freq
    patterns + noise. Lets training/benching run with zero downloads.

    `hard` mode ('synthetic-hard-*' names) caps the achievable accuracy
    below 100%: with probability 0.15 an image is rendered from a
    *different* class's prototype (label kept), plus amplitude jitter and
    3x pixel noise — a Bayes-error floor of ~13.5%, so accuracy lands
    mid-80s and compression/fine-tune accuracy *differences* are
    observable (used by the flagship evidence runs in results/)."""
    n = n or (50_000 if train else 10_000)
    rng = np.random.RandomState(0 if train else 1)
    y = rng.randint(0, info.num_classes, size=n).astype(np.int32)
    s = info.input_size
    c = len(info.mean)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
    protos = []
    prng = np.random.RandomState(1234)
    for k in range(info.num_classes):
        f = prng.uniform(1, 4, size=(2, c))
        ph = prng.uniform(0, 2 * np.pi, size=(2, c))
        img = 0.5 + 0.25 * (np.sin(2 * np.pi * f[0] * yy[..., None] + ph[0]) +
                            np.sin(2 * np.pi * f[1] * xx[..., None] + ph[1]))
        protos.append(img)
    protos = np.stack(protos)  # [K, s, s, c]
    if hard:
        k = info.num_classes
        # irreducible class overlap: 15% of images are rendered from a
        # different class's prototype while keeping their label
        render = y.copy()
        flip = rng.rand(n) < 0.15
        render[flip] = rng.randint(0, k, size=int(flip.sum()))
        amp = rng.uniform(0.6, 1.4, size=(n, 1, 1, 1)).astype(np.float32)
        x = 0.5 + amp * (protos[render] - 0.5)
        x = x + rng.normal(0, 0.3, size=(n, s, s, c)).astype(np.float32)
    else:
        x = protos[y] + rng.normal(0, 0.15, size=(n, s, s, c)).astype(np.float32)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8), y


def load_dataset(name: str, train: bool, data_dir: Optional[str] = None,
                 synthetic_size: Optional[int] = None):
    """Returns (images uint8 [N,H,W,C], labels int32 [N], DatasetInfo).

    'synthetic-<name>' (or a missing data_dir) selects the deterministic
    synthetic fallback with <name>'s geometry.
    """
    base, mode = _split_synthetic(name)
    info = dataset_info(base)
    if mode is not None or data_dir is None:
        x, y = _synthetic(info, train, synthetic_size, hard=(mode == "hard"))
        return x, y, info
    loader = {"cifar10": _load_cifar10, "cifar100": _load_cifar100,
              "mnist": _load_mnist}.get(base)
    if loader is None:
        raise ValueError(f"no direct reader for {base}; use the streaming pipeline")
    x, y = loader(data_dir, train)
    return x, y, info
