"""DCTA record-shard format: writer + pure-Python reader.

Fixed-size uint8 image records (see native/dataloader.cc header). The
writer converts any (images uint8 [N,H,W,C], labels int32 [N]) pair into
shards; the pure-Python reader is the fallback when the native loader
isn't built."""

from __future__ import annotations

import os
import struct
from typing import List, Tuple

import numpy as np

MAGIC = 0x44435441


def write_shards(images: np.ndarray, labels: np.ndarray, out_dir: str,
                 samples_per_shard: int = 10_000,
                 prefix: str = "data") -> List[str]:
    assert images.dtype == np.uint8 and images.ndim == 4
    n, h, w, c = images.shape
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s0 in range(0, n, samples_per_shard):
        s1 = min(n, s0 + samples_per_shard)
        path = os.path.join(out_dir, f"{prefix}-{s0 // samples_per_shard:05d}.dcta")
        with open(path, "wb") as f:
            f.write(struct.pack("<5I", MAGIC, s1 - s0, h, w, c))
            for i in range(s0, s1):
                f.write(struct.pack("<i", int(labels[i])))
                f.write(images[i].tobytes())
        paths.append(path)
    return paths


def shard_sample_count(path: str) -> int:
    """Record count from the 20-byte shard header (no data read)."""
    with open(path, "rb") as f:
        magic, count, _, _, _ = struct.unpack("<5I", f.read(20))
        assert magic == MAGIC, f"bad magic in {path}"
    return int(count)


def read_shard(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        magic, count, h, w, c = struct.unpack("<5I", f.read(20))
        assert magic == MAGIC, f"bad magic in {path}"
        img_size = h * w * c
        images = np.empty((count, h, w, c), np.uint8)
        labels = np.empty((count,), np.int32)
        for i in range(count):
            labels[i] = struct.unpack("<i", f.read(4))[0]
            images[i] = np.frombuffer(f.read(img_size), np.uint8).reshape(h, w, c)
    return images, labels
