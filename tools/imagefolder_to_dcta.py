#!/usr/bin/env python
"""Convert a torchvision-style ImageFolder tree into DCTA record shards.

The reference trains ImageNet straight from raw JPEGs through
torchvision ImageFolder + host-side transforms
(/root/reference/datasets.py:142-239), paying the decode cost every
epoch on the data-loader workers. The TPU-native pipeline instead
decodes ONCE, offline, into fixed-size uint8 records
(data/records.py, streamed by native/dataloader.cc), and performs the
random crop/flip/RandAugment augmentation on device inside the compiled
step (data/device_pipeline.py::augment_batch). Fixed shapes keep XLA
happy; storing post-resize uint8 224x224x3 is ~150 KB/image (smaller
than the average train JPEG decode+resize work per epoch).

Layout expected (ImageFolder semantics — class subdirectories, labels
assigned by sorted class-name order):

    root/train/<class_name>/*.{jpg,jpeg,png,bmp,webp}
    root/val/<class_name>/*.(same)

Each image is resized so its shorter side equals --resize, then
center-cropped to --size (the canonical eval geometry; train-time
randomness is applied on device from these crops).

Usage:
    python tools/imagefolder_to_dcta.py IMAGEFOLDER_ROOT OUT_DIR \
        [--size 224] [--resize 256] [--samples-per-shard 8192] [--workers 8]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def find_classes(split_dir: str):
    """Sorted class subdirectories -> label index (ImageFolder rule)."""
    classes = sorted(d for d in os.listdir(split_dir)
                     if os.path.isdir(os.path.join(split_dir, d)))
    if not classes:
        raise FileNotFoundError(f"no class subdirectories under {split_dir}")
    return {c: i for i, c in enumerate(classes)}


def list_samples(split_dir: str):
    class_to_idx = find_classes(split_dir)
    samples = []
    for cls, idx in class_to_idx.items():
        cdir = os.path.join(split_dir, cls)
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith(EXTS):
                samples.append((os.path.join(cdir, fn), idx))
    return samples, class_to_idx


def decode_one(path: str, size: int, resize: int) -> np.ndarray:
    """JPEG/PNG -> uint8 [size, size, 3]: shorter-side resize + center crop
    (the reference's val transform, datasets.py:205-214)."""
    from PIL import Image
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        scale = resize / min(w, h)
        im = im.resize((max(size, round(w * scale)),
                        max(size, round(h * scale))), Image.BILINEAR)
        w, h = im.size
        left, top = (w - size) // 2, (h - size) // 2
        im = im.crop((left, top, left + size, top + size))
        return np.asarray(im, dtype=np.uint8)


def convert_split(split_dir: str, out_dir: str, prefix: str, *, size: int,
                  resize: int, samples_per_shard: int, workers: int,
                  log=print):
    from dnn_compression_tensor_admm_tpu.data.records import write_shards
    samples, class_to_idx = list_samples(split_dir)
    log(f"{prefix}: {len(samples)} images, {len(class_to_idx)} classes")
    paths = []
    with concurrent.futures.ThreadPoolExecutor(workers) as ex:
        for s0 in range(0, len(samples), samples_per_shard):
            chunk = samples[s0:s0 + samples_per_shard]
            imgs = list(ex.map(lambda s: decode_one(s[0], size, resize), chunk))
            x = np.stack(imgs)
            y = np.asarray([s[1] for s in chunk], dtype=np.int32)
            shard_idx = s0 // samples_per_shard
            p = write_shards(x, y, out_dir,
                             samples_per_shard=samples_per_shard,
                             prefix=f"{prefix}-part{shard_idx:05d}")
            paths.extend(p)
            log(f"  wrote {p[0]} ({len(chunk)} samples)")
    return paths, class_to_idx


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("root", help="ImageFolder root containing train/ and/or val/")
    ap.add_argument("out_dir")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--resize", type=int, default=256)
    ap.add_argument("--samples-per-shard", type=int, default=8192)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    done = []
    for split in ("train", "val"):
        sdir = os.path.join(args.root, split)
        if os.path.isdir(sdir):
            convert_split(sdir, args.out_dir, split, size=args.size,
                          resize=args.resize,
                          samples_per_shard=args.samples_per_shard,
                          workers=args.workers)
            done.append(split)
    if not done:
        raise SystemExit(f"ERROR: neither {args.root}/train nor {args.root}/val exists")
    print(f"converted splits: {', '.join(done)} -> {args.out_dir}")


if __name__ == "__main__":
    main()
