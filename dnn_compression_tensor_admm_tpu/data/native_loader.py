"""ctypes binding for the native C++ record-shard loader
(native/dataloader.cc) with automatic build and a pure-Python fallback.

Usage:
    loader = NativeLoader(shard_paths, batch_size=256, workers=4)
    for images, labels, n_valid in loader:   # numpy uint8/int32 batches
        ...
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdcta_loader.so")

_lib = None


def _build_native() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_native():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.dcta_loader_create.restype = ctypes.c_void_p
    lib.dcta_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int]
    lib.dcta_loader_create_strided.restype = ctypes.c_void_p
    lib.dcta_loader_create_strided.argtypes = \
        lib.dcta_loader_create.argtypes + [ctypes.c_int, ctypes.c_int]
    lib.dcta_loader_batch_spec.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.dcta_loader_total.restype = ctypes.c_long
    lib.dcta_loader_total.argtypes = [ctypes.c_void_p]
    lib.dcta_loader_next.restype = ctypes.c_int
    lib.dcta_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
    lib.dcta_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeLoader:
    """Iterates (images [B,H,W,C] uint8, labels [B] int32, n_valid)."""

    def __init__(self, shard_paths: Sequence[str], batch_size: int,
                 workers: int = 4, prefetch: int = 8, seed: int = 0,
                 drop_last: bool = False, loop: bool = False,
                 stride: int = 1, offset: int = 0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed); "
                               "use data.records.read_shard fallback")
        self._lib = lib
        arr = (ctypes.c_char_p * len(shard_paths))(
            *[p.encode() for p in shard_paths])
        self._h = ctypes.c_int(); self._w = ctypes.c_int(); self._c = ctypes.c_int()
        if stride > 1:
            # disjoint sample partition offset::stride (DistributedSampler
            # role when shard files are shared across processes)
            self._ptr = lib.dcta_loader_create_strided(
                arr, len(shard_paths), batch_size, workers, prefetch, seed,
                int(drop_last), int(loop), stride, offset)
        else:
            self._ptr = lib.dcta_loader_create(
                arr, len(shard_paths), batch_size, workers, prefetch, seed,
                int(drop_last), int(loop))
        if not self._ptr:
            raise RuntimeError(f"failed to open shards {list(shard_paths)[:2]}...")
        lib.dcta_loader_batch_spec(self._ptr, ctypes.byref(self._h),
                                   ctypes.byref(self._w), ctypes.byref(self._c))
        self.batch_size = batch_size
        self.shape = (self._h.value, self._w.value, self._c.value)
        self.total = lib.dcta_loader_total(self._ptr)

    def __iter__(self):
        h, w, c = self.shape
        while True:
            images = np.empty((self.batch_size, h, w, c), np.uint8)
            labels = np.empty((self.batch_size,), np.int32)
            n = self._lib.dcta_loader_next(
                self._ptr, images.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p))
            if n == 0:
                return
            yield images, labels, n

    def close(self):
        if getattr(self, "_ptr", None):
            self._lib.dcta_loader_destroy(self._ptr)
            self._ptr = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
