"""Golden-bytes tests for the real-format CIFAR readers.

These exercise the exact code that runs the day real CIFAR-10/100
arrives for the published-number parity attempt (reference ingestion:
torchvision datasets consumed at /root/reference/datasets.py:142-239):
synthesized `cifar-10-batches-py` pickles with the canonical byte
layout (b"data" uint8 [N, 3072] as three row-major 1024-byte planes
R,G,B; b"labels"/b"fine_labels" lists), plus the tar.gz auto-extract
branch.
"""

import os
import pickle
import tarfile

import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.data.datasets import (
    _load_cifar10, _load_cifar100, load_dataset)


def _make_cifar10_batch(rng, n):
    """(dict in canonical schema, expected NHWC array, labels)."""
    data = rng.randint(0, 256, size=(n, 3072), dtype=np.uint8)
    labels = rng.randint(0, 10, size=n).tolist()
    # expected NHWC: plane p of row i is channel p at [h, w] = idx // 32, idx % 32
    expected = data.reshape(n, 3, 32, 32).transpose(0, 2, 3, 1)
    return {b"data": data, b"labels": labels}, expected, labels


@pytest.fixture()
def cifar10_dir(tmp_path):
    rng = np.random.RandomState(0)
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    exp_x, exp_y = [], []
    for i in range(1, 6):
        d, ex, ey = _make_cifar10_batch(rng, 2)
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(d, f)
        exp_x.append(ex)
        exp_y.extend(ey)
    d, test_x, test_y = _make_cifar10_batch(rng, 3)
    with open(base / "test_batch", "wb") as f:
        pickle.dump(d, f)
    return (str(tmp_path), np.concatenate(exp_x), np.asarray(exp_y),
            test_x, np.asarray(test_y))


class TestCifar10Reader:
    def test_train_pixels_labels_layout(self, cifar10_dir):
        root, exp_x, exp_y, _, _ = cifar10_dir
        x, y = _load_cifar10(root, train=True)
        assert x.shape == (10, 32, 32, 3) and x.dtype == np.uint8
        assert y.dtype == np.int32
        np.testing.assert_array_equal(x, exp_x)
        np.testing.assert_array_equal(y, exp_y)
        # spot-check the plane layout against raw bytes: channel 0 of
        # pixel (h, w) is byte h*32+w of the red plane
        with open(os.path.join(root, "cifar-10-batches-py", "data_batch_1"),
                  "rb") as f:
            d = pickle.load(f, encoding="bytes")
        assert x[0, 5, 7, 0] == d[b"data"][0, 5 * 32 + 7]
        assert x[0, 5, 7, 1] == d[b"data"][0, 1024 + 5 * 32 + 7]
        assert x[0, 5, 7, 2] == d[b"data"][0, 2048 + 5 * 32 + 7]

    def test_test_split(self, cifar10_dir):
        root, _, _, test_x, test_y = cifar10_dir
        x, y = _load_cifar10(root, train=False)
        np.testing.assert_array_equal(x, test_x)
        np.testing.assert_array_equal(y, test_y)

    def test_targz_auto_extract(self, cifar10_dir, tmp_path_factory):
        # pack the batches dir into cifar-10-python.tar.gz in a FRESH dir:
        # the loader must extract and then read identically
        root, exp_x, exp_y, _, _ = cifar10_dir
        fresh = tmp_path_factory.mktemp("targz")
        tgz = fresh / "cifar-10-python.tar.gz"
        with tarfile.open(tgz, "w:gz") as tf:
            tf.add(os.path.join(root, "cifar-10-batches-py"),
                   arcname="cifar-10-batches-py")
        x, y = _load_cifar10(str(fresh), train=True)
        np.testing.assert_array_equal(x, exp_x)
        np.testing.assert_array_equal(y, exp_y)

    def test_through_load_dataset(self, cifar10_dir):
        root, exp_x, exp_y, _, _ = cifar10_dir
        x, y, info = load_dataset("cifar10", True, root)
        assert info.num_classes == 10 and info.input_size == 32
        np.testing.assert_array_equal(x, exp_x)
        np.testing.assert_array_equal(y, exp_y)


class TestCifar100Reader:
    def test_train_and_test(self, tmp_path):
        rng = np.random.RandomState(1)
        base = tmp_path / "cifar-100-python"
        base.mkdir()
        exp = {}
        for fn in ("train", "test"):
            data = rng.randint(0, 256, size=(4, 3072), dtype=np.uint8)
            fine = rng.randint(0, 100, size=4).tolist()
            with open(base / fn, "wb") as f:
                pickle.dump({b"data": data, b"fine_labels": fine,
                             b"coarse_labels": [0] * 4}, f)
            exp[fn] = (data.reshape(4, 3, 32, 32).transpose(0, 2, 3, 1),
                       np.asarray(fine, np.int32))
        x, y = _load_cifar100(str(tmp_path), train=True)
        np.testing.assert_array_equal(x, exp["train"][0])
        np.testing.assert_array_equal(y, exp["train"][1])
        x, y = _load_cifar100(str(tmp_path), train=False)
        np.testing.assert_array_equal(x, exp["test"][0])
        np.testing.assert_array_equal(y, exp["test"][1])
