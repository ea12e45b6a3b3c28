"""Native C++ shard loader: build, correctness, shuffling, epoch semantics."""

import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.data.records import write_shards, read_shard
from dnn_compression_tensor_admm_tpu.data.native_loader import NativeLoader, get_lib


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(250, 8, 8, 3), dtype=np.uint8)
    labels = np.arange(250, dtype=np.int32)
    paths = write_shards(images, labels, str(d), samples_per_shard=100)
    return paths, images, labels


class TestRecords:
    def test_roundtrip_python_reader(self, shards):
        paths, images, labels = shards
        x, y = read_shard(paths[0])
        np.testing.assert_array_equal(x, images[:100])
        np.testing.assert_array_equal(y, labels[:100])
        assert len(paths) == 3  # 100 + 100 + 50


class TestNative:
    def test_lib_builds(self):
        assert get_lib() is not None

    def test_full_epoch_coverage_and_content(self, shards):
        paths, images, labels = shards
        loader = NativeLoader(paths, batch_size=32, workers=3, seed=1)
        assert loader.total == 250
        assert loader.shape == (8, 8, 3)
        seen = {}
        count = 0
        for xb, yb, n in loader:
            for i in range(n):
                seen[int(yb[i])] = xb[i].copy()
            count += n
        loader.close()
        assert count == 250
        assert sorted(seen) == list(range(250))  # every sample exactly once
        # content correctness: label k was written with images[k]
        for k in (0, 137, 249):
            np.testing.assert_array_equal(seen[k], images[k])

    def test_shuffled_between_seeds(self, shards):
        paths, _, _ = shards
        def first_labels(seed):
            loader = NativeLoader(paths, batch_size=50, workers=1, seed=seed)
            _, yb, n = next(iter(loader))
            loader.close()
            return list(yb[:n])
        a = first_labels(1)
        b = first_labels(2)
        assert a != b
        assert a != sorted(a)  # actually shuffled

    def test_drop_last(self, shards):
        paths, _, _ = shards
        loader = NativeLoader(paths, batch_size=60, workers=2, seed=0,
                              drop_last=True)
        total = sum(n for _, _, n in loader)
        loader.close()
        assert total == 240  # 4 full batches of 60, tail 10 dropped

    def test_throughput_sane(self, shards):
        import time
        paths, _, _ = shards
        loader = NativeLoader(paths, batch_size=64, workers=4, seed=0, loop=True)
        it = iter(loader)
        next(it)
        t0 = time.perf_counter()
        n = 0
        for _ in range(50):
            _, _, k = next(it)
            n += k
        dt = time.perf_counter() - t0
        loader.close()
        assert n / dt > 5000  # tiny 8x8 records: should be very fast


class TestStridedPartition:
    def test_disjoint_and_complete_across_offsets(self, shards):
        # 3 virtual processes over the SAME files: the strided loaders'
        # label sets must partition the full dataset (DistributedSampler
        # disjointness — reference uses torch DistributedSampler)
        paths, _, labels = shards
        seen_sets = []
        for off in range(3):
            loader = NativeLoader(paths, batch_size=16, workers=2, seed=7,
                                  stride=3, offset=off)
            assert loader.total == len(range(off, 250, 3))
            got = []
            for _, yb, n in loader:
                got.extend(yb[:n].tolist())
            loader.close()
            seen_sets.append(set(got))
        assert seen_sets[0] | seen_sets[1] | seen_sets[2] == set(labels.tolist())
        assert not (seen_sets[0] & seen_sets[1])
        assert not (seen_sets[0] & seen_sets[2])
        assert not (seen_sets[1] & seen_sets[2])

    def test_partition_shard_paths_modes(self, shards):
        from dnn_compression_tensor_admm_tpu.parallel.dist import (
            partition_shard_paths)
        paths, _, _ = shards
        # enough files: file-level split, no striding
        p0, s0, st0, of0 = partition_shard_paths(paths, 0, 3, seed=5)
        p1, _, _, _ = partition_shard_paths(paths, 1, 3, seed=5)
        assert st0 == 1 and of0 == 0 and s0 == 5
        assert not (set(p0) & set(p1))
        # fewer files than processes: shared files + sample striding
        p, s, st, of = partition_shard_paths(paths, 2, 8, seed=5)
        assert list(p) == list(paths) and st == 8 and of == 2 and s == 5
