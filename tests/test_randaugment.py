"""In-jit RandAugment + RandomErasing (the reference's timm-loader
recipe, datasets.py:43-81: auto_augment='rand-m9-mstd0.5-inc1', re_prob)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.data.augment import (
    _affine_warp, _autocontrast, _posterize, _solarize, random_erasing,
    rand_augment)
from dnn_compression_tensor_admm_tpu.data.device_pipeline import augment_batch


class TestOps:
    def test_identity_warp_is_exact(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
        out = _affine_warp(img, jnp.eye(2, 3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_rotation_preserves_center(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (17, 17, 3))
        th = 0.3
        mat = jnp.array([[jnp.cos(th), -jnp.sin(th), 0.0],
                         [jnp.sin(th), jnp.cos(th), 0.0]])
        out = _affine_warp(img, mat)
        np.testing.assert_allclose(np.asarray(out[8, 8]), np.asarray(img[8, 8]),
                                   atol=1e-5)

    def test_autocontrast_full_range(self):
        img = jnp.full((8, 8, 3), 0.4).at[0, 0].set(0.2).at[1, 1].set(0.6)
        out = _autocontrast(img, 0.0)
        assert abs(float(out.min())) < 1e-6
        assert abs(float(out.max()) - 1.0) < 1e-6

    def test_solarize_inverts_above_threshold(self):
        img = jnp.array([[[0.1, 0.9, 0.5]]])
        out = _solarize(img, 10.0)  # threshold 0
        np.testing.assert_allclose(np.asarray(out),
                                   [[[0.9, 0.1, 0.5]]], atol=1e-6)

    def test_posterize_quantizes(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 3))
        out = _posterize(img, 10.0)  # keep 4 bits
        vals = np.unique(np.round(np.asarray(out) * 255).astype(int) % 16)
        assert (vals == 0).all()


class TestRandAugment:
    def test_batch_shapes_and_range(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (8, 24, 24, 3))
        y = jax.jit(rand_augment)(x, jax.random.PRNGKey(1))
        assert y.shape == x.shape
        assert float(y.min()) >= -1e-6 and float(y.max()) <= 1 + 1e-6

    def test_per_sample_randomness(self):
        x = jnp.tile(jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3)),
                     (8, 1, 1, 1))
        y = rand_augment(x, jax.random.PRNGKey(2))
        flat = np.asarray(y).reshape(8, -1)
        assert not np.allclose(flat[0], flat[1])  # samples augmented differently

    def test_zero_magnitude_near_identity(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3),
                               minval=0.25, maxval=0.75)
        y = rand_augment(x, jax.random.PRNGKey(1), magnitude=0.0, mag_std=0.0)
        # at level 0: warps are identity, enhance factors 1, thresholds off;
        # only autocontrast/posterize change pixels
        diff = float(jnp.mean(jnp.abs(y - x)))
        assert diff < 0.3


class TestRandomErasing:
    def test_prob_zero_is_identity(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3))
        y = random_erasing(x, jax.random.PRNGKey(1), prob=0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_prob_one_erases_a_box(self):
        x = jnp.zeros((8, 32, 32, 3))
        y = random_erasing(x, jax.random.PRNGKey(1), prob=1.0)
        changed = np.asarray((jnp.abs(y) > 1e-9).any(axis=(1, 2, 3)))
        assert changed.all()
        frac = float(jnp.mean((jnp.abs(y) > 1e-9).astype(jnp.float32)))
        assert 0.01 < frac < 0.5  # boxes, not the whole image


class TestCropFlipSelection:
    def test_einsum_crop_matches_gather_reference(self):
        """The one-hot-matmul crop+flip must reproduce the plain gather
        implementation bit-exactly (uint8 values are exact in bf16 and
        each output pixel is a single-term selection)."""
        pad = 4
        x = jax.random.randint(jax.random.PRNGKey(3), (16, 32, 32, 3), 0, 256,
                               dtype=jnp.int32).astype(jnp.uint8)
        key = jax.random.PRNGKey(7)
        out = jax.jit(lambda x, k: augment_batch(
            x, k, mean=(0.0, 0.0, 0.0), std=(1 / 255.,) * 3))(x, key)
        # reference: same key splits, gather-based crop + flip
        b, h, w, c = x.shape
        k_crop, k_flip, _, _ = jax.random.split(key, 4)
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        offs = jax.random.randint(k_crop, (b, 2), 0, 2 * pad + 1)
        rows = offs[:, 0:1] + jnp.arange(h)[None, :]
        cols = offs[:, 1:2] + jnp.arange(w)[None, :]
        ref = jnp.take_along_axis(xp, rows[:, :, None, None], axis=1)
        ref = jnp.take_along_axis(ref, cols[:, None, :, None], axis=2)
        do = jax.random.bernoulli(k_flip, 0.5, (b, 1, 1))
        ref = jnp.where(do[..., None], ref[:, :, ::-1, :], ref)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(ref).astype(np.float32))


class TestPipelineIntegration:
    def test_augment_batch_with_randaug_and_erase(self):
        x = jax.random.randint(jax.random.PRNGKey(0), (8, 32, 32, 3), 0, 256,
                               dtype=jnp.int32).astype(jnp.uint8)
        out = jax.jit(lambda x, k: augment_batch(
            x, k, mean=(0.49, 0.48, 0.45), std=(0.2, 0.2, 0.2),
            randaug_magnitude=9.0, erase_prob=0.25))(x, jax.random.PRNGKey(1))
        assert out.shape == (8, 32, 32, 3)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_cli_aa_parse(self):
        from dnn_compression_tensor_admm_tpu.cli.main import _aa_magnitude
        assert _aa_magnitude("rand-m9-mstd0.5") == (9.0, 0.5)
        assert _aa_magnitude("rand-m7-mstd1.0-inc1") == (7.0, 1.0)
        assert _aa_magnitude(None) == (0.0, 0.5)

    def test_trainconfig_randaug_trains(self):
        from dnn_compression_tensor_admm_tpu.train import (TrainConfig,
                                                           train_model)
        cfg = TrainConfig(model="resnet20", dataset="synthetic-cifar10",
                          batch_size=16, epochs=1, steps_per_epoch=2,
                          randaug_magnitude=9.0, erase_prob=0.25,
                          compute_dtype=None, synthetic_size=64,
                          eval_every=10**9, print_fn=lambda *a: None)
        state, hist = train_model(cfg)
        assert np.isfinite(hist[0]["train_loss"])
