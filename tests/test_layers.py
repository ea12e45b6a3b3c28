"""Layer-library tests: factorized-vs-reconstruct duality and dense-init
fidelity — the internal consistency checks implied by the reference's
M/R variant pairing (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.configs.hp import (
    TTConvSpec, TTLinearSpec, TKSpec, SVDSpec)
from dnn_compression_tensor_admm_tpu.layers import (
    TTConv2d, TKConv2d, SVDConv2d, TTLinear, TKLinear, SVDLinear, conv2d)


def _dense_conv_ref(x, w_oihw, stride, padding):
    w = jnp.transpose(w_oihw, (2, 3, 1, 0))
    return conv2d(x, w, stride, padding)


def _mk_lowrank_kernel(key, o, i, kh, kw, r=8):
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (o, r))
    b = jax.random.normal(k2, (r, i * kh * kw))
    return (a @ b).reshape(o, i, kh, kw) / np.sqrt(i * kh * kw)


class TestTTConv:
    SPEC = TTConvSpec.create((8, 4, 9, 4, 8), (1, 8, 16, 16, 8, 1), out_channels=32)

    def test_spec_split(self):
        s = self.SPEC
        assert s.out_shapes == (8, 4) and s.filter_dim == 9 and s.in_shapes == (4, 8)
        assert s.out_channels == 32 and s.in_channels == 32

    @pytest.mark.parametrize("stride", [1, 2])
    def test_factorized_equals_reconstruct(self, stride):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
        m_f = TTConv2d(32, 32, 3, self.SPEC, stride=stride, padding=1, mode="factorized")
        m_r = TTConv2d(32, 32, 3, self.SPEC, stride=stride, padding=1, mode="reconstruct")
        params = m_f.init(jax.random.PRNGKey(1), x)
        y_f = jax.jit(m_f.apply)(params, x)
        y_r = jax.jit(m_r.apply)(params, x)
        assert y_f.shape == (2, 8 // stride, 8 // stride, 32)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=1e-4)

    def test_from_dense_full_rank_matches_dense(self):
        spec = TTConvSpec.create((8, 4, 9, 4, 8), (1, 64, 288, 64, 32, 1), out_channels=32)
        w = jax.random.normal(jax.random.PRNGKey(2), (32, 32, 3, 3)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(3), (32,)) * 0.1
        params = {"params": TTConv2d.factorize_dense(w, spec, b)}
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 32))
        m = TTConv2d(32, 32, 3, spec, stride=1, padding=1)
        y = jax.jit(m.apply)(params, x)
        y_ref = _dense_conv_ref(x, w, 1, 1) + b
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)

    def test_from_dense_lowrank_kernel_near_exact(self):
        w = _mk_lowrank_kernel(jax.random.PRNGKey(5), 32, 32, 3, 3, r=4)
        params = {"params": TTConv2d.factorize_dense(w, self.SPEC)}
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 32))
        m = TTConv2d(32, 32, 3, self.SPEC, stride=1, padding=1, use_bias=False)
        y = jax.jit(m.apply)(params, x)
        y_ref = _dense_conv_ref(x, w, 1, 1)
        err = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
        assert err < 0.35  # truncation at [.,8,16,16,8,.] of a rank-4-ish kernel

    def test_order3_special_tt(self):
        # 'special' TT keeps channels unfactorized: shapes [O, 9, I]
        spec = TTConvSpec.create((16, 9, 16), (1, 12, 12, 1), out_channels=16)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 16))
        m = TTConv2d(16, 16, 3, spec, padding=1)
        params = m.init(jax.random.PRNGKey(8), x)
        y = jax.jit(m.apply)(params, x)
        assert y.shape == (2, 8, 8, 16)


class TestTKConv:
    def test_chain_equals_reconstruct(self):
        spec = TKSpec(out_rank=10, in_rank=7)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
        m_c = TKConv2d(16, 32, 3, spec, stride=2, padding=1, mode="chain")
        m_r = TKConv2d(16, 32, 3, spec, stride=2, padding=1, mode="reconstruct")
        params = m_c.init(jax.random.PRNGKey(1), x)
        y_c = jax.jit(m_c.apply)(params, x)
        y_r = jax.jit(m_r.apply)(params, x)
        assert y_c.shape == (2, 4, 4, 32)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r), atol=1e-4)

    def test_from_dense_full_rank_matches_dense(self):
        spec = TKSpec(out_rank=32, in_rank=16)
        w = jax.random.normal(jax.random.PRNGKey(2), (32, 16, 3, 3)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(3), (32,)) * 0.1
        params = {"params": TKConv2d.factorize_dense(w, spec, b)}
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 16))
        m = TKConv2d(16, 32, 3, spec, padding=1)
        y = jax.jit(m.apply)(params, x)
        y_ref = _dense_conv_ref(x, w, 1, 1) + b
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)

    def test_from_dense_exact_on_true_tucker_kernel(self):
        # Kernel with exact multilinear ranks (8, 8) must be recovered.
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
        core = jax.random.normal(k1, (8, 8, 3, 3))
        u0 = jnp.linalg.qr(jax.random.normal(k2, (32, 8)))[0]
        u1 = jnp.linalg.qr(jax.random.normal(k3, (32, 8)))[0]
        w = jnp.einsum("abhw,oa,ib->oihw", core, u0, u1) * 0.1
        spec = TKSpec(out_rank=8, in_rank=8)
        params = {"params": TKConv2d.factorize_dense(w, spec)}
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 32))
        m = TKConv2d(32, 32, 3, spec, padding=1, use_bias=False)
        y = jax.jit(m.apply)(params, x)
        y_ref = _dense_conv_ref(x, w, 1, 1)
        err = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
        assert err < 1e-3


class TestSVDConv:
    def test_chain_equals_reconstruct_and_stride(self):
        spec = SVDSpec(rank=6)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
        m_c = SVDConv2d(16, 32, 1, spec, stride=2, mode="chain")
        m_r = SVDConv2d(16, 32, 1, spec, stride=2, mode="reconstruct")
        params = m_c.init(jax.random.PRNGKey(1), x)
        y_c = jax.jit(m_c.apply)(params, x)
        y_r = jax.jit(m_r.apply)(params, x)
        assert y_c.shape == (2, 4, 4, 32)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r), atol=1e-5)

    def test_from_dense_full_rank(self):
        spec = SVDSpec(rank=16)
        w = jax.random.normal(jax.random.PRNGKey(2), (32, 16, 1, 1)) * 0.2
        params = {"params": SVDConv2d.factorize_dense(w, spec)}
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16))
        m = SVDConv2d(16, 32, 1, spec, use_bias=False)
        y = jax.jit(m.apply)(params, x)
        y_ref = _dense_conv_ref(x, w, 1, 0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-3)


class TestTTLinear:
    SPEC = TTLinearSpec.create((8, 8, 8, 8), (1, 8, 10, 8, 1), out_features=64)

    def test_spec(self):
        assert self.SPEC.out_order == 2 and self.SPEC.mid_rank == 10
        assert self.SPEC.out_features == 64 and self.SPEC.in_features == 64

    def test_factorized_equals_reconstruct(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 64))
        m_f = TTLinear(64, 64, self.SPEC, mode="factorized")
        m_r = TTLinear(64, 64, self.SPEC, mode="reconstruct")
        params = m_f.init(jax.random.PRNGKey(1), x)
        np.testing.assert_allclose(
            np.asarray(jax.jit(m_f.apply)(params, x)),
            np.asarray(jax.jit(m_r.apply)(params, x)), atol=1e-4)

    def test_from_dense_full_rank(self):
        spec = TTLinearSpec.create((8, 8, 8, 8), (1, 64, 64, 8, 1), out_features=64)
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 64)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(3), (64,)) * 0.1
        params = {"params": TTLinear.factorize_dense(w, spec, b)}
        x = jax.random.normal(jax.random.PRNGKey(4), (5, 64))
        y = jax.jit(TTLinear(64, 64, spec).apply)(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w.T + b), atol=1e-3)

    def test_batch_dims_preserved(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 64))  # [B, seq, D]
        m = TTLinear(64, 64, self.SPEC)
        params = m.init(jax.random.PRNGKey(6), x)
        assert jax.jit(m.apply)(params, x).shape == (2, 7, 64)


class TestTKSVDLinear:
    def test_tk_chain_equals_reconstruct(self):
        spec = TKSpec(out_rank=10, in_rank=12)
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 48))
        m_c = TKLinear(48, 32, spec, mode="chain")
        m_r = TKLinear(48, 32, spec, mode="reconstruct")
        params = m_c.init(jax.random.PRNGKey(1), x)
        np.testing.assert_allclose(
            np.asarray(jax.jit(m_c.apply)(params, x)),
            np.asarray(jax.jit(m_r.apply)(params, x)), atol=1e-5)

    def test_tk_from_dense_full_rank(self):
        # in_rank requested above the matrix-rank bound; clamps to 32.
        spec = TKSpec(out_rank=32, in_rank=48)
        w = jax.random.normal(jax.random.PRNGKey(2), (32, 48)) * 0.1
        params = {"params": TKLinear.factorize_dense(w, spec)}
        x = jax.random.normal(jax.random.PRNGKey(3), (5, 48))
        y = jax.jit(TKLinear(48, 32, spec, use_bias=False).apply)(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w.T), atol=1e-3)

    def test_svd_from_dense_full_rank(self):
        spec = SVDSpec(rank=32)
        w = jax.random.normal(jax.random.PRNGKey(4), (32, 48)) * 0.1
        params = {"params": SVDLinear.factorize_dense(w, spec)}
        x = jax.random.normal(jax.random.PRNGKey(5), (5, 48))
        y = jax.jit(SVDLinear(48, 32, spec, use_bias=False).apply)(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w.T), atol=1e-3)
