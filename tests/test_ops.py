"""Property tests for the L0 kernels (TT-SVD, partial Tucker, truncated SVD).

The de-facto spec is the reference's numeric behavior (ttd.py,
admm.py:91-149); here we check the defining mathematical properties plus
agreement with independent NumPy oracles.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.ops import (
    clamp_tt_ranks, ten2tt, tt2ten, tt_project,
    partial_tucker, tucker_to_tensor, tucker2_project,
    truncated_svd, svd_project, truncated_left_sv,
)


def _np_tt_svd(x, shapes, ranks):
    """Independent NumPy TT-SVD oracle (standard Oseledets sweep)."""
    ranks = list(ranks)
    d = len(shapes)
    t = np.asarray(x, dtype=np.float64)
    cores = []
    for i in range(d - 1):
        t = t.reshape(ranks[i] * shapes[i], -1)
        u, s, vt = np.linalg.svd(t, full_matrices=False)
        r = min(ranks[i + 1], s.shape[0])
        ranks[i + 1] = r
        cores.append(u[:, :r].reshape(ranks[i], shapes[i], r))
        t = np.diag(s[:r]) @ vt[:r]
    cores.append(t.reshape(ranks[d - 1], shapes[d - 1], ranks[d]))
    full = cores[0]
    for c in cores[1:]:
        full = full.reshape(-1, c.shape[0]) @ c.reshape(c.shape[0], -1)
    return full.reshape(shapes)


class TestClampRanks:
    def test_full_rank_feasible(self):
        assert clamp_tt_ranks([16, 9, 16], [1, 16, 16, 1]) == [1, 16, 16, 1]

    def test_clamps_to_unfolding_dims(self):
        # r1 <= 1*4 = 4; r2 <= min(r1*4, 3) = 3
        assert clamp_tt_ranks([4, 4, 3], [1, 100, 100, 1]) == [1, 4, 3, 1]

    def test_sequential_dependence(self):
        # clamped r1 feeds into the bound on r2
        assert clamp_tt_ranks([2, 8, 8], [1, 50, 50, 1]) == [1, 2, 8, 1]

    def test_bad_length_raises(self):
        with pytest.raises(ValueError):
            clamp_tt_ranks([4, 4], [1, 4])


class TestTT:
    def test_roundtrip_full_rank(self):
        key = jax.random.PRNGKey(0)
        shapes, ranks = [8, 9, 8], [1, 8, 8, 1]
        x = jax.random.normal(key, tuple(shapes))
        ranks = clamp_tt_ranks(shapes, ranks)
        cores = ten2tt(x, shapes, ranks)
        rec = tt2ten(cores, shapes)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)

    def test_core_shapes(self):
        shapes, ranks = [16, 9, 16], [1, 6, 6, 1]
        x = jax.random.normal(jax.random.PRNGKey(1), tuple(shapes))
        cores = ten2tt(x, shapes, ranks)
        assert [tuple(c.shape) for c in cores] == [(1, 16, 6), (6, 9, 6), (6, 16, 1)]

    def test_matches_numpy_oracle(self):
        shapes, ranks = [16, 9, 16], [1, 6, 6, 1]
        x = np.random.RandomState(0).randn(*shapes).astype(np.float32)
        ours = np.asarray(tt_project(jnp.asarray(x), shapes, ranks))
        oracle = _np_tt_svd(x, shapes, list(ranks))
        # Truncated reconstructions agree (same optimal subspaces).
        np.testing.assert_allclose(ours, oracle, atol=5e-4)

    def test_error_monotone_in_rank(self):
        shapes = [16, 9, 16]
        x = jax.random.normal(jax.random.PRNGKey(2), tuple(shapes))
        errs = []
        for r in (2, 6, 12, 16):
            z = tt_project(x, shapes, [1, r, r, 1])
            errs.append(float(jnp.linalg.norm(z - x)))
        assert errs == sorted(errs, reverse=True)
        assert errs[-1] < 1e-3

    def test_projection_jits(self):
        shapes, ranks = [8, 9, 8], [1, 4, 4, 1]
        f = jax.jit(lambda t: tt_project(t, shapes, ranks))
        x = jax.random.normal(jax.random.PRNGKey(3), tuple(shapes))
        z = f(x)
        assert z.shape == x.shape

    def test_gram_method_close_to_svd(self):
        shapes, ranks = [16, 9, 16], [1, 8, 8, 1]
        x = jax.random.normal(jax.random.PRNGKey(4), tuple(shapes))
        z_svd = tt_project(x, shapes, ranks, method="svd")
        z_gram = tt_project(x, shapes, ranks, method="gram")
        # Same subspace up to float32 Gram conditioning.
        assert float(jnp.linalg.norm(z_svd - z_gram)) / float(jnp.linalg.norm(x)) < 1e-2


class TestTucker:
    def test_roundtrip_full_rank(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 3, 3))
        core, factors = partial_tucker(x, (16, 16), n_iter=2)
        rec = tucker_to_tensor(core, factors)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)

    def test_shapes(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 16, 3, 3))
        core, (u0, u1) = partial_tucker(x, (10, 7))
        assert core.shape == (10, 7, 3, 3)
        assert u0.shape == (32, 10) and u1.shape == (16, 7)

    def test_factors_orthonormal(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (32, 16, 3, 3))
        _, (u0, u1) = partial_tucker(x, (10, 7))
        np.testing.assert_allclose(np.asarray(u0.T @ u0), np.eye(10), atol=1e-4)
        np.testing.assert_allclose(np.asarray(u1.T @ u1), np.eye(7), atol=1e-4)

    def test_hooi_improves_on_hosvd(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (64, 32, 3, 3))
        z0 = tucker2_project(x, 16, 8, n_iter=0)
        z10 = tucker2_project(x, 16, 8, n_iter=10)
        e0 = float(jnp.linalg.norm(z0 - x))
        e10 = float(jnp.linalg.norm(z10 - x))
        assert e10 <= e0 + 1e-5

    def test_projection_near_idempotent(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (32, 32, 3, 3))
        z = tucker2_project(x, 8, 8, n_iter=10)
        z2 = tucker2_project(z, 8, 8, n_iter=10)
        assert float(jnp.linalg.norm(z2 - z)) / float(jnp.linalg.norm(z)) < 1e-3

    def test_jit_and_vmap(self):
        xs = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 16, 3, 3))
        f = jax.jit(jax.vmap(lambda t: tucker2_project(t, 8, 8, n_iter=5)))
        zs = f(xs)
        assert zs.shape == xs.shape


class TestSVD:
    def test_eckart_young_vs_numpy(self):
        a = np.random.RandomState(0).randn(64, 48).astype(np.float32)
        z = np.asarray(svd_project(jnp.asarray(a), 10))
        u, s, vt = np.linalg.svd(a, full_matrices=False)
        best = (u[:, :10] * s[:10]) @ vt[:10]
        np.testing.assert_allclose(z, best, atol=1e-3)

    def test_truncated_shapes(self):
        a = jnp.ones((20, 30))
        u, s, vt = truncated_svd(a, 5)
        assert u.shape == (20, 5) and s.shape == (5,) and vt.shape == (5, 30)

    def test_rank_clamped_to_min_dim(self):
        a = jnp.ones((4, 30))
        u, s, vt = truncated_svd(a, 10)
        assert u.shape == (4, 4)

    def test_gram_left_sv_spans_same_subspace(self):
        a = jax.random.normal(jax.random.PRNGKey(6), (32, 288))
        u1 = truncated_left_sv(a, 8, method="svd")
        u2 = truncated_left_sv(a, 8, method="gram")
        # Projector distance, invariant to basis rotation/sign.
        p1 = np.asarray(u1 @ u1.T)
        p2 = np.asarray(u2 @ u2.T)
        assert np.linalg.norm(p1 - p2) < 1e-2


class TestSubspaceMethod:
    def test_subspace_captures_near_optimal_energy(self):
        # random matrices have slowly-decaying spectra (worst case for
        # orthogonal iteration): the criterion is captured energy, not
        # exact subspace identity
        a = jax.random.normal(jax.random.PRNGKey(7), (32, 288))
        u1 = truncated_left_sv(a, 8, method="svd")
        u2 = truncated_left_sv(a, 8, method="subspace")
        e1 = float(jnp.linalg.norm(u1.T @ a))
        e2 = float(jnp.linalg.norm(u2.T @ a))
        assert e2 >= 0.98 * e1
        # orthonormality of the iterated basis
        np.testing.assert_allclose(np.asarray(u2.T @ u2), np.eye(8), atol=1e-3)

    def test_full_rank_shortcut_exact(self):
        import jax, jax.numpy as jnp
        x = jax.random.normal(jax.random.PRNGKey(8), (16, 16, 3, 3))
        z = tucker2_project(x, 16, 16, n_iter=2, method="subspace")
        assert float(jnp.linalg.norm(z - x) / jnp.linalg.norm(x)) < 1e-5

    def test_ns_method_matmul_only_and_near_optimal(self):
        """'ns' (Newton-Schulz orthogonalization) must (a) contain NO
        LAPACK custom calls in its lowered HLO — the property that makes
        it shard_map-scalable (custom calls serialize across virtual CPU
        devices; see BENCHNOTES) — and (b) capture near-optimal energy."""
        import jax, jax.numpy as jnp
        a = jax.random.normal(jax.random.PRNGKey(7), (32, 288))
        f = jax.jit(lambda a: truncated_left_sv(a, 8, method="ns"))
        hlo = f.lower(a).compile().as_text()
        assert "custom-call" not in hlo, "ns path must be pure-HLO matmuls"
        u1 = truncated_left_sv(a, 8, method="svd")
        u2 = f(a)
        e1 = float(jnp.linalg.norm(u1.T @ a))
        e2 = float(jnp.linalg.norm(u2.T @ a))
        assert e2 >= 0.98 * e1
        np.testing.assert_allclose(np.asarray(u2.T @ u2), np.eye(8), atol=5e-3)

    def test_ns_tucker_residual_close_to_exact(self):
        import jax, jax.numpy as jnp
        x = jax.random.normal(jax.random.PRNGKey(9), (32, 32, 3, 3))
        z_svd = tucker2_project(x, 16, 16, n_iter=6, method="svd")
        z_ns = tucker2_project(x, 16, 16, n_iter=6, method="ns")
        e_svd = float(jnp.linalg.norm(z_svd - x))
        e_ns = float(jnp.linalg.norm(z_ns - x))
        assert e_ns <= e_svd * 1.02

    def test_subspace_tucker_residual_close_to_exact(self):
        import jax, jax.numpy as jnp
        x = jax.random.normal(jax.random.PRNGKey(9), (32, 32, 3, 3))
        z_svd = tucker2_project(x, 16, 16, n_iter=6, method="svd")
        z_sub = tucker2_project(x, 16, 16, n_iter=6, method="subspace")
        e_svd = float(jnp.linalg.norm(z_svd - x))
        e_sub = float(jnp.linalg.norm(z_sub - x))
        assert e_sub <= e_svd * 1.02  # within 2% of the optimal residual
