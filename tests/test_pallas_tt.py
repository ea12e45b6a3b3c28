"""Fused Pallas TT-SVD sweep + SVD-via-Tucker routes vs the XLA paths.

Interpret mode on the CPU test backend (compiles natively on TPU).
Reference math being matched: sequential TT-SVD (ttd.py:10-31) and
truncated SVD (admm.py:129-149) inside the ADMM Z-step.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.ops.pallas import (
    dominant_left_subspace_batched, pallas_subspace_supported,
    tt_project_batched, tt_supported_pallas)
from dnn_compression_tensor_admm_tpu.ops.svd import svd_project
from dnn_compression_tensor_admm_tpu.ops.ttd import clamp_tt_ranks, tt_project


def _relerr(z, x):
    return float(jnp.linalg.norm(z - x) / jnp.linalg.norm(x))


def test_subspace_kernel_matches_svd_subspace():
    # spectrum with a clear gap after the 5th value: subspace iteration
    # converges at rate (s6/s5)^(2*iters), so a gapped spectrum isolates
    # kernel correctness from iteration-count effects
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qu, _ = jnp.linalg.qr(jax.random.normal(k1, (3, 24, 24)))
    qv, _ = jnp.linalg.qr(jax.random.normal(k2, (3, 40, 24)))
    s = jnp.concatenate([jnp.array([10., 9., 8., 7., 6.]),
                         0.5 * jnp.ones(19)])
    x = jnp.einsum("lik,k,ljk->lij", qu, s, qv)
    u = dominant_left_subspace_batched(x, 5, interpret=True)
    assert u.shape == (3, 24, 5)
    for j in range(3):
        # projector onto the learned subspace must match the exact top-5
        # left singular projector
        ue, _, _ = np.linalg.svd(np.asarray(x[j]), full_matrices=False)
        p_exact = ue[:, :5] @ ue[:, :5].T
        p_ker = np.asarray(u[j] @ u[j].T)
        assert np.linalg.norm(p_ker - p_exact) < 5e-2


def test_subspace_kernel_tall_unfolding_matches_svd_subspace():
    # rows > cols exercises the small-gram (right-Gram + lift) path added
    # for resnet50's [720, 128] unfoldings, which blow the Mosaic stack
    # under the rows^2 left-Gram plan
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    qu, _ = jnp.linalg.qr(jax.random.normal(k1, (2, 72, 24)))
    qv, _ = jnp.linalg.qr(jax.random.normal(k2, (2, 24, 24)))
    s = jnp.concatenate([jnp.array([10., 9., 8., 7., 6.]),
                         0.5 * jnp.ones(19)])
    x = jnp.einsum("lik,k,ljk->lij", qu, s, qv)   # [2, 72, 24], tall
    u = dominant_left_subspace_batched(x, 5, interpret=True)
    assert u.shape == (2, 72, 5)
    for j in range(2):
        ue, _, _ = np.linalg.svd(np.asarray(x[j]), full_matrices=False)
        p_exact = ue[:, :5] @ ue[:, :5].T
        p_ker = np.asarray(u[j] @ u[j].T)
        assert np.linalg.norm(p_ker - p_exact) < 5e-2
        # and the basis itself must be orthonormal (lift uses one NS pass)
        assert np.linalg.norm(np.asarray(u[j]).T @ np.asarray(u[j]) -
                              np.eye(5)) < 1e-3


def test_subspace_kernel_full_rank_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32)
    u = dominant_left_subspace_batched(x, 8, interpret=True)
    assert np.allclose(np.asarray(u), np.eye(8)[None], atol=1e-6)


@pytest.mark.parametrize("shapes,ranks", [
    ([4, 6, 9, 5, 4], [1, 3, 6, 6, 3, 1]),   # order-5 general TT conv
    ([24, 9, 16], [1, 8, 6, 1]),              # special TT conv [O, 9, I]
    ([8, 8, 6, 4], [1, 4, 8, 3, 1]),          # TT linear
])
def test_tt_project_batched_matches_xla(shapes, ranks):
    numel = int(np.prod(shapes))
    x = jax.random.normal(jax.random.PRNGKey(2), (3, numel), jnp.float32)
    assert tt_supported_pallas(3, numel, shapes, ranks)
    z_pal = tt_project_batched(x, shapes, ranks, interpret=True)
    assert z_pal.shape == x.shape
    z_xla = jax.vmap(lambda t: tt_project(t, shapes, ranks, method="svd"))(x)
    e_pal = _relerr(z_pal, x)
    e_xla = _relerr(z_xla, x)
    assert e_pal <= e_xla + 0.02, (e_pal, e_xla)


def test_tt_project_batched_exact_on_tt_input():
    shapes, ranks = [6, 9, 8], [1, 4, 4, 1]
    ranks = clamp_tt_ranks(shapes, ranks)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    g1 = jax.random.normal(ks[0], (2, 6, 4))      # [L, n1, r1]
    g2 = jax.random.normal(ks[1], (2, 4, 9, 4))   # [L, r1, n2, r2]
    g3 = jax.random.normal(ks[2], (2, 4, 8))      # [L, r2, n3]
    x = jnp.einsum("lar,lrbs,lsc->labc", g1, g2, g3).reshape(2, -1)
    z = tt_project_batched(x, shapes, ranks, interpret=True)
    assert _relerr(z, x) < 1e-3


def test_supported_gates():
    assert pallas_subspace_supported((4, 64, 576))
    assert not pallas_subspace_supported((4, 2048, 4096))
    assert not tt_supported_pallas(2, 100, [4, 5, 6], [1, 4, 4, 1])  # numel mismatch


def test_engine_pallas_covers_tt_and_svd(monkeypatch):
    """With DCTA_PALLAS_INTERPRET=1 the engine routes TT and SVD buckets
    through the fused kernels; Z must stay a valid projection (finite,
    nonzero residual on truncated layers) and match the XLA method
    closely."""
    from dnn_compression_tensor_admm_tpu.admm import (admm_init, admm_update,
                                                      build_program)
    from dnn_compression_tensor_admm_tpu.configs.resolver import get_rank_plan
    from dnn_compression_tensor_admm_tpu.models import create_model

    monkeypatch.setenv("DCTA_PALLAS_INTERPRET", "1")
    m = create_model("resnet32", num_classes=10)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    plan = get_rank_plan("resnet32", "tt", "3", "general")
    prog = build_program(v["params"], plan)
    st = admm_init(v["params"], prog)
    new_p, res_p = admm_update(v["params"], st, prog, update_u=False,
                               method="pallas", n_iter=6)
    new_x, res_x = admm_update(v["params"], st, prog, update_u=False,
                               method="subspace", n_iter=6)
    for k in res_p:
        assert np.isfinite(float(res_p[k]))
        # same projection quality as the XLA path in *relative* terms
        # (the Newton-Schulz orthogonalizer has a ~1e-4 relative error
        # floor vs Cholesky-QR's 1e-6 — irrelevant for a regularizer)
        scale = float(jnp.linalg.norm(new_x.z[k])) + 1e-12
        assert float(res_p[k]) / scale <= float(res_x[k]) / scale + 1e-2, k
