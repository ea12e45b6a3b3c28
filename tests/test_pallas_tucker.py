"""Fused Pallas Tucker-2 kernel vs the XLA subspace path.

Runs in Pallas interpret mode on the CPU test backend (the kernel
compiles natively on TPU); shapes are kept tiny. Projection quality must
match the batched-XLA Cholesky-QR path (reference math:
tensorly.partial_tucker in admm.py:113-127).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.ops.pallas import (
    pallas_tk_supported, tucker2_project_batched)
from dnn_compression_tensor_admm_tpu.ops.tucker import tucker2_project


def _relerr(z, x):
    return float(jnp.linalg.norm(z - x) / jnp.linalg.norm(x))


@pytest.mark.parametrize("L,K,O,I,r0,r1", [
    (3, 9, 16, 8, 5, 3),     # rectangular conv bucket
    (2, 1, 24, 16, 6, 6),    # linear bucket (K=1)
    (2, 9, 8, 8, 8, 3),      # full-rank mode-0
])
def test_pallas_matches_xla_projection_quality(L, K, O, I, r0, r1):
    x = jax.random.normal(jax.random.PRNGKey(0), (L, K, O, I), jnp.float32)
    z_pal = tucker2_project_batched(x, r0, r1, interpret=True)
    assert z_pal.shape == x.shape

    def xla_one(t):  # t: [K, O, I] -> canonical [O, I, K] view for the XLA op
        t_oik = jnp.transpose(t, (1, 2, 0))
        z = tucker2_project(t_oik, r0, r1, n_iter=6, method="subspace")
        return jnp.transpose(z, (2, 0, 1))

    z_xla = jax.vmap(xla_one)(x)
    e_pal, e_xla = _relerr(z_pal, x), _relerr(z_xla, x)
    # both are approximate iterative solvers; quality must agree closely
    assert e_pal <= e_xla + 0.02, (e_pal, e_xla)


def test_pallas_projection_is_near_idempotent():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 16, 16), jnp.float32)
    z1 = tucker2_project_batched(x, 5, 5, interpret=True)
    z2 = tucker2_project_batched(z1, 5, 5, interpret=True)
    assert _relerr(z2, z1) < 0.05


def test_pallas_exact_on_low_rank_input():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    u = jax.random.normal(k1, (2, 16, 4))
    v = jax.random.normal(k2, (2, 4, 12))
    core = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 4, 4))
    x = jnp.einsum("lor,lkrs,lsi->lkoi", u, core, v)
    z = tucker2_project_batched(x, 4, 4, interpret=True)
    assert _relerr(z, x) < 1e-3


def test_vmem_gate():
    assert pallas_tk_supported((10, 9, 64, 64))
    assert not pallas_tk_supported((4, 9, 1024, 1024))  # > VMEM budget
    assert not pallas_tk_supported((4, 64, 64))         # wrong rank


def test_engine_pallas_method_falls_back_off_tpu():
    """On the CPU test backend (no DCTA_PALLAS_INTERPRET), method='pallas'
    must silently take the XLA subspace path and still produce a valid
    rank-constrained Z."""
    from dnn_compression_tensor_admm_tpu.admm import (admm_init, admm_update,
                                                      build_program)
    from dnn_compression_tensor_admm_tpu.configs.resolver import get_rank_plan
    from dnn_compression_tensor_admm_tpu.models import create_model

    m = create_model("resnet32", num_classes=10)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    plan = get_rank_plan("resnet32", "tk", "2", "general")
    prog = build_program(v["params"], plan)
    st = admm_init(v["params"], prog)
    new, residuals = admm_update(v["params"], st, prog, update_u=True,
                                 method="pallas", n_iter=2)
    name = next(iter(residuals))
    assert np.isfinite(float(residuals[name]))
    # Z of a rank-truncated layer differs from W
    w = v["params"]
    assert any(float(r) > 0 for r in residuals.values())
