"""ADMM engine invariants (reference semantics: admm.py:15-149)."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.admm import (
    AdmmState, build_program, admm_init, admm_update, admm_penalty, adjust_rho,
    orthogonal_penalty,
)
from dnn_compression_tensor_admm_tpu.configs.hp import (
    RankPlan, TKSpec, TTConvSpec, SVDSpec)
from dnn_compression_tensor_admm_tpu.ops.tucker import tucker2_project


def _mk_params(key):
    """Two TK conv layers (same shape -> one vmap bucket), one TT conv,
    one SVD 1x1 conv — stored HWIO like flax."""
    ks = jax.random.split(key, 4)
    return {
        "layer1.0": {"conv1": {"kernel": jax.random.normal(ks[0], (3, 3, 16, 16))},
                     "conv2": {"kernel": jax.random.normal(ks[1], (3, 3, 16, 16))}},
        "layer2.0": {"conv1": {"kernel": jax.random.normal(ks[2], (3, 3, 16, 32))}},
        "down": {"conv": {"kernel": jax.random.normal(ks[3], (1, 1, 16, 32))}},
    }


PLAN = RankPlan(fmt="tk", layers={
    "layer1.0.conv1.weight": TKSpec(8, 8),
    "layer1.0.conv2.weight": TKSpec(8, 8),
    "layer2.0.conv1.weight": TTConvSpec.create((8, 4, 9, 4, 4), (1, 8, 12, 12, 4, 1), 32),
    "down.conv.weight": SVDSpec(6),
})


class TestProgram:
    def test_grouping_buckets_same_signature(self):
        params = _mk_params(jax.random.PRNGKey(0))
        prog = build_program(params, PLAN)
        assert len(prog.groups) == 3  # 2 TK convs share one bucket
        sizes = sorted(len(g.names) for g in prog.groups)
        assert sizes == [1, 1, 2]

    def test_missing_plan_name_raises(self):
        params = _mk_params(jax.random.PRNGKey(0))
        bad = RankPlan(fmt="tk", layers={"nope.weight": TKSpec(2, 2)})
        try:
            build_program(params, bad)
            assert False
        except ValueError as e:
            assert "nope.weight" in str(e)


class TestUpdate:
    def setup_method(self):
        self.params = _mk_params(jax.random.PRNGKey(1))
        self.prog = build_program(self.params, PLAN)
        self.state = admm_init(self.params, self.prog)

    def test_init(self):
        for n in self.prog.paths:
            assert float(jnp.abs(self.state.u[n]).max()) == 0.0

    def test_first_update_keeps_u_zero(self):
        state, res = admm_update(self.params, self.state, self.prog, update_u=False)
        for n in self.prog.paths:
            assert float(jnp.abs(state.u[n]).max()) == 0.0
        # z is now the projection, not the raw weight
        assert float(res["layer1.0.conv1.weight"]) > 0.1

    def test_dual_ascent_arithmetic(self):
        state, _ = admm_update(self.params, self.state, self.prog, update_u=False)
        state2, _ = admm_update(self.params, state, self.prog, update_u=True)
        w = self.params["layer1.0"]["conv1"]["kernel"]
        expect_u = w - state2.z["layer1.0.conv1.weight"]  # u was 0
        np.testing.assert_allclose(np.asarray(state2.u["layer1.0.conv1.weight"]),
                                   np.asarray(expect_u), atol=1e-5)

    def test_z_is_rank_constrained(self):
        state, _ = admm_update(self.params, self.state, self.prog, update_u=False)
        z = state.z["layer1.0.conv1.weight"]  # HWIO
        z_oihw = jnp.transpose(z, (3, 2, 0, 1))
        # projecting again changes nothing
        z2 = tucker2_project(z_oihw, 8, 8, n_iter=10)
        assert float(jnp.linalg.norm(z2 - z_oihw) / jnp.linalg.norm(z_oihw)) < 1e-3

    def test_fixed_point_when_weight_already_low_rank(self):
        w = self.params["layer1.0"]["conv1"]["kernel"]
        z_oihw = tucker2_project(jnp.transpose(w, (3, 2, 0, 1)), 8, 8)
        params = jax.tree.map(lambda x: x, self.params)
        params["layer1.0"]["conv1"]["kernel"] = jnp.transpose(z_oihw, (2, 3, 1, 0))
        state = admm_init(params, self.prog)
        state, res = admm_update(params, state, self.prog, update_u=False)
        assert float(res["layer1.0.conv1.weight"]) < 1e-2

    def test_update_jits(self):
        f = jax.jit(lambda p, s: admm_update(p, s, self.prog, update_u=True),)
        state, res = f(self.params, self.state)
        assert set(res) == set(self.prog.paths)

    def test_penalty_matches_manual(self):
        state, _ = admm_update(self.params, self.state, self.prog, update_u=False)
        rho = 0.01
        pen = float(admm_penalty(self.params, state, self.prog, rho))
        manual = 0.0
        for n, path in self.prog.paths.items():
            node = self.params
            for k in path:
                node = node[k]
            manual += 0.5 * rho * float(jnp.sum((node - state.z[n] + state.u[n]) ** 2))
        assert abs(pen - manual) / manual < 1e-5

    def test_gradient_descent_on_penalty_shrinks_residual(self):
        # The X-step's view: SGD on the penalty pulls W toward Z - U.
        state, _ = admm_update(self.params, self.state, self.prog, update_u=False)
        loss = lambda p: admm_penalty(p, state, self.prog, 1.0)
        p = self.params
        l0 = float(loss(p))
        g = jax.grad(loss)(p)
        p = jax.tree.map(lambda a, b: a - 0.1 * b, p, g)
        assert float(loss(p)) < l0


class TestMisc:
    def test_adjust_rho(self):
        assert adjust_rho(epoch=171, epochs=200, init_rho=0.01) == 0.05
        assert adjust_rho(epoch=100, epochs=200, init_rho=0.01) == 0.01

    def test_orthogonal_penalty_zero_for_orthonormal(self):
        q = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(0), (32, 8)))[0]
        params = {"l": {"first_factor": q.T, "last_factor": q,
                        "core": jnp.ones((8, 8))}}
        assert float(orthogonal_penalty(params, 1.0)) < 1e-6
        params2 = {"l": {"first_factor": 2 * q.T}}
        assert float(orthogonal_penalty(params2, 1.0)) > 1.0


class TestAnalyticPenaltyGradient:
    def test_grad_add_matches_autodiff(self):
        """admm_grad_add must equal d/dW of admm_penalty exactly
        (the train engine folds the analytic form for TPU speed)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from dnn_compression_tensor_admm_tpu.admm import (
            admm_grad_add, admm_init, admm_penalty, build_program)
        from dnn_compression_tensor_admm_tpu.configs.hp import TKSpec, RankPlan
        rng = np.random.RandomState(0)
        params = {"layer1": {"conv1": {"kernel": jnp.asarray(
            rng.randn(3, 3, 8, 16), jnp.float32)}},
            "other": {"kernel": jnp.asarray(rng.randn(4, 4), jnp.float32)}}
        plan = RankPlan("tk", {"layer1.conv1.weight": TKSpec(4, 4)})
        prog = build_program(params, plan)
        state = admm_init(params, prog)
        # give U and Z nontrivial values
        state = state.replace(
            u={k: jnp.asarray(rng.randn(*v.shape), jnp.float32) * 0.1
               for k, v in state.u.items()},
            z={k: v + 0.3 for k, v in state.z.items()})
        rho = 0.07
        auto = jax.grad(lambda p: admm_penalty(p, state, prog, rho))(params)
        zero = jax.tree.map(jnp.zeros_like, params)
        analytic = admm_grad_add(zero, params, state, prog, rho)
        for a, b in zip(jax.tree.leaves(auto), jax.tree.leaves(analytic)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


class TestNanProjectionGuard:
    def test_nan_projection_falls_back_to_previous_z(self, monkeypatch):
        """A solver that NaNs (singular Gram/Cholesky late in training —
        observed killing a 300-epoch deit-small run) must not poison the
        state: the layer keeps its previous Z and the dual update stays
        finite (skip-this-update ADMM heuristic)."""
        import dnn_compression_tensor_admm_tpu.admm.engine as eng
        params = _mk_params(jax.random.PRNGKey(0))
        prog = build_program(params, PLAN)
        state = admm_init(params, prog)

        orig = eng._project_one

        def poisoned(kind, spec, w, *, method, n_iter):
            z = orig(kind, spec, w, method=method, n_iter=n_iter)
            return z * jnp.nan

        monkeypatch.setattr(eng, "_project_one", poisoned)
        new_state, res = eng.admm_update(params, state, prog,
                                         method="subspace", n_iter=2)
        for k in state.z:
            np.testing.assert_array_equal(np.asarray(new_state.z[k]),
                                          np.asarray(state.z[k]))
            assert np.isfinite(np.asarray(new_state.u[k])).all(), k
            assert np.isfinite(float(res[k])), k

    def test_nan_projection_falls_back_on_mesh(self, monkeypatch):
        from dnn_compression_tensor_admm_tpu.parallel.mesh import make_mesh
        import dnn_compression_tensor_admm_tpu.admm.engine as eng
        params = _mk_params(jax.random.PRNGKey(1))
        prog = build_program(params, PLAN)
        state = admm_init(params, prog)
        orig = eng._project_one

        def poisoned(kind, spec, w, *, method, n_iter):
            z = orig(kind, spec, w, method=method, n_iter=n_iter)
            return z * jnp.nan

        monkeypatch.setattr(eng, "_project_one", poisoned)
        mesh = make_mesh(n_data=1, n_layer=4)
        new_state, res = eng.admm_update(params, state, prog,
                                         method="subspace", n_iter=2,
                                         mesh=mesh)
        for k in state.z:
            np.testing.assert_array_equal(np.asarray(new_state.z[k]),
                                          np.asarray(state.z[k]))
            assert np.isfinite(np.asarray(new_state.u[k])).all(), k
