"""BertAdam + warmup schedules (reference optimization.py:35-301)."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.nlp.optimization import (
    bert_adam, warmup_constant, warmup_cosine, warmup_cosine_hard_restarts,
    warmup_linear)


class TestSchedules:
    def test_warmup_linear_shape(self):
        s = warmup_linear(0.1, 100)
        assert float(s(0)) == 0.0
        assert abs(float(s(10)) - 1.0) < 1e-6      # peak at end of warmup
        assert abs(float(s(55)) - 0.5) < 1e-6      # halfway down
        assert float(s(100)) == 0.0

    def test_warmup_constant(self):
        s = warmup_constant(0.1, 100)
        assert abs(float(s(5)) - 0.5) < 1e-6
        assert float(s(50)) == 1.0
        assert float(s(100)) == 1.0

    def test_warmup_cosine(self):
        s = warmup_cosine(0.1, 100)     # default cycles=0.5: cos half-period
        assert abs(float(s(10)) - 1.0) < 1e-6
        assert abs(float(s(100))) < 1e-6
        mid = float(s(55))
        assert 0.4 < mid < 0.6

    def test_hard_restarts_restart(self):
        s = warmup_cosine_hard_restarts(0.0, 100, cycles=2.0)
        # just before/after the restart at progress 0.5
        assert float(s(49)) < 0.01
        assert float(s(51)) > 0.99


def _quadratic_setup(tx):
    params = {"dense": {"kernel": jnp.array([2.0, -3.0]),
                        "bias": jnp.array([1.0])}}
    state = tx.init(params)
    def loss(p):
        return jnp.sum(p["dense"]["kernel"] ** 2) + jnp.sum(p["dense"]["bias"] ** 2)
    return params, state, loss


class TestBertAdam:
    def test_no_bias_correction_first_step_magnitude(self):
        """Without bias correction, step-1 update is
        lr * ((1-b1)g / (sqrt((1-b2)) |g| + eps) + wd*p) — ~3.16x lr for
        any nonzero gradient (the reference's raw-moment semantics)."""
        tx = bert_adam(0.01, t_total=-1, weight_decay=0.0, max_grad_norm=-1)
        params, state, loss = _quadratic_setup(tx)
        g = jax.grad(loss)(params)
        upd, state = tx.update(g, state, params)
        expect = 0.01 * 0.1 / (np.sqrt(0.001) + 1e-6)  # per-component, g=const sign
        got = abs(float(upd["dense"]["kernel"][0]) / 4.0 * 4.0)
        # each component: -lr * (0.1*g)/(sqrt(0.001*g^2)+eps) = -lr*3.162*sign(g)
        np.testing.assert_allclose(
            np.abs(np.asarray(upd["dense"]["kernel"])), 0.01 * 3.1623,
            rtol=1e-3)

    def test_weight_decay_skips_bias_and_scale(self):
        tx = bert_adam(1.0, t_total=-1, weight_decay=0.5, max_grad_norm=-1)
        params = {"kernel": jnp.array([1.0]), "bias": jnp.array([1.0]),
                  "scale": jnp.array([1.0])}
        state = tx.init(params)
        zero_g = jax.tree.map(jnp.zeros_like, params)
        upd, _ = tx.update(zero_g, state, params)
        assert float(upd["kernel"][0]) == -0.5   # decay applied
        assert float(upd["bias"][0]) == 0.0      # excluded
        assert float(upd["scale"][0]) == 0.0     # excluded

    def test_per_parameter_clipping(self):
        """Each tensor is clipped by its own norm (reference
        optimization.py:279-280), not a global norm."""
        tx = bert_adam(1.0, t_total=-1, weight_decay=0.0, max_grad_norm=1.0)
        params = {"big": jnp.array([30.0, 40.0]), "small": jnp.array([0.3])}
        state = tx.init(params)
        g = {"big": jnp.array([30.0, 40.0]), "small": jnp.array([0.3])}
        upd, _ = tx.update(g, state, params)
        # big grad (norm 50) clipped to norm 1 -> direction (0.6, 0.8);
        # both leaves then produce the same sign-scaled Adam update, so the
        # clipped one must NOT be 100x the small one.
        ratio = abs(float(upd["big"][0])) / abs(float(upd["small"][0]))
        assert ratio < 2.0, ratio

    def test_schedule_multiplies_lr(self):
        tx = bert_adam(1.0, schedule="warmup_linear", warmup=0.5, t_total=10,
                       weight_decay=0.0, max_grad_norm=-1)
        params = {"w": jnp.array([1.0])}
        state = tx.init(params)
        g = {"w": jnp.array([1.0])}
        upd1, state = tx.update(g, state, params)   # step 0: multiplier 0
        assert float(upd1["w"][0]) == 0.0
        upd2, state = tx.update(g, state, params)   # step 1: multiplier 0.2
        assert abs(float(upd2["w"][0])) > 0.0

    def test_converges_on_quadratic(self):
        tx = bert_adam(0.05, t_total=-1, weight_decay=0.0)
        params, state, loss = _quadratic_setup(tx)
        import optax
        for _ in range(300):
            g = jax.grad(loss)(params)
            upd, state = tx.update(g, state, params)
            params = optax.apply_updates(params, upd)
        assert float(loss(params)) < 1e-3
