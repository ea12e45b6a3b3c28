"""Analysis tooling + numeric-example oracles.

The reference's numeric_example1-3.py hand-compute TT conv/FC forwards as
its de-facto math spec (SURVEY.md §4); these tests reproduce that spec
against the layer library.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.analysis import (
    tt_conv_cost, tk_conv_cost, svd_conv_cost, tt_linear_cost,
    dense_conv_cost, model_compression_report,
    activation_spectra, compare_feature_ranks,
    TTLSTMCell, tt_lstm_inference_demo)
from dnn_compression_tensor_admm_tpu.configs.hp import (
    SVDSpec, TKSpec, TTConvSpec, TTLinearSpec)
from dnn_compression_tensor_admm_tpu.configs.resolver import get_rank_plan
from dnn_compression_tensor_admm_tpu.layers import TTConv2d, conv2d
from dnn_compression_tensor_admm_tpu.models import create_model


class TestNumericExample1:
    """Order-1 TT conv = 3 computations (numeric_example1.py:31-52):
    in-core matmul -> small conv -> out-core matmul."""

    def test_matches_manual_three_computations(self):
        B, I, H, W, O = 4, 16, 10, 10, 32
        r1, r2 = 10, 24
        spec = TTConvSpec.create((O, 9, I), (1, r2, r1, 1), out_channels=O)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (B, H, W, I))
        in_core = jax.random.normal(ks[1], (r1, I, 1)) * 0.2
        core = jax.random.normal(ks[2], (3, 3, r1, r2)) * 0.2
        out_core = jax.random.normal(ks[3], (1, O, r2)) * 0.2
        params = {"params": {"in_core_0": in_core, "core_kernel": core,
                             "out_core_0": out_core,
                             "bias": jnp.zeros((O,))}}
        m = TTConv2d(I, O, 3, spec, stride=1, padding=1)
        y = jax.jit(m.apply)(params, x)
        # manual: computation 1 (numeric_example1.py:43-45)
        h = jnp.einsum("bhwi,ri->bhwr", x, in_core[:, :, 0])
        # computation 2 (line 47)
        h = conv2d(h, core, 1, 1)
        # computation 3 (line 50)
        y_ref = jnp.einsum("bhwr,or->bhwo", h, out_core[0].reshape(O, r2))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


class TestNumericExample2:
    """General-order TT conv params/FLOPs accounting (numeric_example2.py)."""

    def test_cost_model_matches_param_count(self):
        spec = TTConvSpec.create((8, 4, 9, 4, 8), (1, 8, 16, 16, 8, 1), 32)
        m = TTConv2d(32, 32, 3, spec, padding=1, use_bias=False)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 32)))
        n_actual = sum(a.size for a in jax.tree.leaves(v))
        params, flops = tt_conv_cost(spec, (8, 8))
        assert params == n_actual
        dense_p, dense_f = dense_conv_cost((8, 8), 32, 32, 3, 3)
        assert params < dense_p and flops < dense_f

    def test_tk_svd_costs(self):
        p, f = tk_conv_cost(TKSpec(16, 16), (8, 8), 64, 64, 3, 3)
        assert p == 16 * 64 + 16 * 16 * 9 + 64 * 16
        p2, f2 = svd_conv_cost(SVDSpec(8), (8, 8), 64, 128)
        assert p2 == 8 * (64 + 128)


class TestNumericExample3:
    """General TT FC layer accounting (numeric_example3.py)."""

    def test_tt_linear_cost(self):
        spec = TTLinearSpec.create((8, 8, 8, 8), (1, 8, 10, 8, 1), 64)
        p, f = tt_linear_cost(spec)
        assert p == 1 * 8 * 8 + 8 * 8 * 10 + 10 * 8 * 8 + 8 * 8 * 1
        assert f == 10 * (64 + 64)


class TestFeatureRank:
    def test_spectra_and_compare(self):
        dense = create_model("resnet20")
        comp = create_model("tkc_resnet32", ratio="3")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        dv = dense.init(jax.random.PRNGKey(1), x, train=False)
        spec = activation_spectra(dense, dv, x, top_k=8)
        assert any("layer1.0.conv1" in k for k in spec)
        assert all(len(v) == 8 for v in spec.values())
        # dense resnet32 vs compressed resnet32: shared layer names compare
        d32 = create_model("resnet32")
        dv32 = d32.init(jax.random.PRNGKey(2), x, train=False)
        cv = comp.init(jax.random.PRNGKey(3), x, train=False)
        rep = compare_feature_ranks(d32, dv32, comp, cv, x)
        assert rep and all("dense_rank" in r for r in rep.values())

    def test_compression_report(self):
        dense = create_model("resnet32")
        comp = create_model("tkc_resnet32", ratio="3")
        x = jnp.ones((1, 32, 32, 3))
        dv = dense.init(jax.random.PRNGKey(0), x, train=False)
        cv = comp.init(jax.random.PRNGKey(1), x, train=False)
        plan = get_rank_plan("resnet32", "tk", "3")
        rep = model_compression_report(dv, cv, plan)
        # conv-targeted params compress ~3x (README.md:20-21 plan tuning)
        assert 2.5 < rep["targeted_ratio"] < 3.6, rep


class TestTTLSTM:
    def test_cell_step_and_scan(self):
        cell = TTLSTMCell(64, 32, compression_ratio=4.0)
        carry = cell.init_carry(2)
        x = jnp.ones((2, 64))
        v = cell.init(jax.random.PRNGKey(0), carry, x)
        (h, c), y = cell.apply(v, carry, x)
        assert h.shape == (2, 32) and y.shape == (2, 32)

    def test_demo_reports_compression(self):
        r = tt_lstm_inference_demo(input_size=256, hidden_size=64, seq_len=8,
                                   batch=2, ratio=8.0, iters=2)
        assert r["ms_per_sequence"] > 0
        assert r["params"] < r["dense_wx_params"]
