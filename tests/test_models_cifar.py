"""CIFAR ResNet zoo: naming parity, substitution, decompose, ADMM wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.admm import (
    admm_init, admm_update, admm_penalty, build_program)
from dnn_compression_tensor_admm_tpu.configs.resolver import get_rank_plan
from dnn_compression_tensor_admm_tpu.layers.common import canonical_param_name
from dnn_compression_tensor_admm_tpu.models import (
    create_model, decompose_params, compression_ratio, count_params)


def _init(model, key=0, train=False):
    x = jnp.ones((2, 32, 32, 3))
    return model.init(jax.random.PRNGKey(key), x, train=train)


def _names(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {canonical_param_name(tuple(k.key for k in kp)) for kp, _ in flat}


class TestDense:
    def test_resnet32_param_names_match_reference(self):
        v = _init(create_model("resnet32"))
        names = _names(v["params"])
        # reference state-dict keys (resnet_cifar.py:__main__ dump)
        for want in ("conv1.weight", "bn1.weight", "bn1.bias",
                     "layer1.0.conv1.weight", "layer2.4.conv2.weight",
                     "layer3.0.conv1.weight", "linear.weight", "linear.bias"):
            assert want in names, want
        assert "layer1.5.conv1.weight" not in names  # 5 blocks per stage

    def test_resnet32_param_count(self):
        v = _init(create_model("resnet32"))
        # reference total (resnet_cifar.py __main__): ~0.46M
        n = count_params(v["params"])
        assert 464_000 < n < 467_000, n

    def test_forward_shapes_and_train_mode(self):
        m = create_model("resnet32", num_classes=10)
        v = _init(m)
        x = jnp.ones((4, 32, 32, 3))
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
        assert y.shape == (4, 10)
        y2, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in mut

    def test_resnet20_and_56(self):
        for name, blocks in (("resnet20", 3), ("resnet56", 9)):
            v = _init(create_model(name))
            names = _names(v["params"])
            assert f"layer1.{blocks - 1}.conv1.weight" in names
            assert f"layer1.{blocks}.conv1.weight" not in names


class TestCompressed:
    def test_tkc_resnet32_3x_compression(self):
        dense_v = _init(create_model("resnet32"))
        m = create_model("tkc_resnet32", ratio="3")
        v = _init(m)
        ratio = compression_ratio(dense_v, v)
        # README.md:20-21 reports 3x for this plan (conv-only compression,
        # bn/linear excluded, so overall ratio is a bit under the nominal 3).
        assert 2.3 < ratio < 3.5, ratio
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.ones((2, 32, 32, 3)))
        assert y.shape == (2, 10)

    def test_ttm_resnet32_forward(self):
        m = create_model("ttm_resnet32", ratio="3")
        v = _init(m)
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, jnp.ones((2, 32, 32, 3)))
        assert y.shape == (2, 10)

    def test_decompose_preserves_function_at_high_acc(self):
        """Factorized(decompose(dense)) stays close to dense on real ranks."""
        dense_m = create_model("resnet32")
        dense_v = _init(dense_m, key=3)
        plan = get_rank_plan("resnet32", "tk", "3")
        comp_v = decompose_params(dense_v, plan)
        comp_m = create_model("tkc_resnet32", ratio="3")
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
        y_dense = dense_m.apply(dense_v, x, train=False)
        y_comp = comp_m.apply(comp_v, x, train=False)
        # random kaiming weights are nearly full-rank: outputs differ, but
        # the factorized net must be finite and structurally compatible
        assert y_comp.shape == y_dense.shape
        assert bool(jnp.all(jnp.isfinite(y_comp)))

    def test_decompose_param_tree_matches_compressed_model(self):
        dense_v = _init(create_model("resnet32"), key=5)
        plan = get_rank_plan("resnet32", "tk", "3")
        comp_v = decompose_params(dense_v, plan)
        want = _init(create_model("tkc_resnet32", ratio="3"), key=6)
        shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
        assert shapes(comp_v["params"]) == shapes(want["params"])

    def test_tkr_mode_same_params_as_tkc(self):
        v_c = _init(create_model("tkc_resnet32", ratio="3"), key=7)
        v_r = _init(create_model("tkr_resnet32", ratio="3"), key=7)
        shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
        assert shapes(v_c["params"]) == shapes(v_r["params"])


class TestAdmmOnModel:
    def test_program_covers_all_30_convs(self):
        v = _init(create_model("resnet32"), key=1)
        plan = get_rank_plan("resnet32", "tk", "3")
        prog = build_program(v["params"], plan)
        assert sum(len(g.names) for g in prog.groups) == 30
        # buckets: (16,16,3,3) / (32,16,..) / (32,32,..) / (64,32,..) / (64,64,..)
        # split further by distinct rank pairs
        assert len(prog.groups) < 10

    def test_one_admm_epoch_on_model(self):
        v = _init(create_model("resnet32"), key=2)
        plan = get_rank_plan("resnet32", "tt", "3")
        prog = build_program(v["params"], plan)
        state = admm_init(v["params"], prog)
        upd = jax.jit(lambda p, s: admm_update(p, s, prog, update_u=False, method="gram"))
        state, res = upd(v["params"], state)
        pen = admm_penalty(v["params"], state, prog, rho=0.01)
        assert float(pen) > 0
        assert all(np.isfinite(float(r)) for r in res.values())
