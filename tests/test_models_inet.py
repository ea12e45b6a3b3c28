"""ImageNet ResNet + ViT/DeiT zoo tests (small inputs for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np

from dnn_compression_tensor_admm_tpu.admm import admm_init, admm_update, build_program
from dnn_compression_tensor_admm_tpu.configs.resolver import get_rank_plan
from dnn_compression_tensor_admm_tpu.layers.common import canonical_param_name
from dnn_compression_tensor_admm_tpu.models import (
    create_model, decompose_params, compression_ratio)


import pytest

pytestmark = pytest.mark.slow  # heavy e2e module; fast slice: -m 'not slow'


def _names(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {canonical_param_name(tuple(k.key for k in kp)) for kp, _ in flat}


class TestResNetInet:
    def test_resnet18_names_and_shapes(self):
        m = create_model("resnet18", num_classes=100)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        names = _names(v["params"])
        for want in ("conv1.weight", "layer1.0.conv1.weight",
                     "layer2.0.downsample.0.weight", "layer4.1.conv2.weight",
                     "fc.weight"):
            assert want in names, want
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
        assert y.shape == (1, 100)

    def test_resnet50_bottleneck_names(self):
        m = create_model("resnet50", num_classes=10)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        names = _names(v["params"])
        assert "layer1.0.conv3.weight" in names
        assert "layer1.0.downsample.0.weight" in names
        # bottleneck conv3 is 1x1 with 4x expansion
        k = v["params"]["layer1.0"]["conv3"]["kernel"]
        assert k.shape == (1, 1, 64, 256)

    def test_tt_resnet18_special_builds_and_runs(self):
        m = create_model("ttm_resnet18", ratio="2", tt_type="special", num_classes=10)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
        assert y.shape == (1, 10)

    def test_tk_resnet18_admm_program(self):
        m = create_model("resnet18", num_classes=10)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(1), x, train=False)
        plan = get_rank_plan("resnet18", "tk", "3")
        prog = build_program(v["params"], plan)
        assert sum(len(g.names) for g in prog.groups) == 16
        state = admm_init(v["params"], prog)
        state, res = jax.jit(lambda p, s: admm_update(
            p, s, prog, update_u=False, method="gram"))(v["params"], state)
        assert all(np.isfinite(float(r)) for r in res.values())

    def test_tt_resnet50_with_svd_fallback_decomposes(self):
        # tk_resnet50 3x mixes len-1 ranks (SVD 1x1 fallback,
        # resnet_inet_tt.py:44-53) with TK pairs
        m = create_model("resnet50", num_classes=10)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(2), x, train=False)
        plan = get_rank_plan("resnet50", "tk", "3")
        from dnn_compression_tensor_admm_tpu.configs.hp import SVDSpec
        kinds = {type(s).__name__ for s in plan.layers.values()}
        assert "SVDSpec" in kinds and "TKSpec" in kinds
        cv = decompose_params(v, plan)
        mc = create_model("tkc_resnet50", ratio="3", num_classes=10)
        vc = mc.init(jax.random.PRNGKey(3), x, train=False)
        shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
        assert shapes(cv["params"]) == shapes(vc["params"])


class TestViT:
    def test_deit_tiny_names_and_forward(self):
        m = create_model("deit_tiny_patch16_224", num_classes=10)
        x = jnp.ones((2, 224, 224, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        names = _names(v["params"])
        for want in ("cls_token", "pos_embed", "patch_embed.proj.weight",
                     "blocks.0.attn.qkv.weight", "blocks.11.mlp.fc2.weight",
                     "norm.weight", "head.weight"):
            assert want in names, want
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
        assert y.shape == (2, 10)

    def test_ttm_deit_tiny_compression_and_forward(self):
        dense = create_model("deit_tiny_patch16_224", num_classes=10)
        x = jnp.ones((1, 224, 224, 3))
        dv = dense.init(jax.random.PRNGKey(0), x, train=False)
        m = create_model("ttm_deit_tiny_patch16_224", ratio="2", num_classes=10)
        v = m.init(jax.random.PRNGKey(1), x, train=False)
        r = compression_ratio(dv, v)
        assert 1.2 < r < 4.0, r  # ~30% params kept in attn/mlp linears
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
        assert y.shape == (1, 10)

    def test_deit_admm_tt_program(self):
        m = create_model("deit_tiny_patch16_224", num_classes=10)
        x = jnp.ones((1, 224, 224, 3))
        v = m.init(jax.random.PRNGKey(2), x, train=False)
        plan = get_rank_plan("deit_tiny_patch16_224", "tt", "2")
        prog = build_program(v["params"], plan)
        assert sum(len(g.names) for g in prog.groups) == 48
        state = admm_init(v["params"], prog)
        state, res = jax.jit(lambda p, s: admm_update(
            p, s, prog, update_u=False, method="gram"))(v["params"], state)
        assert all(np.isfinite(float(r)) for r in res.values())

    def test_train_mode_droppath(self):
        m = create_model("deit_tiny_patch16_224", num_classes=10,
                         drop_path_rate=0.2)
        x = jnp.ones((2, 224, 224, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        assert y.shape == (2, 10)
