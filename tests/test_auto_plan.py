"""Auto rank planner: any registry model at any numeric ratio.

The reference registers 58 builders but `get_hp_dict` (utils.py:258-400)
only serves a hand-tuned subset; names like tkc_resnet20 are
un-instantiable there. Here every registered reference name must
resolve, with the auto planner filling the gaps.
"""

import jax
import jax.numpy as jnp
import pytest

from dnn_compression_tensor_admm_tpu.configs.auto_plan import (
    auto_rank_plan, layer_inventory)
from dnn_compression_tensor_admm_tpu.configs.hp import (
    SVDSpec, TKSpec, TTConvSpec)
from dnn_compression_tensor_admm_tpu.models.registry import create_model

# every @register_model name in the reference repo (grep over *.py)
REFERENCE_MODEL_NAMES = [
    "densenet100", "densenet40", "mobilenetv2", "mobilenetv2_cifar",
    "resnet20", "resnet32", "resnet56", "stftkc_resnet32",
    "svdc_mobilenetv2", "svdc_mobilenetv2_cifar", "svdm_mobilenetv2",
    "svdm_mobilenetv2_cifar", "svdr_mobilenetv2_cifar",
    "tkc_densenet121", "tkc_densenet201", "tkc_densenet264",
    "tkc_mobilenetv2", "tkc_mobilenetv2_cifar", "tkc_resnet18",
    "tkc_resnet20", "tkc_resnet32", "tkc_resnet50", "tkc_vgg16",
    "tkc_vgg16_bn", "tkm_deit_small_patch16_224",
    "tkm_deit_tiny_patch16_224", "tkm_mobilenetv2_cifar", "tkm_resnet18",
    "tkm_resnet20", "tkm_resnet32", "tkm_resnet50",
    "tkr_deit_small_patch16_224", "tkr_deit_tiny_patch16_224",
    "tkr_densenet40", "tkr_mobilenetv2_cifar", "tkr_resnet18",
    "tkr_resnet20", "tkr_resnet32", "tkr_resnet34", "tkr_resnet50",
    "tkr_resnet56", "ttm_deit_small_patch16_224",
    "ttm_deit_tiny_patch16_224", "ttm_resnet18", "ttm_resnet20",
    "ttm_resnet32", "ttm_vit_small_patch16_224",
    "ttr_deit_small_patch16_224", "ttr_deit_tiny_patch16_224",
    "ttr_mobilenetv2", "ttr_resnet18", "ttr_resnet20", "ttr_resnet32",
    "ttr_resnet34", "ttr_resnet50", "ttr_resnet56",
    "ttr_vit_small_patch16_224",
]


pytestmark = pytest.mark.slow  # heavy e2e module; fast slice: -m 'not slow'


class TestReferenceNameParity:
    @pytest.mark.parametrize("name", REFERENCE_MODEL_NAMES)
    def test_resolves(self, name):
        create_model(name)


class TestInventory:
    def test_resnet20_inventory_excludes_stem_and_head(self):
        names = dict(layer_inventory("resnet20"))
        assert "conv1.weight" not in names      # RGB stem left dense
        assert "fc.weight" not in names         # classifier left dense
        assert "layer1.0.conv1.weight" in names
        assert names["layer1.0.conv1.weight"] == (16, 16, 3, 3)

    def test_mobilenet_excludes_depthwise(self):
        shapes = dict(layer_inventory("mobilenetv2_cifar"))
        for name, s in shapes.items():
            if len(s) == 4:
                assert s[1] > 3, (name, s)      # no depthwise/stem kernels


def _spec_params(spec, shape):
    if isinstance(spec, TKSpec):
        o, i = shape[0], shape[1]
        k = shape[2] * shape[3] if len(shape) == 4 else 1
        return o * spec.out_rank + i * spec.in_rank + spec.out_rank * spec.in_rank * k
    if isinstance(spec, SVDSpec):
        import math
        o = shape[0]
        rest = math.prod(shape[1:])
        return spec.rank * (o + rest)
    # TT
    total = 0
    for j in range(len(spec.tt_shapes)):
        total += spec.tt_ranks[j] * spec.tt_shapes[j] * spec.tt_ranks[j + 1]
    return total


class TestAutoRatio:
    @pytest.mark.parametrize("fmt", ["tk", "tt", "svd"])
    def test_targeted_layers_hit_ratio(self, fmt):
        import math
        plan = auto_rank_plan("resnet20", fmt, 3.0)
        shapes = dict(layer_inventory("resnet20"))
        dense = comp = 0
        for name, spec in plan.layers.items():
            dense += math.prod(shapes[name])
            comp += _spec_params(spec, shapes[name])
        achieved = dense / comp
        assert 2.0 < achieved < 4.5, achieved

    def test_tt_special_shapes(self):
        plan = auto_rank_plan("resnet20", "tt", 3.0, tt_type="special")
        spec = plan.spec("layer2.0.conv1.weight")
        assert isinstance(spec, TTConvSpec)
        assert spec.tt_shapes == (32, 9, 16)    # [O, kh*kw, I] unfactorized

    def test_rejects_ratio_below_one(self):
        with pytest.raises(ValueError):
            auto_rank_plan("resnet20", "tk", 1.0)


class TestAutoPlannedModelRuns:
    def test_tkc_resnet20_forward_and_decompose(self):
        from dnn_compression_tensor_admm_tpu.models.decompose import (
            compression_ratio, decompose_params)
        dense = create_model("resnet20")
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        dvars = dense.init(jax.random.PRNGKey(0), x, train=False)

        comp = create_model("tkc_resnet20", ratio="3")
        plan = auto_rank_plan("resnet20", "tk", 3.0)
        cvars = decompose_params(dvars, plan)
        y = comp.apply(cvars, x, train=False)
        assert y.shape == (2, 10)
        assert bool(jnp.all(jnp.isfinite(y)))
        r = compression_ratio(dvars, cvars)
        assert 1.8 < r < 4.0, r
