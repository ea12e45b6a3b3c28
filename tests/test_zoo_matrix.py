"""Zoo-wide decompose->apply matrix.

Round 3's MobileNetV2 head-conv crash (commit 10f7f49) proved that a
plan/substitution mismatch anywhere in the zoo only surfaces when a
decompose->fine-tune run actually executes. This module executes the
reference protocol (dense state dict -> per-layer factorization -> copy
into the compressed model, resnet_cifar_tt.py:224-229) for EVERY
registered compressed name: init the dense base, `decompose_params` with
that name's plan, assert the resulting tree matches the compressed
model's template leaf-for-leaf (names AND shapes), then run the
compressed forward.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnn_compression_tensor_admm_tpu.configs.resolver import get_rank_plan
from dnn_compression_tensor_admm_tpu.models import create_model, decompose_params
from dnn_compression_tensor_admm_tpu.models.registry import parse_compressed_name
from tests.test_auto_plan import REFERENCE_MODEL_NAMES

pytestmark = pytest.mark.slow

COMPRESSED = [n for n in REFERENCE_MODEL_NAMES
              if parse_compressed_name(n) is not None]

# ViT/DeiT position embeddings fix the input size; conv nets only need
# enough pixels to survive their stride stack.
_INPUT_SIZE = {
    "vit": 224, "deit": 224,
    "resnet18": 64, "resnet34": 64, "resnet50": 64,
    "mobilenetv2": 64, "densenet121": 64, "densenet201": 64,
    "densenet264": 64,
    # the ConvMlp head's 7x7 fc1 conv needs the 7x7 feature map a 224
    # input produces (2x2 at 64 -> empty conv output -> NaN mean)
    "vgg16": 224, "vgg16_bn": 224,
}


def _input_size(base: str) -> int:
    for key, sz in _INPUT_SIZE.items():
        if base.startswith(key) and not base.endswith("_cifar"):
            return sz
    return 32


def _flat(tree):
    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[".".join(str(k.key) for k in kp)] = tuple(np.shape(leaf))
    return out


@pytest.mark.parametrize("name", COMPRESSED)
def test_decompose_apply(name):
    base, fmt, _mode = parse_compressed_name(name)
    sz = _input_size(base)
    x = jnp.zeros((2, sz, sz, 3))
    kw = dict(num_classes=10)

    dense = create_model(base, **kw)
    dvars = dense.init(jax.random.PRNGKey(0), x, train=False)

    plan_fmt = "tk" if fmt == "stftk" else fmt
    plan = get_rank_plan(name, plan_fmt, "3")
    # gram solver + 1 HOOI sweep: this test checks STRUCTURE (slot names,
    # shapes, finite forward), not decomposition fidelity — the exact-svd
    # default takes ~1 h over the 47-name matrix on CPU
    cvars = decompose_params(dvars, plan, method="gram", n_iter=1)

    comp = create_model(name, ratio="3", **kw)
    template = comp.init(jax.random.PRNGKey(1), x, train=False)

    # leaf-for-leaf structural parity: any substitution/plan mismatch
    # (the mbv2 head-conv bug class) fails HERE with a readable diff
    got, want = _flat(cvars), _flat(template)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{name}: decompose tree != model template; "
        f"missing={missing[:6]} extra={extra[:6]}")
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, f"{name}: shape mismatches {mismatched}"

    y = comp.apply(cvars, x, train=False)
    assert y.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_function_preservation_tk_reconstruction():
    """decompose -> compressed forward must equal the DENSE forward run
    with the reconstructed kernels (same function by algebra): the
    end-to-end check that weights land in the right slots with the right
    layouts, not merely in slots of the right shape."""
    name = "tkc_resnet20"
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    dense = create_model("resnet20", num_classes=10)
    dvars = dense.init(jax.random.PRNGKey(0), x, train=False)
    plan = get_rank_plan(name, "tk", "3")
    cvars = decompose_params(dvars, plan)

    # rebuild each factorized kernel (tk_conv.py reconstruct-mode einsum)
    # and run it through the DENSE model. Module path segments come from
    # the dense tree's actual key paths ('layer1.0' is ONE flax key).
    from dnn_compression_tensor_admm_tpu.models.decompose import _name_to_path_map
    name_to_path = _name_to_path_map(dvars["params"])
    rparams = jax.tree.map(lambda a: a, dvars["params"])
    for lname in plan.names():
        path = name_to_path[lname][:-1]
        node = rparams
        cnode = cvars["params"]
        for p in path:
            node, cnode = node[p], cnode[p]
        w = jnp.einsum("oa,hwba,bi->hwio", cnode["last_factor"],
                       cnode["core_kernel"], cnode["first_factor"])
        node["kernel"] = w
    rvars = dict(dvars)
    rvars["params"] = rparams

    comp = create_model(name, ratio="3", num_classes=10)
    yd = dense.apply(rvars, x, train=False).astype(jnp.float32)
    yc = comp.apply(cvars, x, train=False).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yd),
                               rtol=2e-3, atol=2e-3)
