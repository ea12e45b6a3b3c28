"""PyTorch checkpoint interop: the reference consumes torch state dicts
(resnet_cifar_tt.py:365-374, main.py:79-90); these tests pin the
name/layout mapping and both readers (torch and torch-free)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dnn_compression_tensor_admm_tpu.models import create_model, decompose_params
from dnn_compression_tensor_admm_tpu.utils.torch_import import (
    load_torch_state_dict, save_torch_state_dict, torch_to_variables,
    variables_to_torch)

torch = pytest.importorskip("torch")


def _dense_variables(name="resnet20", size=32, classes=10):
    m = create_model(name, num_classes=classes)
    return m, m.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
                     train=False)


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for (kp, va), (_, vb) in zip(fa[0], fb[0]):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(kp))


@pytest.mark.parametrize("prefer_torch", [True, False],
                         ids=["torch-reader", "torch-free-reader"])
def test_roundtrip_bit_equal(tmp_path, prefer_torch):
    """Export dense model under torch naming -> torch.save -> re-import
    -> bit-equal (VERDICT item 5's done-criterion)."""
    _, variables = _dense_variables()
    sd = variables_to_torch(variables)
    # reference state-dict names present with torch layouts
    assert sd["conv1.weight"].shape[-2:] == (3, 3)      # OIHW
    assert "bn1.running_mean" in sd
    assert sd["linear.weight"].shape == (10, 64)        # [out, in]
    path = str(tmp_path / "dense.pth")
    save_torch_state_dict(path, sd)
    back = torch_to_variables(
        load_torch_state_dict(path, prefer_torch=prefer_torch), variables)
    _assert_tree_equal(variables, back)


def test_torch_free_reader_matches_torch_reader(tmp_path):
    _, variables = _dense_variables()
    path = str(tmp_path / "d.pth")
    save_torch_state_dict(path, variables_to_torch(variables))
    a = load_torch_state_dict(path, prefer_torch=True)
    b = load_torch_state_dict(path, prefer_torch=False)
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_torch_free_reader_refuses_code(tmp_path):
    """The restricted unpickler must refuse arbitrary globals."""
    import os
    path = str(tmp_path / "evil.pth")
    torch.save({"x": torch.zeros(2)}, path)
    # poison: a pickle that imports os.system
    import pickle
    import zipfile
    evil = pickle.dumps({"f": os.system})
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", evil)
    with pytest.raises(pickle.UnpicklingError):
        load_torch_state_dict(path, prefer_torch=False)


def test_wrapped_state_dict_and_nonstrict(tmp_path):
    """{'state_dict': ...} wrappers unwrap; strict=False keeps template
    init for missing keys (new classifier head)."""
    _, variables = _dense_variables()
    sd = variables_to_torch(variables)
    head_w = sd.pop("linear.weight")
    sd.pop("linear.bias")
    path = str(tmp_path / "w.pth")
    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()},
                "epoch": 3}, path)
    loaded = load_torch_state_dict(path)
    assert "conv1.weight" in loaded and "epoch" not in loaded
    with pytest.raises(KeyError):
        torch_to_variables(loaded, variables, strict=True)
    back = torch_to_variables(loaded, variables, strict=False)
    # head kept from template; conv imported
    np.testing.assert_array_equal(
        np.asarray(back["params"]["linear"]["kernel"]),
        np.asarray(variables["params"]["linear"]["kernel"]))


def test_bfloat16_storage_torch_free(tmp_path):
    path = str(tmp_path / "bf16.pth")
    t = torch.arange(6, dtype=torch.float32).reshape(2, 3).to(torch.bfloat16)
    torch.save({"w": t}, path)
    out = load_torch_state_dict(path, prefer_torch=False)
    np.testing.assert_allclose(out["w"], t.float().numpy())


def test_imported_dense_checkpoint_decomposes(tmp_path):
    """A torch dense checkpoint seeds --decompose end-to-end: import,
    factorize with the tk plan, run the compressed forward."""
    from dnn_compression_tensor_admm_tpu.configs.resolver import get_rank_plan
    model, variables = _dense_variables("resnet20")
    path = str(tmp_path / "dense.pth")
    save_torch_state_dict(path, variables_to_torch(variables))
    dense = torch_to_variables(load_torch_state_dict(path), variables)
    plan = get_rank_plan("tkc_resnet20", "tk", "3")
    cvars = decompose_params(dense, plan)
    cm = create_model("tkc_resnet20", num_classes=10, ratio="3")
    y = cm.apply({"params": cvars["params"],
                  "batch_stats": cvars.get("batch_stats")},
                 jnp.zeros((2, 32, 32, 3)), train=False)
    assert y.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(y)))


def test_imagenet_resnet18_torchvision_names(tmp_path):
    """torchvision-style resnet18 names (conv1, layer1.0.*, fc.*) map
    onto the ImageNet zoo model (reference main.py:79-90 loads
    torchvision weights)."""
    m = create_model("resnet18", num_classes=1000)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      train=False)
    sd = variables_to_torch(variables)
    # torchvision naming: downsample convs + fc
    assert any(k.startswith("layer2.0.downsample") or "shortcut" in k
               or "downsample" in k for k in sd), sorted(sd)[:20]
    path = str(tmp_path / "r18.pth")
    save_torch_state_dict(path, sd)
    back = torch_to_variables(load_torch_state_dict(path), variables)
    _assert_tree_equal(variables, back)
