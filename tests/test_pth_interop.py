"""Round-trip and surgery tests for the .pth interop shim."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.models import DeeplabMulti, FCDiscriminator
from adaptsegnet_tpu.utils import pth_interop as io


@pytest.fixture(scope="module")
def multi_vars():
    model = DeeplabMulti(num_classes=19)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_resnet_roundtrip(multi_vars):
    sd = io.variables_to_resnet_state_dict(multi_vars)
    # Spot-check torch layout.
    assert sd["conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["layer1.0.downsample.0.weight"].shape == (256, 64, 1, 1)
    assert sd["layer5.conv2d_list.3.weight"].shape == (19, 1024, 3, 3)
    assert sd["layer6.conv2d_list.0.weight"].shape == (19, 2048, 3, 3)
    assert "layer3.22.conv2.weight" in sd

    back = io.resnet_state_dict_to_variables(sd)
    merged = io.merge_variables(multi_vars, back)
    for a, b in zip(jax.tree.leaves(multi_vars), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_key_count_matches_torch_checkpoint_layout(multi_vars):
    sd = io.variables_to_resnet_state_dict(multi_vars)
    # ResNet-101: 104 convs in backbone (1 stem + 33*3 + 4 downsample),
    # each with a BN (4 tensors); heads: 8 convs * 2 tensors.
    n_backbone_convs = 1 + 33 * 3 + 4
    expected = n_backbone_convs + n_backbone_convs * 4 + 8 * 2
    assert len(sd) == expected


def test_coco_init_surgery(multi_vars):
    """'Scale.' prefix + skip-layer5 semantics of the reference loader."""
    sd = io.variables_to_resnet_state_dict(multi_vars)
    # Simulate the MS-COCO init file: Scale.-prefixed, no layer6, with
    # perturbed values so we can detect what loaded.
    coco = {
        "Scale." + k: v + 1.0
        for k, v in sd.items()
        if not k.startswith("layer6.")
    }
    stripped = {io.strip_prefix(k): v for k, v in coco.items()}
    partial = io.resnet_state_dict_to_variables(stripped, skip_layer5=True)
    merged = io.merge_variables(multi_vars, partial)

    # Backbone loaded (values shifted by +1)...
    old = np.asarray(multi_vars["params"]["backbone"]["conv1"]["conv"]["kernel"])
    new = np.asarray(merged["params"]["backbone"]["conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(new, old + 1.0, rtol=1e-6)
    # ...heads untouched.
    for head in ("layer5", "layer6"):
        old_h = np.asarray(multi_vars["params"][head]["branch0"]["conv"]["kernel"])
        new_h = np.asarray(merged["params"][head]["branch0"]["conv"]["kernel"])
        np.testing.assert_array_equal(old_h, new_h)


def test_merge_shape_mismatch_raises(multi_vars):
    sd = io.variables_to_resnet_state_dict(multi_vars)
    sd["conv1.weight"] = np.zeros((64, 3, 3, 3), dtype=np.float32)
    partial = io.resnet_state_dict_to_variables(sd)
    with pytest.raises(ValueError, match="shape mismatch"):
        io.merge_variables(multi_vars, partial)


def test_discriminator_roundtrip():
    model = FCDiscriminator(num_classes=19)
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 19)))
    sd = io.variables_to_discriminator_state_dict(v)
    assert sd["conv1.weight"].shape == (64, 19, 4, 4)
    assert sd["classifier.weight"].shape == (1, 512, 4, 4)
    back = io.discriminator_state_dict_to_variables(sd)
    merged = io.merge_variables(v, back)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_file_roundtrip(tmp_path, multi_vars):
    """Full disk round-trip through torch.save/torch.load."""
    sd = io.variables_to_resnet_state_dict(multi_vars)
    path = str(tmp_path / "ckpt.pth")
    io.save_torch_state_dict(sd, path)
    loaded = io.load_torch_state_dict(path)
    assert set(loaded) == set(sd)
    np.testing.assert_array_equal(loaded["conv1.weight"], sd["conv1.weight"])
