"""Auxiliary subsystems: Synscapes loader, VGG export, config CLI, orbax."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


# --- Synscapes -------------------------------------------------------------

@pytest.fixture(scope="module")
def synscapes_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synscapes"))
    rng = np.random.default_rng(7)
    os.makedirs(osp.join(root, "img", "rgb"))
    os.makedirs(osp.join(root, "img", "class"))
    for i in range(3):
        img = rng.integers(0, 256, size=(32, 64, 3), dtype=np.uint8)
        lab = rng.integers(0, 34, size=(32, 64), dtype=np.uint8)
        Image.fromarray(img).save(osp.join(root, "img", "rgb", f"{i + 1}.png"))
        Image.fromarray(lab).save(osp.join(root, "img", "class", f"{i + 1}.png"))
    return root


def test_synscapes_dataset(synscapes_root):
    from adaptsegnet_tpu.data import SynscapesDataset

    ds = SynscapesDataset(synscapes_root, crop_size=(32, 16))
    assert len(ds) == 3
    img, lab, size, name = ds[0]
    assert img.shape == (16, 32, 3)
    assert lab.shape == (16, 32)
    # Labels remapped: everything is a train id or 255.
    assert set(np.unique(lab)) <= set(range(19)) | {255}
    ds2 = SynscapesDataset(synscapes_root, max_iters=7)
    assert len(ds2) == 9


# --- VGG .pth export/import round-trip --------------------------------------

def test_vgg_pth_roundtrip():
    from adaptsegnet_tpu.models import DeeplabVGG
    from adaptsegnet_tpu.utils import pth_interop as io

    model = DeeplabVGG(num_classes=19)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sd = io.variables_to_vgg_state_dict(v)
    assert sd["features.0.weight"].shape == (64, 3, 3, 3)
    assert sd["features.29.weight"].shape == (1024, 512, 3, 3)  # fc6
    assert sd["features.31.weight"].shape == (1024, 1024, 3, 3)  # fc7
    assert sd["classifier.conv2d_list.0.weight"].shape == (19, 1024, 3, 3)
    back = io.vgg_state_dict_to_variables(sd)
    merged = io.merge_variables(v, back)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- Config CLI -------------------------------------------------------------

def test_config_reference_flags():
    from adaptsegnet_tpu.train.config import parse_args

    cfg = parse_args([
        "--lambda-seg", "0.2", "--lambda-adv-target1", "0.001",
        "--lambda-adv-target2", "0.002", "--gan", "Vanilla",
        "--snapshot-dir", "/tmp/s", "--no-source-only",
        "--level", "multi-level", "--iter-size", "2",
        "--input-size", "512,256", "--source", "Synscapes",
        "--optim-dup-quirk",
    ])
    assert cfg.optim_dup_quirk
    assert cfg.lambda_seg == 0.2
    assert cfg.lambda_adv_target1 == 0.001
    assert cfg.gan == "Vanilla"
    assert not cfg.source_only
    assert cfg.level == "multi-level"
    assert cfg.input_hw == (256, 512)
    assert cfg.crop_size_wh == (512, 256)
    assert cfg.source == "Synscapes"


def test_config_defaults_match_reference():
    from adaptsegnet_tpu.train.config import TrainConfig

    d = TrainConfig()
    # Reference defaults (train_gta2cityscapes_multi.py:24-69).
    assert d.learning_rate == 2.5e-4
    assert d.learning_rate_D == 1e-4
    assert d.lambda_seg == 0.1
    assert d.lambda_adv_target1 == 0.0002
    assert d.lambda_adv_target2 == 0.001
    assert d.gan == "LS"
    assert d.num_steps == 250000 and d.num_steps_stop == 150000
    assert d.save_pred_every == 5000
    assert d.momentum == 0.9 and d.weight_decay == 0.0005
    assert d.power == 0.9
    assert d.source_only is True and d.level == "single-level"
    assert d.warper is True
    assert d.input_size == "1024,512"


# --- tensorboard scalar logging ----------------------------------------------

def test_tensorboard_logger(tmp_path):
    from adaptsegnet_tpu.utils.logging import ScalarLogger, format_losses

    log_dir = str(tmp_path / "tb")
    lg = ScalarLogger(log_dir, tensorboard=True, every=10)
    for step in range(21):
        lg.log(step, {"loss_seg2": 1.0 / (step + 1)})
    lg.close()
    import glob

    assert glob.glob(log_dir + "/events.out.tfevents.*")
    line = format_losses(7, 100, {"loss_seg2": 1.234})
    assert "iter =        7/     100" in line and "loss_seg2 = 1.234" in line


# --- orbax full-state round-trip ---------------------------------------------

def test_orbax_roundtrip(tmp_path, rng):
    from tests.test_steps import make_states, make_batch, HW
    from adaptsegnet_tpu.train.steps import make_adversarial_step
    from adaptsegnet_tpu.utils.checkpoint import CheckpointManager

    model, disc, state = make_states()
    step = make_adversarial_step(model, disc, level="multi-level",
                                 input_hw=HW, donate=False)
    state, _ = step(state, make_batch(rng))

    mgr = CheckpointManager(str(tmp_path / "orbax"))
    mgr.save(1, state)
    assert mgr.latest_step() == 1
    restored = mgr.restore(state)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- Profiling (utils/profiling.py) -----------------------------------------

def test_op_stats_parses_trace(tmp_path):
    """trace() + op_stats() round-trip on the CPU backend: a traced jitted
    matmul yields parseable framework_op_stats rows (self_us populated,
    sorted descending). device_only=False because xprof labels CPU-backend
    rows Host."""
    from adaptsegnet_tpu.utils.profiling import op_stats, print_op_stats, trace

    @jax.jit
    def f(a, b):
        return jnp.tanh(a @ b)

    a = jnp.ones((128, 128), jnp.float32)
    out = f(a, a)  # compile outside the trace
    out.block_until_ready()
    tdir = str(tmp_path / "trace")
    with trace(tdir):
        for _ in range(3):
            out = f(a, a)
        out.block_until_ready()

    rows = op_stats(tdir, device_only=False)
    assert rows, "no op rows parsed from the trace"
    assert all("self_us" in r for r in rows)
    assert rows == sorted(rows, key=lambda r: -r["self_us"])
    print_op_stats(rows, top=5, iters=3)  # smoke: formatting doesn't throw


def test_op_stats_missing_trace(tmp_path):
    from adaptsegnet_tpu.utils.profiling import op_stats

    with pytest.raises(FileNotFoundError):
        op_stats(str(tmp_path / "nope"))
