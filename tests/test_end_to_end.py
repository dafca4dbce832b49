"""End-to-end slice: tiny train -> .pth snapshot -> evaluate -> mIoU.

Exercises the whole user-visible pipeline on synthetic data with the real
DeeplabMulti (tiny images), matching the reference's de-facto integration
test (train -> evaluate_cityscapes -> compute_iou, SURVEY.md §4).
"""

import os.path as osp

import numpy as np
import pytest

import jax

from adaptsegnet_tpu.data import lists
from adaptsegnet_tpu.train.config import TrainConfig
from adaptsegnet_tpu.train.loop import train
from adaptsegnet_tpu.eval.compute_iou import compute_mIoU


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    gta_root = str(base / "gta5")
    cs_root = str(base / "cs")
    gta_list = lists.make_synthetic_gta5(gta_root, n=4, size_wh=(64, 32))
    cs_train_list = lists.make_synthetic_cityscapes(
        cs_root, "train", n=4, size_wh=(64, 32))
    cs_val_list = lists.make_synthetic_cityscapes(
        cs_root, "val", n=2, size_wh=(64, 32))
    return dict(base=base, gta_root=gta_root, cs_root=cs_root,
                gta_list=gta_list, cs_train_list=cs_train_list,
                cs_val_list=cs_val_list)


def _cfg(env, tmpdir, **kw):
    defaults = dict(
        data_dir=env["gta_root"], data_list=env["gta_list"],
        data_dir_target=env["cs_root"], data_list_target=env["cs_train_list"],
        input_size="64,32", input_size_target="64,32",
        num_steps=100, num_steps_stop=3, save_pred_every=100,
        snapshot_dir=str(tmpdir), log_dir=str(tmpdir / "log"),
        warper=False, restore_from="", orbax_checkpoints=False,
        num_workers=2,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_multi_level_train_snapshot_eval_iou(env, tmp_path):
    cfg = _cfg(env, tmp_path, source_only=False, level="multi-level")
    summary = train(cfg, max_steps=3)
    assert summary["steps"] == 3
    for v in summary["final_metrics"].values():
        assert np.isfinite(v)
    snap = osp.join(str(tmp_path), "multi_level", "GTA5_3.pth")
    assert osp.exists(snap)
    assert osp.exists(osp.join(str(tmp_path), "multi_level", "GTA5_3_D1.pth"))
    assert osp.exists(osp.join(str(tmp_path), "multi_level", "GTA5_3_D2.pth"))

    # Evaluate that snapshot on the synthetic val split.
    from adaptsegnet_tpu.cli import evaluate as ev

    save_dir = str(tmp_path / "result")
    ev.main([
        "--model", "DeeplabMulti",
        "--data-dir", env["cs_root"],
        "--data-list", env["cs_val_list"],
        "--restore-from", snap,
        "--save", save_dir,
        "--input-size", "64,32",
        "--output-size", "64,32",
    ])
    import glob

    preds = sorted(glob.glob(save_dir + "/*_leftImg8bit.png"))
    assert len(preds) == 2
    colors = glob.glob(save_dir + "/*_color.png")
    assert len(colors) == 2

    # mIoU over synthetic ground truth.
    val_names = open(env["cs_val_list"]).read().split()
    gt_dir, label_names = lists.make_synthetic_cityscapes_gt(
        env["cs_root"], val_names, size_wh=(64, 32))
    devkit = str(tmp_path / "devkit")
    lists.write_devkit(devkit, val_names, label_names)
    ious = compute_mIoU(gt_dir, save_dir, devkit, verbose=False)
    assert ious.shape == (19,)
    # Random-init model on random labels: mIoU is defined and small.
    assert np.nanmean(ious) >= 0.0


@pytest.mark.parametrize("model_name", ["Oracle", "DeeplabVGG"])
def test_evaluate_cli_single_output_models(env, tmp_path, model_name):
    """Oracle/VGG eval path: random-init weights exported to .pth, loaded
    back through the CLI, predictions written."""
    import jax.numpy as jnp
    from adaptsegnet_tpu.cli import evaluate as ev
    from adaptsegnet_tpu.models import DeeplabSingle, DeeplabVGG
    from adaptsegnet_tpu.utils import pth_interop as io

    if model_name == "Oracle":
        model = DeeplabSingle(num_classes=19)
        exporter = io.variables_to_resnet_state_dict
    else:
        model = DeeplabVGG(num_classes=19)
        exporter = io.variables_to_vgg_state_dict
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    ckpt = str(tmp_path / f"{model_name}.pth")
    io.save_torch_state_dict(exporter(v), ckpt)

    save_dir = str(tmp_path / "result")
    ev.main([
        "--model", model_name,
        "--data-dir", env["cs_root"],
        "--data-list", env["cs_val_list"],
        "--restore-from", ckpt,
        "--save", save_dir,
        "--input-size", "64,32",
        "--output-size", "64,32",
    ])
    import glob

    assert len(glob.glob(save_dir + "/*_leftImg8bit.png")) == 2


def test_source_only_train_runs(env, tmp_path):
    cfg = _cfg(env, tmp_path, source_only=True, num_steps_stop=2)
    summary = train(cfg, max_steps=2)
    assert np.isfinite(summary["final_metrics"]["loss_seg2"])
    assert osp.exists(osp.join(str(tmp_path), "source_only", "GTA5_2.pth"))


def test_single_level_train_runs(env, tmp_path):
    cfg = _cfg(env, tmp_path, source_only=False, level="single-level",
               num_steps_stop=2, gan="Vanilla")
    summary = train(cfg, max_steps=2)
    m = summary["final_metrics"]
    assert np.isfinite(m["loss_D2"]) and m["loss_D2"] != 0.0
    assert m["loss_D1"] == 0.0


def test_evaluator_ragged_tail_keeps_prefetch(env, tmp_path, monkeypatch):
    """n % batch_size != 0 must still prefetch the full batches and pad the
    remainder to the compiled batch shape (no recompile, nothing dropped)."""
    import flax.linen as fnn
    import jax.numpy as jnp

    from adaptsegnet_tpu.data import CityscapesDataset, lists
    from adaptsegnet_tpu.eval.evaluator import Evaluator

    cs_root = str(tmp_path / "cs")
    val_list = lists.make_synthetic_cityscapes(cs_root, "val", n=5,
                                               size_wh=(32, 16))
    ds = CityscapesDataset(cs_root, val_list, crop_size=(32, 16), set="val")

    class TinySeg(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return fnn.Conv(19, (1, 1))(x)

    model = TinySeg()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)))

    calls = []
    from adaptsegnet_tpu.data import pipeline as pipe

    orig_cls = pipe.PrefetchIterator

    def spy(*a, **kw):
        calls.append(kw.get("max_batches"))
        return orig_cls(*a, **kw)

    monkeypatch.setattr(pipe, "PrefetchIterator", spy)

    ev = Evaluator(model, out_hw=(16, 32), save_dir=str(tmp_path / "out"))
    written = ev.run(variables, ds, batch_size=2)
    assert calls == [2]  # prefetch engaged for the 2 full batches
    assert len(written) == 5  # all 5 images written incl. the ragged one


def test_missing_restore_from_fails_loudly(env, tmp_path):
    """A typo'd --restore-from path must crash (like the reference's
    torch.load, train_gta2cityscapes_multi.py:202-205), not silently train
    from random init. Empty string means intentional from-scratch."""
    from adaptsegnet_tpu.train.build import build_train_state

    cfg = _cfg(env, tmp_path, source_only=True,
               restore_from=str(tmp_path / "no_such_ckpt.pth"))
    with pytest.raises(FileNotFoundError, match="no_such_ckpt"):
        build_train_state(cfg)
    # restore_from='' still builds (random init path).
    cfg2 = _cfg(env, tmp_path, source_only=True, restore_from="")
    state, _ = build_train_state(cfg2)
    assert int(state.step) == 0
