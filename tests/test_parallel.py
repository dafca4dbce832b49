"""Mesh data-parallel correctness on the 8-virtual-device CPU platform."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.parallel import make_mesh, replicate, shard_batch
from tests.test_steps import HW, TinySeg, make_batch, make_states
from adaptsegnet_tpu.train.steps import make_adversarial_step


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_sharded_step_matches_single_device(rng):
    """Data-parallel multi-level step == single-device step on the same
    global batch (psum gradient identity)."""
    model, disc, state = make_states()
    step = make_adversarial_step(
        model, disc, level="multi-level", input_hw=HW, donate=False
    )
    # Global batch of 8, one per device.
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((1, 8, *HW, 3)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 19, size=(1, 8, *HW)).astype(np.int32)),
        "target_images": jnp.asarray(
            rng.standard_normal((1, 8, *HW, 3)).astype(np.float32)),
    }

    single_state, single_metrics = step(state, batch)

    mesh = make_mesh(8)
    sharded_state = replicate(mesh, state)
    sharded_batch = shard_batch(mesh, batch, batch_axis=1)
    multi_state, multi_metrics = step(sharded_state, sharded_batch)

    for k in single_metrics:
        np.testing.assert_allclose(
            float(single_metrics[k]), float(multi_metrics[k]),
            rtol=1e-4, atol=1e-5,
        )
    for a, b in zip(jax.tree.leaves(single_state.generator.params),
                    jax.tree.leaves(multi_state.generator.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    p1, p2 = out
    assert p1.shape == (1, 32, 64, 19)
    assert p2.shape == (1, 32, 64, 19)


class _ArrayDataset:
    """In-memory (image, name) dataset with the Cityscapes item contract."""

    def __init__(self, images, names):
        self._images = images
        self._names = names

    def __len__(self):
        return len(self._names)

    def __getitem__(self, i):
        return self._images[i], (64, 32), self._names[i]


def test_mesh_sharded_eval_matches_single_device(rng, tmp_path):
    """Evaluator(mesh=8) must produce the identical masks and confusion
    matrix as the single-device evaluator (the reference's default eval is
    multi-GPU DataParallel, evaluate_cityscapes.py:92,145-146). Covers the
    ragged tail (10 images, batch 8)."""
    from PIL import Image

    from adaptsegnet_tpu.eval.evaluator import Evaluator
    from adaptsegnet_tpu.ops.metrics import mean_iou

    n, hw = 10, (16, 32)
    images = rng.standard_normal((n, *hw, 3)).astype(np.float32)
    names = [f"city/city_{i:06d}_leftImg8bit.png" for i in range(n)]
    labels = {
        nm: rng.integers(0, 19, size=hw).astype(np.int32) for nm in names
    }
    # Sprinkle ignore pixels.
    for nm in names:
        labels[nm][0, :4] = 255
    ds = _ArrayDataset(images, names)
    gt = lambda nm: labels[nm]

    model = TinySeg()
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, *hw, 3)))

    def run(mesh, out_dir):
        ev = Evaluator(model, out_hw=hw, output_index=1,
                       save_dir=str(out_dir), mesh=mesh)
        return ev.run_streaming(variables, ds, gt, batch_size=8,
                                num_workers=2)

    hist_single = run(None, tmp_path / "single")
    hist_mesh = run(make_mesh(8), tmp_path / "mesh")

    np.testing.assert_array_equal(hist_single, hist_mesh)
    assert hist_single.sum() == n * hw[0] * hw[1] - n * 4  # ignores dropped
    assert np.isfinite(mean_iou(hist_single))
    for nm in names:
        base = nm.split("/")[-1]
        a = np.array(Image.open(tmp_path / "single" / base))
        b = np.array(Image.open(tmp_path / "mesh" / base))
        np.testing.assert_array_equal(a, b)


def test_mesh_eval_rejects_indivisible_batch():
    from adaptsegnet_tpu.eval.evaluator import Evaluator

    ev = Evaluator(TinySeg(), out_hw=(16, 32), mesh=make_mesh(8))
    with pytest.raises(ValueError, match="not divisible"):
        ev._prepare({}, 3)
