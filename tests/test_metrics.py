"""mIoU machinery tests: hand-computed confusions + numpy/jax agreement."""

import numpy as np
import jax.numpy as jnp

from adaptsegnet_tpu.ops import fast_hist, per_class_iu, mean_iou
from adaptsegnet_tpu.ops.metrics import fast_hist_jax, label_mapping


def test_fast_hist_hand_computed():
    label = np.array([0, 0, 1, 1, 2, 255])
    pred = np.array([0, 1, 1, 1, 0, 2])
    h = fast_hist(label, pred, 3)
    expected = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 0]])
    np.testing.assert_array_equal(h, expected)


def test_per_class_iou_hand_computed():
    hist = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 0]], dtype=np.float64)
    iou = per_class_iu(hist)
    # class0: 1/(2+2-1)=1/3; class1: 2/(2+3-2)=2/3; class2: 0/(1+0-0)=0
    np.testing.assert_allclose(iou, [1 / 3, 2 / 3, 0.0])
    np.testing.assert_allclose(mean_iou(hist), 100 * (1 / 3 + 2 / 3 + 0) / 3)


def test_nan_classes_excluded_from_mean():
    hist = np.zeros((3, 3))
    hist[0, 0] = 5  # only class 0 present
    assert mean_iou(hist) == 100.0


def test_jax_hist_matches_numpy(rng):
    label = rng.integers(0, 19, size=(2, 33, 41)).astype(np.int32)
    label[rng.uniform(size=label.shape) < 0.2] = 255
    pred = rng.integers(0, 19, size=(2, 33, 41)).astype(np.int32)
    h_np = fast_hist(label, pred, 19)
    h_jx = np.asarray(fast_hist_jax(jnp.asarray(label), jnp.asarray(pred), 19))
    np.testing.assert_array_equal(h_np, h_jx)


def test_jax_hist_chunked_scan_matches_numpy(rng):
    """Flat inputs longer than _chunk take the int32-scan path (incl. the
    invalid-id tail padding); counts must still match numpy exactly."""
    n = 1000
    label = rng.integers(0, 19, size=(n,)).astype(np.int32)
    label[rng.uniform(size=n) < 0.2] = 255
    pred = rng.integers(0, 19, size=(n,)).astype(np.int32)
    h_np = fast_hist(label, pred, 19)
    h_jx = np.asarray(fast_hist_jax(jnp.asarray(label), jnp.asarray(pred),
                                    19, _chunk=128))
    np.testing.assert_array_equal(h_np, h_jx)


def test_jax_hist_batched_per_item_matches_flat(rng):
    """ndim>=2 inputs reduce per leading-axis item (the f32-exactness /
    mesh-friendly path); the counts equal the flat formulation."""
    label = rng.integers(0, 19, size=(4, 17, 23)).astype(np.int32)
    label[rng.uniform(size=label.shape) < 0.2] = 255
    pred = rng.integers(0, 19, size=(4, 17, 23)).astype(np.int32)
    h_np = fast_hist(label, pred, 19)
    h_jx = np.asarray(fast_hist_jax(jnp.asarray(label), jnp.asarray(pred), 19))
    np.testing.assert_array_equal(h_np, h_jx)


def test_label_mapping_masks_on_input():
    mapping = np.array([[7, 0], [8, 1], [0, 255]])
    arr = np.array([7, 8, 0, 3])
    out = label_mapping(arr, mapping)
    # Masks are computed on the ORIGINAL array, so 7->0 is not re-hit by 0->255.
    np.testing.assert_array_equal(out, [0, 1, 255, 3])
