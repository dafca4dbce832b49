"""Confusion-matrix mIoU (reference compute_iou.py:15-65), MXU-formulated.

The reference accumulates a 19x19 confusion matrix with np.bincount
(`fast_hist`) and reports nanmean of per-class IoU. On TPU a scatter-add
histogram serializes badly; instead the confusion matrix is computed as a
matmul of one-hot encodings — hist = onehot(label)^T @ onehot(pred) — which
maps straight onto the MXU with static shapes.

Both a NumPy path (drop-in for the reference's offline PNG pipeline) and a
jittable JAX path (for on-device streaming eval) are provided.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fast_hist(label: np.ndarray, pred: np.ndarray, num_classes: int) -> np.ndarray:
    """NumPy confusion matrix, semantics of reference compute_iou.py:15-17.

    Rows index ground-truth class, columns predicted class. Pixels whose
    label is outside [0, num_classes) are dropped.
    """
    label = np.asarray(label).reshape(-1)
    pred = np.asarray(pred).reshape(-1)
    k = (label >= 0) & (label < num_classes)
    return np.bincount(
        num_classes * label[k].astype(int) + pred[k],
        minlength=num_classes ** 2,
    ).reshape(num_classes, num_classes)


def fast_hist_jax(
    label: jnp.ndarray, pred: jnp.ndarray, num_classes: int,
    _chunk: int = 1 << 22,
) -> jnp.ndarray:
    """Jittable confusion matrix via one-hot matmul (MXU-friendly).

    label, pred: integer arrays of identical shape. Invalid labels
    (< 0 or >= num_classes, e.g. the 255 ignore id) contribute nothing.
    Returns (num_classes, num_classes) int32, rows = ground truth.

    The one-hot product sums in f32, which counts exactly only up to 2^24
    per cell — a 16-image 1024x2048 batch can cross that silently. Batched
    inputs (ndim >= 2) are therefore reduced per leading-axis item (a
    1024x2048 image is 2^21 pixels, comfortably exact) and accumulated in
    int32 — which also keeps the batch axis intact under a data-parallel
    mesh, so GSPMD lowers the item sum to a psum instead of gathering the
    flattened pixels. Flat inputs longer than `_chunk` pixels fold through
    an int32 scan; exactness then holds to int32's 2^31 per cell.
    """

    def one(lab, prd):
        valid = (lab >= 0) & (lab < num_classes)
        lab_oh = jax.nn.one_hot(
            jnp.where(valid, lab, num_classes), num_classes + 1,
            dtype=jnp.float32,
        )[:, :num_classes]
        # Predictions from argmax are always in range; one_hot handles
        # strays.
        prd_oh = jax.nn.one_hot(prd, num_classes, dtype=jnp.float32)
        hist = jnp.einsum(
            "nl,np->lp", lab_oh, prd_oh, precision=jax.lax.Precision.HIGHEST
        )
        return hist.astype(jnp.int32)

    if label.ndim >= 2 and label[0].size <= (1 << 24):
        labs = label.reshape(label.shape[0], -1).astype(jnp.int32)
        prds = pred.reshape(pred.shape[0], -1).astype(jnp.int32)
        return jax.vmap(one)(labs, prds).sum(axis=0)

    label = label.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    n = label.shape[0]
    if n <= _chunk:
        return one(label, pred)
    pad = (-n) % _chunk
    if pad:
        # Padded labels land on the invalid num_classes id -> zero rows.
        label = jnp.pad(label, (0, pad), constant_values=num_classes)
        pred = jnp.pad(pred, (0, pad))
    labs = label.reshape(-1, _chunk)
    prds = pred.reshape(-1, _chunk)

    def body(acc, ab):
        return acc + one(ab[0], ab[1]), None

    hist, _ = jax.lax.scan(
        body, jnp.zeros((num_classes, num_classes), jnp.int32), (labs, prds)
    )
    return hist


def per_class_iu(hist: np.ndarray) -> np.ndarray:
    """Per-class IoU = diag / (row + col - diag); NaN for absent classes.

    Reference compute_iou.py:20-21.
    """
    hist = np.asarray(hist, dtype=np.float64)
    denom = hist.sum(1) + hist.sum(0) - np.diag(hist)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.diag(hist) / denom


def mean_iou(hist: np.ndarray) -> float:
    """nanmean of per-class IoU, in percent (reference compute_iou.py:61-64)."""
    return float(np.nanmean(per_class_iu(hist)) * 100.0)


def label_mapping(arr: np.ndarray, mapping: np.ndarray) -> np.ndarray:
    """Remap raw label ids through an (n, 2) [from, to] table.

    Semantics of reference compute_iou.py:24-28: each row's mask is computed
    against the ORIGINAL array, so chained remaps (a->b, b->c) do not cascade.
    """
    out = np.copy(arr)
    for src, dst in np.asarray(mapping):
        out[arr == src] = dst
    return out.astype(np.int64)
