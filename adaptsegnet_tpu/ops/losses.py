"""Segmentation and adversarial objectives.

Parity targets (reference file:line):
  * seg loss — torch.nn.CrossEntropyLoss(ignore_index=255) over NCHW logits
    (train_gta2cityscapes_multi.py:248,359,546): mean over non-ignored pixels.
  * GAN loss — selected by --gan: 'Vanilla' -> BCEWithLogitsLoss, 'LS' ->
    MSELoss (train_gta2cityscapes_multi.py:355-358,542-545); adversarial
    labels source=0 / target=1 (:363-364, :550-551).

All functions take NHWC activations and return scalar f32 means. Everything
here is elementwise + reductions — XLA fuses these into the surrounding
matmuls, so there is no bespoke kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_2d(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = 255,
) -> jnp.ndarray:
    """Pixel-wise softmax cross-entropy with an ignore label.

    logits: (N, H, W, C) raw scores; labels: (N, H, W) int, with pixels equal
    to `ignore_label` excluded from the mean. Matches
    torch.nn.CrossEntropyLoss(ignore_index=255) (mean reduction over valid
    pixels). Returns 0 when every pixel is ignored (torch returns NaN there;
    a zero keeps the fused train step finite — documented deviation).
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    # One-hot dot instead of take_along_axis: a last-axis gather lowers to a
    # serialized TPU gather (4.4x slower measured at 512x1024x19); the
    # one-hot multiply-reduce stays on the VPU.
    oh = jax.nn.one_hot(safe, logits.shape[-1], dtype=logits.dtype)
    picked = jnp.sum(logits * oh, axis=-1)
    nll = (logz - picked) * valid.astype(jnp.float32)
    count = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    return nll.sum() / count


def cross_entropy_2d_planar(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = 255,
) -> jnp.ndarray:
    """cross_entropy_2d on (N, C, H, W) channel-plane logits.

    Same math as cross_entropy_2d; the class axis is MAJOR, so every
    reduction/one-hot runs over a leading axis with W in the lanes —
    a (N, H, W, 19) c-minor tensor pads every HBM tile 19 -> 128 lanes
    (6.7x traffic), which made the dense CE's reduce/convert chain cost
    ~2 ms/step in the warper-on profile. Pairs with
    upsample_warp(planar_out=True), whose kernel emits planes directly.
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=1)
    # One-hot dot, same rationale as cross_entropy_2d above; axis=1 places
    # the class axis on the (major) plane axis of the planar layout.
    oh = jax.nn.one_hot(safe, logits.shape[1], axis=1, dtype=logits.dtype)
    picked = jnp.sum(logits * oh, axis=1)
    nll = (logz - picked) * valid.astype(jnp.float32)
    count = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    return nll.sum() / count


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray | float) -> jnp.ndarray:
    """Mean binary cross-entropy on raw logits (torch BCEWithLogitsLoss).

    Numerically stable form: max(x,0) - x*t + log(1 + exp(-|x|)).
    """
    x = logits.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(target, jnp.float32), x.shape)
    loss = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return loss.mean()


def ls_gan_mse(logits: jnp.ndarray, target: jnp.ndarray | float) -> jnp.ndarray:
    """Mean squared error on raw discriminator outputs (torch MSELoss).

    The reference's least-squares GAN objective (--gan LS, the default).
    """
    x = logits.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(target, jnp.float32), x.shape)
    return jnp.mean(jnp.square(x - t))


def gan_loss(mode: str):
    """Return the adversarial criterion for --gan 'Vanilla' | 'LS'."""
    if mode == "Vanilla":
        return bce_with_logits
    if mode == "LS":
        return ls_gan_mse
    raise NotImplementedError(f"gan mode {mode!r} is not implemented")
