"""Numerics substrate: resize, grid sampling, losses, metrics.

These pure functions carry exact PyTorch-parity semantics where that parity
gates bit-matching evaluation of the released reference checkpoints
(align_corners=True bilinear resize, grid_sample, ignore-label cross-entropy).
"""

from adaptsegnet_tpu.ops.resize import (
    resize_bilinear_align_corners,
    upsample_logits,
)
from adaptsegnet_tpu.ops.sampling import grid_sample_bilinear
from adaptsegnet_tpu.ops.losses import (
    cross_entropy_2d,
    cross_entropy_2d_planar,
    gan_loss,
    bce_with_logits,
    ls_gan_mse,
)
from adaptsegnet_tpu.ops.metrics import fast_hist, per_class_iu, mean_iou
from adaptsegnet_tpu.ops.aspp import aspp_matmul
from adaptsegnet_tpu.ops.conv4x4 import conv4x4_stride2
from adaptsegnet_tpu.ops.conv_transpose4x4 import conv_transpose4x4_stride2

__all__ = [
    "resize_bilinear_align_corners",
    "upsample_logits",
    "grid_sample_bilinear",
    "cross_entropy_2d",
    "cross_entropy_2d_planar",
    "gan_loss",
    "bce_with_logits",
    "ls_gan_mse",
    "fast_hist",
    "per_class_iu",
    "mean_iou",
    "aspp_matmul",
    "conv4x4_stride2",
    "conv_transpose4x4_stride2",
]
