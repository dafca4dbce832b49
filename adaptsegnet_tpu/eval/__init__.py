"""Evaluation: Cityscapes val inference -> PNGs -> mIoU."""

from adaptsegnet_tpu.eval.palette import CITYSCAPES_PALETTE, colorize_mask
from adaptsegnet_tpu.eval.evaluator import Evaluator, make_eval_fn
from adaptsegnet_tpu.eval.compute_iou import compute_mIoU

__all__ = [
    "CITYSCAPES_PALETTE",
    "colorize_mask",
    "Evaluator",
    "make_eval_fn",
    "compute_mIoU",
]
