"""Pallas/Mosaic TPU kernels for ops where XLA's default lowering leaves
performance on the table. Each kernel ships with an XLA-lowering fallback
(used on CPU and in tests via interpret mode)."""

from adaptsegnet_tpu.ops.pallas.upsample_argmax import upsample_argmax

__all__ = ["upsample_argmax"]
