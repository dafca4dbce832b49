"""adaptsegnet_tpu — TPU-native adversarial domain-adaptive semantic segmentation.

A from-scratch JAX/XLA/pjit/Pallas framework with the capabilities of
AdaptSegNet (CVPR'18, "Learning to Adapt Structured Output Space for Semantic
Segmentation"): DeepLab-v2 segmenters (dilated ResNet-101 / VGG-16) with ASPP
heads, fully-convolutional output-space discriminators, single-level and
multi-level adversarial training (GTA5/Synscapes -> Cityscapes), an optional
flow-field Warper, and the evaluate -> colorize -> mIoU pipeline.

Layout conventions (TPU-first, deliberately different from the reference):
  * activations are NHWC (channels on lanes), weights HWIO;
  * the whole train step (G fwd/bwd + D fwd/bwd + both optimizers) is one XLA
    program under jit/pjit with `stop_gradient` standing in for the
    reference's detach/requires_grad choreography;
  * scale-out is a `jax.sharding.Mesh` data-parallel axis (psum over ICI),
    not DataParallel replication.

Reference (behavioral spec only): /root/reference — sahngmin/AdaptSegNet.
"""

__version__ = "0.1.0"
