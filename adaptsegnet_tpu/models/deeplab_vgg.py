"""VGG-16 DeepLab-v2 segmenter.

Spec (reference model/deeplab_vgg.py:24-54): torchvision VGG-16 `features`
with pool4 (idx 23) and pool5 (idx 30) removed, the three conv5 convs
dilated x2 (padding 2), then dilated fc6/fc7 (1024 ch, k3, dilation 4,
padding 4) with ReLU, and an ASPP classifier head on 1024 channels. Only
three 2x2 pools remain -> output stride 8. Returns raw stride-8 logits
(upsampling external, reference evaluate_cityscapes.py:153,166).

The reference constructor is Python-2 only (`range(23)+range(24,30)` at
model/deeplab_vgg.py:34 breaks under py3) and its ASPP forward carries the
early-return bug (:19-21); we default aspp_sum='first2' for released-
checkpoint (GTA2Cityscapes_vgg) parity, with 'all' available.

VGG conv layout (torchvision `features` indices of the conv layers kept):
  stage1: 0, 2       (64)    pool
  stage2: 5, 7       (128)   pool
  stage3: 10, 12, 14 (256)   pool
  stage4: 17, 19, 21 (512)
  stage5: 24, 26, 28 (512, dilation 2 after surgery)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from adaptsegnet_tpu.models.layers import Conv2d, max_pool_2x2_s2
from adaptsegnet_tpu.models.deeplab_resnet import ClassifierModule

Dtype = Any

# (name, out_channels, dilation) per conv; None marks a 2x2 maxpool.
_VGG_PLAN = [
    ("conv1_1", 64, 1), ("conv1_2", 64, 1), None,
    ("conv2_1", 128, 1), ("conv2_2", 128, 1), None,
    ("conv3_1", 256, 1), ("conv3_2", 256, 1), ("conv3_3", 256, 1), None,
    ("conv4_1", 512, 1), ("conv4_2", 512, 1), ("conv4_3", 512, 1),
    # pool4 removed
    ("conv5_1", 512, 2), ("conv5_2", 512, 2), ("conv5_3", 512, 2),
    # pool5 removed
]


class DeeplabVGG(nn.Module):
    num_classes: int = 19
    aspp_sum: str = "first2"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        """return_features=True stops after fc7+ReLU (the reference's
        `self.features` output, model/deeplab_vgg.py:44) — used by parity
        tests to drive the reference's own classifier head."""
        for item in _VGG_PLAN:
            if item is None:
                x = max_pool_2x2_s2(x)
                continue
            name, cout, dil = item
            x = Conv2d(
                cout, 3, padding=dil, dilation=dil, use_bias=True,
                dtype=self.dtype, name=name,
            )(x)
            x = nn.relu(x)
        # Dilated fc6/fc7 (reference model/deeplab_vgg.py:40-43).
        x = Conv2d(1024, 3, padding=4, dilation=4, use_bias=True,
                   dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        x = Conv2d(1024, 3, padding=4, dilation=4, use_bias=True,
                   dtype=self.dtype, name="fc7")(x)
        x = nn.relu(x)
        if return_features:
            return x
        return ClassifierModule(
            self.num_classes, aspp_sum=self.aspp_sum, dtype=self.dtype,
            name="classifier",
        )(x)
