"""Fully-convolutional output-space discriminator.

Spec (reference model/discriminator.py:5-34): five 4x4/stride-2 convs,
channels C -> 64 -> 128 -> 256 -> 512 -> 1, LeakyReLU(0.2) between; no final
sigmoid (the GAN criterion is applied on raw scores). Input is the channel
softmax of upsampled segmentation logits (train_gta2cityscapes_multi.py:423).
Output is a 1-channel patch score map at 1/32 of its input.

Init matches torch's nn.Conv2d defaults (the reference does not re-init the
discriminator): kaiming-uniform weights, uniform bias.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from adaptsegnet_tpu.models.layers import (
    Conv2d,
    leaky_relu,
    torch_default_bias_init,
    torch_default_kernel_init,
)

Dtype = Any


class FCDiscriminator(nn.Module):
    num_classes: int = 19
    ndf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        widths = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8, 1]
        cin = self.num_classes
        for i, cout in enumerate(widths):
            name = "classifier" if i == len(widths) - 1 else f"conv{i + 1}"
            x = Conv2d(
                cout, 4, stride=2, padding=1, use_bias=True,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(4 * 4 * cin),
                dtype=self.dtype, name=name,
            )(x)
            if i < len(widths) - 1:
                x = leaky_relu(x, 0.2)
            cin = cout
        return x
