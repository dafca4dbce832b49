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


class _Conv4x4Params(nn.Module):
    """Param-only holder with Conv2d's <name>/conv/{kernel,bias} layout."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        class _P(nn.Module):
            cin: int
            cout: int

            @nn.compact
            def __call__(self):
                k = self.param(
                    "kernel", torch_default_kernel_init,
                    (4, 4, self.cin, self.cout),
                )
                b = self.param(
                    "bias", torch_default_bias_init(4 * 4 * self.cin),
                    (self.cout,),
                )
                return k, b

        return _P(self.cin, self.cout, name="conv")()


class FCDiscriminator(nn.Module):
    """Input is the (N, H, W, C) softmax map, the 4-tuple of stride-2
    parity phases from ops.resize.upsample_softmax_s2d, or the 1-tuple of
    their single channel-concat tensor (blocked=True) — the producer
    layouts that let conv1 run shuffle-free (ops.conv4x4.conv4x4_s2d_phases
    / conv4x4_s2d_blocked). Same params, same math, same checkpoint layout
    every way."""

    num_classes: int = 19
    ndf: int = 64
    dtype: Dtype = jnp.float32

    # Advertises the tuple input contract to train/steps.py (test stand-in
    # discriminators without this attribute get the dense softmax map).
    supports_s2d_phases = True

    @nn.compact
    def __call__(self, x):
        widths = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8, 1]
        cin = self.num_classes
        start = 0
        if isinstance(x, (tuple, list)):
            from adaptsegnet_tpu.ops.conv4x4 import (
                conv4x4_s2d_blocked,
                conv4x4_s2d_phases,
            )
            from adaptsegnet_tpu.ops.pallas import conv4x4_patch
            from adaptsegnet_tpu.ops.resize import PlanarPhases

            k, b = _Conv4x4Params(cin, self.ndf, name="conv1")()
            k = jnp.asarray(k, self.dtype)
            b = jnp.asarray(b, self.dtype)
            if isinstance(x, PlanarPhases):
                phases = tuple(p.astype(self.dtype) for p in x)
                if conv4x4_patch.supported(phases[0].shape, self.ndf,
                                           self.dtype):
                    x = conv4x4_patch.conv4x4_s2_phases_planar(phases, k, b)
                else:
                    # CPU / f32 / odd-shape fallback: transpose to the
                    # c-minor phase lowering (same math; keeps the parity
                    # suite exercising this dispatch without a TPU).
                    x = conv4x4_s2d_phases(
                        tuple(jnp.transpose(p, (0, 2, 3, 1))
                              for p in phases), k, b,
                    )
            elif len(x) == 1:  # blocked single-tensor form (4C / aligned 4A)
                x = conv4x4_s2d_blocked(x[0].astype(self.dtype), k, b)
            else:
                x = conv4x4_s2d_phases(
                    tuple(p.astype(self.dtype) for p in x), k, b
                )
            x = leaky_relu(x, 0.2)
            cin, start = self.ndf, 1
        for i, cout in list(enumerate(widths))[start:]:
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
