"""Custom conv-layer zoo (reference model/custom_layers.py, component C7).

The fork's building-block library for the Warper and its experimental
variants. The U-Net encode/decode stages live in models/warper.py; this
module provides the remaining blocks so the full zoo is available:

  * SpectralConv2d / SpectralConvTranspose2d — spectral-norm-constrained
    conv / 4x4-stride-2 transposed conv (custom_layers.py:4-22). Spectral
    norm uses one power-iteration step per call with a persistent u vector
    (torch parity), stored in the 'spectral' collection (mutable during
    training). For the transpose, torch's spectral_norm normalizes over
    dim=1 (out_channels) — matched here.
  * OneOneConvolution — 1x1 conv wrapper (custom_layers.py:52-64). The
    reference constructs a second ReLU+1x1 'one_one' branch that its
    forward never uses; the params are created here too so exported state
    dicts carry the same surface.
  * Connection — the per-skip 1x1 projection list (warper.py:15-33). The
    reference's forward would IndexError (loops num_layers entries over a
    num_layers-3 list); this version applies each existing projection to
    warp_list[i+1] and appends warp_list[-1], the evident intent.
  * InstanceNorm2d — the 'Instance' norm_layer option
    (custom_layers via SkipConnectionDecode, warper.py:104-106).
  * PReLU — channelwise parametric ReLU (torch default init 0.25).
  * pixel_shuffle + AdvancedDecoderOutput — the pixel-shuffle decoder head
    (custom_layers.py:191-230): 3x3 conv to 64ch + PReLU, a residual block,
    then conv to 256 -> PixelShuffle(2) -> PReLU -> 9x9 conv.
  * DownDiscriminatorBlock / KeepDiscriminatorBlock — 4x4 conv (stride 2 /
    stride 1) + norm + LeakyReLU stages (custom_layers.py:238-267).

These mirror capability surface; the reference never *calls* several of
them (SURVEY.md C7 'unused'), but they are part of the public zoo.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from adaptsegnet_tpu.models.layers import (
    Conv2d,
    leaky_relu,
    torch_default_kernel_init,
    xavier_normal_init,
)

Dtype = Any


def pixel_shuffle(x: jnp.ndarray, upscale: int) -> jnp.ndarray:
    """torch nn.PixelShuffle on NHWC: (N,H,W,C*r^2) -> (N,rH,rW,C).

    Channel unpacking order matches torch's NCHW semantics (c, r, r).
    """
    n, h, w, c = x.shape
    r = upscale
    cout = c // (r * r)
    x = x.reshape(n, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, cout
    return x.reshape(n, h * r, w * r, cout)


class PReLU(nn.Module):
    """Channelwise parametric ReLU, torch default init (0.25, shared)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,))
        return jnp.where(x >= 0, x, x * a.astype(x.dtype))


class InstanceNorm2d(nn.Module):
    """torch InstanceNorm2d(affine=False, track_running_stats=False):
    per-(sample, channel) normalization over H, W."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class SpectralConv2d(nn.Module):
    """Conv2d wrapped in spectral normalization (torch
    nn.utils.spectral_norm parity: one power iteration per training call on
    the (cout, fan_in) weight matrix; u persisted in the 'spectral'
    collection, eps 1e-12)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    kernel_init: Callable = xavier_normal_init(0.02)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,)) if self.use_bias else None)
        # torch views the OIHW weight as (cout, fan_in).
        w = kernel.astype(jnp.float32).transpose(3, 0, 1, 2).reshape(
            self.features, -1)
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (self.features,), jnp.float32),
        )
        u = u_var.value
        eps = 1e-12
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u_new = w @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + eps)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        sigma = jnp.dot(u_new, w @ v)
        w_sn = (kernel.astype(jnp.float32) / sigma).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_sn,
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class SpectralConvTranspose2d(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1) wrapped in spectral normalization
    (reference SpectralTranspose, custom_layers.py:14-22).

    torch's spectral_norm uses dim=1 for ConvTranspose modules, i.e. the
    weight is viewed as (cout, cin*kh*kw) with u of length cout — matched.
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable = xavier_normal_init(0.02)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        from adaptsegnet_tpu.ops.conv_transpose4x4 import (
            conv_transpose4x4_stride2,
        )

        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (4, 4, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,)) if self.use_bias else None)
        # HWIO -> (cout, cin, kh, kw) -> (cout, fan); torch views the
        # (cin, cout, kh, kw) weight permuted to put cout first (dim=1).
        w = kernel.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(
            self.features, -1)
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (self.features,), jnp.float32),
        )
        u = u_var.value
        eps = 1e-12
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u_new = w @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + eps)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        sigma = jnp.dot(u_new, w @ v)
        w_sn = (kernel.astype(jnp.float32) / sigma).astype(self.dtype)
        return conv_transpose4x4_stride2(
            x.astype(self.dtype), w_sn,
            None if bias is None else bias.astype(self.dtype),
        )


class OneOneConvolution(nn.Module):
    """1x1 conv (reference custom_layers.py:52-64). forward = the 'input'
    conv only; the 'one_one' ReLU+1x1 branch exists as params but is never
    applied (reference parity — its Sequential is constructed and unused)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        # Unused-branch params, kept for state-dict surface parity.
        self.param("one_one_kernel", torch_default_kernel_init,
                   (1, 1, cin, self.features))
        if self.use_bias:
            self.param("one_one_bias", nn.initializers.zeros_init(),
                       (self.features,))
        return Conv2d(self.features, 1, use_bias=self.use_bias,
                      kernel_init=torch_default_kernel_init,
                      dtype=self.dtype, name="input")(x)


class Connection(nn.Module):
    """Per-skip 1x1 projections (reference warper.py:15-33): num_layers-3
    OneOneConvolution(512 -> warp_channels) modules. The reference forward
    indexes past the list (would IndexError); here each existing projection
    i maps warp_list[i+1], then warp_list[-1] passes through — the evident
    intent of the loop."""

    num_layers: int = 6
    warp_channels: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, warp_list):
        out_ch = self.warp_channels if self.warp_channels else 2 * 512
        container = []
        for i in range(self.num_layers - 3):
            proj = OneOneConvolution(out_ch, use_bias=True, dtype=self.dtype,
                                     name=f"one_one_{i}")
            container.append(proj(warp_list[i + 1]))
        container.append(warp_list[-1])
        return container


class AdvancedDecoderOutput(nn.Module):
    """Pixel-shuffle decoder head (custom_layers.py:191-230): in -> 64ch
    conv+norm + PReLU, one residual conv block, conv to 256 ->
    PixelShuffle(2) -> PReLU -> 9x9 conv to out_ch."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from adaptsegnet_tpu.models.warper import _WarperBN

        conv = lambda cout, k, pad, name, bias=False: Conv2d(
            cout, k, padding=pad, use_bias=bias,
            kernel_init=xavier_normal_init(0.02), dtype=self.dtype, name=name,
        )
        h = nn.relu(x)
        h = conv(64, 3, 1, "input_conv")(h)
        h = _WarperBN(dtype=self.dtype, name="input_bn")(h, train)
        h = PReLU(name="input_prelu")(h)
        identity = h
        r = conv(64, 3, 1, "res_conv1")(h)
        r = _WarperBN(dtype=self.dtype, name="res_bn1")(r, train)
        r = PReLU(name="res_prelu")(r)
        r = conv(64, 3, 1, "res_conv2")(r)
        r = _WarperBN(dtype=self.dtype, name="res_bn2")(r, train)
        h = identity + r
        h = conv(256, 3, 1, "shuffle_conv")(h)
        h = pixel_shuffle(h, 2)
        h = PReLU(name="shuffle_prelu")(h)
        return conv(self.out_ch, 9, 4, "output_conv", bias=True)(h)


class DownDiscriminatorBlock(nn.Module):
    """4x4/stride-2 conv + norm + LeakyReLU(0.2) (custom_layers.py:238-251)."""

    features: int
    norm: str = "Batch"  # Batch | Spectral
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from adaptsegnet_tpu.models.warper import _WarperBN

        if self.norm == "Spectral":
            x = SpectralConv2d(self.features, 4, stride=2, padding=1,
                               use_bias=True, dtype=self.dtype,
                               name="conv")(x, update_stats=train)
        else:
            x = Conv2d(self.features, 4, stride=2, padding=1, use_bias=False,
                       kernel_init=xavier_normal_init(0.02),
                       dtype=self.dtype, name="conv")(x)
            x = _WarperBN(dtype=self.dtype, name="bn")(x, train)
        return leaky_relu(x, 0.2)


class KeepDiscriminatorBlock(nn.Module):
    """4x4/stride-1 conv + norm + LeakyReLU(0.2) (custom_layers.py:254-267).

    Note the reference keeps padding=1 with k=4/s=1, so the spatial size
    shrinks by 1 — preserved."""

    features: int
    norm: str = "Batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from adaptsegnet_tpu.models.warper import _WarperBN

        if self.norm == "Spectral":
            x = SpectralConv2d(self.features, 4, stride=1, padding=1,
                               use_bias=True, dtype=self.dtype,
                               name="conv")(x, update_stats=train)
        else:
            x = Conv2d(self.features, 4, stride=1, padding=1, use_bias=False,
                       kernel_init=xavier_normal_init(0.02),
                       dtype=self.dtype, name="conv")(x)
            x = _WarperBN(dtype=self.dtype, name="bn")(x, train)
        return leaky_relu(x, 0.2)
