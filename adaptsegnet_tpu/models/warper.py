"""Flow-field Warper: U-Net encoder/decoder predicting a 2-channel flow.

Fork-added module (reference model/warper.py, model/custom_layers.py). With
the shipped defaults — Warper(norm='Batch', warp_channels=2, num_layers=8,
transpose=False) — the architecture is:

  Encoder (SkipConnectionEncode, model/warper.py:36-64): seven 4x4/stride-2
  convs (3->64, then LeakyReLU(0.2)+conv+BN pairs 64->128->256->512 and
  3x 512->512), skips collected after every conv (reversed), then
  EncoderOutput LeakyReLU+4x4/2 conv 512->512. Total downsample x256 for the
  skips, x512 for the latent (512x1024 input -> 1x2 latent).

  Decoder (SkipConnectionDecode with num_layers = 8-1 = 7,
  model/warper.py:98-144): eight up stages, each ReLU -> bilinear x2
  (align_corners=False; transpose=False path of custom_layers.py:129,154) ->
  3x3 conv -> BN (except the biased, BN-free output conv). U-Net concat of
  skip[i-1] BEFORE stage i for i >= 1. Channel plan: 512 -> [cat 1024] 512
  -> [cat] 512 -> [cat] 512 -> [cat] 256 -> [cat 512] 128 -> [cat 256] 64 ->
  output conv -> 2. The flow comes out at full input resolution.

  The `Connection` module exists in the reference but its forward is never
  called (and would IndexError, model/warper.py:27-33); not rebuilt.

BN here is LIVE (affine + running stats updated, custom_layers.py BatchNorm
with track_running_stats=True) unlike the frozen backbone BN — pass
`train=True` during training and collect 'batch_stats' mutations.

Init: xavier-normal gain 0.02 for convs, BN weight ~ N(1, 0.02)
(model/warper.py:147-178 'xavier' path).

Input-size constraint: H and W must be multiples of 256 and H x W >= 512x512
(the latent must be >= 1x1), satisfied by the 512x1024 training resolution.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from adaptsegnet_tpu.models.layers import (
    Conv2d,
    ConvTranspose2d,
    leaky_relu,
    xavier_normal_init,
)
from adaptsegnet_tpu.ops.planar_out_conv import conv3x3_planar_out
from adaptsegnet_tpu.ops.resize import resize_bilinear_half_pixel

Dtype = Any

_XAVIER = xavier_normal_init(0.02)


class _ParamOnlyConv(nn.Module):
    """Params of a 3x3 Conv2d (path <name>/conv/{kernel,bias}) without the
    NHWC conv computation — the planar flow-head lowering consumes them."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        class _K(nn.Module):
            cin: int
            cout: int

            @nn.compact
            def __call__(self):
                k = self.param("kernel", _XAVIER,
                               (3, 3, self.cin, self.cout))
                b = self.param("bias", nn.initializers.zeros_init(),
                               (self.cout,))
                return k, b

        return _K(self.cin, self.cout, name="conv")()


def _bn_scale_init(key, shape, dtype=jnp.float32):
    """BN weight ~ N(1.0, 0.02): reference init_weights BatchNorm branch."""
    import jax

    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


class _WarperBN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            scale_init=_bn_scale_init,
            name="bn",
        )(x)


def _make_norm(norm: str, dtype, name: str):
    """norm_layer selection (reference warper.py:40-42, 104-112):
    'Batch' (bias-free convs + BN), 'Instance' (biased convs + InstanceNorm),
    'Spectral' (handled at the conv itself, no separate norm)."""
    if norm == "Batch":
        bn = _WarperBN(dtype=dtype, name=name)
        return lambda x, train: bn(x, train)
    if norm == "Instance":
        from adaptsegnet_tpu.models.custom_blocks import InstanceNorm2d

        inorm = InstanceNorm2d(name=name)
        return lambda x, train: inorm(x)
    if norm == "Spectral":
        return lambda x, train: x
    raise NotImplementedError(f"norm {norm!r}")


class WarperEncoder(nn.Module):
    """SkipConnectionEncode: returns (latent, skips) — skips reversed."""

    num_layers: int = 8
    out_channel: int = 512
    norm: str = "Batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_bias = self.norm != "Batch"

        def conv(cout, name):
            if self.norm == "Spectral":
                from adaptsegnet_tpu.models.custom_blocks import SpectralConv2d

                sc = SpectralConv2d(cout, 4, stride=2, padding=1,
                                    use_bias=True, dtype=self.dtype, name=name)
                return lambda y: sc(y, update_stats=train)
            return Conv2d(cout, 4, stride=2, padding=1, use_bias=use_bias,
                          kernel_init=_XAVIER, dtype=self.dtype, name=name)

        widths = [64, 128, 256, 512] + [512] * (self.num_layers - 5)
        skips = []
        out = x
        for i, cout in enumerate(widths):
            if i > 0:
                out = leaky_relu(out, 0.2)
            out = conv(cout, f"down{i}")(out)
            if i > 0 and self.norm != "Spectral":
                out = _make_norm(self.norm, self.dtype, f"down{i}_bn")(out, train)
            skips.append(out)
        skips.reverse()
        out = leaky_relu(out, 0.2)
        out = conv(self.out_channel, "out")(out)
        return out, skips


class WarperDecoder(nn.Module):
    """SkipConnectionDecode: up stages + skips.

    transpose=False (shipped default): ReLU -> bilinear x2 -> 3x3 conv -> BN.
    transpose=True: ReLU -> ConvTranspose2d(4, s2, p1) -> BN (reference
    custom_layers.py:122-127,147-152,176-179).
    use_dropout applies Dropout(0.5) after each UpConvolution stage (not the
    DecoderInput or the output stage, custom_layers.py:144-168).
    """

    num_layers: int = 7  # driving_num_layers = warper num_layers - 1
    out_channel: int = 2
    norm: str = "Batch"
    transpose: bool = False
    use_dropout: bool = False
    planar_flow: bool = False  # emit flow as (N, 2, H, W) channel planes
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, latent, skips, train: bool = True):
        def up_stage(x, cout, name, use_bn=True, use_bias=False):
            x = nn.relu(x)
            biased = use_bias or (use_bn and self.norm == "Instance")
            if self.transpose:
                if self.norm == "Spectral" and use_bn:
                    from adaptsegnet_tpu.models.custom_blocks import (
                        SpectralConvTranspose2d,
                    )

                    return SpectralConvTranspose2d(
                        cout, use_bias=True, dtype=self.dtype,
                        name=f"{name}_conv",
                    )(x, update_stats=train)
                x = ConvTranspose2d(
                    cout, use_bias=biased, kernel_init=_XAVIER,
                    dtype=self.dtype, name=f"{name}_conv",
                )(x)
            else:
                n, h, w, c = x.shape
                # bf16 compute takes the fast in-dtype resize path.
                x = resize_bilinear_half_pixel(
                    x, (h * 2, w * 2), exact=self.dtype == jnp.float32
                )
                if self.norm == "Spectral" and use_bn:
                    from adaptsegnet_tpu.models.custom_blocks import (
                        SpectralConv2d,
                    )

                    return SpectralConv2d(
                        cout, 3, stride=1, padding=1, use_bias=True,
                        dtype=self.dtype, name=f"{name}_conv",
                    )(x, update_stats=train)
                x = Conv2d(
                    cout, 3, padding=1, use_bias=biased,
                    kernel_init=_XAVIER, dtype=self.dtype,
                    name=f"{name}_conv",
                )(x)
            if use_bn:
                x = _make_norm(self.norm, self.dtype, f"{name}_bn")(x, train)
            return x

        plan = (
            [512] * (self.num_layers - 4 + 1)  # DecoderInput + Up(1024,512) x3
            + [256, 128, 64]
        )
        out = latent
        warp_list = [out]
        for i, cout in enumerate(plan):
            if i != 0:
                out = jnp.concatenate([skips[i - 1], out], axis=-1)
            out = up_stage(out, cout, f"up{i}")
            if self.use_dropout and i != 0:
                out = nn.Dropout(rate=0.5, deterministic=not train,
                                 name=f"up{i}_dropout")(out)
            warp_list.append(out)
        if self.planar_flow and not self.transpose and self.norm != "Spectral":
            # Flow-head fast path: same math/params as the generic stage
            # (relu -> bilinear x2 -> 3x3 conv + bias), but the conv emits
            # (N, 2, H, W) channel planes (ops/planar_out_conv.py) — the
            # NHWC 2-channel conv output layout costs its consumers ~10 ms
            # of strided relayout per step at (512, 1024).
            out = nn.relu(out)
            n, h, w, c = out.shape
            out = resize_bilinear_half_pixel(
                out, (h * 2, w * 2), exact=self.dtype == jnp.float32
            )
            k, b = _ParamOnlyConv(c, self.out_channel, name="output_conv")()
            out = conv3x3_planar_out(out, k, b)
        else:
            out = up_stage(out, self.out_channel, "output", use_bn=False,
                           use_bias=True)
            if self.planar_flow:
                out = jnp.transpose(out, (0, 3, 1, 2))
        return out, warp_list


class Warper(nn.Module):
    """forward(pose) -> (flow, warp_list); flow at input resolution.

    flow's x-channel displaces width, y-channel height, consumed by
    ops.sampling.warp_with_flow (tanh + identity grid + clamp + grid_sample).
    Layout: NHW2 by default; `planar_flow=True` emits (N, 2, H, W) channel
    planes instead (same values/params — the TPU-friendly layout for the
    fused warp kernel; see ops/planar_out_conv.py).
    """

    num_layers: int = 8
    norm: str = "Batch"  # Batch | Instance | Spectral (reference warper.py:217)
    transpose: bool = False  # ConvTranspose2d upsampling (warper.py:218)
    use_dropout: bool = False  # Dropout(0.5) after Up stages (warper.py:218)
    planar_flow: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pose, train: bool = True):
        latent, skips = WarperEncoder(
            num_layers=self.num_layers, norm=self.norm, dtype=self.dtype,
            name="encoder_d",
        )(pose, train)
        flow, warp_list = WarperDecoder(
            num_layers=self.num_layers - 1, norm=self.norm,
            transpose=self.transpose, use_dropout=self.use_dropout,
            planar_flow=self.planar_flow, dtype=self.dtype, name="decoder_d",
        )(latent, skips, train)
        return flow, warp_list
