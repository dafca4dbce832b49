"""Dilated ResNet-101 DeepLab-v2 segmenters (multi-level and single-head).

Behavioral spec (reference file:line):
  * Bottleneck with stride on the 1x1 reduce conv and dilation on the 3x3
    (model/deeplab_multi.py:59-103); all backbone BN frozen (:66-78).
  * ResNetMulti: conv1 7x7/2 -> BN -> ReLU -> maxpool 3x3/2 (floor) ->
    layer1(3) -> layer2(4, /2) -> layer3(23, d2) -> layer4(3, d4); ASPP head
    layer5 on the 1024-ch layer3 output and layer6 on the 2048-ch layer4
    output (model/deeplab_multi.py:124-152, 174-194). Output stride 8.
  * ASPP Classifier_Module: sum of four 3x3 convs with dilation = padding =
    {6, 12, 18, 24} (model/deeplab_multi.py:106-121).
  * Single-head 'Oracle' ResNet: same backbone with ceil-mode maxpool and one
    ASPP head on layer4 (model/deeplab.py:120-177). The reference's
    Classifier_Module there early-returns after summing only the first two
    branches (model/deeplab.py:113-116) — kept as an option (`aspp_sum =
    'first2'`) because the released oracle checkpoint was trained/evaluated
    with that behavior; 'all' gives the intended 4-branch sum.

TPU-native deviations from the reference:
  * forward returns RAW stride-8 logits; bilinear align-corners upsampling to
    the input (train) or 2048x1024 (eval) size lives outside the module
    (ops.resize.upsample_logits), matching upstream semantics and fixing the
    fork's forward-arity crash (SURVEY.md §3.3).
  * NHWC activations, HWIO kernels, optional bf16 compute.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from adaptsegnet_tpu.models.layers import (
    conv_bn_folded,
    max_pool_3x3_s2,
    normal_conv_init,
)

Dtype = Any


class Bottleneck(nn.Module):
    """1x1(stride)/3x3(dilated)/1x1(x4) residual block, frozen BN.

    Conv+BN pairs use the BN-folded lowering (layers.conv_bn_folded): the
    frozen normalization is applied to the weights instead of the
    activations — same math, one fewer activation-bandwidth pass per conv.
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x):
        def convbn(y, features, k, tag, stride=1, dilation=1):
            conv_name = f"conv{tag}" if tag.isdigit() else f"{tag}_conv"
            bn_name = f"bn{tag}" if tag.isdigit() else f"{tag}_bn"
            return conv_bn_folded(
                self, y, features, k, conv_name, bn_name, stride=stride,
                padding=dilation if k == 3 else 0, dilation=dilation,
                dtype=self.dtype, bn_mode=self.bn_mode,
            )

        residual = x
        out = convbn(x, self.planes, 1, "1", stride=self.stride)
        out = nn.relu(out)
        out = convbn(out, self.planes, 3, "2", dilation=self.dilation)
        out = nn.relu(out)
        out = convbn(out, self.planes * 4, 1, "3")
        if self.has_downsample:
            residual = convbn(
                x, self.planes * 4, 1, "downsample", stride=self.stride
            )
        return nn.relu(out + residual)


class _ASPPBranchParams(nn.Module):
    """Param-only holder keeping the branch{i}/conv/{kernel,bias} layout
    (checkpoint-compatible with the Conv2d-based lowering)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        class _Conv(nn.Module):
            cin: int
            cout: int

            @nn.compact
            def __call__(self):
                k = self.param(
                    "kernel", normal_conv_init(0.01), (3, 3, self.cin, self.cout)
                )
                b = self.param("bias", nn.initializers.zeros_init(), (self.cout,))
                return k, b

        return _Conv(self.cin, self.cout, name="conv")()


class ClassifierModule(nn.Module):
    """ASPP head: sum of parallel dilated 3x3 convs to `num_classes` maps.

    `aspp_sum='all'` sums every branch (the intended semantics, used by
    DeeplabMulti); 'first2' reproduces the reference early-return bug of the
    single-head/VGG variants (sums branches 0 and 1 only) for released-
    checkpoint parity.

    Lowering: with `use_matmul=True` (default) the whole head is ONE
    (C, n*9*num_classes) matmul + 36 static shift-adds (ops/aspp.py) —
    ~6x better MXU lane utilization than four 19-channel convolutions.
    `use_matmul=False` keeps the per-branch dilated-conv lowering (used in
    tests to pin equivalence).
    """

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    aspp_sum: str = "all"
    use_matmul: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from adaptsegnet_tpu.ops.aspp import aspp_matmul

        n_branches = (
            len(self.dilations) if self.aspp_sum == "all"
            else min(2, len(self.dilations))
        )
        cin = x.shape[-1]
        kernels, biases = [], []
        for i in range(len(self.dilations)):
            k, b = _ASPPBranchParams(cin, self.num_classes, name=f"branch{i}")()
            kernels.append(k)
            biases.append(b)

        x = x.astype(self.dtype)
        if self.use_matmul:
            # n_sum positional: custom_vjp nondiff args must be positional.
            return aspp_matmul(
                x, kernels, biases, self.dilations, n_branches
            )
        out = None
        for k, b, d in list(zip(kernels, biases, self.dilations))[:n_branches]:
            y = jax.lax.conv_general_dilated(
                x, k.astype(self.dtype),
                window_strides=(1, 1),
                padding=((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(self.dtype)
            out = y if out is None else out + y
        return out


class ResNetBackbone(nn.Module):
    """conv1..layer4 of the dilated ResNet-101 (output stride 8)."""

    layers: Sequence[int] = (3, 4, 23, 3)
    ceil_mode_pool: bool = False
    dtype: Dtype = jnp.float32
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x):
        x = conv_bn_folded(
            self, x, 64, 7, "conv1", "bn1", stride=2, padding=3,
            dtype=self.dtype, bn_mode=self.bn_mode,
        )
        x = nn.relu(x)
        x = max_pool_3x3_s2(x, ceil_mode=self.ceil_mode_pool)

        specs = [  # (planes, stride, dilation)
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        feats = {}
        for li, ((planes, stride, dilation), blocks) in enumerate(
            zip(specs, self.layers), start=1
        ):
            for bi in range(blocks):
                # First block of each layer carries the projection shortcut
                # (stride/channel change, and the reference also adds one for
                # dilated layers: model/deeplab_multi.py:154-162).
                x = Bottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    has_downsample=(bi == 0),
                    dtype=self.dtype,
                    bn_mode=self.bn_mode,
                    name=f"layer{li}_block{bi}",
                )(x)
            feats[f"layer{li}"] = x
        return feats


class DeeplabMulti(nn.Module):
    """Multi-level DeepLab-v2: ASPP heads on layer3 (aux) and layer4 (main).

    Returns (pred1, pred2) raw stride-8 logit maps, NHWC. pred2 (from
    layer4) is the primary output; pred1 feeds the lambda-seg-weighted aux
    loss and D1 in multi-level training (reference
    train_gta2cityscapes_multi.py:599-626).
    """

    num_classes: int = 19
    dtype: Dtype = jnp.float32
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x):
        feats = ResNetBackbone(
            dtype=self.dtype, bn_mode=self.bn_mode, name="backbone"
        )(x)
        pred1 = ClassifierModule(
            self.num_classes, dtype=self.dtype, name="layer5"
        )(feats["layer3"])
        pred2 = ClassifierModule(
            self.num_classes, dtype=self.dtype, name="layer6"
        )(feats["layer4"])
        return pred1, pred2


class DeeplabSingle(nn.Module):
    """Single-head 'Oracle' ResNet DeepLab (reference model/deeplab.py).

    Returns raw stride-8 logits. Uses ceil-mode pooling like the reference
    (model/deeplab.py:130) — so at 512x1024 input the logit map is 65x129,
    one pixel larger than DeeplabMulti's. aspp_sum defaults to 'first2' for
    parity with the released cityscapes_oracle checkpoint (trained with the
    reference's early-return ASPP); pass 'all' for the intended head.
    """

    num_classes: int = 19
    aspp_sum: str = "first2"
    dtype: Dtype = jnp.float32
    bn_mode: str = "frozen"

    @nn.compact
    def __call__(self, x):
        feats = ResNetBackbone(
            ceil_mode_pool=True, dtype=self.dtype, bn_mode=self.bn_mode,
            name="backbone",
        )(x)
        return ClassifierModule(
            self.num_classes, aspp_sum=self.aspp_sum, dtype=self.dtype,
            name="layer5",
        )(feats["layer4"])
