"""Functional torch oracle for golden-value model tests.

Re-executes our flax models' computation with torch.nn.functional primitives,
consuming the *flax* parameter tree directly. This cross-checks the semantic
details that gate checkpoint parity — conv stride/padding/dilation placement,
BN formula, pooling modes, LeakyReLU slope, ASPP summation — against an
independent numeric implementation. (Wiring/topology is additionally pinned
by the parameter-shape tests.)
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x))


def conv(params, x, stride=1, padding=0, dilation=1):
    """Apply a flax Conv2d param dict {conv: {kernel[, bias]}} on NCHW x."""
    p = params["conv"]
    w = _t(p["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = _t(p["bias"]) if "bias" in p else None
    return F.conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation)


def bn(params, stats, x):
    """Inference-mode batch norm from flax params/batch_stats dicts."""
    p, s = params["bn"], stats["bn"]
    return F.batch_norm(
        x, _t(s["mean"]), _t(s["var"]), _t(p["scale"]), _t(p["bias"]),
        training=False, eps=1e-5,
    )


def bottleneck(params, stats, x, stride, dilation, has_downsample):
    out = conv(params["conv1"], x, stride=stride)
    out = F.relu(bn(params["bn1"], stats["bn1"], out))
    out = conv(params["conv2"], out, padding=dilation, dilation=dilation)
    out = F.relu(bn(params["bn2"], stats["bn2"], out))
    out = conv(params["conv3"], out)
    out = bn(params["bn3"], stats["bn3"], out)
    residual = x
    if has_downsample:
        residual = conv(params["downsample_conv"], x, stride=stride)
        residual = bn(params["downsample_bn"], stats["downsample_bn"], residual)
    return F.relu(out + residual)


def resnet_backbone(params, stats, x, layers=(3, 4, 23, 3), ceil_mode=False):
    x = conv(params["conv1"], x, stride=2, padding=3)
    x = F.relu(bn(params["bn1"], stats["bn1"], x))
    x = F.max_pool2d(x, 3, stride=2, padding=1, ceil_mode=ceil_mode)
    specs = [(1, 1), (2, 1), (1, 2), (1, 4)]  # (stride, dilation)
    feats = {}
    for li, ((stride, dilation), blocks) in enumerate(zip(specs, layers), 1):
        for bi in range(blocks):
            name = f"layer{li}_block{bi}"
            x = bottleneck(
                params[name], stats[name], x,
                stride=stride if bi == 0 else 1,
                dilation=dilation, has_downsample=(bi == 0),
            )
        feats[f"layer{li}"] = x
    return feats


def aspp(params, x, dilations=(6, 12, 18, 24), n_sum=4):
    outs = [
        conv(params[f"branch{i}"], x, padding=d, dilation=d)
        for i, d in enumerate(dilations)
    ]
    out = outs[0]
    for o in outs[1:n_sum]:
        out = out + o
    return out


def deeplab_multi(variables, x_nhwc: np.ndarray):
    params, stats = variables["params"], variables["batch_stats"]
    x = _t(np.transpose(x_nhwc, (0, 3, 1, 2)))
    feats = resnet_backbone(params["backbone"], stats["backbone"], x)
    p1 = aspp(params["layer5"], feats["layer3"])
    p2 = aspp(params["layer6"], feats["layer4"])
    to_nhwc = lambda t: np.transpose(t.detach().numpy(), (0, 2, 3, 1))
    return to_nhwc(p1), to_nhwc(p2)


def deeplab_single(variables, x_nhwc: np.ndarray, n_sum=2):
    params, stats = variables["params"], variables["batch_stats"]
    x = _t(np.transpose(x_nhwc, (0, 3, 1, 2)))
    feats = resnet_backbone(
        params["backbone"], stats["backbone"], x, ceil_mode=True
    )
    out = aspp(params["layer5"], feats["layer4"], n_sum=n_sum)
    return np.transpose(out.detach().numpy(), (0, 2, 3, 1))


def fc_discriminator(variables, x_nhwc: np.ndarray):
    params = variables["params"]
    x = _t(np.transpose(x_nhwc, (0, 3, 1, 2)))
    for name in ["conv1", "conv2", "conv3", "conv4", "classifier"]:
        x = conv(params[name], x, stride=2, padding=1)
        if name != "classifier":
            x = F.leaky_relu(x, 0.2)
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def deeplab_vgg(variables, x_nhwc: np.ndarray, n_sum=2):
    from adaptsegnet_tpu.models.deeplab_vgg import _VGG_PLAN

    params = variables["params"]
    x = _t(np.transpose(x_nhwc, (0, 3, 1, 2)))
    for item in _VGG_PLAN:
        if item is None:
            x = F.max_pool2d(x, 2, stride=2)
            continue
        name, _, dil = item
        x = F.relu(conv(params[name], x, padding=dil, dilation=dil))
    x = F.relu(conv(params["fc6"], x, padding=4, dilation=4))
    x = F.relu(conv(params["fc7"], x, padding=4, dilation=4))
    out = aspp(params["classifier"], x, n_sum=n_sum)
    return np.transpose(out.detach().numpy(), (0, 2, 3, 1))


def warper(variables, x_nhwc: np.ndarray, num_layers=8):
    """Inference-mode (running-stats) functional Warper."""
    params, stats = variables["params"], variables["batch_stats"]
    enc_p, enc_s = params["encoder_d"], stats["encoder_d"]
    dec_p, dec_s = params["decoder_d"], stats["decoder_d"]
    x = _t(np.transpose(x_nhwc, (0, 3, 1, 2)))

    widths = [64, 128, 256, 512] + [512] * (num_layers - 5)
    skips = []
    out = x
    for i in range(len(widths)):
        if i > 0:
            out = F.leaky_relu(out, 0.2)
        out = conv(enc_p[f"down{i}"], out, stride=2, padding=1)
        if i > 0:
            out = bn(enc_p[f"down{i}_bn"], enc_s[f"down{i}_bn"], out)
        skips.append(out)
    skips.reverse()
    latent = conv(enc_p["out"], F.leaky_relu(out, 0.2), stride=2, padding=1)

    def up(p, s, x, has_bn=True):
        x = F.relu(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=False)
        x = conv(p[0], x, padding=1)
        if has_bn:
            x = bn(p[1], s, x)
        return x

    dn = num_layers - 1
    plan = [512] * (dn - 4 + 1) + [256, 128, 64]
    out = latent
    for i in range(len(plan)):
        if i != 0:
            out = torch.cat([skips[i - 1], out], dim=1)
        out = up((dec_p[f"up{i}_conv"], dec_p[f"up{i}_bn"]),
                 dec_s[f"up{i}_bn"], out)
    flow = up((dec_p["output_conv"], None), None, out, has_bn=False)
    return np.transpose(flow.detach().numpy(), (0, 2, 3, 1))
