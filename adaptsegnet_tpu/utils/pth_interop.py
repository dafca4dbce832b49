"""torch `.pth` <-> flax variable-tree interop.

External contract (SURVEY.md §5.4): the framework can consume the released
reference checkpoints — `GTA2Cityscapes_multi-ed35151c.pth`,
`GTA2Cityscapes_vgg-ac4ac9f6.pth`, `cityscapes_oracle-b7b9934.pth`, the
MS-COCO `DeepLab_resnet_pretrained_init-f81d91e8.pth`, and our own training
snapshots (`GTA5_<iter>.pth`, `GTA5_<iter>_D1/_D2.pth`) — and can export back
to the same key layout.

Weight-layout conversion: torch conv weights are OIHW; ours are HWIO
(transpose (2, 3, 1, 0)). BN: weight->scale, bias->bias,
running_mean->batch_stats.mean, running_var->batch_stats.var;
num_batches_tracked is dropped.

This module works on plain `dict[str, np.ndarray]` state dicts so it has no
torch dependency; `load_torch_state_dict` uses torch (CPU, baked in) only to
deserialize the pickle.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Deserialize a .pth file into numpy arrays (strips DataParallel and
    legacy 'Scale.' prefixes)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    out = {}
    for k, v in raw.items():
        k = strip_prefix(k)
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def strip_prefix(key: str) -> str:
    """Strip 'module.' (DataParallel) and 'Scale.' (caffe-converted init,
    reference train_gta2cityscapes_multi.py:207-213) prefixes."""
    for p in ("module.", "Scale."):
        if key.startswith(p):
            key = key[len(p):]
    return key


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW->HWIO


def _conv_to_torch(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))  # HWIO->OIHW


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# --- key translation -------------------------------------------------------

_BOTTLENECK_RE = re.compile(r"^layer([1-4])\.(\d+)\.(.+)$")
_ASPP_RE = re.compile(r"^(layer5|layer6|classifier)\.conv2d_list\.(\d+)\.(weight|bias)$")
_VGG_FEAT_RE = re.compile(r"^features\.(\d+)\.(weight|bias)$")

# VGG Sequential index -> our conv name (see models/deeplab_vgg.py layout).
_VGG_IDX_TO_NAME = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    23: "conv5_1", 25: "conv5_2", 27: "conv5_3",
    29: "fc6", 31: "fc7",
}

_DISC_CONVS = {"conv1", "conv2", "conv3", "conv4", "classifier"}


def _translate_resnet_key(key: str):
    """torch key -> (collection, flax path) for the ResNet DeepLab nets.

    Returns None for keys to drop (num_batches_tracked).
    """
    if key.endswith("num_batches_tracked"):
        return None

    def bn_leaf(torch_leaf: str):
        return {
            "weight": ("params", "scale"),
            "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
        }[torch_leaf]

    m = _ASPP_RE.match(key)
    if m:
        head, idx, leaf = m.groups()
        name = "kernel" if leaf == "weight" else "bias"
        return "params", (head, f"branch{int(idx)}", "conv", name)

    m = _BOTTLENECK_RE.match(key)
    if m:
        layer, block, rest = m.groups()
        base = ("backbone", f"layer{layer}_block{int(block)}")
        if rest.startswith("downsample."):
            which, leaf = rest.split(".")[1:]
            if which == "0":  # projection conv
                return "params", base + ("downsample_conv", "conv", "kernel")
            coll, name = bn_leaf(leaf)
            return coll, base + ("downsample_bn", "bn", name)
        mod, leaf = rest.split(".")
        if mod.startswith("conv"):
            return "params", base + (mod, "conv", "kernel")
        coll, name = bn_leaf(leaf)
        return coll, base + (mod, "bn", name)

    if key == "conv1.weight":
        return "params", ("backbone", "conv1", "conv", "kernel")
    if key.startswith("bn1."):
        leaf = key.split(".", 1)[1]
        coll, name = bn_leaf(leaf)
        return coll, ("backbone", "bn1", "bn", name)
    raise KeyError(f"unrecognized ResNet DeepLab checkpoint key: {key}")


def resnet_state_dict_to_variables(
    sd: Mapping[str, np.ndarray],
    skip_heads: bool = False,
    skip_layer5: bool = False,
) -> dict:
    """Build {'params': ..., 'batch_stats': ...} subtrees present in `sd`.

    `skip_layer5` reproduces the reference init surgery for 19 classes
    (train_gta2cityscapes_multi.py:212: layer5 of the COCO init is skipped).
    `skip_heads` drops layer5+layer6+classifier entirely (backbone only).
    Returns a partial tree — merge over freshly-initialized variables with
    `merge_variables`.
    """
    out: dict = {"params": {}, "batch_stats": {}}
    for key, val in sd.items():
        key = strip_prefix(key)
        if skip_layer5 and key.startswith("layer5."):
            continue
        if skip_heads and key.split(".")[0] in ("layer5", "layer6", "classifier"):
            continue
        tr = _translate_resnet_key(key)
        if tr is None:
            continue
        coll, path = tr
        if path[-1] == "kernel":
            val = _conv_to_flax(val)
        _set(out[coll], path, np.asarray(val, dtype=np.float32))
    return out


def vgg_state_dict_to_variables(sd: Mapping[str, np.ndarray]) -> dict:
    """DeeplabVGG torch state dict -> partial flax variables."""
    out: dict = {"params": {}}
    for key, val in sd.items():
        key = strip_prefix(key)
        if key.endswith("num_batches_tracked"):
            continue
        m = _VGG_FEAT_RE.match(key)
        if m:
            idx, leaf = int(m.group(1)), m.group(2)
            if idx not in _VGG_IDX_TO_NAME:
                raise KeyError(f"non-conv VGG features index {idx} in {key}")
            name = "kernel" if leaf == "weight" else "bias"
            val = _conv_to_flax(val) if leaf == "weight" else val
            _set(out["params"], (_VGG_IDX_TO_NAME[idx], "conv", name),
                 np.asarray(val, dtype=np.float32))
            continue
        m = _ASPP_RE.match(key)
        if m:
            head, idx, leaf = m.groups()
            name = "kernel" if leaf == "weight" else "bias"
            val = _conv_to_flax(val) if leaf == "weight" else val
            _set(out["params"], (head, f"branch{int(idx)}", "conv", name),
                 np.asarray(val, dtype=np.float32))
            continue
        raise KeyError(f"unrecognized VGG checkpoint key: {key}")
    return out


def discriminator_state_dict_to_variables(sd: Mapping[str, np.ndarray]) -> dict:
    """FCDiscriminator torch state dict -> flax variables."""
    out: dict = {"params": {}}
    for key, val in sd.items():
        key = strip_prefix(key)
        mod, leaf = key.split(".")
        if mod not in _DISC_CONVS:
            raise KeyError(f"unrecognized discriminator key: {key}")
        name = "kernel" if leaf == "weight" else "bias"
        val = _conv_to_flax(val) if leaf == "weight" else val
        _set(out["params"], (mod, "conv", name), np.asarray(val, dtype=np.float32))
    return out


def _convt_to_flax(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight (Cin, Cout, kh, kw) -> our HWIO.
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


_WARPER_ENC_RE = re.compile(
    r"^encoder_d\.down_list\.(\d+)\.(?:input|block\.1\.(l|norm))\.(.+)$"
)
_WARPER_DEC_RE = re.compile(
    r"^decoder_d\.up_list\.(\d+)\.(?:block\.(1|2)\.(l|norm)|output\.(1|2))\.(.+)$"
)


def warper_state_dict_to_variables(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference Warper torch state dict -> partial flax variables.

    Handles both decoder layouts: transpose=False (Upsample+3x3 conv at
    Sequential index 2) and transpose=True (ConvTranspose2d at index 1,
    weight (Cin, Cout, 4, 4)) — reference model/custom_layers.py:117-188.
    `connection.*` keys are dropped: the reference constructs the Connection
    module but never calls it (model/warper.py:27-33), and never saves
    warper weights to its snapshots either.
    """
    out: dict = {"params": {}, "batch_stats": {}}

    def put_bn(scope, name, leaf, val):
        coll, fname = {
            "weight": ("params", "scale"),
            "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
        }[leaf]
        _set(out[coll], (scope, name, "bn", fname),
             np.asarray(val, np.float32))

    for key, val in sd.items():
        key = strip_prefix(key)
        if key.endswith("num_batches_tracked") or key.startswith("connection."):
            continue
        if key.startswith("encoder_d.out.down.1."):
            leaf = key.rsplit(".", 1)[1]
            val = _conv_to_flax(val) if leaf == "weight" else val
            _set(out["params"],
                 ("encoder_d", "out", "conv",
                  "kernel" if leaf == "weight" else "bias"),
                 np.asarray(val, np.float32))
            continue
        m = _WARPER_ENC_RE.match(key)
        if m:
            idx, mod, leaf = int(m.group(1)), m.group(2), m.group(3)
            if mod == "norm":
                put_bn("encoder_d", f"down{idx}_bn", leaf, val)
            else:  # 'l' conv or the unnormed 'input' conv (idx 0)
                val = _conv_to_flax(val) if leaf == "weight" else val
                _set(out["params"],
                     ("encoder_d", f"down{idx}", "conv",
                      "kernel" if leaf == "weight" else "bias"),
                     np.asarray(val, np.float32))
            continue
        m = _WARPER_DEC_RE.match(key)
        if m:
            idx, blk_idx, mod, out_idx, leaf = m.groups()
            idx = int(idx)
            is_output = out_idx is not None
            transposed = (out_idx or blk_idx) == "1"
            name = "output_conv" if is_output else f"up{idx}_conv"
            if mod == "norm":
                put_bn("decoder_d", f"up{idx}_bn", leaf, val)
            else:
                if leaf == "weight":
                    val = _convt_to_flax(val) if transposed else _conv_to_flax(val)
                _set(out["params"],
                     ("decoder_d", name, "conv",
                      "kernel" if leaf == "weight" else "bias"),
                     np.asarray(val, np.float32))
            continue
        raise KeyError(f"unrecognized Warper checkpoint key: {key}")
    if not out["batch_stats"]:
        del out["batch_stats"]
    return out


def merge_variables(base: Mapping[str, Any], partial: Mapping[str, Any]) -> dict:
    """Deep-merge `partial` over `base`, verifying shapes match.

    Mirrors the reference's filtered load (evaluate_cityscapes.py:137-141):
    keys absent from `partial` keep their `base` (freshly initialized)
    values.
    """
    import jax.numpy as jnp

    def rec(b, p, path):
        if not isinstance(p, Mapping):
            b_arr = np.asarray(b)
            p_arr = np.asarray(p)
            if b_arr.shape != p_arr.shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: "
                    f"checkpoint {p_arr.shape} vs model {b_arr.shape}"
                )
            return jnp.asarray(p_arr)
        out = dict(b)
        for k, v in p.items():
            if k not in out:
                raise KeyError(f"checkpoint key {'/'.join(path + (k,))} "
                               f"not present in model")
            out[k] = rec(out[k], v, path + (k,))
        return out

    return rec(dict(base), partial, ())


# --- export back to torch layout ------------------------------------------

def variables_to_resnet_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Flax DeeplabMulti/DeeplabSingle variables -> torch-layout state dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict[str, np.ndarray] = {}

    def put_conv(torch_key, node):
        sd[torch_key + ".weight"] = _conv_to_torch(np.asarray(node["conv"]["kernel"]))
        if "bias" in node["conv"]:
            sd[torch_key + ".bias"] = np.asarray(node["conv"]["bias"])

    def put_bn(torch_key, pnode, snode):
        sd[torch_key + ".weight"] = np.asarray(pnode["bn"]["scale"])
        sd[torch_key + ".bias"] = np.asarray(pnode["bn"]["bias"])
        sd[torch_key + ".running_mean"] = np.asarray(snode["bn"]["mean"])
        sd[torch_key + ".running_var"] = np.asarray(snode["bn"]["var"])

    bb_p, bb_s = params["backbone"], stats["backbone"]
    put_conv("conv1", bb_p["conv1"])
    put_bn("bn1", bb_p["bn1"], bb_s["bn1"])
    for name in bb_p:
        m = re.match(r"^layer(\d)_block(\d+)$", name)
        if not m:
            continue
        tkey = f"layer{m.group(1)}.{int(m.group(2))}"
        blk_p, blk_s = bb_p[name], bb_s[name]
        for i in (1, 2, 3):
            put_conv(f"{tkey}.conv{i}", blk_p[f"conv{i}"])
            put_bn(f"{tkey}.bn{i}", blk_p[f"bn{i}"], blk_s[f"bn{i}"])
        if "downsample_conv" in blk_p:
            put_conv(f"{tkey}.downsample.0", blk_p["downsample_conv"])
            put_bn(f"{tkey}.downsample.1", blk_p["downsample_bn"],
                   blk_s["downsample_bn"])
    for head in ("layer5", "layer6"):
        if head in params:
            for bname, node in params[head].items():
                idx = int(bname.replace("branch", ""))
                put_conv(f"{head}.conv2d_list.{idx}", node)
    return sd


def variables_to_vgg_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Flax DeeplabVGG variables -> torch-layout state dict (features.N.*)."""
    params = variables["params"]
    if "vgg" in params:  # unwrap the _VGGAsMulti training adapter
        params = params["vgg"]
    name_to_idx = {v: k for k, v in _VGG_IDX_TO_NAME.items()}
    sd: dict[str, np.ndarray] = {}
    for name, node in params.items():
        if name == "classifier":
            for bname, bnode in node.items():
                idx = int(bname.replace("branch", ""))
                sd[f"classifier.conv2d_list.{idx}.weight"] = _conv_to_torch(
                    np.asarray(bnode["conv"]["kernel"]))
                sd[f"classifier.conv2d_list.{idx}.bias"] = np.asarray(
                    bnode["conv"]["bias"])
            continue
        idx = name_to_idx[name]
        sd[f"features.{idx}.weight"] = _conv_to_torch(
            np.asarray(node["conv"]["kernel"]))
        sd[f"features.{idx}.bias"] = np.asarray(node["conv"]["bias"])
    return sd


def variables_to_discriminator_state_dict(variables) -> dict[str, np.ndarray]:
    sd = {}
    for mod, node in variables["params"].items():
        sd[mod + ".weight"] = _conv_to_torch(np.asarray(node["conv"]["kernel"]))
        sd[mod + ".bias"] = np.asarray(node["conv"]["bias"])
    return sd


def save_torch_state_dict(sd: Mapping[str, np.ndarray], path: str):
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
