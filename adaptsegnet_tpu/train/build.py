"""Construct models and train state from a TrainConfig.

Mirrors the reference's main() setup (train_gta2cityscapes_multi.py:180-257):
model choice, MS-COCO init surgery restore, warper construction,
discriminator(s), optimizers — then wraps everything into one TrainState
pytree.
"""

from __future__ import annotations

import logging
import os.path as osp
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from adaptsegnet_tpu.models import (
    DeeplabMulti,
    DeeplabVGG,
    FCDiscriminator,
    Warper,
)
from adaptsegnet_tpu.train.config import TrainConfig
from adaptsegnet_tpu.train.optim import (
    generator_param_labels,
    make_discriminator_tx,
    make_generator_tx,
)
from adaptsegnet_tpu.train.state import (
    DiscriminatorState,
    GeneratorState,
    TrainState,
    WarperState,
)
from adaptsegnet_tpu.utils import pth_interop


class _VGGAsMulti(nn.Module):
    """Adapter: expose DeeplabVGG through the (pred1, pred2) contract.

    The aux output aliases the main one; with lambda_seg/lambda_adv1 at 0
    (single-level training, the only mode the paper uses for VGG) the aux
    branch contributes nothing and XLA dead-code-eliminates the duplicate.
    """

    num_classes: int = 19
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = DeeplabVGG(
            num_classes=self.num_classes, dtype=self.dtype, name="vgg"
        )(x)
        return out, out


def _dtype_of(cfg: TrainConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def build_generator(cfg: TrainConfig, rng: jax.Array, example_hw=None):
    """Build the segmenter module + initialized variables."""
    dtype = _dtype_of(cfg)
    hw = example_hw or cfg.input_hw
    x = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    if cfg.model == "DeepLab":
        model = DeeplabMulti(
            num_classes=cfg.num_classes, dtype=dtype, bn_mode=cfg.bn_mode
        )
    elif cfg.model == "DeeplabVGG":
        # The VGG-16 backbone has no BN (torchvision vgg16, reference
        # model/deeplab_vgg.py) — bn_mode is a no-op there.
        model = _VGGAsMulti(num_classes=cfg.num_classes, dtype=dtype)
    else:
        raise NotImplementedError(f"model {cfg.model!r}")
    variables = model.init(rng, x)
    return model, variables


def restore_generator(cfg: TrainConfig, variables):
    """Apply the reference restore-from surgery onto fresh variables.

    For the MS-COCO init (or any ResNet-layout .pth): strip Scale./module.
    prefixes, skip layer5 when num_classes == 19 (reference :207-215), merge
    the rest over the initialized tree.
    """
    if not cfg.restore_from:
        return variables, False
    if not osp.exists(cfg.restore_from):
        # The reference crashes on a bad path (torch.load inside
        # train_gta2cityscapes_multi.py:202-205); silently training from
        # random init would burn a 150k-step run, so crash loudly too.
        raise FileNotFoundError(
            "--restore-from checkpoint not found: "
            f"{osp.abspath(cfg.restore_from)!r} (pass --restore-from '' to "
            "train from random init)"
        )
    sd = pth_interop.load_torch_state_dict(cfg.restore_from)
    if cfg.model == "DeepLab":
        partial = pth_interop.resnet_state_dict_to_variables(
            sd,
            skip_layer5=(cfg.num_classes == 19),
            skip_heads=cfg.not_restore_last,
        )
        # Drop keys for head layers missing from the checkpoint gracefully:
        # merge_variables only touches present keys.
    elif cfg.model == "DeeplabVGG":
        partial = {
            "params": {
                "vgg": pth_interop.vgg_state_dict_to_variables(sd)["params"]
            }
        }
    else:
        return variables, False
    n_merged = len(jax.tree_util.tree_leaves(partial))
    n_total = len(jax.tree_util.tree_leaves(variables))
    # print (not a bare module logger): the CLIs configure no logging
    # handler, and this restore count is the operator's only confirmation
    # that --restore-from actually loaded something (advisor r3).
    print(
        f"restored {n_merged}/{n_total} arrays from {cfg.restore_from}",
        file=sys.stderr,
    )
    logging.getLogger(__name__).info(
        "restored %d/%d arrays from %s", n_merged, n_total, cfg.restore_from
    )
    return pth_interop.merge_variables(variables, partial), True


def build_train_state(
    cfg: TrainConfig,
    seed: Optional[int] = None,
    example_hw=None,
) -> tuple[TrainState, dict]:
    """Create the full TrainState; returns (state, modules dict)."""
    seed = cfg.random_seed if seed is None else seed
    root = jax.random.PRNGKey(seed)
    kg, kd1, kd2, kw = jax.random.split(root, 4)
    dtype = _dtype_of(cfg)

    model, gvars = build_generator(cfg, kg, example_hw=example_hw)
    gvars, _ = restore_generator(cfg, gvars)
    labels = generator_param_labels(
        gvars["params"], all_1x=(cfg.model == "DeeplabVGG")
    )
    dup_mults = None
    if getattr(cfg, "optim_dup_quirk", False):
        from adaptsegnet_tpu.train.optim import generator_param_multiplicity

        dup_mults = generator_param_multiplicity(
            gvars["params"], all_1x=(cfg.model == "DeeplabVGG")
        )
    gtx = make_generator_tx(
        labels,
        base_lr=cfg.learning_rate,
        momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        num_steps=cfg.num_steps,
        power=cfg.power,
        dup_mults=dup_mults,
    )
    generator = GeneratorState.create(
        gvars["params"], gvars.get("batch_stats", {}), gtx
    )

    modules = {"model": model}
    d1 = d2 = warper_state = None
    hw = example_hw or cfg.input_hw

    if not cfg.source_only:
        disc = FCDiscriminator(num_classes=cfg.num_classes, dtype=dtype)
        modules["discriminator"] = disc
        dx = jnp.zeros((1, hw[0], hw[1], cfg.num_classes), jnp.float32)
        dtx = lambda: make_discriminator_tx(
            base_lr=cfg.learning_rate_D,
            num_steps=cfg.num_steps,
            power=cfg.power,
        )
        d2 = DiscriminatorState.create(disc.init(kd2, dx)["params"], dtx())
        if cfg.level == "multi-level":
            d1 = DiscriminatorState.create(disc.init(kd1, dx)["params"], dtx())

    use_warper = cfg.warper and (cfg.source_only or cfg.level == "single-level")
    if use_warper:
        # planar_flow: the flow head emits (N, 2, H, W) channel planes —
        # a 2-channel NHWC conv output costs its consumers ~10 ms/step of
        # strided relayout on TPU (ops/planar_out_conv.py). Same params
        # and values; the fused warp kernel consumes planes natively.
        warper = Warper(norm=cfg.warper_norm, num_layers=cfg.warper_num_layers,
                        dtype=dtype, planar_flow=True)
        modules["warper"] = warper
        wx = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
        wvars = warper.init(kw, wx)
        warper_state = WarperState(
            params=wvars["params"],
            stats={k: v for k, v in wvars.items() if k != "params"},
        )

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        generator=generator,
        d1=d1,
        d2=d2,
        warper=warper_state,
    )
    return state, modules
