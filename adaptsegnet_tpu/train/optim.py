"""Optimizers with torch-parity update rules and the reference's param groups.

Generator (reference train_gta2cityscapes_multi.py:244-245 +
model/deeplab_multi.py:196-235): SGD(momentum=0.9, weight_decay=5e-4) over
two groups — backbone at 1x lr, ASPP heads at 10x lr — with frozen backbone
BN affine params excluded entirely. torch's coupled update order is
    d_p = grad + wd * p;  buf = m * buf + d_p;  p -= lr_group * buf
which maps to optax chain [add_decayed_weights, trace, scale_by(-lr),
per-group multiplier].

Discriminators (reference :351, :536-539): Adam(lr=1e-4, betas=(0.9, 0.99),
eps=1e-8) — optax.scale_by_adam implements exactly torch's bias-corrected
rule. Both use the poly LR schedule stepped once per outer iteration.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from adaptsegnet_tpu.train.schedule import lr_poly

# Param-group labels.
BACKBONE_1X = "backbone_1x"
HEAD_10X = "head_10x"
FROZEN = "frozen"

_HEAD_NAMES = {"layer5", "layer6", "classifier"}


def generator_param_labels(params: Any, all_1x: bool = False) -> Any:
    """Label each generator param leaf with its LR group.

    ResNet DeepLab: heads (layer5/layer6) -> 10x; backbone conv kernels ->
    1x; backbone BN scale/bias -> frozen (reference
    model/deeplab_multi.py:196-231: BN params have requires_grad=False and
    never reach the optimizer). With `all_1x=True` (DeeplabVGG:
    optim_parameters returns plain .parameters(), model/deeplab_vgg.py:53-54)
    every param is 1x.
    """

    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if all_1x:
            return BACKBONE_1X
        if keys and keys[0] in _HEAD_NAMES:
            return HEAD_10X
        if "bn" in keys:
            return FROZEN
        return BACKBONE_1X

    return jax.tree_util.tree_map_with_path(label, params)


def _scale_by_labels(labels: Any, multipliers: dict[str, float]):
    """Per-leaf update multiplier keyed by the label tree."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        scaled = jax.tree.map(
            lambda u, lab: u * multipliers[lab], updates, labels
        )
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_generator_tx(
    labels: Any,
    base_lr: float = 2.5e-4,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    num_steps: int = 250_000,
    power: float = 0.9,
) -> optax.GradientTransformation:
    not_frozen = jax.tree.map(lambda lab: lab != FROZEN, labels)
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=not_frozen),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_schedule(
            lambda step: -lr_poly(base_lr, step, num_steps, power)
        ),
        _scale_by_labels(
            labels, {BACKBONE_1X: 1.0, HEAD_10X: 10.0, FROZEN: 0.0}
        ),
    )


def make_discriminator_tx(
    base_lr: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.99,
    num_steps: int = 250_000,
    power: float = 0.9,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
        optax.scale_by_schedule(
            lambda step: -lr_poly(base_lr, step, num_steps, power)
        ),
    )
