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


def generator_param_multiplicity(params: Any, all_1x: bool = False) -> Any:
    """Per-leaf occurrence count of the reference's SGD param list.

    The reference's get_1x_lr_params_NOscale iterates `for j in
    b[i].modules(): for k in j.parameters()` (model/deeplab_multi.py:212-217)
    — `.modules()` recurses AND `.parameters()` recurses, so every backbone
    param is yielded once per ancestor module: stem conv1 x1, bottleneck
    convs x3 (layer / Bottleneck / conv), downsample convs x4 (+ the
    downsample Sequential). torch never dedups a param group, and the
    0.4-era sequential SGD loop then runs the momentum+update k times per
    step for a k-duplicated param (measured histogram on the reference
    module itself: {1: 1, 3: 99, 4: 4}; pinned in tests/test_optim.py).
    The 10x head group and the VGG path (plain .parameters()) have no
    duplicates.
    """

    def mult(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if all_1x or not keys or keys[0] != "backbone":
            return 1
        if keys[1] == "conv1":
            return 1
        if "bn" in keys:
            return 1  # frozen — never reaches the optimizer either way
        if any(k.startswith("downsample") for k in keys):
            return 4
        return 3

    return jax.tree_util.tree_map_with_path(mult, params)


def _kfold_trace(mults: Any, decay: float):
    """torch-0.4 momentum applied k times per step (the duplicate quirk).

    One step of the reference's sequential SGD over a k-duplicated param is
    k repetitions of {buf = m*buf + d; p -= lr*buf} with the same d (torch
    0.4 optim/sgd.py step loop; modern torch differs only on the very first
    step, where its per-group state init re-clones d for every occurrence).
    Closed form with S_k = (1-m^k)/(1-m):

        buf'   = m^k * buf + S_k * d
        update = m*S_k * buf + T_k * d,   T_k = (k - m*S_k)/(1-m)

    (k=1 reduces to optax.trace.) The 0.4 loop recomputes d = grad + wd*p
    per occurrence with the freshly updated p; folding weight decay once
    before this transform instead drifts by O(wd * lr) relative ~ 1e-7 per
    step — far below f32 update noise.
    """

    def coeffs(k):
        s_k = (1.0 - decay**k) / (1.0 - decay)
        t_k = (k - decay * s_k) / (1.0 - decay)
        return decay**k, s_k, decay * s_k, t_k

    buf_decay = jax.tree.map(lambda k: coeffs(k)[0], mults)
    d_to_buf = jax.tree.map(lambda k: coeffs(k)[1], mults)
    buf_to_out = jax.tree.map(lambda k: coeffs(k)[2], mults)
    d_to_out = jax.tree.map(lambda k: coeffs(k)[3], mults)

    def init_fn(params):
        return optax.TraceState(trace=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        new_trace = jax.tree.map(
            lambda d, buf, bd, db: bd * buf + db * d,
            updates, state.trace, buf_decay, d_to_buf,
        )
        out = jax.tree.map(
            lambda d, buf, bo, do: bo * buf + do * d,
            updates, state.trace, buf_to_out, d_to_out,
        )
        return out, optax.TraceState(trace=new_trace)

    return optax.GradientTransformation(init_fn, update_fn)


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
    dup_mults: Any = None,
) -> optax.GradientTransformation:
    """`dup_mults` (from generator_param_multiplicity) opts into the
    reference's literal duplicate-param SGD dynamics — the torch-0.4 loop
    applies the momentum+update k times per step for the k-duplicated
    backbone params (see _kfold_trace). Default None = one clean update per
    param (the documented intent of optim_parameters; the duplication is a
    reference bug, but the published training curves ran WITH it)."""
    not_frozen = jax.tree.map(lambda lab: lab != FROZEN, labels)
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=not_frozen),
        (optax.trace(decay=momentum, nesterov=False) if dup_mults is None
         else _kfold_trace(dup_mults, momentum)),
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
