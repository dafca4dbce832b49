"""Optimizer parity: our optax chains vs torch SGD/Adam over several steps."""

import collections
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from adaptsegnet_tpu.train.optim import (
    BACKBONE_1X,
    FROZEN,
    HEAD_10X,
    make_discriminator_tx,
    make_generator_tx,
    generator_param_labels,
    generator_param_multiplicity,
)
from adaptsegnet_tpu.train.schedule import lr_poly


def test_lr_poly():
    np.testing.assert_allclose(float(lr_poly(2.5e-4, 0, 250000, 0.9)),
                               2.5e-4, rtol=1e-6)
    v = float(lr_poly(2.5e-4, 125000, 250000, 0.9))
    # f32 pow on device vs f64 python: ~1e-7 relative.
    np.testing.assert_allclose(v, 2.5e-4 * 0.5 ** 0.9, rtol=1e-5)


def test_sgd_matches_torch_with_groups(rng):
    base_lr, momentum, wd, num_steps, power = 0.01, 0.9, 5e-4, 100, 0.9
    w_back = rng.standard_normal((4, 3)).astype(np.float32)
    w_head = rng.standard_normal((5,)).astype(np.float32)
    w_frozen = rng.standard_normal((3,)).astype(np.float32)

    params = {"backbone": jnp.asarray(w_back), "head": jnp.asarray(w_head),
              "frozen": jnp.asarray(w_frozen)}
    labels = {"backbone": BACKBONE_1X, "head": HEAD_10X, "frozen": FROZEN}
    tx = make_generator_tx(labels, base_lr, momentum, wd, num_steps, power)
    opt_state = tx.init(params)

    t_back = torch.tensor(w_back, requires_grad=True)
    t_head = torch.tensor(w_head, requires_grad=True)
    t_frozen = torch.tensor(w_frozen)  # excluded from the torch optimizer
    opt = torch.optim.SGD(
        [{"params": [t_back], "lr": base_lr},
         {"params": [t_head], "lr": base_lr * 10}],
        lr=base_lr, momentum=momentum, weight_decay=wd,
    )

    for step in range(5):
        g_back = rng.standard_normal(w_back.shape).astype(np.float32)
        g_head = rng.standard_normal(w_head.shape).astype(np.float32)
        g_frozen = rng.standard_normal(w_frozen.shape).astype(np.float32)
        grads = {"backbone": jnp.asarray(g_back), "head": jnp.asarray(g_head),
                 "frozen": jnp.asarray(g_frozen)}

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        lr = base_lr * (1 - step / num_steps) ** power
        opt.param_groups[0]["lr"] = lr
        opt.param_groups[1]["lr"] = lr * 10
        opt.zero_grad()
        t_back.grad = torch.tensor(g_back)
        t_head.grad = torch.tensor(g_head)
        opt.step()

    np.testing.assert_allclose(np.asarray(params["backbone"]),
                               t_back.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["head"]),
                               t_head.detach().numpy(), rtol=1e-5, atol=1e-7)
    # Frozen leaf never moves.
    np.testing.assert_array_equal(np.asarray(params["frozen"]), w_frozen)


def test_adam_matches_torch(rng):
    base_lr, num_steps, power = 1e-4, 100, 0.9
    w = rng.standard_normal((6, 4)).astype(np.float32)
    params = {"w": jnp.asarray(w)}
    tx = make_discriminator_tx(base_lr, 0.9, 0.99, num_steps, power)
    opt_state = tx.init(params)

    t_w = torch.tensor(w, requires_grad=True)
    opt = torch.optim.Adam([t_w], lr=base_lr, betas=(0.9, 0.99))

    for step in range(5):
        g = rng.standard_normal(w.shape).astype(np.float32)
        updates, opt_state = tx.update(params={"w": params["w"]},
                                       updates={"w": jnp.asarray(g)},
                                       state=opt_state)
        params = optax.apply_updates(params, updates)

        lr = base_lr * (1 - step / num_steps) ** power
        opt.param_groups[0]["lr"] = lr
        opt.zero_grad()
        t_w.grad = torch.tensor(g)
        opt.step()

    np.testing.assert_allclose(np.asarray(params["w"]), t_w.detach().numpy(),
                               rtol=1e-5, atol=1e-8)


def test_kfold_trace_matches_sequential_duplicates(rng):
    """--optim-dup-quirk: the closed-form k-fold momentum equals the literal
    torch-0.4 sequential loop over a k-duplicated param list — k repetitions
    of {buf = m*buf + d; p -= lr_group*buf} per step with the same d
    (reference model/deeplab_multi.py:212-217 duplication x torch 0.4
    optim/sgd.py update loop)."""
    base_lr, momentum, wd, num_steps, power = 0.01, 0.9, 5e-4, 100, 0.9
    shapes = {"stem": (3,), "block": (4, 2), "down": (5,), "head": (2, 2)}
    mults = {"stem": 1, "block": 3, "down": 4, "head": 1}
    groups = {"stem": 1.0, "block": 1.0, "down": 1.0, "head": 10.0}
    labels = {k: (HEAD_10X if k == "head" else BACKBONE_1X) for k in shapes}

    init = {k: rng.standard_normal(s).astype(np.float32)
            for k, s in shapes.items()}
    params = {k: jnp.asarray(v) for k, v in init.items()}
    tx = make_generator_tx(labels, base_lr, momentum, wd, num_steps, power,
                           dup_mults=mults)
    opt_state = tx.init(params)

    ref_p = {k: v.astype(np.float64).copy() for k, v in init.items()}
    ref_buf = {k: np.zeros_like(v) for k, v in ref_p.items()}

    for step in range(5):
        g = {k: rng.standard_normal(s).astype(np.float32)
             for k, s in shapes.items()}
        updates, opt_state = tx.update(
            {k: jnp.asarray(v) for k, v in g.items()}, opt_state, params)
        params = optax.apply_updates(params, updates)

        lr = base_lr * (1 - step / num_steps) ** power
        for k in shapes:
            d = g[k] + wd * ref_p[k]  # fixed per step (see _kfold_trace doc)
            for _ in range(mults[k]):
                ref_buf[k] = momentum * ref_buf[k] + d
                ref_p[k] = ref_p[k] - lr * groups[k] * ref_buf[k]

    for k in shapes:
        np.testing.assert_allclose(np.asarray(params[k]), ref_p[k],
                                   rtol=2e-5, atol=1e-7)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/model"),
    reason="reference checkout not available",
)
def test_param_multiplicity_matches_reference_histogram():
    """generator_param_multiplicity reproduces the occurrence counts of the
    reference's own optim_parameters generator, measured on the reference
    module itself: {x1: 1 stem conv, x3: 99 bottleneck convs, x4: 4
    downsample convs}; the 10x head group has no duplicates."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.deeplab_multi import DeeplabMulti as RefDeeplabMulti

    ref = RefDeeplabMulti(num_classes=19)
    ref_hist = collections.Counter(
        collections.Counter(
            id(p) for p in ref.get_1x_lr_params_NOscale()
        ).values()
    )
    assert dict(ref_hist) == {1: 1, 3: 99, 4: 4}
    assert set(
        collections.Counter(id(p) for p in ref.get_10x_lr_params()).values()
    ) == {1}

    from adaptsegnet_tpu.models import DeeplabMulti

    model = DeeplabMulti(num_classes=19)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 128, 3), jnp.float32),
    )
    params = shapes["params"]
    labels = generator_param_labels(params)
    mults = generator_param_multiplicity(params)
    hist = collections.Counter(
        m for m, lab in zip(jax.tree.leaves(mults), jax.tree.leaves(labels))
        if lab == BACKBONE_1X
    )
    assert dict(hist) == {1: 1, 3: 99, 4: 4}, dict(hist)
    assert all(
        m == 1
        for m, lab in zip(jax.tree.leaves(mults), jax.tree.leaves(labels))
        if lab == HEAD_10X
    )
    assert set(jax.tree.leaves(
        generator_param_multiplicity(params, all_1x=True))) == {1}


def test_generator_param_labels_resnet():
    params = {
        "backbone": {
            "conv1": {"conv": {"kernel": 0}},
            "bn1": {"bn": {"scale": 0, "bias": 0}},
            "layer1_block0": {
                "conv1": {"conv": {"kernel": 0}},
                "bn1": {"bn": {"scale": 0, "bias": 0}},
            },
        },
        "layer5": {"branch0": {"conv": {"kernel": 0, "bias": 0}}},
        "layer6": {"branch0": {"conv": {"kernel": 0, "bias": 0}}},
    }
    labels = generator_param_labels(params)
    assert labels["backbone"]["conv1"]["conv"]["kernel"] == BACKBONE_1X
    assert labels["backbone"]["bn1"]["bn"]["scale"] == FROZEN
    assert labels["backbone"]["layer1_block0"]["bn1"]["bn"]["bias"] == FROZEN
    assert labels["layer5"]["branch0"]["conv"]["kernel"] == HEAD_10X
    assert labels["layer6"]["branch0"]["conv"]["bias"] == HEAD_10X

    all1x = generator_param_labels(params, all_1x=True)
    assert set(jax.tree.leaves(all1x)) == {BACKBONE_1X}
