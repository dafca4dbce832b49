"""Single-layer parity of the BN building blocks vs torch.

The full-network bn_mode='batch' check (test_reference_parity.py) can only
bound the forward loosely — batch-stat normalization amplifies f32 rounding
chaotically over ~100 layers. The TIGHT semantic check of the reference's
train-mode dynamics (model.train() with affine requires_grad=False,
train_gta2cityscapes_multi.py:222 + model/deeplab_multi.py:130-132) lives
here: one layer vs torch.nn.BatchNorm2d.train(), forward + input/upstream
gradients + running-stat momentum update, at 1e-6.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.models.layers import _BNTrainFrozenAffine


@pytest.mark.parametrize("shape", [(2, 8, 12, 5), (1, 16, 16, 3)])
def test_bn_train_frozen_affine_vs_torch(rng, shape):
    n, h, w, c = shape
    x = rng.standard_normal(shape, dtype=np.float32) * 3.0 + 1.5
    g = rng.standard_normal(shape, dtype=np.float32)
    scale = rng.standard_normal(c).astype(np.float32) + 1.0
    bias = rng.standard_normal(c).astype(np.float32) * 0.1
    rmean = rng.standard_normal(c).astype(np.float32) * 0.1
    rvar = (rng.random(c) * 1.5 + 0.5).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(c).train()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
        tbn.running_mean.copy_(torch.from_numpy(rmean))
        tbn.running_var.copy_(torch.from_numpy(rvar))
    # The reference freezes the affine (requires_grad=False) but leaves the
    # module in train mode.
    tbn.weight.requires_grad_(False)
    tbn.bias.requires_grad_(False)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    ty = tbn(tx)
    ty.backward(torch.from_numpy(np.transpose(g, (0, 3, 1, 2))))
    ref_y = np.transpose(ty.detach().numpy(), (0, 2, 3, 1))
    ref_dx = np.transpose(tx.grad.numpy(), (0, 2, 3, 1))

    mod = _BNTrainFrozenAffine(c)
    variables = {
        "params": {"bn": {"scale": jnp.asarray(scale),
                          "bias": jnp.asarray(bias)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(rmean),
                               "var": jnp.asarray(rvar)}},
    }

    def f(xj):
        y, mut = mod.apply(variables, xj, mutable=["batch_stats"])
        return y, mut["batch_stats"]["bn"]

    (y, new_stats), vjp = jax.vjp(f, jnp.asarray(x), has_aux=False)
    # vjp over the (y, stats) tuple: stats cotangent zero.
    (dx,) = vjp((jnp.asarray(g),
                 jax.tree.map(jnp.zeros_like, new_stats)))

    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), ref_dx, rtol=1e-5, atol=1e-6)
    # Running stats: torch momentum 0.1, unbiased batch var in the update.
    np.testing.assert_allclose(
        np.asarray(new_stats["mean"]), tbn.running_mean.numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["var"]), tbn.running_var.numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_bn_train_frozen_affine_no_affine_grads(rng):
    """The frozen affine must receive exactly zero gradient (reference
    requires_grad=False): stop_gradient inside the module."""
    c = 4
    x = rng.standard_normal((2, 6, 6, c), dtype=np.float32)
    mod = _BNTrainFrozenAffine(c)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss(params):
        y, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), mutable=["batch_stats"],
        )
        return jnp.sum(y * y)

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree.leaves(grads):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
