"""Golden tests: CE with ignore label and GAN objectives vs torch."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops import (
    cross_entropy_2d,
    bce_with_logits,
    ls_gan_mse,
    gan_loss,
)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((2, 8, 10, 19), dtype=np.float32) * 3
    labels = rng.integers(0, 19, size=(2, 8, 10)).astype(np.int64)
    # Sprinkle ignore pixels.
    mask = rng.uniform(size=labels.shape) < 0.3
    labels[mask] = 255

    ours = float(cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels),
        ignore_index=255,
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_cross_entropy_all_ignored_is_zero(rng):
    logits = rng.standard_normal((1, 4, 4, 19), dtype=np.float32)
    labels = np.full((1, 4, 4), 255, dtype=np.int64)
    assert float(cross_entropy_2d(jnp.asarray(logits), jnp.asarray(labels))) == 0.0


def test_cross_entropy_planar_matches_dense(rng):
    """cross_entropy_2d_planar((N,C,H,W)) == cross_entropy_2d((N,H,W,C)),
    value and logits gradient, with ignore pixels present."""
    from adaptsegnet_tpu.ops import cross_entropy_2d_planar

    logits = rng.standard_normal((2, 8, 12, 19)).astype(np.float32)
    labels = rng.integers(0, 19, size=(2, 8, 12)).astype(np.int32)
    labels[:, :2] = 255
    lj, yj = jnp.asarray(logits), jnp.asarray(labels)

    dense = cross_entropy_2d(lj, yj)
    planar = cross_entropy_2d_planar(jnp.transpose(lj, (0, 3, 1, 2)), yj)
    np.testing.assert_allclose(float(planar), float(dense),
                               rtol=1e-6, atol=1e-7)

    gd = jax.grad(lambda l: cross_entropy_2d(l, yj))(lj)
    gp = jax.grad(lambda l: cross_entropy_2d_planar(
        jnp.transpose(l, (0, 3, 1, 2)), yj))(lj)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                               rtol=1e-5, atol=1e-7)


def test_bce_with_logits_matches_torch(rng):
    x = (rng.standard_normal((2, 6, 7, 1)) * 4).astype(np.float32)
    for target in (0.0, 1.0):
        ours = float(bce_with_logits(jnp.asarray(x), target))
        ref = F.binary_cross_entropy_with_logits(
            torch.from_numpy(x), torch.full(x.shape, target)
        ).item()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_ls_gan_matches_torch_mse(rng):
    x = rng.standard_normal((2, 6, 7, 1)).astype(np.float32)
    ours = float(ls_gan_mse(jnp.asarray(x), 1.0))
    ref = F.mse_loss(torch.from_numpy(x), torch.ones(x.shape)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_gan_loss_selector():
    assert gan_loss("LS") is ls_gan_mse
    assert gan_loss("Vanilla") is bce_with_logits
    try:
        gan_loss("wgan")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass
