"""conv4x4_stride2: torch parity + custom-VJP == autodiff."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.conv4x4 import conv4x4_stride2


def test_forward_matches_torch(rng):
    x = rng.standard_normal((2, 16, 24, 7), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 7, 5)) * 0.1).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    ours = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(k.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grad_matches_torch(rng):
    """Autodiff grads through the matmul lowering == torch conv grads."""
    x = rng.standard_normal((1, 8, 12, 6), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 6, 3)) * 0.1).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)

    dx, dk, db = jax.grad(
        lambda x, k, b: jnp.sum(conv4x4_stride2(x, k, b)), argnums=(0, 1, 2)
    )(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    tk = torch.from_numpy(k.transpose(3, 2, 0, 1)).requires_grad_(True)
    tb = torch.from_numpy(b).requires_grad_(True)
    F.conv2d(tx, tk, tb, stride=2, padding=1).sum().backward()
    np.testing.assert_allclose(np.asarray(dx),
                               tx.grad.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk),
                               tk.grad.numpy().transpose(2, 3, 1, 0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), tb.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_forward_matches_torch_large_c(rng):
    """Torch parity at a discriminator-scale channel count."""
    x = rng.standard_normal((1, 8, 12, 40), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 40, 5)) * 0.1).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    ours = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(k.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_forward_matches_torch_rgb_stem(rng):
    """C=3 takes the row-parity path (the Warper encoder stem)."""
    x = rng.standard_normal((2, 12, 16, 3), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 3, 8)) * 0.1).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    ours = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(k.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grad_no_bias(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    k = jnp.asarray((rng.standard_normal((4, 4, 4, 2)) * 0.1).astype(np.float32))
    dx, dk = jax.grad(lambda x, k: jnp.sum(conv4x4_stride2(x, k, None)),
                      argnums=(0, 1))(x, k)
    assert dx.shape == x.shape and dk.shape == k.shape
    assert np.isfinite(np.asarray(dx)).all()
