"""max_pool_3x3_s2 custom backward == torch maxpool autograd, incl. ties.

The custom VJP (models/layers.py) must route each window's cotangent to
the FIRST max in row-major window-scan order — torch's tie rule. Post-ReLU
feature maps are full of exact ties (zeros), so tie handling is
load-bearing, not a corner case.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.models.layers import max_pool_3x3_s2


def _torch_pool_grads(x, g, ceil_mode):
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    ty = F.max_pool2d(tx, 3, stride=2, padding=1, ceil_mode=ceil_mode)
    ty.backward(torch.from_numpy(np.transpose(g, (0, 3, 1, 2))))
    return (np.transpose(ty.detach().numpy(), (0, 2, 3, 1)),
            np.transpose(tx.grad.numpy(), (0, 2, 3, 1)))


@pytest.mark.parametrize("ceil_mode,h,w", [
    (False, 16, 24), (True, 16, 24), (True, 15, 21), (False, 10, 10),
])
def test_forward_and_grad_match_torch(rng, ceil_mode, h, w):
    x = rng.standard_normal((2, h, w, 5), dtype=np.float32)
    # Inject heavy ties: ReLU-like zeros tie across most windows.
    x = np.maximum(x, 0.0)
    oh = ((h - 1) // 2 + 1) if not (ceil_mode and (h - 1) % 2) else (h - 1) // 2 + 2
    ow = ((w - 1) // 2 + 1) if not (ceil_mode and (w - 1) % 2) else (w - 1) // 2 + 2
    g = rng.standard_normal((2, oh, ow, 5)).astype(np.float32)

    ref_y, ref_dx = _torch_pool_grads(x, g, ceil_mode)
    y, vjp = jax.vjp(lambda a: max_pool_3x3_s2(a, ceil_mode), jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), ref_dx, rtol=1e-5, atol=1e-6)


def test_pool2x2_grad_matches_torch(rng):
    from adaptsegnet_tpu.models.layers import max_pool_2x2_s2

    x = np.maximum(rng.standard_normal((2, 12, 16, 5), dtype=np.float32), 0.0)
    g = rng.standard_normal((2, 6, 8, 5)).astype(np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    ty = F.max_pool2d(tx, 2, stride=2)
    ty.backward(torch.from_numpy(np.transpose(g, (0, 3, 1, 2))))
    y, vjp = jax.vjp(max_pool_2x2_s2, jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(y),
                               np.transpose(ty.detach().numpy(), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(dx),
                               np.transpose(tx.grad.numpy(), (0, 2, 3, 1)),
                               rtol=1e-6, atol=1e-6)


def test_grad_all_ties(rng):
    """A constant input ties EVERY window everywhere; the full cotangent
    mass must still be conserved and routed like torch's."""
    x = np.ones((1, 8, 12, 3), np.float32)
    g = rng.standard_normal((1, 4, 6, 3)).astype(np.float32)
    ref_y, ref_dx = _torch_pool_grads(x, g, False)
    y, vjp = jax.vjp(lambda a: max_pool_3x3_s2(a, False), jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(y), ref_y)
    np.testing.assert_allclose(np.asarray(dx), ref_dx, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("h,w", [(11, 16), (12, 15), (9, 13)])
def test_pool2x2_grad_odd_dims(rng, h, w):
    """Floor-mode 2x2 pooling on odd H/W: the trailing row/col is never
    read, so its gradient is zero (torch semantics); the parity-block
    backward must not trace-fail on odd shapes (advisor r2)."""
    from adaptsegnet_tpu.models.layers import max_pool_2x2_s2

    x = np.maximum(rng.standard_normal((2, h, w, 5), dtype=np.float32), 0.0)
    g = rng.standard_normal((2, h // 2, w // 2, 5)).astype(np.float32)
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    ty = F.max_pool2d(tx, 2, stride=2)
    ty.backward(torch.from_numpy(np.transpose(g, (0, 3, 1, 2))))
    y, vjp = jax.vjp(max_pool_2x2_s2, jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(y),
                               np.transpose(ty.detach().numpy(), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(dx),
                               np.transpose(tx.grad.numpy(), (0, 2, 3, 1)),
                               rtol=1e-6, atol=1e-6)
