"""Golden tests: grid_sample vs torch (align_corners=True, zeros padding)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from adaptsegnet_tpu.ops import grid_sample_bilinear
from adaptsegnet_tpu.ops.sampling import make_identity_grid, warp_with_flow


def torch_grid_sample(x_nhwc, grid):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    g = torch.from_numpy(grid)
    y = F.grid_sample(t, g, mode="bilinear", padding_mode="zeros",
                      align_corners=True)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_identity_grid_is_noop(rng):
    x = rng.standard_normal((1, 9, 13, 4), dtype=np.float32)
    grid = np.asarray(make_identity_grid(9, 13))[None]
    out = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)


def test_random_in_range_grid_matches_torch(rng):
    x = rng.standard_normal((2, 16, 24, 5), dtype=np.float32)
    grid = rng.uniform(-1, 1, size=(2, 10, 12, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    ref = torch_grid_sample(x, grid)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_out_of_range_zero_padding_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
    grid = rng.uniform(-1.8, 1.8, size=(1, 6, 6, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    ref = torch_grid_sample(x, grid)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_warp_with_flow_matches_reference_recipe(rng):
    """warp == grid_sample(x, clamp(tanh(flow) + identity, -1, 1))."""
    x = rng.standard_normal((1, 12, 20, 19), dtype=np.float32)
    flow = (rng.standard_normal((1, 12, 20, 2)) * 2.0).astype(np.float32)

    ours = np.asarray(warp_with_flow(jnp.asarray(x), jnp.asarray(flow)))

    gy = np.linspace(-1, 1, 12, dtype=np.float32)
    gx = np.linspace(-1, 1, 20, dtype=np.float32)
    gxx, gyy = np.meshgrid(gx, gy)
    ident = np.stack([gxx, gyy], -1)[None]
    sampler = np.clip(np.tanh(flow) + ident, -1.0, 1.0).astype(np.float32)
    ref = torch_grid_sample(x, sampler)
    # XLA's tanh is a fast polynomial approximation (~3e-5 off vs libm);
    # that coordinate jitter amplifies through the bilinear gather. The
    # grid_sample itself bit-matches (see the other tests).
    np.testing.assert_allclose(ours, ref, rtol=1e-2, atol=5e-3)
