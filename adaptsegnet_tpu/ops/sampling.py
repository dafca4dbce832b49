"""Bilinear grid sampling (torch-0.4 `F.grid_sample` semantics).

Used by the Warper path: the reference builds a [-1, 1] identity mesh, adds a
tanh-squashed 2-channel flow, clamps to [-1, 1], and `grid_sample`s the
upsampled logits (reference model/deeplab_multi.py:238-255). Torch 0.4's
grid_sample has align_corners=True behavior (the flag only appeared in 1.3)
and zero padding for out-of-range samples.

TPU-native formulation: the sample grid is data-dependent, so this is a true
gather. We flatten the spatial plane and use a single `take` along the fused
H*W axis with precomputed corner indices — four gathers + a lerp, all static
shapes, which XLA vectorizes well. The flow is bounded (tanh + clamp keeps
the grid inside [-1, 1]) so the zero-padding mask only fires on the border.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC `x` at `grid` (N, Ho, Wo, 2) of (gx, gy) in [-1, 1].

    Matches torch.nn.functional.grid_sample(input, grid) for torch 0.4
    (bilinear, zeros padding, align_corners=True unnormalization):
        ix = (gx + 1) / 2 * (W - 1),  iy = (gy + 1) / 2 * (H - 1).
    Out-of-range corner taps contribute zero (padding_mode='zeros').
    grid[..., 0] is x (width) and grid[..., 1] is y (height), torch order.
    """
    n, h, w, c = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0
    # Lerp weights before clamping (out-of-range handled by zero masks).
    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def tap(iy_f, ix_f, wy, wx):
        valid = (ix_f >= 0) & (ix_f <= w - 1) & (iy_f >= 0) & (iy_f <= h - 1)
        xi = jnp.clip(ix_f, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(iy_f, 0, h - 1).astype(jnp.int32)
        flat = yi * w + xi  # (N, Ho, Wo)
        # Gather along the fused spatial axis, batch-wise.
        src = x.reshape(n, h * w, c)
        vals = jnp.take_along_axis(
            src, flat.reshape(n, -1, 1), axis=1
        ).reshape(n, *flat.shape[1:], c)
        weight = (wy * wx * valid.astype(jnp.float32))[..., None]
        return vals.astype(jnp.float32) * weight

    out = (
        tap(iy0, ix0, wy0, wx0)
        + tap(iy0, ix1, wy0, wx1)
        + tap(iy1, ix0, wy1, wx0)
        + tap(iy1, ix1, wy1, wx1)
    )
    return out.astype(x.dtype)


def make_identity_grid(h: int, w: int) -> jnp.ndarray:
    """The reference's [-1, 1] identity mesh (Ho, Wo, 2) with (gx, gy) order.

    Equivalent to np.meshgrid(linspace(-1,1,W), linspace(-1,1,H)) stacked on
    the last axis (reference model/deeplab_multi.py:241-244).
    """
    gy = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    gx = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
    gxx, gyy = jnp.meshgrid(gx, gy)  # each (h, w)
    return jnp.stack([gxx, gyy], axis=-1)


def warp_with_flow(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp NHWC `x` by a raw 2-channel flow field (N, H, W, 2).

    Reference semantics (model/deeplab_multi.py:238-255): sampler =
    clamp(tanh(flow) + identity_grid, -1, 1), then bilinear grid_sample.
    The reference's loop over flow channel pairs only ever keeps the final
    pair; with the standard 2-channel Warper output this is a single warp.
    flow[..., 0] displaces x (width), flow[..., 1] displaces y (height).
    """
    n, h, w, _ = flow.shape
    grid = jnp.tanh(flow.astype(jnp.float32)) + make_identity_grid(h, w)[None]
    grid = jnp.clip(grid, -1.0, 1.0)
    return grid_sample_bilinear(x, grid)
