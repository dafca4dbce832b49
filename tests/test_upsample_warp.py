"""Golden tests: fused upsample+warp kernel vs torch interpolate+grid_sample.

The kernel computes warp_with_flow(upsample_logits(x, HW), flow) as dense
lo-res contractions (ops/pallas/upsample_warp.py). Torch reference:
F.interpolate(align_corners=True) then F.grid_sample over the sampler
clamp(tanh(flow) + identity, -1, 1) — the reference Warper recipe
(model/deeplab_multi.py:238-255).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.pallas.upsample_warp import upsample_warp


def torch_upsample_warp(x_nhwc, flow_nhw2, out_hw):
    x = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)
    x = x.requires_grad_(True)
    flow = torch.from_numpy(np.asarray(flow_nhw2, np.float32))
    flow = flow.requires_grad_(True)
    hh, wh = out_hw
    up = F.interpolate(x, size=(hh, wh), mode="bilinear", align_corners=True)
    gy, gx = torch.meshgrid(
        torch.linspace(-1, 1, hh), torch.linspace(-1, 1, wh), indexing="ij"
    )
    ident = torch.stack([gx, gy], dim=-1)[None]
    sampler = torch.clamp(torch.tanh(flow) + ident, -1.0, 1.0)
    out = F.grid_sample(up, sampler, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return x, flow, out.permute(0, 2, 3, 1)


def _rand(rng, shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


@pytest.mark.parametrize("n,hl,wl,c,hh,wh", [
    (1, 6, 8, 5, 24, 32),
    (2, 8, 16, 19, 32, 64),
    (1, 5, 6, 3, 20, 30),   # P=600 exercises the block-padding path
])
def test_forward_matches_torch(rng, n, hl, wl, c, hh, wh):
    x = _rand(rng, (n, hl, wl, c))
    flow = _rand(rng, (n, hh, wh, 2), 0.5)
    _, _, ref = torch_upsample_warp(x, flow, (hh, wh))
    got = np.asarray(upsample_warp(jnp.asarray(x), jnp.asarray(flow),
                                   interpret=True))
    np.testing.assert_allclose(got, ref.detach().numpy(), atol=2e-5, rtol=1e-5)


def test_gradients_match_torch(rng):
    n, hl, wl, c, hh, wh = 1, 6, 8, 4, 24, 32
    x = _rand(rng, (n, hl, wl, c))
    flow = _rand(rng, (n, hh, wh, 2), 0.5)
    g = _rand(rng, (n, hh, wh, c))

    tx, tflow, tout = torch_upsample_warp(x, flow, (hh, wh))
    tout.backward(torch.from_numpy(g).permute(0, 3, 1, 2).permute(0, 2, 3, 1))
    ref_dx = tx.grad.permute(0, 2, 3, 1).numpy()
    ref_dflow = tflow.grad.numpy()

    def loss(xj, fj):
        return jnp.vdot(upsample_warp(xj, fj, interpret=True),
                        jnp.asarray(g))

    dx, dflow = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x),
                                               jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(dx), ref_dx, atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dflow), ref_dflow, atol=3e-3,
                               rtol=1e-3)


def test_matches_inrepo_xla_composition(rng):
    """The CPU fallback (upsample_logits + warp_with_flow) and the kernel
    agree — they are the same operator in different summation orders."""
    from adaptsegnet_tpu.ops.resize import upsample_logits
    from adaptsegnet_tpu.ops.sampling import warp_with_flow

    n, hl, wl, c, hh, wh = 1, 8, 16, 7, 32, 64
    x = jnp.asarray(_rand(rng, (n, hl, wl, c)))
    flow = jnp.asarray(_rand(rng, (n, hh, wh, 2), 0.5))
    ref = warp_with_flow(upsample_logits(x, (hh, wh)), flow)
    got = upsample_warp(x, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    # and the dispatcher's non-TPU path IS that composition
    disp = upsample_warp(x, flow)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref), atol=1e-6)


def test_planar_flow_layout_equivalent(rng):
    """planar=True consumes (N, 2, H, W) flow planes — same result as the
    NHW2 layout, on both the kernel and the fallback dispatch paths."""
    n, hl, wl, c, hh, wh = 1, 6, 8, 4, 24, 32
    x = jnp.asarray(_rand(rng, (n, hl, wl, c)))
    flow = jnp.asarray(_rand(rng, (n, hh, wh, 2), 0.5))
    fpl = jnp.transpose(flow, (0, 3, 1, 2))
    ref = upsample_warp(x, flow, interpret=True)
    got = upsample_warp(x, fpl, interpret=True, planar=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    # fallback dispatch (non-TPU backend, interpret=None)
    ref2 = upsample_warp(x, flow)
    got2 = upsample_warp(x, fpl, planar=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=1e-6)


def test_lane_tile_matches_matmul_expansion(rng):
    """The opt-in pltpu.repeat g-expansion in the d-x kernel == the S2^T
    matmul expansion, values and grads (ADAPTSEG_WARP_LANE_TILE gate)."""
    n, hl, wl, c, hh, wh = 1, 8, 12, 5, 32, 48
    x = jnp.asarray(_rand(rng, (n, hl, wl, c)))
    flow = jnp.asarray(_rand(rng, (n, hh, wh, 2), 0.5))
    g = jnp.asarray(_rand(rng, (n, hh, wh, c)))

    def loss(xj, fj, **kw):
        return jnp.vdot(upsample_warp(xj, fj, interpret=True, **kw), g)

    ref = upsample_warp(x, flow, interpret=True)
    got = upsample_warp(x, flow, interpret=True, lane_tile=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    ref_dx, ref_df = jax.grad(loss, argnums=(0, 1))(x, flow)
    dx, df = jax.grad(
        lambda a, b: loss(a, b, lane_tile=True), argnums=(0, 1)
    )(x, flow)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(df), np.asarray(ref_df), atol=1e-6)


def test_planar_out_matches_dense(rng):
    """planar_out=True == transpose(dense): forward values AND both
    gradients through the transposed-block kernel paths."""
    n, hl, wl, c, hh, wh = 1, 6, 8, 5, 24, 32
    x = jnp.asarray(_rand(rng, (n, hl, wl, c)))
    flow = jnp.asarray(_rand(rng, (n, hh, wh, 2), 0.5))
    g = jnp.asarray(_rand(rng, (n, hh, wh, c)))

    ref = upsample_warp(x, flow, interpret=True)
    got = upsample_warp(x, flow, interpret=True, planar_out=True)
    assert got.shape == (n, c, hh, wh)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref).transpose(0, 3, 1, 2),
                               atol=1e-6, rtol=1e-6)

    def loss(xj, fj, planar_out):
        out = upsample_warp(xj, fj, interpret=True, planar_out=planar_out)
        gp = jnp.transpose(g, (0, 3, 1, 2)) if planar_out else g
        return jnp.vdot(out, gp)

    dx_r, df_r = jax.grad(loss, argnums=(0, 1))(x, flow, False)
    dx_p, df_p = jax.grad(loss, argnums=(0, 1))(x, flow, True)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_r),
                               atol=1e-5, rtol=1e-5)

    # CPU fallback dispatch (interpret=None on a non-TPU backend)
    fb = upsample_warp(x, flow, planar_out=True)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(got),
                               atol=2e-5, rtol=1e-5)


def test_planar_out_with_lane_tile(rng):
    """lane_tile x planar_out combination (the campaign's ALL-gates arm):
    the d-x kernel's pltpu.repeat expansion consumes the TRANSPOSED planar
    cotangent — values and both grads must still match dense."""
    n, hl, wl, c, hh, wh = 1, 6, 8, 5, 24, 32
    x = jnp.asarray(_rand(rng, (n, hl, wl, c)))
    flow = jnp.asarray(_rand(rng, (n, hh, wh, 2), 0.5))
    g = jnp.asarray(_rand(rng, (n, hh, wh, c)))

    def loss(xj, fj, **kw):
        out = upsample_warp(xj, fj, interpret=True, **kw)
        gp = jnp.transpose(g, (0, 3, 1, 2)) if kw.get("planar_out") else g
        return jnp.vdot(out, gp)

    ref = upsample_warp(x, flow, interpret=True)
    got = upsample_warp(x, flow, interpret=True, planar_out=True,
                        lane_tile=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref).transpose(0, 3, 1, 2),
                               atol=1e-6, rtol=1e-6)
    dx_r, df_r = jax.grad(loss, argnums=(0, 1))(x, flow)
    dx_p, df_p = jax.grad(
        lambda a, b: loss(a, b, planar_out=True, lane_tile=True),
        argnums=(0, 1),
    )(x, flow)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_r),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("planar_out", [False, True])
def test_pixel_lanes_matches_default(rng, planar_out):
    """The transposed pixel-lane kernel family (ADAPTSEG_WARP_PIXEL_LANES)
    == the default layout: forward values and both gradients, dense and
    planar output, including a block-padding geometry."""
    n, hl, wl, c, hh, wh = 2, 8, 16, 5, 32, 64
    x = jnp.asarray(_rand(rng, (n, hl, wl, c)))
    flow = jnp.asarray(_rand(rng, (n, hh, wh, 2), 0.5))
    g = jnp.asarray(_rand(rng, (n, hh, wh, c)))

    def loss(xj, fj, **kw):
        out = upsample_warp(xj, fj, interpret=True, planar_out=planar_out,
                            **kw)
        gp = jnp.transpose(g, (0, 3, 1, 2)) if planar_out else g
        return jnp.vdot(out, gp)

    ref = upsample_warp(x, flow, interpret=True, planar_out=planar_out)
    got = upsample_warp(x, flow, interpret=True, planar_out=planar_out,
                        pixel_lanes=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    dx_r, df_r = jax.grad(loss, argnums=(0, 1))(x, flow)
    dx_p, df_p = jax.grad(
        lambda a, b: loss(a, b, pixel_lanes=True), argnums=(0, 1)
    )(x, flow)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               atol=1e-5, rtol=1e-5)
    # df sums the per-tap products in a different order (VPU sublane
    # reduce vs MXU dot) — same operator, f32-rounding-level drift only.
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_r),
                               atol=1e-3, rtol=1e-4)


def test_pixel_lanes_block_padding(rng):
    """P=600 (not a multiple of _BLOCK_PX) exercises the pad path of all
    three pixel-lane kernels against torch."""
    n, hl, wl, c, hh, wh = 1, 5, 6, 3, 20, 30
    x = _rand(rng, (n, hl, wl, c))
    flow = _rand(rng, (n, hh, wh, 2), 0.5)
    _, _, ref = torch_upsample_warp(x, flow, (hh, wh))
    got = upsample_warp(jnp.asarray(x), jnp.asarray(flow), interpret=True,
                        pixel_lanes=True)
    np.testing.assert_allclose(np.asarray(got), ref.detach().numpy(),
                               atol=2e-5, rtol=1e-5)


def test_bf16_smoke(rng):
    n, hl, wl, c, hh, wh = 1, 6, 8, 4, 24, 32
    x = jnp.asarray(_rand(rng, (n, hl, wl, c)), jnp.bfloat16)
    flow = jnp.asarray(_rand(rng, (n, hh, wh, 2), 0.5))
    out = upsample_warp(x, flow, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(
        upsample_warp(x.astype(jnp.float32), flow, interpret=True)
    )
    np.testing.assert_allclose(np.asarray(out).astype(np.float32), ref,
                               atol=0.05, rtol=0.05)
