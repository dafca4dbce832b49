"""Fused align-corners-upsample + flow-warp as dense MXU contractions.

The reference's Warper path samples the UPSAMPLED logits with a flow-driven
grid_sample (model/deeplab_multi.py:188-192,238-255): logits (N,h,w,C) are
bilinearly upsampled (align_corners=True) to (H,W) and then warped by
sampler = clamp(tanh(flow) + identity_grid, -1, 1). Lowered naively on TPU
that warp is an arbitrary-index gather whose backward is a scatter-add —
measured 16 ms fwd / 187 ms bwd at (512x1024x19) on v5e, the slowest op of
the default (warper-on) training mode.

TPU-native formulation — no gather, no scatter, exact:
the composition warp(upsample(x)) has SEPARABLE per-output-pixel weights
over the LOW-RES grid. For output pixel p with hi-res sample position
(iy, ix) (from the flow), hi-res taps r_k = floor(i)+k, and the
align-corners scale s = (h-1)/(H-1):

    out[p, c] = sum_ly sum_lx VY[p, ly] * VX[p, lx] * x[ly, lx, c]
    VY[p, ly] = (1-wy)*hat(ry_0*s - ly) + wy*hat(ry_1*s - ly)
    hat(d)    = max(0, 1 - |d|)         (the bilinear tent weight)

because the upsample weight of hi-res row r w.r.t. lo-res row ly is exactly
hat(r*s - ly), and the y/x tap structure is an outer product. VY/VX have
<= 3 non-zeros but are kept DENSE over the lo-res axes (h ~ 64, w ~ 128),
trading ~2000x more FLOPs for zero gather/scatter — the MXU wins >40x.

Kernel shape (per block of `bp` output pixels; x pre-flattened to
x2[lx, ly*C + c], i.e. lanes run over (low-res ROW, channel) — the y axis
is the SHORTER spatial axis at these aspect ratios, so lanes = h*C is
~half of w*C and both the lane-weight expansion and the group reduction
shrink accordingly):

  t    = VX @ x2                 MXU, K = w      (bp, h*C)
  VYe  = VY @ E2                 MXU, K = h      per-lane y-weight; E2 is
                                 the 0/1 expansion kron(I_h, ones(1,C)) —
                                 evaluating the hats per-lane on the VPU
                                 costs more than this matmul, and an
                                 in-kernel broadcast+collapse reshape is an
                                 unsupported tpu.reshape when C is not
                                 lane-aligned
  out  = (t * VYe) @ S2          MXU, K = h*C    group-reduce over ly;
                                 S2 = kron(ones(h,1), I_C)
  d x2 = VX^T @ (VYe * (g @ S2^T))   the EXACT transpose — no scatter
  d flow: same contractions with hat-derivative weight rows, in a separate
          pallas_call so XLA drops it when the flow is a constant in the
          step (train/steps.py never optimizes the Warper).

Everything is f32-accumulated; inputs fed to the MXU in x.dtype (bf16
models keep bf16 operands).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 2048  # output pixels per grid step (fwd / d-x kernels), bf16 —
#                the (bp, h*C) t/vye intermediates are kept bf16 so this
#                fits VMEM; fewer, larger grid steps amortize the per-step
#                overhead that kept the kernel at ~23% of roofline
_BLOCK_F32 = 512  # f32 keeps t/vye f32 (~5 MB each at 1024) vs the 16 MB
#                   VMEM stack limit (advisor r2)
_BLOCK_FLOW = 256  # d-flow kernel keeps more (bp, h*C) f32 live -> smaller


# NOTE (do not retry): y-band windowing of the lo-res row taps does NOT
# work for this operator. The idea — split output rows into bands and
# window each band's reachable lo-res rows via the sampler clamp — only
# shrinks EDGE bands: tanh flow spans +-(H-1)/2 pixels, so a CENTER band
# reaches the entire image and its window is all hl rows (uniform window
# = hl => zero savings; non-uniform windows average ~0.75*hl => <=25%
# FLOP cut at the cost of per-band kernel shapes). Derived and
# unit-checked 2026-08-18 (win==64 of 64 at the training geometry,
# hl=64 hh=512 nb=8).


_BLOCK_PX = 1024  # pixel-lane kernels keep the (C*h, bp) t/tmat intermediates
#                   f32 (the ly-reduce accumulates on the VPU, so no MXU f32
#                   accumulator rescues a bf16 product); 1024 bounds the worst
#                   case of an unfused multiply+reduce at ~10 MB VMEM


def _env_pixel_lanes() -> bool:
    """DEFAULT since the r5 on-chip A/B: transposed 'pixel-lane' kernels.

    In-step bench.py --train source-only-warper: 26.55 ms vs 30.43 ms
    base (3-run medians 27.01/26.49/26.55, scripts/campaign_results.json
    2026-08-20) — a 13% step win, closing most of the 3-round-old warp
    roofline gap (ROADMAP gap 2). Set =0 to A/B the lane-over-channel
    family.

    Lanes run over OUTPUT PIXELS and sublanes over (c, ly) — channel-major,
    so each channel's hl-row group is tile-aligned (hl=64 at the training
    geometry is a multiple of both the 8- and 16-row tiles) and the
    (C, hl, bp) 3D views are layout-preserving. This removes ALL the
    padded MXU work of the default layout: the (t*vye)@S2 output dot
    (N=19 -> 128 lanes, 6.7x), the g@S2^T expansion (K=19, 6.7x) and both
    VY@E2 expansions (K=64, 2x) become VPU broadcast-multiplies + an
    aligned sublane reduce; only the K=wl tap contraction and the K=bp dx
    contraction remain on the MXU."""
    return os.environ.get("ADAPTSEG_WARP_PIXEL_LANES", "1") == "1"


def _env_lane_tile() -> bool:
    """Lane-tile dx path LOST its r4 on-chip A/B: in-step bench.py --train
    source-only-warper 35.44 ms vs 32.30 ms base (3-run medians,
    scripts/campaign_results.json 2026-08-19) — the pltpu.repeat lane tile
    moves the g-expansion from MXU to VPU and the VPU is the kernel's
    bottleneck, so it slows the whole dx pass (the recurring
    ops/conv3x3.py NOTE lesson: only in-step numbers flip lowerings).
    The lane_tile=True kernel variant stays for direct use/tests; the env
    gate is retired — default path always uses the expansion matmul."""
    return False


def _block(cdtype):
    return _BLOCK if cdtype == jnp.bfloat16 else _BLOCK_F32


def _hats(pos0, w1, iota, scale):
    """Weight row: (1-w)*hat(pos0*s - l) + w*hat((pos0+1)*s - l)."""
    h0 = jnp.maximum(0.0, 1.0 - jnp.abs(pos0 * scale - iota))
    h1 = jnp.maximum(0.0, 1.0 - jnp.abs((pos0 + 1.0) * scale - iota))
    return h0 * (1.0 - w1) + h1 * w1


def _dhats(pos0, iota, scale):
    """d(weight)/d(i) = hat at tap 1 minus hat at tap 0 (floor const a.e.)."""
    h0 = jnp.maximum(0.0, 1.0 - jnp.abs(pos0 * scale - iota))
    h1 = jnp.maximum(0.0, 1.0 - jnp.abs((pos0 + 1.0) * scale - iota))
    return h1 - h0


def _axis_weights(i_ref, nl, scale, bp):
    """Dense (bp, nl) tent weights + floor taps for one axis.

    Coordinates arrive as a (1, bp) lane row — (P, 1)-shaped coordinate
    arrays force XLA into catastrophic minor-dim-1 relayouts (measured
    ~7.5 ms/call of pure data movement at 512x1024) — and are transposed
    to a (bp, 1) column here, inside VMEM, where it costs ~nothing.
    """
    i = jnp.transpose(i_ref[:], (1, 0))  # (1, bp) -> (bp, 1) f32
    r0 = jnp.floor(i)
    # Mosaic iota must be integer-typed; cast to f32 for the hat weights.
    l = jax.lax.broadcasted_iota(jnp.int32, (bp, nl), 1).astype(jnp.float32)
    v = _hats(r0, i - r0, l, scale)
    return v, r0, l


def _expand_y(vy, e2_ref, cdtype, out_dtype=jnp.float32):
    """(bp, h) -> (bp, h*C) per-lane y-weights via the 0/1 E2 matmul.

    Mosaic requires 32-bit matmul accumulators; the bf16 path converts
    the result right at the dot (E2 is 0/1, so this rounds only the
    weight itself), halving the live (bp, h*C) footprint — which is what
    lets _BLOCK reach 2048."""
    return jnp.dot(vy.astype(cdtype), e2_ref[:],
                   preferred_element_type=jnp.float32).astype(out_dtype)


def _fwd_kernel(iy_ref, ix_ref, x_ref, e2_ref, s2_ref, o_ref,
                *, sy, sx, cdtype, planar):
    wl = x_ref.shape[1]
    if planar:
        c, bp = o_ref.shape[1:]
    else:
        bp, c = o_ref.shape[1:]
    hl = e2_ref.shape[0]
    vy, _, _ = _axis_weights(iy_ref, hl, sy, bp)
    vx, _, _ = _axis_weights(ix_ref, wl, sx, bp)
    # bf16 keeps the (bp, h*C) intermediates bf16 (t is an MXU f32-
    # accumulated sum rounded once; the f32 parity path keeps f32).
    t = jnp.dot(vx.astype(cdtype), x_ref[0],
                preferred_element_type=jnp.float32).astype(cdtype)
    vye = _expand_y(vy, e2_ref, cdtype, out_dtype=cdtype)
    out = jnp.dot(
        (t * vye).astype(cdtype), s2_ref[:],
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)
    # planar: emit (C, bp) channel planes — a VMEM transpose here is ~free
    # while the (N, P, C) c-minor HBM tensor pads every (8, 128) tile to
    # 128 lanes (6.7x traffic at C=19) for EVERY downstream consumer.
    o_ref[0] = jnp.transpose(out, (1, 0)) if planar else out


def _bwd_x_kernel(iy_ref, ix_ref, g_ref, e2_ref, s2_ref, dx_ref,
                  *, sy, sx, cdtype, lane_tile, planar):
    tnum = pl.program_id(1)
    wl = dx_ref.shape[1]
    if planar:
        c, bp = g_ref.shape[1:]
        g = jnp.transpose(g_ref[0], (1, 0))  # (C, bp) plane -> (bp, C)
    else:
        bp, c = g_ref.shape[1:]
        g = g_ref[0]
    hl = e2_ref.shape[0]
    vy, _, _ = _axis_weights(iy_ref, hl, sy, bp)
    vx, _, _ = _axis_weights(ix_ref, wl, sx, bp)
    vye = _expand_y(vy, e2_ref, cdtype, out_dtype=cdtype)
    if lane_tile:
        # (bp, C) -> (bp, h*C): lane tile on the VPU (g repeats verbatim
        # per lo-res row group) instead of the K=19 MXU dot below, which
        # runs at ~19/128 utilization.
        gexp = pltpu.repeat(g.astype(cdtype), hl, axis=1)
    else:
        # (bp, C) -> (bp, h*C) group expansion via g @ S2^T (MXU,
        # reshape-free; 0/1 rhs, so the cdtype result is exact up to g's
        # own rounding)
        gexp = jax.lax.dot_general(
            g.astype(cdtype), s2_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdtype)
    tmat = vye * gexp

    @pl.when(tnum == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    # contract the block axis: (w, bp) @ (bp, h*C)
    dx_ref[0] += jax.lax.dot_general(
        vx.astype(cdtype), tmat.astype(cdtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _bwd_flow_kernel(iy_ref, ix_ref, x_ref, e2_ref, s2_ref, g_ref,
                     diy_ref, dix_ref, *, sy, sx, cdtype, planar):
    wl = x_ref.shape[1]
    if planar:
        c, bp = g_ref.shape[1:]
        g = jnp.transpose(g_ref[0], (1, 0)).astype(jnp.float32)
    else:
        bp, c = g_ref.shape[1:]
        g = g_ref[0].astype(jnp.float32)
    hl = e2_ref.shape[0]
    vy, ry0, ly = _axis_weights(iy_ref, hl, sy, bp)
    vx, cx0, lx = _axis_weights(ix_ref, wl, sx, bp)
    x = x_ref[0]
    t = jnp.dot(vx.astype(cdtype), x, preferred_element_type=jnp.float32)

    # d/d iy: dVY/diy = hat1 - hat0 (the lerp-weight derivative; the hats
    # are const a.e.). The lane sum is taken per-channel first via S2 and
    # dotted with g row-wise — never materializing a (bp, h*C) g expansion
    # (which is what blew the 16M VMEM stack at larger blocks).
    dvye = _expand_y(_dhats(ry0, ly, sy), e2_ref, cdtype)
    t1 = jnp.dot((t * dvye).astype(cdtype), s2_ref[:],
                 preferred_element_type=jnp.float32)  # (bp, C)
    diy_ref[:] = jnp.transpose(
        jnp.sum(t1 * g, axis=1, keepdims=True), (1, 0)
    ).astype(diy_ref.dtype)

    dvx = _dhats(cx0, lx, sx)
    rp = jnp.dot(dvx.astype(cdtype), x, preferred_element_type=jnp.float32)
    vye = _expand_y(vy, e2_ref, cdtype)
    t2 = jnp.dot((rp * vye).astype(cdtype), s2_ref[:],
                 preferred_element_type=jnp.float32)
    dix_ref[:] = jnp.transpose(
        jnp.sum(t2 * g, axis=1, keepdims=True), (1, 0)
    ).astype(dix_ref.dtype)


def _axis_weights_T(i_ref, nl, scale, bp):
    """Transposed (nl, bp) tent weights: pixels stay on LANES.

    No coordinate transpose at all — the (1, bp) lane row broadcasts
    against a sublane iota, which is the cheapest of the three coordinate
    layouts (_axis_weights documents why (P, 1) columns are catastrophic)."""
    i = i_ref[:]  # (1, bp) f32
    r0 = jnp.floor(i)
    l = jax.lax.broadcasted_iota(jnp.int32, (nl, bp), 0).astype(jnp.float32)
    v = _hats(r0, i - r0, l, scale)
    return v, r0, l


def _fwd_kernel_px(iy_ref, ix_ref, x_ref, o_ref, *, sy, sx, hl, cdtype,
                   planar):
    """Pixel-lane forward: out[c, p] = sum_ly vy[ly, p] * t[(c, ly), p].

    t = x2p @ VX^T is the only MXU op (K = wl, full depth); the y-weighting
    and ly-reduction run on tile-aligned (C, hl, bp) views — no E2/S2
    matmuls, hence none of their 19-lane / 64-deep padding waste."""
    bp = o_ref.shape[-1] if planar else o_ref.shape[1]
    wl = x_ref.shape[2]
    c = x_ref.shape[1] // hl
    vy, _, _ = _axis_weights_T(iy_ref, hl, sy, bp)
    vx, _, _ = _axis_weights_T(ix_ref, wl, sx, bp)
    # (C*hl, wl) @ (wl, bp) — f32 accumulation on the MXU.
    t = jnp.dot(x_ref[0], vx.astype(cdtype),
                preferred_element_type=jnp.float32)
    out = jnp.sum(t.reshape(c, hl, bp) * vy.reshape(1, hl, bp), axis=1)
    o_ref[0] = (out if planar else jnp.transpose(out, (1, 0))
                ).astype(o_ref.dtype)


def _bwd_x_kernel_px(iy_ref, ix_ref, g_ref, dx_ref, *, sy, sx, hl, cdtype,
                     planar):
    """Pixel-lane dx: dx[(c,ly), lx] = sum_p vy[ly,p] g[c,p] vx[lx,p].

    tmat[(c,ly), p] = g[c,p]*vy[ly,p] is a pure VPU broadcast build (the
    default layout needs a K=19 MXU expansion for the same tensor); the
    block contraction over p happens lane-to-lane on the MXU."""
    tnum = pl.program_id(1)
    wl = dx_ref.shape[2]
    c = dx_ref.shape[1] // hl
    if planar:
        g = g_ref[0]  # (C, bp)
    else:
        g = jnp.transpose(g_ref[0], (1, 0))  # (bp, C) -> (C, bp)
    bp = g.shape[1]
    vy, _, _ = _axis_weights_T(iy_ref, hl, sy, bp)
    vx, _, _ = _axis_weights_T(ix_ref, wl, sx, bp)
    tmat = (g.reshape(c, 1, bp).astype(jnp.float32)
            * vy.reshape(1, hl, bp)).reshape(c * hl, bp)

    @pl.when(tnum == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    # (C*hl, bp) x (wl, bp) contracted over the lane (pixel) axis.
    dx_ref[0] += jax.lax.dot_general(
        tmat.astype(cdtype), vx.astype(cdtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _bwd_flow_kernel_px(iy_ref, ix_ref, x_ref, g_ref, diy_ref, dix_ref,
                        *, sy, sx, hl, cdtype, planar):
    """Pixel-lane d-flow: the two hat-derivative contractions with the
    same (C, hl, bp) reduce structure as the forward."""
    wl = x_ref.shape[2]
    c = x_ref.shape[1] // hl
    if planar:
        g = g_ref[0].astype(jnp.float32)  # (C, bp)
    else:
        g = jnp.transpose(g_ref[0], (1, 0)).astype(jnp.float32)
    bp = g.shape[1]
    vy, ry0, ly = _axis_weights_T(iy_ref, hl, sy, bp)
    vx, cx0, lx = _axis_weights_T(ix_ref, wl, sx, bp)
    x = x_ref[0]
    t = jnp.dot(x, vx.astype(cdtype), preferred_element_type=jnp.float32)
    dvy = _dhats(ry0, ly, sy)
    t1 = jnp.sum(t.reshape(c, hl, bp) * dvy.reshape(1, hl, bp), axis=1)
    diy_ref[:] = jnp.sum(t1 * g, axis=0, keepdims=True).astype(diy_ref.dtype)
    dvx = _dhats(cx0, lx, sx)
    rp = jnp.dot(x, dvx.astype(cdtype), preferred_element_type=jnp.float32)
    t2 = jnp.sum(rp.reshape(c, hl, bp) * vy.reshape(1, hl, bp), axis=1)
    dix_ref[:] = jnp.sum(t2 * g, axis=0, keepdims=True).astype(dix_ref.dtype)


def _prep(x, iy, ix, pixel_lanes=False):
    """Flatten x to x2[n, lx, ly*C+c] (default) or x2p[n, c*hl+ly, lx]
    (pixel-lane kernels), coords to lane-packed (N, P)."""
    n, hl, wl, c = x.shape
    _, hh, wh = iy.shape
    if pixel_lanes:
        xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c * hl, wl)
    else:
        xf = jnp.transpose(x, (0, 2, 1, 3)).reshape(n, wl, hl * c)
    p = hh * wh
    sy = (hl - 1) / (hh - 1) if hh > 1 else 0.0
    sx = (wl - 1) / (wh - 1) if wh > 1 else 0.0
    iyf = iy.reshape(n, p).astype(jnp.float32)
    ixf = ix.reshape(n, p).astype(jnp.float32)
    return xf, iyf, ixf, (n, hl, wl, c, hh, wh, p, sy, sx)


def _pad_coords(iyf, ixf, p, bp):
    pad = (-p) % bp
    if pad:
        iyf = jnp.pad(iyf, ((0, 0), (0, pad)))
        ixf = jnp.pad(ixf, ((0, 0), (0, pad)))
    return iyf, ixf, pad


def _e2matrix(hl, c, dtype):
    """(h, h*C) per-lane y-weight expansion: E2[ly, ly'*C+c] = [ly==ly']."""
    e = np.kron(np.eye(hl, dtype=np.float32), np.ones((1, c), np.float32))
    return jnp.asarray(e, dtype)


def _s2matrix(hl, c, dtype):
    """(h*C, C) lane-group reduction over ly: S2 = kron(ones(h,1), I_C)."""
    s = np.kron(np.ones((hl, 1), np.float32), np.eye(c, dtype=np.float32))
    return jnp.asarray(s, dtype)


def _cdtype(dtype):
    return jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _sample_upsampled(x, iy, ix, interpret, lane_tile=False,
                      planar_out=False, pixel_lanes=False):
    """out[n, y, x, c] = bilinear-upsample(x)[n] sampled at (iy, ix).

    iy/ix are hi-res pixel coordinates (N, H, W), assumed in-range
    [0, H-1] x [0, W-1] (the warp wrapper's clamp guarantees this).
    planar_out=True returns (n, c, y, x) channel planes instead (see
    _fwd_kernel: same math, the kernel just stores transposed blocks).
    pixel_lanes=True runs the transposed kernel family (_fwd_kernel_px
    etc.) — same operator, lanes over pixels instead of (ly, c).
    """
    out, _ = _sample_fwd(x, iy, ix, interpret, lane_tile, planar_out,
                         pixel_lanes)
    return out


def _sample_fwd_px(x, iy, ix, interpret, planar_out):
    """Pixel-lane forward pallas_call (see _env_pixel_lanes)."""
    xp, iyf, ixf, geo = _prep(x, iy, ix, pixel_lanes=True)
    n, hl, wl, c, hh, wh, p, sy, sx = geo
    cdtype = _cdtype(x.dtype)
    bp = _BLOCK_PX
    iyp, ixp, pad = _pad_coords(iyf, ixf, p, bp)
    nt = (p + pad) // bp
    if planar_out:
        out_specs = pl.BlockSpec((1, c, bp), lambda i, t: (i, 0, t),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, c, p + pad), x.dtype)
    else:
        out_specs = pl.BlockSpec((1, bp, c), lambda i, t: (i, t, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, p + pad, c), x.dtype)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_px, sy=sy, sx=sx, hl=hl,
                          cdtype=cdtype, planar=planar_out),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c * hl, wl), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (p + pad) * (wl + 2) * hl * c,
            bytes_accessed=4 * n * (p + pad) * (2 + c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(iyp, ixp, xp.astype(cdtype))
    if planar_out:
        out = out[:, :, :p].reshape(n, c, hh, wh)
    else:
        out = out[:, :p, :].reshape(n, hh, wh, c)
    return out, (x, iy, ix)


def _bwd_x_px(iyf, ixf, gf, geo, cdtype, interpret, planar):
    """Pixel-lane dx pallas_call: grid (n, nt), block-accumulated."""
    n, hl, wl, c, hh, wh, p, sy, sx = geo
    bp = _BLOCK_PX
    iyp, ixp, pad = _pad_coords(iyf, ixf, p, bp)
    gp, gspec = _pad_g_and_spec(gf, pad, c, bp, planar)
    nt = (p + pad) // bp
    dxp = pl.pallas_call(
        functools.partial(_bwd_x_kernel_px, sy=sy, sx=sx, hl=hl,
                          cdtype=cdtype, planar=planar),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            gspec,
        ],
        out_specs=pl.BlockSpec((1, c * hl, wl), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c * hl, wl), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (p + pad) * (wl + 2) * hl * c,
            bytes_accessed=4 * n * (p + pad) * (2 + c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(iyp, ixp, gp)
    # (n, c*hl, wl) -> (n, hl, wl, c)
    return dxp.reshape(n, c, hl, wl).transpose(0, 2, 3, 1)


def _sample_bwd_px(interpret, planar_out, res, g):
    """Pixel-lane backward: dx + d-flow pallas_calls."""
    x, iy, ix = res
    xp, iyf, ixf, geo = _prep(x, iy, ix, pixel_lanes=True)
    n, hl, wl, c, hh, wh, p, sy, sx = geo
    cdtype = _cdtype(x.dtype)
    gf = g.reshape(n, c, p) if planar_out else g.reshape(n, p, c)

    dx = _bwd_x_px(iyf, ixf, gf, geo, cdtype, interpret,
                   planar_out).astype(x.dtype)

    bp = _BLOCK_FLOW
    iyp, ixp, pad = _pad_coords(iyf, ixf, p, bp)
    gp, gspec = _pad_g_and_spec(gf, pad, c, bp, planar_out)
    nb = (p + pad) // bp
    diy, dix = pl.pallas_call(
        functools.partial(_bwd_flow_kernel_px, sy=sy, sx=sx, hl=hl,
                          cdtype=cdtype, planar=planar_out),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c * hl, wl), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            gspec,
        ],
        out_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p + pad), jnp.float32),
            jax.ShapeDtypeStruct((n, p + pad), jnp.float32),
        ],
        interpret=interpret,
    )(iyp, ixp, xp.astype(cdtype), gp)
    diy = diy[:, :p].reshape(n, hh, wh)
    dix = dix[:, :p].reshape(n, hh, wh)
    return dx, diy, dix


def _sample_fwd(x, iy, ix, interpret, lane_tile=False, planar_out=False,
                pixel_lanes=False):
    if pixel_lanes:
        return _sample_fwd_px(x, iy, ix, interpret, planar_out)
    xf, iyf, ixf, geo = _prep(x, iy, ix)
    n, hl, wl, c, hh, wh, p, sy, sx = geo
    cdtype = _cdtype(x.dtype)
    bp = _block(cdtype)
    iyp, ixp, pad = _pad_coords(iyf, ixf, p, bp)
    nt = (p + pad) // bp
    if planar_out:
        out_specs = pl.BlockSpec((1, c, bp), lambda i, t: (i, 0, t),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, c, p + pad), x.dtype)
    else:
        out_specs = pl.BlockSpec((1, bp, c), lambda i, t: (i, t, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, p + pad, c), x.dtype)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, sy=sy, sx=sx, cdtype=cdtype,
                          planar=planar_out),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wl, hl * c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hl, hl * c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hl * c, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (p + pad) * (wl + hl + c) * hl * c,
            bytes_accessed=4 * n * (p + pad) * (2 + c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(iyp, ixp, xf.astype(cdtype), _e2matrix(hl, c, cdtype),
      _s2matrix(hl, c, cdtype))
    if planar_out:
        out = out[:, :, :p].reshape(n, c, hh, wh)
    else:
        out = out[:, :p, :].reshape(n, hh, wh, c)
    return out, (x, iy, ix)


def _sample_bwd(interpret, lane_tile, planar_out, pixel_lanes, res, g):
    if pixel_lanes:
        return _sample_bwd_px(interpret, planar_out, res, g)
    x, iy, ix = res
    xf, iyf, ixf, geo = _prep(x, iy, ix)
    n, hl, wl, c, hh, wh, p, sy, sx = geo
    cdtype = _cdtype(x.dtype)
    gf = g.reshape(n, c, p) if planar_out else g.reshape(n, p, c)

    dx = _bwd_x(iyf, ixf, gf, geo, cdtype, interpret,
                lane_tile, planar_out).astype(x.dtype)

    bp = _BLOCK_FLOW
    iyp, ixp, pad = _pad_coords(iyf, ixf, p, bp)
    gp, gspec = _pad_g_and_spec(gf, pad, c, bp, planar_out)
    nb = (p + pad) // bp
    diy, dix = pl.pallas_call(
        functools.partial(_bwd_flow_kernel, sy=sy, sx=sx, cdtype=cdtype,
                          planar=planar_out),
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wl, hl * c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hl, hl * c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hl * c, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            gspec,
        ],
        out_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p + pad), jnp.float32),
            jax.ShapeDtypeStruct((n, p + pad), jnp.float32),
        ],
        interpret=interpret,
    )(iyp, ixp, xf.astype(cdtype), _e2matrix(hl, c, cdtype),
      _s2matrix(hl, c, cdtype), gp)
    diy = diy[:, :p].reshape(n, hh, wh)
    dix = dix[:, :p].reshape(n, hh, wh)
    return dx, diy, dix


def _pad_g_and_spec(gf, pad, c, bp, planar):
    """Pixel-pad the cotangent and pick its BlockSpec for either layout:
    planar (n, c, p) blocks tile the minor pixel axis; dense (n, p, c)
    blocks tile the major one. Shared by _sample_bwd and _bwd_x so the two
    backward kernels can never read differently-padded g tensors."""
    if pad:
        gpad = ((0, 0), (0, 0), (0, pad)) if planar else \
            ((0, 0), (0, pad), (0, 0))
        gf = jnp.pad(gf, gpad)
    gspec = (
        pl.BlockSpec((1, c, bp), lambda i, t: (i, 0, t),
                     memory_space=pltpu.VMEM)
        if planar else
        pl.BlockSpec((1, bp, c), lambda i, t: (i, t, 0),
                     memory_space=pltpu.VMEM)
    )
    return gf, gspec


def _bwd_x(iyf, ixf, gf, geo, cdtype, interpret, lane_tile=False,
           planar=False):
    """Per-batch dx: grid (n, nt); each batch's block accumulates over nt."""
    n, hl, wl, c, hh, wh, p, sy, sx = geo
    bp = _block(cdtype)
    iyp, ixp, pad = _pad_coords(iyf, ixf, p, bp)
    gp, gspec = _pad_g_and_spec(gf, pad, c, bp, planar)
    nt = (p + pad) // bp
    dxf = pl.pallas_call(
        functools.partial(_bwd_x_kernel, sy=sy, sx=sx, cdtype=cdtype,
                          lane_tile=lane_tile, planar=planar),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda i, t: (i, t),
                         memory_space=pltpu.VMEM),
            gspec,
            pl.BlockSpec((hl, hl * c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hl * c, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wl, hl * c), lambda i, t: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, wl, hl * c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (p + pad) * (wl + hl + c) * hl * c,
            bytes_accessed=4 * n * (p + pad) * (2 + c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(iyp, ixp, gp, _e2matrix(hl, c, cdtype), _s2matrix(hl, c, cdtype))
    # (n, wl, hl*c) -> (n, hl, wl, c)
    return dxf.reshape(n, wl, hl, c).transpose(0, 2, 1, 3)


_sample_upsampled.defvjp(_sample_fwd, _sample_bwd)


def _coords_from_flow(flow, out_hw, planar=False):
    """warp_with_flow's sampler: clamp(tanh(flow) + identity, -1, 1) in
    hi-res pixel units (reference model/deeplab_multi.py:238-255).

    Layout note: NHW2 flow (planar=False) is fine for standalone arrays,
    but when it is a 2-channel conv OUTPUT its TPU layout is channel-minor
    ({3,0,2,1:T(2,128)}) and every consumer — transpose, slice, or fused
    elementwise — pays ~10 ms/step of strided relayout at (512, 1024).
    That cost cannot be repaired downstream (an optimization_barrier'd
    planar transpose just moves the same 10 ms into the copy); the
    producer has to emit planes. `planar=True` takes flow as (N, 2, H, W)
    — the Warper's `planar_flow=True` head emits it directly — and
    everything here runs on lane-packed (N, H, W) planes.
    Differentiation stays in XLA: the custom-VJP boundary is at the
    (x, iy, ix) sampler, so clip/tanh gradients match the unfused
    composition exactly.
    """
    hh, wh = out_hw
    gy = jnp.linspace(-1.0, 1.0, hh, dtype=jnp.float32)
    gx = jnp.linspace(-1.0, 1.0, wh, dtype=jnp.float32)
    f = jnp.tanh(flow.astype(jnp.float32))
    fx, fy = (f[:, 0], f[:, 1]) if planar else (f[..., 0], f[..., 1])
    sgx = jnp.clip(fx + gx[None, None, :], -1.0, 1.0)
    sgy = jnp.clip(fy + gy[None, :, None], -1.0, 1.0)
    ix = (sgx + 1.0) * 0.5 * (wh - 1)
    iy = (sgy + 1.0) * 0.5 * (hh - 1)
    return iy, ix


def upsample_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    out_hw: tuple[int, int] | None = None,
    interpret: bool | None = None,
    planar: bool = False,
    lane_tile: bool | None = None,
    planar_out: bool = False,
    pixel_lanes: bool | None = None,
) -> jnp.ndarray:
    """warp_with_flow(upsample_logits(x, out_hw), flow), fused and exact.

    x: (N, h, w, C) low-res logits; flow: (N, H, W, 2) raw flow field —
    or (N, 2, H, W) channel planes with planar=True (the layout the
    Warper's planar_flow head emits; see _coords_from_flow) —
    (tanh + identity-grid + clamp applied here, matching
    ops.sampling.warp_with_flow / reference model/deeplab_multi.py:238-255).
    Returns (N, H, W, C) in x.dtype. out_hw defaults to flow's (H, W).

    On TPU this runs the MXU contraction kernels above (custom VJP: exact
    transpose for d x, hat-derivative contraction for d flow). On other
    backends it falls back to the unfused XLA composition — same math,
    different summation order (float-tolerance equivalent).

    `lane_tile` defaults to False (it lost its in-step A/B — see
    _env_lane_tile's NOTE); pass lane_tile=True explicitly in tests.

    `planar_out=True` returns (N, C, H, W) channel planes: same values,
    but the kernels store/load transposed blocks so no (N, H, W, 19)
    c-minor tensor (whose HBM tiles pad 19 -> 128 lanes) ever exists —
    for consumers that can work on planes (ops.losses.
    cross_entropy_2d_planar).

    `pixel_lanes=True` (the DEFAULT since the r5 on-chip A/B, 26.55 vs
    30.43 ms in-step — ADAPTSEG_WARP_PIXEL_LANES=0 opts out) runs the
    transposed kernel family: lanes over output pixels, sublanes over
    (c, ly), which turns every padded E2/S2 expansion matmul into
    tile-aligned VPU broadcast+reduce work.
    """
    if out_hw is None:
        out_hw = (
            (flow.shape[2], flow.shape[3]) if planar
            else (flow.shape[1], flow.shape[2])
        )
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None and not on_tpu:
        from adaptsegnet_tpu.ops.resize import upsample_logits
        from adaptsegnet_tpu.ops.sampling import warp_with_flow

        if planar:
            flow = jnp.transpose(flow, (0, 2, 3, 1))
        exact = x.dtype == jnp.float32
        out = warp_with_flow(upsample_logits(x, out_hw, exact=exact), flow)
        return jnp.transpose(out, (0, 3, 1, 2)) if planar_out else out
    if lane_tile is None:
        lane_tile = _env_lane_tile()
    if pixel_lanes is None:
        pixel_lanes = _env_pixel_lanes()
    iy, ix = _coords_from_flow(flow, out_hw, planar=planar)
    return _sample_upsampled(x, iy, ix, bool(interpret), bool(lane_tile),
                             bool(planar_out), bool(pixel_lanes))
