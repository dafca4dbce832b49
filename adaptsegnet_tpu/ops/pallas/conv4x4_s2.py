"""4x4 / stride-2 / pad-1 conv as Pallas MXU kernels with in-VMEM s2d.

The discriminator's conv2..conv4 (reference model/discriminator.py:11-13)
run through the XLA space-to-depth + matmul lowering (ops/conv4x4.py):
correct math, but the s2d shuffle materializes in HBM — profiled at
~0.5-0.6 ms per application fwd and the same again in its autodiff
transpose, across six discriminator applications per multi-level step.
Every slice-based XLA alternative LOST in-step (ops/conv4x4.py NOTEs:
strided taps, row-parity s2d, channel padding) because XLA materializes
shifted HBM copies and its transpose of strided slices is weak.

Here the space-to-depth happens IN VMEM, where shifts are register
traffic, with custom kernels for all three directions (the proven recipe
of ops/pallas/conv3x3_dil.py, which runs at ~98% of MXU roofline):

  fwd:   build B(u)[j, (r, s, c)] = x_pad[2u + r, 2(j) + s, c] per R-row
         block — row-pair split is a MAJOR-dim slice, the (W, C) ->
         (W/2, 2C) col-pair flatten is contiguous, and the r-concat is
         lane-aligned (2C % 128 == 0) — then 4 taps (a, b) each one
         (R*Wo, 4C) @ (4C, Cout) MXU matmul. Same identity as
         ops/conv4x4.py:9-13.
  wgrad: same B taps, contracted the other way: (4C, R*Wo) @ (R*Wo, Cout)
         accumulated across the grid into a (16C, Cout) block that XLA
         reorders back to HWIO.
  dgrad: dx emitted as two row-parity, col-paired planes (py in {0, 1}),
         each the sum of six (M, Cout) @ (Cout, 2C) matmuls against
         kernel-slice matrices assembled in XLA; the planes interleave
         back to (H, W, C) with two contiguous reshapes and one cheap
         major-dim stack.

bf16 path only; the f32 parity path keeps the XLA lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_r(ho: int) -> int:
    # R = 8 keeps every kernel's VMEM residency (streams + B + taps +
    # accumulator + weight block) inside the 16 MB scoped limit at the
    # largest discriminator shape (C=256 -> 512); R = 16 overflowed there.
    for r in (8, 4, 2):
        if ho % r == 0:
            return r
    return 1


def supported(x: jnp.ndarray, cout: int) -> bool:
    n, h, w, c = x.shape
    if not (h % 2 == 0 and w % 2 == 0):
        return False
    r = _pick_r(h // 2)
    return (
        x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        # _build_b's in-kernel concat of two (.., 2C) operands along the
        # lane axis needs 2C lane-aligned (c=32 would pass a 4C check but
        # hand Mosaic a 64-lane concat).
        and (2 * c) % 128 == 0
        and cout % 128 == 0
        and r >= 2
    )


# ---------------------------------------------------------------- forward


def _build_b(s0, s1, r, c):
    """B[u][j, rr*2C + s*C + c] = window[2u + rr, pair j member s, c].

    s0/s1 are COL-PAIRED row slabs (2R, Wp/2, 2C) — the (W, C) ->
    (W/2, 2C) flatten happens in XLA (contiguous there; in-kernel it is an
    unsupported Mosaic shape cast when C is not lane-aligned). Here only
    major-dim row splits and a lane-aligned (2C % 128 == 0) concat remain.
    """
    p0 = s0.reshape(r, 2, s0.shape[1], 2 * c)
    p1 = s1.reshape(r, 2, s1.shape[1], 2 * c)
    halves = []
    for rr in (0, 1):
        halves.append(jnp.concatenate([p0[:, rr], p1[:1, rr]], axis=0))
    return jnp.concatenate(halves, axis=-1)  # (R+1, Wp/2, 4C)


def _fwd_kernel(s0_ref, s1_ref, k_ref, b_ref, o_ref, *, r, w, cin, cout):
    wo = w // 2
    bb = _build_b(s0_ref[0], s1_ref[0], r, cin)
    acc = None
    for a in (0, 1):
        for b in (0, 1):
            tap = bb[a : a + r, b : b + wo].reshape(r * wo, 4 * cin)
            kblk = k_ref[(2 * a + b) * 4 * cin : (2 * a + b + 1) * 4 * cin]
            y = jnp.dot(tap, kblk, preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(r, wo, cout).astype(o_ref.dtype)


def _wprime_mat(kernel):
    """(4, 4, C, Cout) -> (16C, Cout), row blocks (a, b) x (r, s, c)."""
    c, cout = kernel.shape[2], kernel.shape[3]
    wk = kernel.reshape(2, 2, 2, 2, c, cout)  # (a, r, b, s, c, o)
    wk = wk.transpose(0, 2, 1, 3, 4, 5)       # (a, b, r, s, c, o)
    return wk.reshape(16 * c, cout)


def _pad_streams(x, r):
    """Pad rows 1 top + (2R - 1) bottom (total H + 2R, divisible by the 2R
    stream block so the last block's (i+1) stream exists; the extra zero
    rows are never multiplied into real outputs), cols 1/1 — then col-pair
    flatten (N, Hp, Wp, C) -> (N, Hp, Wp/2, 2C), contiguous in XLA."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 2 * r - 1), (1, 1), (0, 0)))
    return xp.reshape(n, h + 2 * r, (w + 2) // 2, 2 * c)


def _fwd_impl(x, kernel, bias, interpret=False):
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    ho, wo = h // 2, w // 2
    r = _pick_r(ho)
    wp2 = (w + 2) // 2
    xp = _pad_streams(x, r)
    kf = _wprime_mat(kernel.astype(x.dtype))
    b = (jnp.zeros((cout,), jnp.float32) if bias is None
         else bias.astype(jnp.float32)).reshape(1, cout)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, r=r, w=w, cin=cin, cout=cout),
        grid=(n, ho // r),
        in_specs=[
            pl.BlockSpec((1, 2 * r, wp2, 2 * cin), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * r, wp2, 2 * cin),
                         lambda i, t: (i, t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * cin, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, wo, cout), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * 16 * cin * cout,
            bytes_accessed=2 * n * h * w * cin + 2 * n * ho * wo * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, kf, b)
    return out


# ---------------------------------------------------------------- wgrad


def _wgrad_kernel(s0_ref, s1_ref, dy_ref, dk_ref, *, a, b, r, w, cin, cout):
    """One (a, b) tap: dk_ab = tap^T @ dy, accumulated across the grid
    into the block-invariant (4C, Cout) output."""
    wo = w // 2
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    bb = _build_b(s0_ref[0], s1_ref[0], r, cin)
    dy = dy_ref[0].reshape(r * wo, cout)
    tap = bb[a : a + r, b : b + wo].reshape(r * wo, 4 * cin)
    g = jax.lax.dot_general(
        tap, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4C, Cout)

    @pl.when(step == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    dk_ref[:] += g


def _wgrad_impl(x, dy, cout, interpret=False):
    n, h, w, cin = x.shape
    ho, wo = h // 2, w // 2
    r = _pick_r(ho)
    wp2 = (w + 2) // 2
    xp = _pad_streams(x, r)
    parts = []
    # One pallas_call per (a, b) tap: the (16C, Cout) f32 accumulator plus
    # its staging copy overflowed the 16 MB VMEM scope in one kernel; per
    # tap it is (4C, Cout), and the 4x input re-stream is ~100 us of HBM.
    for a in (0, 1):
        for b in (0, 1):
            parts.append(pl.pallas_call(
                functools.partial(_wgrad_kernel, a=a, b=b, r=r, w=w,
                                  cin=cin, cout=cout),
                grid=(n, ho // r),
                in_specs=[
                    pl.BlockSpec((1, 2 * r, wp2, 2 * cin),
                                 lambda i, t: (i, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2 * r, wp2, 2 * cin),
                                 lambda i, t: (i, t + 1, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, r, wo, cout), lambda i, t: (i, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((4 * cin, cout), lambda i, t: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((4 * cin, cout), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * n * ho * wo * 4 * cin * cout,
                    bytes_accessed=2 * n * h * w * cin
                    + 2 * n * ho * wo * cout,
                    transcendentals=0,
                ),
                interpret=interpret,
            )(xp, xp, dy))
    dk16 = jnp.concatenate(parts, axis=0)
    # (a, b, r, s, c, o) row blocks -> HWIO (4, 4, C, Cout)
    dk = dk16.reshape(2, 2, 2, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return dk.reshape(4, 4, cin, cout)


# ---------------------------------------------------------------- dgrad

# Row-tap validity per output row parity (see _dgrad_mats docstring).
_VALID_RHO = {0: (0, 1), 1: (1, 2)}


def _dgrad_mats(kernel):
    """Twelve (Cout, 2C) matrices M[py][rho][gamma], flattened (12*Cout, 2C).

    dx_py[p, j, px*C + c] = sum_{rho, gamma}
        dy_pad[p + rho, j + gamma] @ M[py][rho][gamma]
    where dy_pad has one row/col of leading zero padding and
      py = 0: valid rho in {0, 1} with a = 1 + 2*(1 - rho)   (u = p+rho-1)
      py = 1: valid rho in {1, 2} with a = 2 - 2*(rho - 1)   (u = p+rho-1)
      px = 0: valid gamma gives b = 3 - 2*gamma (gamma in {0, 1})
      px = 1: valid gamma gives b = 4 - 2*gamma (gamma in {1, 2})
    """
    kh, kw, c, cout = kernel.shape
    mats = []
    for py in (0, 1):
        for rho in _VALID_RHO[py]:
            for gamma in (0, 1, 2):
                m = jnp.zeros((cout, 2 * c), kernel.dtype)
                a = {0: {1: 1, 0: 3}, 1: {1: 2, 2: 0}}[py][rho]
                for px in (0, 1):
                    b = (3 - 2 * gamma) if px == 0 else (4 - 2 * gamma)
                    if 0 <= b <= 3:
                        blk = kernel[a, b]  # (C, Cout)
                        m = m.at[:, px * c : (px + 1) * c].set(
                            jnp.transpose(blk, (1, 0))
                        )
                mats.append(m)
    # (12*Cout, 2C), blocks ordered (py, valid-rho, gamma)
    return jnp.concatenate(mats, axis=0)


def _dgrad_kernel(d0_ref, d1_ref, m_ref, oe_ref, oo_ref,
                  *, r, wo, cin, cout):
    # d0/d1: (1, R, Wo + 2, Cout) padded-dy row blocks i, i+1; window rows
    # [iR, iR + 2R) cover p + rho for p in [iR, iR + R), rho in {0, 1, 2}.
    d0 = d0_ref[0]
    d1 = d1_ref[0]
    wdp = d0.shape[1]
    idx = 0
    for py, o_ref in ((0, oe_ref), (1, oo_ref)):
        acc = None
        for rho in _VALID_RHO[py]:
            if rho == 0:
                win = d0
            elif rho == r:
                # r == 2 only (rho <= 2 <= r): d0[rho:] would be an empty
                # concat operand, which Mosaic rejects; the window is
                # exactly the next row block.
                win = d1
            else:
                win = jnp.concatenate([d0[rho:], d1[:rho]], axis=0)
            for gamma in (0, 1, 2):
                mblk = m_ref[idx * cout : (idx + 1) * cout]
                idx += 1
                tap = win[:, gamma : gamma + wdp - 2].reshape(-1, cout)
                y = jnp.dot(tap, mblk, preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        o_ref[0] = acc.reshape(r, wdp - 2, 2 * cin).astype(o_ref.dtype)


def _dgrad_impl(dy, kernel, x_shape, interpret=False):
    n, h, w, cin = x_shape
    cout = kernel.shape[-1]
    ho, wo = h // 2, w // 2
    # dx row-pair blocks of R pairs; dy window rows [p, p + 2] relative to
    # padded dy (one leading zero row/col).
    r = _pick_r(h // 2)
    dyp = jnp.pad(dy, ((0, 0), (1, 2 * r - 1), (1, 1), (0, 0)))
    mats = _dgrad_mats(kernel.astype(dy.dtype))
    planes = pl.pallas_call(
        functools.partial(_dgrad_kernel, r=r, wo=wo, cin=cin, cout=cout),
        grid=(n, (h // 2) // r),
        in_specs=[
            pl.BlockSpec((1, r, wo + 2, cout), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, wo + 2, cout), lambda i, t: (i, t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12 * cout, 2 * cin), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r, wo, 2 * cin), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, wo, 2 * cin), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h // 2, wo, 2 * cin), dy.dtype),
            jax.ShapeDtypeStruct((n, h // 2, wo, 2 * cin), dy.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * cin * cout * 16 // 4 * 3,
            bytes_accessed=2 * n * ho * wo * cout + 2 * n * h * w * cin,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dyp, dyp, mats)
    dxe, dxo = planes
    # Interleave row parities and unpair cols: one cheap major-dim stack +
    # two contiguous reshapes.
    dx = jnp.stack([dxe, dxo], axis=2)           # (N, H/2, 2, Wo, 2C)
    dx = dx.reshape(n, h, wo, 2 * cin)
    return dx.reshape(n, h, w, cin)


# --------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv4x4_s2_mxu(x, kernel, bias, interpret=False):
    """torch Conv2d(C, Cout, 4, stride=2, padding=1) on NHWC, bf16,
    Pallas-lowered (see module docstring). kernel HWIO (4, 4, C, Cout)."""
    return _fwd_impl(x, kernel, bias, interpret)


def _vjp_fwd(x, kernel, bias, interpret):
    return _fwd_impl(x, kernel, bias, interpret), (x, kernel, bias)


def _vjp_bwd(interpret, res, dy):
    x, kernel, bias = res
    cout = kernel.shape[-1]
    dx = _dgrad_impl(dy, kernel, x.shape, interpret).astype(x.dtype)
    dk = _wgrad_impl(x, dy, cout, interpret).astype(kernel.dtype)
    db = (None if bias is None
          else jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(
              bias.dtype))
    return dx, dk, db


conv4x4_s2_mxu.defvjp(_vjp_fwd, _vjp_bwd)
