"""Discriminator conv1 (4x4/s2 over C=19 softmax phases) as Pallas
patch-matrix kernels.

The FCDiscriminator's first conv (reference model/discriminator.py:10)
consumes the 19-channel softmax map. The shipped lowering
(ops/conv4x4.conv4x4_s2d_phases) runs it as 16 K=19 XLA dots — profiled
at 3.1 ms/step across the six discriminator applications because every
dot streams the full M = N*(H/2)*(W/2) rows while the 19x64 weight
block fills ~7% of the 128x128 MXU, and both r4 dot-consolidation
rewrites (blocked-4C 46.27 ms, 32-aligned 47.36 vs 44.89 base) LOST to
the HBM concat/pad they needed. This kernel family is the r2 candidate
those rewrites approximated: the patch matrix is built IN VMEM, so no
concat ever touches HBM.

Layout contract: phases arrive PLANAR — (N, C, Hb, Wb) with
phase_rs[n, c, u, v] = sm_pad[2u + r, 2v + s, c] (the c-minor phase
tensors' (…, 19) HBM tiles pad 19 -> 128 lanes; planar planes pad only
Wb 513 -> 640). Producer: ops.resize.upsample_softmax_s2d_planar.

  fwd:   per R-row grid block, 16 sublane-aligned stores/tap-row build
         the patch matrix P[(tap, c), (row, col)] = (KP*16, R*Wo) in
         VMEM scratch (KP = 32: taps at aligned offsets, pad rows meet
         zero weight rows); ONE lhsT MXU dot P^T-form against the
         packed (16*KP, Cout) weight matrix replaces the 16 K=19 dots.
  wgrad: same patch build, contracted the other way:
         (16*KP, M) @ (M, Cout), accumulated across the grid.
  dgrad: per padded-dy row, one rhs-transposed dot (the q@k^T form)
         W_pack (16*KP, Cout) @ dy_row (Wpad, Cout)^T -> (16*KP, Wpad);
         each tap's (C, Wpad) slice is lane-rolled by its column shift
         and accumulated into the planar (4C, R, Wpad) phase-grad block.

Every in-kernel reshape/concat is avoided or lane-aligned (CLAUDE.md:
non-lane-aligned minor-dim collapses are unsupported by Mosaic; partial
sublane-range stores at 32-aligned offsets are used instead).

bf16 path only; the f32 parity path keeps the XLA phase lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KP = 32  # sublane rows per (phase, a, b) tap block; 32-aligned stores


def _pick_r(ho: int) -> int:
    # R=8 keeps fwd VMEM ~9.5 MB (scratch (512, 4096) bf16 + f32 acc +
    # double-buffered phase slabs) inside the 16 MB scope at Wo=512.
    for r in (8, 4, 2):
        if ho % r == 0:
            return r
    return 1


def supported(phase_shape, cout: int, dtype) -> bool:
    n, c, hb, wb = phase_shape
    ho, wo = hb - 1, wb - 1
    return (
        dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and c <= KP
        and wo % 128 == 0
        # Mosaic block rule: the row-block dim must be 8-divisible (or
        # equal the array dim) — so only the R=8 blocking is deployable.
        and _pick_r(ho) == 8
        and 0 < cout <= 128
        and cout % 8 == 0
    )


def _pack_weights(kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """HWIO (4, 4, C, Cout) -> (16*KP, Cout); rows [idx*KP, idx*KP + C)
    hold W[2a + r, 2b + s] for idx = (2r + s)*4 + 2a + b; rows past C are
    zero (they multiply the patch matrix's stale pad rows)."""
    kh, kw, c, cout = kernel.shape
    assert (kh, kw) == (4, 4) and c <= KP
    rows = []
    for r in (0, 1):
        for s in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    blk = kernel[2 * a + r, 2 * b + s]  # (C, Cout)
                    rows.append(jnp.pad(blk, ((0, KP - c), (0, 0))))
    return jnp.concatenate(rows, axis=0).astype(dtype)


def _unpack_wgrad(dk: jnp.ndarray, c: int) -> jnp.ndarray:
    """(16*KP, Cout) f32 accumulator -> HWIO (4, 4, C, Cout)."""
    cout = dk.shape[-1]
    dk = dk.reshape(2, 2, 2, 2, KP, cout)[..., :c, :]  # (r, s, a, b, C, O)
    hw = jnp.zeros((4, 4, c, cout), dk.dtype)
    for r in (0, 1):
        for s in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    hw = hw.at[2 * a + r, 2 * b + s].set(dk[r, s, a, b])
    return hw


# ---------------------------------------------------------------- forward


def _build_patch(phase_refs, scratch, *, c, r, wo):
    """16 tap blocks into scratch (16*KP, r*wo): per (phase, a, b, row)
    one (C, Wo) store at a 32-aligned sublane / 128-aligned lane offset.
    Rows [C, KP) of each block are zeroed once (grid step 0) and never
    rewritten — they meet zero weight rows, but must not be NaN garbage.
    """
    for pi in range(4):
        lo = phase_refs[2 * pi][0]        # (C, R, Wb) rows [tR, tR+R)
        nxt = phase_refs[2 * pi + 1][0, :, 0]  # (C, Wb) row tR+R (block t+1)
        for a in (0, 1):
            for b in (0, 1):
                k0 = (pi * 4 + 2 * a + b) * KP
                for rr in range(r):
                    src = lo[:, rr + a] if rr + a < r else nxt  # (C, Wb)
                    scratch[k0:k0 + c, rr * wo:(rr + 1) * wo] = (
                        src[:, b:b + wo]
                    )


def _fwd_kernel(*refs, c, r, wo, cout):
    phase_refs, (w_ref, b_ref, o_ref, scratch) = refs[:8], refs[8:]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        scratch[:] = jnp.zeros_like(scratch)

    _build_patch(phase_refs, scratch, c=c, r=r, wo=wo)
    acc = jax.lax.dot_general(
        scratch[:], w_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R*Wo, Cout)
    o_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _phase_specs(c, r, wb):
    # Both refs are full (1, C, R, Wb) blocks (Mosaic requires the last
    # two block dims divisible by (8, 128) or equal to the array's —
    # a 1-row next block fails that): the second sits at block t+1 and
    # only its first row is read, which is why _pad_phase_rows extends
    # the row dim to Ho + R.
    specs = []
    for _ in range(4):
        specs.append(pl.BlockSpec((1, c, r, wb), lambda i, t: (i, 0, t, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, c, r, wb),
                                  lambda i, t: (i, 0, t + 1, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _pad_phase_rows(phases, r):
    """Zero-pad planar phase rows Hb -> Ho + R so the t+1 row block of
    the last grid step exists (rows past Hb are never multiplied into
    real outputs)."""
    n, c, hb, wb = phases[0].shape
    need = (hb - 1) + r
    if hb == need:
        return phases
    return tuple(
        jnp.pad(p, ((0, 0), (0, 0), (0, need - hb), (0, 0))) for p in phases
    )


def _fwd_impl(phases, kernel, bias, interpret=False):
    n, c, hb, wb = phases[0].shape
    ho, wo = hb - 1, wb - 1
    cout = kernel.shape[-1]
    r = _pick_r(ho)
    dtype = phases[0].dtype
    wp = _pack_weights(kernel, dtype)
    b = (jnp.zeros((cout,), jnp.float32) if bias is None
         else bias.astype(jnp.float32)).reshape(1, cout)
    padded = _pad_phase_rows(phases, r)
    args = [p for ph in padded for p in (ph, ph)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, r=r, wo=wo, cout=cout),
        grid=(n, ho // r),
        in_specs=_phase_specs(c, r, wb) + [
            pl.BlockSpec((16 * KP, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * wo, cout), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho * wo, cout), dtype),
        scratch_shapes=[pltpu.VMEM((16 * KP, r * wo), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * 16 * KP * cout,
            bytes_accessed=2 * 4 * n * c * hb * wb + 2 * n * ho * wo * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args, wp, b)
    return out.reshape(n, ho, wo, cout)


# ---------------------------------------------------------------- wgrad


def _wgrad_kernel(*refs, c, r, wo, cout):
    phase_refs, (dy_ref, dk_ref, scratch) = refs[:8], refs[8:]
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        scratch[:] = jnp.zeros_like(scratch)
        dk_ref[:] = jnp.zeros_like(dk_ref)

    _build_patch(phase_refs, scratch, c=c, r=r, wo=wo)
    dk_ref[:] += jax.lax.dot_general(
        scratch[:], dy_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16*KP, Cout)


def _wgrad_impl(phases, dy, cout, interpret=False):
    n, c, hb, wb = phases[0].shape
    ho, wo = hb - 1, wb - 1
    r = _pick_r(ho)
    padded = _pad_phase_rows(phases, r)
    args = [p for ph in padded for p in (ph, ph)]
    dk = pl.pallas_call(
        functools.partial(_wgrad_kernel, c=c, r=r, wo=wo, cout=cout),
        grid=(n, ho // r),
        in_specs=_phase_specs(c, r, wb) + [
            pl.BlockSpec((1, r * wo, cout), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16 * KP, cout), lambda i, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16 * KP, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((16 * KP, r * wo), phases[0].dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * 16 * KP * cout,
            bytes_accessed=2 * 4 * n * c * hb * wb + 2 * n * ho * wo * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args, dy.reshape(n, ho * wo, cout))
    return _unpack_wgrad(dk, c)


# ---------------------------------------------------------------- dgrad

_WPAD = 128  # dy cols padded 1 + Wo + (WPAD-1) -> lane-aligned Wo + WPAD


def _dgrad_kernel(d0_ref, d1_ref, w_ref, o_ref, acc, *, c, r2, wpad, cout):
    acc[:] = jnp.zeros_like(acc)
    for rr in range(r2 + 1):
        row = d0_ref[0, rr] if rr < r2 else d1_ref[0, 0]  # (Wpad, Cout)
        g = jax.lax.dot_general(
            w_ref[:], row,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16*KP, Wpad) — the q@k^T form
        for pi in range(4):
            for a in (0, 1):
                u = rr - 1 + a
                if not 0 <= u < r2:
                    continue
                for b in (0, 1):
                    blk = g[(pi * 4 + 2 * a + b) * KP:][:c]  # (C, Wpad)
                    if b == 0:
                        # padded col = v + 1 - b: b=0 reads cols [1, Wpad),
                        # i.e. a left-roll by 1 (= right-roll by Wpad - 1;
                        # pltpu.roll requires a non-negative shift). The
                        # wrapped col lands in the sliced-away pad tail.
                        blk = pltpu.roll(blk, shift=wpad - 1, axis=1)
                    acc[pi * c:(pi + 1) * c, u] += blk
    o_ref[0] = acc[:].astype(o_ref.dtype)


def _dgrad_impl(dy, kernel, hb, interpret=False):
    n, ho, wo, cout = dy.shape
    c = kernel.shape[2]
    wpad = wo + _WPAD
    r2 = _pick_r(ho)
    upad = -(-hb // r2) * r2
    # rows: 1 leading zero (u=0, a=1 reads dy[-1]) + dy + zeros so the
    # t+1 single-row ref stays in bounds at the last block.
    dyp = jnp.pad(dy, ((0, 0), (1, upad + r2 - ho), (1, _WPAD - 1), (0, 0)))
    wp = _pack_weights(kernel, dy.dtype)
    out = pl.pallas_call(
        functools.partial(_dgrad_kernel, c=c, r2=r2, wpad=wpad, cout=cout),
        grid=(n, upad // r2),
        in_specs=[
            pl.BlockSpec((1, r2, wpad, cout), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wpad, cout),
                         lambda i, t: (i, r2 * t + r2, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * KP, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * c, r2, wpad),
                               lambda i, t: (i, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4 * c, upad, wpad), dy.dtype),
        scratch_shapes=[pltpu.VMEM((4 * c, r2, wpad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * upad * wpad * 16 * KP * cout,
            bytes_accessed=2 * n * ho * wo * cout + 2 * 4 * n * c * hb * wpad,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dyp, dyp, wp)
    # (N, 4C, Upad, Wpad) -> 4 planar (N, C, Hb, Wb); the slices drop the
    # grid pad rows and the lane-pad/wrap junk columns.
    wb = wo + 1
    return tuple(
        out[:, pi * c:(pi + 1) * c, :hb, :wb] for pi in range(4)
    )


# --------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv4x4_s2_phases_planar(phases, kernel, bias, interpret=False):
    """torch Conv2d(C, Cout, 4, stride=2, padding=1) on the s2d parity
    phases in PLANAR layout (module docstring). phases: 4-tuple (index
    2r + s) of (N, C, Hb, Wb); kernel HWIO (4, 4, C, Cout). Returns the
    c-minor (N, Ho, Wo, Cout) map (Cout=64 tiles cleanly downstream).

    Same math as ops.conv4x4.conv4x4_s2d_phases on the transposed
    phases: out(i, j) = sum_{a,b,r,s} phase_rs[i+a, j+b] @ W[2a+r, 2b+s].
    """
    return _fwd_impl(phases, kernel, bias, interpret)


def _vjp_fwd(phases, kernel, bias, interpret):
    return _fwd_impl(phases, kernel, bias, interpret), (phases, kernel, bias)


def _vjp_bwd(interpret, res, dy):
    phases, kernel, bias = res
    hb = phases[0].shape[2]
    dphases = _dgrad_impl(dy, kernel.astype(dy.dtype), hb, interpret)
    dk = _wgrad_impl(phases, dy, kernel.shape[-1], interpret).astype(
        kernel.dtype)
    db = (None if bias is None
          else jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(
              bias.dtype))
    return tuple(dp.astype(p.dtype) for dp, p in zip(dphases, phases)), dk, db


conv4x4_s2_phases_planar.defvjp(_vjp_fwd, _vjp_bwd)
