"""Bilinear resize with PyTorch `align_corners=True` semantics, MXU-mapped.

The reference upsamples logits with `nn.Upsample(mode='bilinear',
align_corners=True)` both in training (to the input size,
reference train_gta2cityscapes_multi.py:250, model/deeplab_multi.py:188-189)
and in evaluation (to 1024x2048 before argmax, evaluate_cityscapes.py:153).
Exact parity with torch's sampling grid is required for bit-matching mIoU on
the released checkpoints.

TPU-native formulation: 1-D bilinear interpolation along an axis is a linear
map, i.e. a (out_len, in_len) matrix with at most two non-zeros per row.
Separable 2-D resize therefore becomes two dense matmuls that XLA tiles onto
the MXU — no gathers, no dynamic shapes, fuses with neighboring elementwise
ops. For the eval path (64x128 -> 1024x2048 over 19 channels) this is far
faster on TPU than a gather-based implementation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.precision import F32_PRECISION


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_len: int, out_len: int) -> np.ndarray:
    """Dense (out_len, in_len) align_corners=True interpolation matrix.

    Row `o` holds the bilinear weights of source pixels for output pixel `o`:
    src = o * (in_len - 1) / (out_len - 1); the two taps are floor(src) and
    min(floor(src)+1, in_len-1) with weights (1-frac, frac). Matches
    torch.nn.functional.interpolate(mode='bilinear', align_corners=True).
    """
    m = np.zeros((out_len, in_len), dtype=np.float64)
    if out_len == 1:
        # align_corners with a single output sample reads source pixel 0.
        m[0, 0] = 1.0
        return m.astype(np.float32)
    if in_len == 1:
        m[:, 0] = 1.0
        return m.astype(np.float32)
    scale = (in_len - 1) / (out_len - 1)
    src = np.arange(out_len, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_len - 1)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = src - lo
    rows = np.arange(out_len)
    np.add.at(m, (rows, lo), 1.0 - frac)
    np.add.at(m, (rows, hi), frac)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _interp_matrix_half_pixel(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) align_corners=False (half-pixel) interp matrix.

    src = (o + 0.5) * in/out - 0.5, clamped; matches torch interpolate
    (mode='bilinear', align_corners=False) — the default of the modern
    nn.Upsample used inside the Warper decoder (custom_layers.py:129,154,182).
    """
    m = np.zeros((out_len, in_len), dtype=np.float64)
    scale = in_len / out_len
    src = np.clip((np.arange(out_len, dtype=np.float64) + 0.5) * scale - 0.5,
                  0.0, in_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    frac = src - lo
    rows = np.arange(out_len)
    np.add.at(m, (rows, lo), 1.0 - frac)
    np.add.at(m, (rows, hi), frac)
    return m.astype(np.float32)


def _separable_resize(
    x: jnp.ndarray, out_hw: tuple[int, int], matrix_fn, exact: bool = True
) -> jnp.ndarray:
    """exact=True: f32 accumulation at HIGHEST matmul precision (torch
    parity, gates bit-matching eval). exact=False: stay in x.dtype with
    default precision — ~4x faster on bf16, used by the throughput path."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x[0] if squeeze else x
    mh = jnp.asarray(matrix_fn(h, oh))
    mw = jnp.asarray(matrix_fn(w, ow))
    if exact:
        y = x.astype(jnp.float32)
        hp = F32_PRECISION
        y = jnp.einsum("oh,nhwc->nowc", mh, y, precision=hp)
        y = jnp.einsum("pw,nhwc->nhpc", mw, y, precision=hp)
        y = y.astype(x.dtype)
    else:
        y = jnp.einsum("oh,nhwc->nowc", mh.astype(x.dtype), x)
        y = jnp.einsum("pw,nhwc->nhpc", mw.astype(x.dtype), y)
    return y[0] if squeeze else y


def resize_bilinear_half_pixel(
    x: jnp.ndarray, out_hw: tuple[int, int], exact: bool = True
) -> jnp.ndarray:
    """Bilinear resize with align_corners=False (half-pixel) semantics."""
    return _separable_resize(x, out_hw, _interp_matrix_half_pixel, exact=exact)


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_hw: tuple[int, int], exact: bool = True
) -> jnp.ndarray:
    """Resize NHWC (or HWC) `x` to `out_hw` with align_corners=True bilinear.

    Implemented as two einsum contractions (H then W) against constant
    interpolation matrices; XLA lowers these to MXU matmuls and fuses the pair.
    Computation runs in float32 regardless of input dtype (matching torch's
    float32 interpolate); the result is cast back to `x.dtype`.
    """
    # HIGHEST precision inside _separable_resize keeps the interpolation in
    # true f32 on the MXU (parity with torch's float32 interpolate).
    return _separable_resize(x, out_hw, _interp_matrix, exact=exact)


@functools.lru_cache(maxsize=64)
def _phase_matrix(in_len: int, out_len: int, parity: int) -> np.ndarray:
    """(out_len//2 + 1, in_len) matrix: align-corners interp rows for the
    stride-2 parity taps 2u + parity - 1, zero rows where that index falls
    in the conv pad (outside [0, out_len)).

    This is the row/col factor of s2d(pad1(upsample(x))): emitting the
    space-to-depth BLOCKS of the upsampled tensor directly as matmuls, so
    the 4x4/stride-2 consumer (FCDiscriminator conv1) never needs the
    (H, W, C) -> (H/2+1, W/2+1, 4C) shuffle that cost ~7.6 ms/step across
    its six applications (profiled r2; ops/conv4x4.py NOTEs).
    """
    full = _interp_matrix(in_len, out_len)
    nb = out_len // 2 + 1
    m = np.zeros((nb, in_len), dtype=np.float32)
    for u in range(nb):
        src = 2 * u + parity - 1
        if 0 <= src < out_len:
            m[u] = full[src]
    return m


def upsample_softmax_s2d(
    logits: jnp.ndarray, out_hw: tuple[int, int],
    blocked: bool | str = False,
) -> tuple[jnp.ndarray, ...]:
    """softmax(upsample(logits)) in stride-2 parity-phase (blocked) form.

    Returns 4 tensors phase[(r, s)] of shape (N, H/2+1, W/2+1, C) with
    phase_rs[u, v] = sm_pad[2u + r, 2v + s] where sm_pad is the channel
    softmax of the align-corners-upsampled logits, zero-padded by one pixel
    — exactly conv4x4.s2d(pad(softmax(upsample(x)))) split channel-groups,
    but produced by four phase-sliced MXU matmul resizes + per-phase
    softmax, with the pad positions masked to zero. Order: (0,0), (0,1),
    (1,0), (1,1) i.e. index = 2r + s.

    This is the TPU-native producer for the discriminator input
    (reference train_gta2cityscapes_multi.py:423 feeds
    F.softmax(interp(pred)) to the D): the blocked layout means the
    4x4/stride-2 conv1 consumes it as clean matmuls (conv4x4_s2d_phases)
    with no space-to-depth relayout anywhere.

    `blocked=True` returns a 1-tuple of the single channel-concat tensor
    (N, H/2+1, W/2+1, 4C), order (r, s, c) — the input contract of
    conv4x4_s2d_blocked, which needs 4x fewer MXU streaming passes than
    the 16 K=C dots of the phase form (and the 4C=76-lane concat writes
    waste fewer lanes than four separate C=19-minor tensors).

    `blocked='aligned'` additionally zero-pads each phase's channels to a
    32 multiple before the concat, so every block sits at a lane-aligned
    offset and (at C=19) the concat tensor is exactly one full 128-lane
    tile. Consumer: conv4x4_s2d_blocked handles the zero rows via zero
    kernel rows — same math exactly. NOTE (measured, don't retry): BOTH
    concat forms LOST their r4 in-step multi-level A/Bs vs the phase
    form (blocked=True 46.27, 'aligned' 47.36, base 44.89 ms — 3-run
    medians, scripts/campaign_results.json 2026-08-19); the dot
    consolidation itself loses, not the concat alignment. Kept for
    direct use/tests.
    """
    n, h, w, c = logits.shape
    oh, ow = out_hw
    # The pad masking below assumes even out_hw: with an odd dim the
    # parity-1 phase's last row/col would hold VALID data (src = out-1) yet
    # be zeroed, silently corrupting the discriminator input. The 4x4/s2
    # consumer requires even dims anyway, so fail loudly (advisor r3).
    if oh % 2 or ow % 2:
        raise ValueError(
            f"upsample_softmax_s2d requires even out_hw, got {out_hw}"
        )
    x = logits
    # f32 inputs keep the f32-parity matmul precision (the dense path this
    # replaces resizes at F32_PRECISION via upsample_logits(exact=True);
    # without it the TPU MXU would resize f32 operands with 1-pass bf16
    # multiplies and the f32 adversarial train path would silently drift).
    hp = F32_PRECISION if x.dtype == jnp.float32 else None
    phases = []
    for r in (0, 1):
        mh = jnp.asarray(_phase_matrix(h, oh, r), x.dtype)
        yr = jnp.einsum("uh,nhwc->nuwc", mh, x, precision=hp)
        for s in (0, 1):
            mw = jnp.asarray(_phase_matrix(w, ow, s), x.dtype)
            p = jnp.einsum("vw,nhwc->nhvc", mw, yr, precision=hp)
            p = jax.nn.softmax(p, axis=-1)
            # softmax turns the zero pad rows into uniform 1/C; the conv pad
            # must be ZERO. Mask the (at most one) pad row/col per phase.
            hb, wb = oh // 2 + 1, ow // 2 + 1
            rmask = np.ones((hb, 1, 1), np.float32)
            cmask = np.ones((wb, 1), np.float32)
            if r == 0:
                rmask[0] = 0.0
            else:
                rmask[-1] = 0.0
            if s == 0:
                cmask[0] = 0.0
            else:
                cmask[-1] = 0.0
            p = p * jnp.asarray(rmask * cmask[None], p.dtype)
            phases.append(p)
    if blocked == "aligned":
        align = -(-c // 32) * 32
        phases = [
            jnp.pad(p, ((0, 0),) * 3 + ((0, align - c),)) for p in phases
        ]
        return (jnp.concatenate(phases, axis=-1),)
    if blocked:
        return (jnp.concatenate(phases, axis=-1),)
    return tuple(phases)


class PlanarPhases(tuple):
    """Marker tuple: 4 PLANAR s2d phases (N, C, Hb, Wb), index 2r + s.

    A distinct type (not shape sniffing — small test shapes can make
    Hb == C ambiguous) so FCDiscriminator dispatches conv1 to the Pallas
    patch-matrix kernel (ops/pallas/conv4x4_patch.py). Plain tuples keep
    meaning c-minor phases. Registered as a pytree so it traces."""

    __slots__ = ()


jax.tree_util.register_pytree_node(
    PlanarPhases,
    lambda xs: (tuple(xs), None),
    lambda _, xs: PlanarPhases(xs),
)


def upsample_softmax_s2d_planar(
    logits: jnp.ndarray, out_hw: tuple[int, int]
) -> PlanarPhases:
    """upsample_softmax_s2d with PLANAR phase outputs (N, C, Hb, Wb).

    Same values as transposing upsample_softmax_s2d's phases; produced
    planar from the start: the c-minor (…, 19) phase tensors' HBM tiles
    pad 19 -> 128 lanes (6.7x write+read waste on every producer and
    consumer pass), while planes pad only Wb 513 -> 640 (~1.25x). The
    consumer is the conv1 patch-matrix kernel
    (ops/pallas/conv4x4_patch.py), whose dgrad hands back planar phase
    cotangents, so the softmax backward also runs on planes.
    """
    n, h, w, c = logits.shape
    oh, ow = out_hw
    if oh % 2 or ow % 2:
        raise ValueError(
            f"upsample_softmax_s2d_planar requires even out_hw, got {out_hw}"
        )
    hp = F32_PRECISION if logits.dtype == jnp.float32 else None
    x = jnp.transpose(logits, (0, 3, 1, 2))  # tiny low-res tensor
    hb, wb = oh // 2 + 1, ow // 2 + 1
    phases = []
    for r in (0, 1):
        mh = jnp.asarray(_phase_matrix(h, oh, r), x.dtype)
        yr = jnp.einsum("uh,nchw->ncuw", mh, x, precision=hp)
        for s in (0, 1):
            mw = jnp.asarray(_phase_matrix(w, ow, s), x.dtype)
            p = jnp.einsum("vw,ncuw->ncuv", mw, yr, precision=hp)
            p = jax.nn.softmax(p, axis=1)
            # Same pad-position masking as upsample_softmax_s2d (the
            # softmax turns zero pad rows into uniform 1/C).
            rmask = np.ones((hb, 1), np.float32)
            cmask = np.ones((wb,), np.float32)
            rmask[0 if r == 0 else -1] = 0.0
            cmask[0 if s == 0 else -1] = 0.0
            p = p * jnp.asarray(rmask * cmask[None], p.dtype)
            phases.append(p)
    return PlanarPhases(phases)


def upsample_logits(
    logits: jnp.ndarray, out_hw: tuple[int, int], exact: bool = True
) -> jnp.ndarray:
    """Upsample segmentation logits (N, h, w, C) to (N, H, W, C).

    Semantics of the reference's external `interp` module
    (train_gta2cityscapes_multi.py:250, evaluate_cityscapes.py:153). Kept as a
    named wrapper so call sites document intent and so a Pallas fused
    resize+softmax path can slot in behind one symbol.
    """
    return resize_bilinear_align_corners(logits, out_hw, exact=exact)
