"""4x4 / stride-2 / pad-1 convolution as space-to-depth + matmuls.

Every discriminator layer and every Warper encoder layer is a
Conv2d(kernel=4, stride=2, padding=1) (reference model/discriminator.py:10-14,
model/custom_layers.py:76,87-91). XLA's strided-conv lowering on this TPU
runs these at 2-6 TFLOP/s (measured) — pathological for what is dense
matmul work.

Identity: with x_p = pad(x, 1) and the space-to-depth blocks
B(u, v)[r, s, c] = x_p(2u + r, 2v + s, c)  (shape (H/2+1, W/2+1, 4C)),
    out(i, j) = sum_{a,b in {0,1}}  B(i+a, j+b) @ W'[a, b]
where W'[a, b][(r, s, c), o] = W[2a + r, 2b + s, c, o]. Four static-slice
matmuls with K = 4C — clean MXU shapes, ~10x faster, exact same math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.precision import F32_PRECISION


def _s2d(x: jnp.ndarray):
    """pad(1) + space-to-depth(2): (N,H,W,C) -> (N,H/2+1,W/2+1,4C), channel
    order (r, s, c)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hb, wb = h // 2 + 1, w // 2 + 1
    blocks = xp.reshape(n, hb, 2, wb, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return blocks.reshape(n, hb, wb, 4 * c)


def _d2s_unpad(blocks: jnp.ndarray, h: int, w: int, c: int):
    """Inverse of _s2d (depth-to-space then strip the 1-pixel pad)."""
    n, hb, wb, _ = blocks.shape
    y = blocks.reshape(n, hb, wb, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(n, 2 * hb, 2 * wb, c)
    return y[:, 1 : 1 + h, 1 : 1 + w, :]


def _wprime(kernel: jnp.ndarray, align: int | None = None):
    """HWIO (4,4,C,cout) -> [(a,b)] list of (4C, cout) with row order (r,s,c).

    With align > C each (r, s) row block is zero-row-padded to `align` so
    the matrix matches an aligned-blocked input (32-padded phase concat,
    ops.resize.upsample_softmax_s2d(blocked='aligned')); the zero rows
    multiply the input's zero pad lanes, leaving the math unchanged."""
    c, cout = kernel.shape[2], kernel.shape[3]
    wk = kernel.reshape(2, 2, 2, 2, c, cout)  # (a, r, b, s, c, o)
    if align is not None and align != c:
        wk = jnp.pad(wk, ((0, 0),) * 4 + ((0, align - c), (0, 0)))
        c = align
    return [wk[a, :, b].reshape(4 * c, cout) for a in (0, 1) for b in (0, 1)]


def _dot(a, b, f32_exact, transpose_rhs=False):
    dn = (((3,), (1,) if transpose_rhs else (0,)), ((), ()))
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        # f32 inputs keep (multi-pass) f32 MXU precision — parity with XLA's
        # conv lowering; bf16 takes the fast single pass.
        precision=F32_PRECISION if f32_exact else None,
    )


def conv4x4_stride2(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """torch Conv2d(Cin, Cout, kernel_size=4, stride=2, padding=1) on NHWC.

    x: (N, H, W, C) with H, W even; kernel: HWIO (4, 4, C, Cout).
    Differentiated by plain autodiff: a hand-written VJP (bf16 cotangents,
    explicit scatter into the block tensor) was MEASURED SLOWER (92 vs 73 ms
    on the multi-level step) because the overlapping-slice accumulation
    serializes; XLA's transpose of the slice/pad chain schedules better.
    """
    # NOTE (measured, don't repeat): two alternative lowerings both lose
    # in-step despite looking better on paper:
    #  - sixteen stride-2 slice taps (skip the block build): strided slices
    #    on channel-minor MINOR axes are far worse (24 ms fwd slice + 11 ms
    #    bwd interior-pad; multi-level step 64 -> 100 ms);
    #  - ROW-PARITY s2d (the trick that won for the conv7x7 stem: stride-2
    #    slices on the MAJOR axis + contiguous (W,C)->(W/2,2C) flatten,
    #    eight K=2C matmuls): multi-level step 62.8 -> 69.1 ms — the
    #    autodiff transpose of the row-strided slices and the halved-K
    #    matmuls lose more than the transpose-engine shuffle costs.
    #  - zero-padding C=19 inputs to 32 so 4C = 128 is one full lane tile:
    #    shuffle times barely moved (reshape 2.41 -> 2.30 ms) and the pad
    #    itself costs more than it saves (step 59.1 -> 60.0 ms).
    # XLA's transpose engine handles this s2d reshuffle better than any
    # slice-based XLA alternative tried — EXCEPT for the C=3 image stem
    # (the Warper encoder's first conv), where the s2d reshape of the
    # RGB-minor tensor costs ~0.6 ms/step and the conv runs forward-only
    # (the Warper has no backward in training: flow is constant wrt
    # generator params), so the row-parity form's weak autodiff transpose
    # never runs.
    #
    # The PALLAS lowering (ops/pallas/conv4x4_s2.py) beats them all where
    # its gate holds (bf16, lane-aligned channels): the s2d shift happens
    # in VMEM and all three directions are hand-written MXU kernels — the
    # XLA losses above were HBM shift copies and weak slice transposes,
    # neither of which exists inside a kernel.
    if x.shape[-1] <= 4:
        return _fwd_rowparity(x, kernel, bias)
    from adaptsegnet_tpu.ops.pallas import conv4x4_s2

    if conv4x4_s2.supported(x, kernel.shape[-1]):
        return conv4x4_s2.conv4x4_s2_mxu(x, kernel, bias)
    return _fwd_impl(x, kernel, bias)


def _fwd_rowparity(x, kernel, bias):
    """Row-parity variant: B_r(u,v)[s,c] = x_p(2u+r, 2v+s, c); eight
    K=2C static-slice matmuls. Strided slices on the MAJOR axis + a
    contiguous (W,C)->(W/2,2C) flatten — no transpose at all."""
    n, h, w, c = x.shape
    kh, kw, kc, cout = kernel.shape
    assert (kh, kw) == (4, 4) and kc == c and h % 2 == 0 and w % 2 == 0
    oh, ow = h // 2, w // 2
    f32 = x.dtype == jnp.float32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    k = kernel.astype(x.dtype)
    out = None
    for r in (0, 1):
        br = xp[:, r::2].reshape(n, oh + 1, ow + 1, 2 * c)
        for a in (0, 1):
            for b in (0, 1):
                wab = k[2 * a + r, 2 * b:2 * b + 2].reshape(2 * c, cout)
                xab = jax.lax.slice(
                    br, (0, a, b, 0), (n, a + oh, b + ow, 2 * c)
                )
                y = _dot(xab, wab, f32)
                out = y if out is None else out + y
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _fwd_impl(x, kernel, bias):
    n, h, w, c = x.shape
    kh, kw, kc, cout = kernel.shape
    assert (kh, kw) == (4, 4) and kc == c and h % 2 == 0 and w % 2 == 0
    return _blocked_dots(_s2d(x), kernel, bias, h // 2, w // 2)


def _blocked_dots(blocks, kernel, bias, oh, ow):
    """Four static-slice K=4A matmuls on a pre-blocked (N,oh+1,ow+1,4A)
    space-to-depth tensor (channel order (r, s, c), matching _wprime;
    A >= C means an aligned zero-padded block layout)."""
    n, _, _, c4 = blocks.shape
    dtype = blocks.dtype
    f32 = dtype == jnp.float32
    out = None
    for i, wab in enumerate(_wprime(kernel.astype(dtype), align=c4 // 4)):
        a, b = divmod(i, 2)
        xab = jax.lax.slice(blocks, (0, a, b, 0), (n, a + oh, b + ow, c4))
        y = _dot(xab, wab, f32)
        out = y if out is None else out + y
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def conv4x4_s2d_blocked(
    blocks: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """conv4x4_stride2 on a pre-blocked SINGLE-tensor s2d input.

    `blocks` is the (N, H/2+1, W/2+1, 4A) channel-concat of the four parity
    phases in (r, s, c) order (ops.resize.upsample_softmax_s2d(...,
    blocked=True), A == C) or its 32-aligned zero-padded form
    (blocked='aligned', A == ceil32(C) >= C — the pad lanes meet zero
    kernel rows). Four K=4A static-slice matmuls — one quarter of the
    M-dim streaming passes of the 16 K=C dots conv4x4_s2d_phases needs
    (profiled: the phase form's D conv1 runs at ~21 TF/s because each of
    the 16 tiny-K dots pays a full pass over the M=N*H*W/4 rows)."""
    n, hb, wb, c4 = blocks.shape
    kh, kw, kc, cout = kernel.shape
    assert (kh, kw) == (4, 4) and c4 % 4 == 0 and c4 // 4 >= kc
    return _blocked_dots(blocks, kernel, bias, hb - 1, wb - 1)


def conv4x4_s2d_phases(
    phases, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """conv4x4_stride2 on a pre-blocked parity-phase input.

    `phases` is the 4-tuple (index 2r + s) of (N, H/2+1, W/2+1, C) tensors
    from ops.resize.upsample_softmax_s2d: phase_rs[u, v] = x_pad[2u+r, 2v+s].
    Then out(i, j) = sum_{a,b,r,s} phase_rs[i+a, j+b] @ W[2a+r, 2b+s] —
    sixteen static-slice K=C matmuls, algebraically identical to
    conv4x4_stride2(x, ...) but with NO space-to-depth shuffle anywhere:
    the producer already emitted blocks (the relayout that cost ~7.6 ms
    across the six discriminator applications of the multi-level step).
    """
    n, hb, wb, c = phases[0].shape
    kh, kw, kc, cout = kernel.shape
    assert (kh, kw) == (4, 4) and kc == c
    oh, ow = hb - 1, wb - 1
    dtype = phases[0].dtype
    f32 = dtype == jnp.float32
    k = kernel.astype(dtype)
    out = None
    for r in (0, 1):
        for s in (0, 1):
            p = phases[2 * r + s]
            for a in (0, 1):
                for b in (0, 1):
                    xab = jax.lax.slice(
                        p, (0, a, b, 0), (n, a + oh, b + ow, c)
                    )
                    y = _dot(xab, k[2 * a + r, 2 * b + s], f32)
                    out = y if out is None else out + y
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
