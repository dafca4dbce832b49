"""MXU-friendly ASPP: multi-dilation 3x3 conv-sum as one matmul + shifts.

The ASPP head sums four 3x3 convs with dilations {6,12,18,24} down to 19
classes (reference model/deeplab_multi.py:106-121). Lowered as convolutions,
each has 19 output channels — 15% lane utilization on the 128-wide MXU, so
XLA pads 6.7x waste into the hottest head of the network.

Identity used here: a dilated 3x3 conv is the sum of 9 spatially-shifted
1x1 convs. Concatenating all 4 branches' 9 taps gives ONE (C, 36*19=684)
matmul over the feature map — 684 columns tile the MXU well — followed by
36 static shift-adds of thin (…, 19) slices, which are pure VPU/bandwidth
work that XLA fuses. Same FLOPs, ~6x better MXU shape.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaptsegnet_tpu.ops.precision import F32_PRECISION


def pack_aspp_weights(kernels: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Stack per-branch HWIO (3,3,C,K) kernels into a (C, B*9*K) matrix.

    Column block order: (branch, ky, kx) row-major, each block K wide.
    """
    cols = []
    for w in kernels:
        kh, kw, c, k = w.shape
        assert (kh, kw) == (3, 3)
        for ky in range(3):
            for kx in range(3):
                cols.append(w[ky, kx])  # (C, K)
    return jnp.concatenate(cols, axis=-1)


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out(h, w) = x(h + dy, w + dx) with zero fill (static shifts)."""
    n, h, w, c = x.shape
    pt, pb = max(0, -dy), max(0, dy)
    pl, pr = max(0, -dx), max(0, dx)
    y = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    return y[:, pt + dy : pt + dy + h, pl + dx : pl + dx + w, :]


def _prec(dtype):
    return F32_PRECISION if dtype == jnp.float32 else None


_K_PAD = 32  # aligned-fwd column-block width: 19 -> 32 (sublane multiple)


def _pack_aspp_weights_padded(kernels, k_pad):
    """pack_aspp_weights with each (C, K) column block zero-padded to
    k_pad columns, so every tap block sits at a k_pad-aligned lane
    offset."""
    cols = []
    for w in kernels:
        kh, kw, c, k = w.shape
        assert (kh, kw) == (3, 3)
        for ky in range(3):
            for kx in range(3):
                cols.append(jnp.pad(w[ky, kx], ((0, 0), (0, k_pad - k))))
    return jnp.concatenate(cols, axis=-1)


def _aspp_fwd_aligned(x, kernels, biases, dils, k_out, prec):
    """Aligned forward: y blocks at 32-lane offsets, shifted blocks
    lane-concatenated once, summed by one (n*9*32, K) 0/1 selector matmul
    (plus bias). Same math as _aspp_fwd_impl up to summation order.

    NOT wired into _aspp_fwd_impl: it LOST both its r4 on-chip A/Bs
    (3-run medians, scripts/campaign_results.json 2026-08-19) — in-step
    bench.py --train multi-level 46.6 ms vs 44.89 ms base, eval bs1
    186.2 vs 204.5 img/s. The 32-padded column blocks grow the (…, 684)
    intermediate to (…, 1152) and add a second full-size matmul pass,
    which costs more HBM traffic than the partial-lane shift-adds it
    deletes (the recurring ops/conv3x3.py NOTE lesson: only in-step
    numbers flip lowerings). Kept for direct use/tests only."""
    n_taps = len(dils) * 9
    wcat = _pack_aspp_weights_padded(kernels, _K_PAD)  # (C, n*9*32)
    y = jax.lax.dot_general(
        x, wcat.astype(x.dtype),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(x.dtype)  # one extra rounding in bf16; f32 stays f32

    shifted = []
    col = 0
    for d in dils:
        for ky in (-1, 0, 1):
            for kx in (-1, 0, 1):
                sl = jax.lax.slice_in_dim(
                    y, col * _K_PAD, (col + 1) * _K_PAD, axis=3)
                shifted.append(_shift2d(sl, ky * d, kx * d))
                col += 1
    ycat = jnp.concatenate(shifted, axis=-1)  # (N, H, W, n*9*32), aligned

    sel = np.kron(np.ones((n_taps, 1), np.float32),
                  np.eye(_K_PAD, dtype=np.float32)[:, :k_out])
    out = jax.lax.dot_general(
        ycat, jnp.asarray(sel, x.dtype),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (N, H, W, K) f32
    for b in biases:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _aspp_fwd_impl(x, kernels, biases, dilations, n_sum):
    kernels = list(kernels)[:n_sum]
    biases = list(biases)[:n_sum]
    dils = list(dilations)[:n_sum]
    k_out = kernels[0].shape[-1]

    wcat = pack_aspp_weights(kernels)  # (C, n*9*K)
    y = jax.lax.dot_general(
        x, wcat.astype(x.dtype),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 inputs = the bit-parity path (TPU DEFAULT would multiply in
        # bf16); bf16 keeps the fast single pass. Matches ops/conv4x4.py.
        precision=_prec(x.dtype),
    )  # (N, H, W, n*9*K) in f32

    out = jnp.zeros(x.shape[:3] + (k_out,), jnp.float32)
    for b in biases:
        out = out + b.astype(jnp.float32)
    col = 0
    for d in dils:
        for ky in (-1, 0, 1):
            for kx in (-1, 0, 1):
                sl = jax.lax.slice_in_dim(y, col * k_out, (col + 1) * k_out,
                                          axis=3)
                out = out + _shift2d(sl, ky * d, kx * d)
                col += 1
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def aspp_matmul(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    dilations: Sequence[int],
    n_sum: int | None = None,
) -> jnp.ndarray:
    """sum_b conv3x3(x, kernels[b], dilation=d_b, padding=d_b) + biases.

    Exact (up to matmul association) equivalent of the branch-conv ASPP.
    `n_sum` limits summation to the first n branches (the reference
    early-return quirk) — unused branches are sliced away before the matmul
    so no FLOPs are spent on them (and receive zero gradients).

    Custom VJP: autodiff transposes the 36 zero-padded shift-adds into 36
    partial-lane (19-wide) scatter-writes into a (…, 684) buffer — a
    read-modify-write pad_add fusion measured at ~3 ms/step. The backward
    instead lane-concatenates the 36 counter-shifted cotangent copies once
    and recovers dx / dW with two clean MXU matmuls.
    """
    if n_sum is None:
        n_sum = len(kernels)
    return _aspp_fwd_impl(x, kernels, biases, dilations, int(n_sum))


def _aspp_fwd(x, kernels, biases, dilations, n_sum):
    if n_sum is None:
        n_sum = len(kernels)
    out = _aspp_fwd_impl(x, kernels, biases, dilations, int(n_sum))
    return out, (x, kernels, biases)


def _aspp_bwd(dilations, n_sum, res, g):
    x, kernels, biases = res
    n = int(n_sum) if n_sum is not None else len(kernels)
    dils = list(dilations)[:n]
    k_out = kernels[0].shape[-1]
    prec = _prec(x.dtype)

    gc = g.astype(x.dtype)
    cols = []
    for d in dils:
        for ky in (-1, 0, 1):
            for kx in (-1, 0, 1):
                # transpose of out += shift(col, ky*d, kx*d)
                cols.append(_shift2d(gc, -ky * d, -kx * d))
    gcat = jnp.concatenate(cols, axis=-1)  # (N, H, W, n*9*K)

    wcat = pack_aspp_weights(list(kernels)[:n]).astype(x.dtype)
    dx = jax.lax.dot_general(
        gcat, wcat,
        dimension_numbers=(((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(x.dtype)

    dwcat = jax.lax.dot_general(
        x, gcat,
        dimension_numbers=(((0, 1, 2), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (C, n*9*K)
    db_live = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))

    dkernels, dbiases = [], []
    col = 0
    for i, k in enumerate(kernels):
        if i < n:
            taps = []
            for ky in range(3):
                row = [
                    dwcat[:, (col + ky * 3 + kx) * k_out:
                          (col + ky * 3 + kx + 1) * k_out]
                    for kx in range(3)
                ]
                taps.append(jnp.stack(row))
            dkernels.append(jnp.stack(taps).astype(k.dtype))
            dbiases.append(db_live.astype(biases[i].dtype))
            col += 9
        else:
            dkernels.append(jnp.zeros_like(k))
            dbiases.append(jnp.zeros_like(biases[i]))
    return dx, dkernels, dbiases


aspp_matmul.defvjp(_aspp_fwd, _aspp_bwd)
