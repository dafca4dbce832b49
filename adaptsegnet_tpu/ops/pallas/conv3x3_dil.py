"""Dilated 3x3 stride-1 conv as nine MXU matmuls with VMEM-resident shifts.

The d-dilated 3x3 convs of the DeepLab backbone (layer3 d=2 C=256, layer4
d=4 C=512 at 64x128 bs-1 feature maps; reference model/deeplab_multi.py:
59-103 bottlenecks with the stride->dilation surgery) run 4-10x off
roofline in XLA's conv emitter inside the fused train step — profiled at
0.77 ms fwd / 2.0 ms dgrad per layer4 conv where the MXU roofline is
~0.2 ms (38.7 GFLOP at bs1). The kernel also supports d=1 (layer2's
stride-1 bottleneck convs, C=128), but layer2 stays on XLA: the r4
on-chip A/B measured the d=1 route at 47.55 ms vs 45.73 ms base in the
fused multi-level step (see `supported`) — the recurring lesson that
standalone-winning lowerings can lose 10-36 ms once XLA's layout
assignment reacts (ops/conv3x3.py NOTE); only `bench.py --train`
numbers flip lowering choices.

The TPU-native lowering: out[r, v] = sum_{dy,dx} x_pad[r + dy*d, v + dx*d]
@ K[dy, dx] — nine (R*W, C) @ (C, C) matmuls per R-row block, with every
shifted operand SLICED IN VMEM (the r2 XLA shifted-matmul experiment lost
in-step precisely because each shift materialized an HBM-round-trip copy;
see ops/conv3x3.py NOTE). Row halos come from passing the padded input
twice with block index maps offset by one R-row block: the two slabs
cover rows [i*R, i*R + 2R) and every dy*d row offset (dy <= 2, 2d <= R)
is a static in-VMEM slice of that window. Column shifts are static
sublane slices of the (R, W + 2d, C) slabs.

f32 accumulation in VMEM scratch; bf16 operands on the MXU; output bf16.
The kernel is used by ops/conv3x3.conv3x3_s1 for both the forward and
(with the flipped, io-swapped kernel) the dgrad whenever the bf16 +
channel-aligned conditions hold; wgrad keeps the nine-dot_general form.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s0_ref, s1_ref, k_ref, o_ref, acc_ref, *, d, r, w, cin, cout):
    """One (1, R, W, C_out) output block.

    s0/s1: (1, R, W+2d, C_in) row slabs at block rows i and i+1 of the
    padded input — together the rows [i*R, i*R + 2R).
    k: (9*C_in, C_out), row-blocks ordered (dy, dx).
    """
    s0 = s0_ref[0]
    s1 = s1_ref[0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        start = dy * d  # row offset of this tap within the [0, 2R) window
        if start == 0:
            window = s0
        elif start >= r:
            window = s1[start - r : start]
        else:
            window = jnp.concatenate([s0[start:], s1[:start]], axis=0)
        for dx in range(3):
            tap = window[:, dx * d : dx * d + w, :].reshape(r * w, cin)
            kblk = k_ref[(3 * dy + dx) * cin : (3 * dy + dx + 1) * cin, :]
            acc_ref[:] += jnp.dot(
                tap, kblk, preferred_element_type=jnp.float32
            )
    o_ref[0] = acc_ref[:].reshape(r, w, cout).astype(o_ref.dtype)


def supported(x: jnp.ndarray, cout: int, dilation: int) -> bool:
    """Gate: bf16 on the real TPU backend, lane-aligned channels, row
    blocking divides H. (The f32 parity path keeps the HIGHEST-precision
    XLA conv; other backends keep XLA.)"""
    n, h, w, cin = x.shape
    d = dilation
    if d not in (2, 4):
        # d=1 (layer2 C=128) LOST its r4 on-chip A/B: in-step bench.py
        # --train multi-level 47.55 ms vs 45.73 ms base (3-run medians,
        # scripts/campaign_results.json 2026-08-19) — at C=128 the r=8 row
        # blocking re-reads each row slab ~3x while XLA's native conv
        # doesn't, and the win the kernel shows standalone inverts in-step
        # (the recurring ops/conv3x3.py NOTE lesson). layer2 stays XLA;
        # the kernel itself still supports d=1 for direct use/tests.
        return False
    r = 2 * d if 2 * d >= 8 else 8
    return (
        x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and cin % 128 == 0
        and cout % 128 == 0
        and h % r == 0
        and h // r >= 2
    )


# ---------------------------------------------------------- batch-blocked
# r5 experiment (verdict r4 #5): the bs8-vs-bs1 eval gap is XLA's dilated
# emitter running ~30% slower PER IMAGE at batch 8 (ops/conv3x3.py NOTE),
# and the bs1-shaped Pallas fwd lost in the bs8 eval graph because its 64
# kernel boundaries (8 imgs x 8 row blocks) block XLA's fusion. This
# variant processes NB images per grid step — NB x fewer boundaries, NB x
# larger M per dot — the one untried axis the NOTE records.


def _kernel_batched(s0_ref, s1_ref, k_ref, o_ref, acc_ref,
                    *, d, r, w, cin, cout, nb):
    s0 = s0_ref[:]
    s1 = s1_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        start = dy * d
        if start == 0:
            window = s0
        elif start >= r:
            window = s1[:, start - r : start]
        else:
            window = jnp.concatenate([s0[:, start:], s1[:, :start]], axis=1)
        for dx in range(3):
            # (NB, R, W, C) -> (NB*R*W, C): minor dim 128-aligned, so the
            # collapse is a supported layout-preserving reshape.
            tap = window[:, :, dx * d : dx * d + w, :].reshape(
                nb * r * w, cin)
            kblk = k_ref[(3 * dy + dx) * cin : (3 * dy + dx + 1) * cin, :]
            acc_ref[:] += jnp.dot(
                tap, kblk, preferred_element_type=jnp.float32
            )
    o_ref[:] = acc_ref[:].reshape(nb, r, w, cout).astype(o_ref.dtype)


def _pick_nb(n, h, w, cin, cout, d, r, budget=12 * 2**20):
    """Largest batch sub-block whose VMEM residency (two slabs double-
    buffered + f32 acc + bf16 tap + kernel matrix) fits the budget."""
    wp = w + 2 * d
    for nb in (8, 4, 2):
        slabs = 2 * 2 * nb * r * wp * cin * 2
        acc = nb * r * w * cout * 4
        tap = nb * r * w * cin * 2
        kmat = 9 * cin * cout * 2
        if n % nb == 0 and slabs + acc + tap + kmat <= budget:
            return nb
    return 1


def supported_batched(x: jnp.ndarray, cout: int, dilation: int) -> bool:
    n, h, w, cin = x.shape
    d = dilation
    if d not in (1, 2, 4):
        return False
    r = 2 * d if 2 * d >= 8 else 8
    return (
        x.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and cin % 128 == 0
        and cout % 128 == 0
        and h % r == 0
        and h // r >= 2
        and _pick_nb(n, h, w, cin, cout, d, r) > 1
    )


def conv3x3_dil_mxu_batched(
    x: jnp.ndarray, k: jnp.ndarray, dilation: int,
    interpret: bool = False, nb: int | None = None,
) -> jnp.ndarray:
    """conv3x3_dil_mxu with NB images per grid step (module NOTE above).
    Forward-only experiment for the batched eval graph; the train step
    keeps the bs1-tuned kernel."""
    n, h, w, cin = x.shape
    cout = k.shape[-1]
    d = dilation
    r = 2 * d if 2 * d >= 8 else 8
    if nb is None:
        nb = _pick_nb(n, h, w, cin, cout, d, r)
    assert n % nb == 0 and h % r == 0 and h // r >= 2, (n, nb, h, r)
    wp = w + 2 * d
    xp = jnp.pad(x, ((0, 0), (d, 2 * r - d), (d, d), (0, 0)))
    kf = k.reshape(9 * cin, cout)
    return pl.pallas_call(
        functools.partial(
            _kernel_batched, d=d, r=r, w=w, cin=cin, cout=cout, nb=nb
        ),
        grid=(n // nb, h // r),
        in_specs=[
            pl.BlockSpec((nb, r, wp, cin), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, r, wp, cin), lambda i, t: (i, t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, r, w, cout), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((nb * r * w, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * cin * cout,
            bytes_accessed=2 * n * h * w * (2 * cin + cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, kf)


def conv3x3_dil_mxu(
    x: jnp.ndarray, k: jnp.ndarray, dilation: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv3x3(x, k, stride=1, padding=dilation, dilation=dilation), NHWC.

    Same contract as the XLA lowering in ops/conv3x3._fwd_conv; bf16 in,
    bf16 out, f32 accumulation. Differentiate via conv3x3_s1 (custom VJP)
    — this is the raw forward lowering.
    """
    n, h, w, cin = x.shape
    kh, kw, kci, cout = k.shape
    assert (kh, kw, kci) == (3, 3, cin), (k.shape, x.shape)
    d = dilation
    r = 2 * d if 2 * d >= 8 else 8
    assert h % r == 0 and h // r >= 2, (h, r)
    wp = w + 2 * d
    # Rows padded to (i_max + 1 + 1) * r = h + 2r so the second (i+1) row
    # slab exists for the last block; rows beyond h + 2d are never read.
    xp = jnp.pad(x, ((0, 0), (d, 2 * r - d), (d, d), (0, 0)))
    kf = k.reshape(9 * cin, cout)

    out = pl.pallas_call(
        functools.partial(
            _kernel, d=d, r=r, w=w, cin=cin, cout=cout
        ),
        grid=(n, h // r),
        in_specs=[
            pl.BlockSpec((1, r, wp, cin), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, wp, cin), lambda i, t: (i, t + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, w, cout), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((r * w, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * cin * cout,
            bytes_accessed=2 * n * h * w * (2 * cin + cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, kf)
    return out
