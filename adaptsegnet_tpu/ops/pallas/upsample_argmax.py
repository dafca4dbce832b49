"""Fused bilinear-upsample + channel-argmax Pallas kernel (eval tail).

The eval protocol upsamples stride-8 logits (64x128x19) to 1024x2048 with
align_corners=True bilinear and takes the per-pixel argmax (reference
evaluate_cityscapes.py:153-169). Lowered separately, XLA materializes the
(1024, 2048, 19) logit tensor in HBM (80-160 MB of traffic) just to reduce
it to a uint8 mask.

This kernel keeps everything in VMEM, channel-MAJOR so the 19-channel axis
lands on sublanes (lane-padding a 19-wide trailing axis would waste 6.7x
VMEM — the layout lesson of this kernel):
  phase 1 (grid step 0 only) — width interpolation once per INPUT row:
      yw[h] = x[h]^T @ MwT, a (C, w) x (w, W_out) MXU matmul per row,
      persisted in scratch across the sequential TPU grid;
  phase 2 (every grid step) — per output row, a 2-row lerp (the height
      interpolation) and a first-index channel argmax over sublanes.

Argmax tie-breaking picks the FIRST maximal channel (numpy/torch parity).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 128  # output rows per grid step (int32 block = 1 MB VMEM)


def _hweights(in_len: int, out_len: int):
    """Per-output-row source indices and lerp weight (i0, i1, w1)."""
    if out_len == 1 or in_len == 1:
        i0 = np.zeros(out_len, np.int32)
        return i0, i0.copy(), np.zeros(out_len, np.float32)
    src = np.arange(out_len, dtype=np.float64) * ((in_len - 1) / (out_len - 1))
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_len - 1)
    i1 = np.minimum(i0 + 1, in_len - 1)
    w1 = (src - i0).astype(np.float32)
    return i0.astype(np.int32), i1.astype(np.int32), w1


def _kernel(i0_ref, i1_ref, wh_ref, x_ref, mwt_ref, out_ref, yw_ref):
    h, w, c = x_ref.shape[1:]
    row_tile = out_ref.shape[1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _fill_yw():
        def winterp(row, _):
            xt = x_ref[0, row, :, :].T  # (C, w)
            yw_ref[row] = jnp.dot(
                xt, mwt_ref[:], preferred_element_type=jnp.float32
            ).astype(yw_ref.dtype)
            return _

        jax.lax.fori_loop(0, h, winterp, None, unroll=False)

    def hinterp(r, _):
        o = t * row_tile + r
        i0 = i0_ref[o]
        i1 = i1_ref[o]
        w1 = wh_ref[o]
        r0 = yw_ref[pl.ds(i0, 1)][0].astype(jnp.float32)  # (C, W_out)
        r1 = yw_ref[pl.ds(i1, 1)][0].astype(jnp.float32)
        y = r0 * (1.0 - w1) + r1 * w1
        m = jnp.max(y, axis=0, keepdims=True)
        chan = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
        idx = jnp.min(jnp.where(y >= m, chan, y.shape[0]), axis=0)
        out_ref[0, pl.ds(r, 1), :] = idx[None]
        return _

    jax.lax.fori_loop(0, row_tile, hinterp, None, unroll=False)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def upsample_argmax(
    logits: jnp.ndarray,
    out_hw: tuple[int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, h, w, C) logits -> (N, H, W) uint8 argmax of the bilinear
    (align_corners=True) upsample. C must be <= 255.

    VMEM: x block + MwT (w, W) + yw scratch (h, C, W bf16) + int32 out tile.
    Eval shapes (64x128x19 -> 1024x2048) use ~8 MB.
    """
    from adaptsegnet_tpu.ops.resize import _interp_matrix

    n, h, w, c = logits.shape
    oh, ow = out_hw
    row_tile = min(_ROW_TILE, oh)
    assert oh % row_tile == 0, f"output height {oh} % {row_tile} != 0"
    i0, i1, w1 = _hweights(h, oh)
    mwt = _interp_matrix(w, ow).T  # (w, W_out)

    out = pl.pallas_call(
        _kernel,
        grid=(n, oh // row_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i, t: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_tile, ow), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        # int32 inside the kernel (Mosaic restricts dynamic-row uint8
        # stores); the cast fuses into the HBM copy out.
        out_shape=jax.ShapeDtypeStruct((n, oh, ow), jnp.int32),
        scratch_shapes=[pltpu.VMEM((h, c, ow), jnp.bfloat16)],
        interpret=interpret,
    )(
        jnp.asarray(i0),
        jnp.asarray(i1),
        jnp.asarray(w1),
        logits,
        jnp.asarray(mwt, logits.dtype),
    )
    return out.astype(jnp.uint8)
