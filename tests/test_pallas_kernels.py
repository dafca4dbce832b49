"""Pallas kernels vs their XLA-lowering references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.pallas.upsample_argmax import upsample_argmax
from adaptsegnet_tpu.ops.resize import resize_bilinear_align_corners


def reference_upsample_argmax(logits, out_hw):
    up = resize_bilinear_align_corners(logits, out_hw, exact=False)
    return np.asarray(jnp.argmax(up, axis=-1).astype(jnp.uint8))


@pytest.mark.parametrize("shape,out_hw", [
    ((1, 8, 16, 19), (64, 128)),
    ((2, 8, 16, 19), (32, 256)),
    ((1, 4, 8, 5), (4, 8)),        # identity size
])
def test_upsample_argmax_matches_xla(rng, shape, out_hw):
    logits = jnp.asarray(
        rng.standard_normal(shape).astype(np.float32), jnp.bfloat16
    )
    ours = np.asarray(upsample_argmax(logits, out_hw, interpret=True))
    ref = reference_upsample_argmax(logits, out_hw)
    # bf16 interpolation in two different association orders flips the
    # argmax on near-ties (random logits tie often; real logit maps have
    # much larger margins). Inspected mismatches are all genuine ties at
    # bf16 resolution.
    agree = (ours == ref).mean()
    assert agree > 0.99, f"only {agree:.4%} agreement"


def test_upsample_argmax_first_index_tiebreak():
    # Two identical channels: argmax must pick the first.
    x = jnp.zeros((1, 4, 8, 3), jnp.float32)
    x = x.at[..., 1].set(5.0).at[..., 2].set(5.0)
    out = np.asarray(upsample_argmax(x, (8, 16), interpret=True))
    assert (out == 1).all()
