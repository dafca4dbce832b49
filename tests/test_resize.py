"""Golden tests: align_corners=True bilinear resize vs torch interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from adaptsegnet_tpu.ops import resize_bilinear_align_corners, upsample_logits


def torch_resize(x_nhwc: np.ndarray, out_hw) -> np.ndarray:
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    y = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=True)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((64, 128), (512, 1024)),   # train-time logit upsample shape ratio
        ((64, 128), (1024, 2048)),  # eval upsample
        ((7, 9), (20, 31)),         # non-integer scale
        ((20, 31), (7, 9)),         # downsample
        ((5, 5), (5, 5)),           # identity
        ((1, 4), (3, 8)),           # degenerate single row
    ],
)
def test_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    ref = torch_resize(x, out_hw)
    # Matmul formulation accumulates in a different order than torch's lerp;
    # agreement is to float32 round-off.
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_hwc_rank3(rng):
    x = rng.standard_normal((6, 8, 4), dtype=np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (12, 16)))
    ref = torch_resize(x[None], (12, 16))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_upsample_logits_alias(rng):
    x = rng.standard_normal((1, 8, 16, 19), dtype=np.float32)
    a = np.asarray(upsample_logits(jnp.asarray(x), (64, 128)))
    b = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (64, 128)))
    np.testing.assert_array_equal(a, b)


def test_preserves_dtype(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    out = resize_bilinear_align_corners(jnp.asarray(x, dtype=jnp.bfloat16), (16, 16))
    assert out.dtype == jnp.bfloat16
