"""Custom-VJP backbone convs (ops/conv3x3.py): forward + grad parity vs
torch's conv2d autograd, across dilations and the 7x7/s2 stem."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.conv3x3 import conv3x3_s1, conv7x7_s2


@pytest.mark.parametrize("dilation,cin,cout", [(1, 8, 16), (2, 16, 8), (4, 8, 8)])
def test_conv3x3_forward_and_grads_match_torch(rng, dilation, cin, cout):
    d = dilation
    x = rng.standard_normal((2, 12, 16, cin), dtype=np.float32)
    w = rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.1
    dy = rng.standard_normal((2, 12, 16, cout), dtype=np.float32)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1)).requires_grad_(True)
    ty = F.conv2d(tx, tw, stride=1, padding=d, dilation=d)
    ty.backward(torch.from_numpy(dy).permute(0, 3, 1, 2))

    f = lambda x_, w_: conv3x3_s1(x_, w_, d, True)
    y, vjp = jax.vjp(f, jnp.asarray(x), jnp.asarray(w))
    gx, gw = vjp(jnp.asarray(dy))

    np.testing.assert_allclose(
        np.asarray(y), ty.detach().permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gx), tx.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gw), tw.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-4, atol=1e-4)


def test_conv7x7_s2_forward_and_wgrad_match_torch(rng):
    x = rng.standard_normal((1, 32, 48, 3), dtype=np.float32)
    w = rng.standard_normal((7, 7, 3, 16), dtype=np.float32) * 0.1
    dy = rng.standard_normal((1, 16, 24, 16), dtype=np.float32)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1)).requires_grad_(True)
    ty = F.conv2d(tx, tw, stride=2, padding=3)
    ty.backward(torch.from_numpy(dy).permute(0, 3, 1, 2))

    f = lambda x_, w_: conv7x7_s2(x_, w_, True)
    y, vjp = jax.vjp(f, jnp.asarray(x), jnp.asarray(w))
    gx, gw = vjp(jnp.asarray(dy))

    np.testing.assert_allclose(
        np.asarray(y), ty.detach().permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gw), tw.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx), tx.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("gate", ["0", "1"])
def test_stem_wgrad_rowparity_gate_matches_torch(rng, monkeypatch, gate):
    """Both stem-wgrad arms match torch: '1' = row-parity s2d build
    (32 K=2C dots, the default since the r4 on-chip A/B) and '0' = the
    6D-shuffle fallback kept for A/B (advisor r4: with the default
    flipped to '1', the fallback needs its own parity coverage)."""
    monkeypatch.setenv("ADAPTSEG_STEM_WGRAD_RP", gate)
    x = rng.standard_normal((1, 32, 48, 3), dtype=np.float32)
    w = rng.standard_normal((7, 7, 3, 16), dtype=np.float32) * 0.1
    dy = rng.standard_normal((1, 16, 24, 16), dtype=np.float32)

    tw = torch.from_numpy(w.transpose(3, 2, 0, 1)).requires_grad_(True)
    ty = F.conv2d(torch.from_numpy(x.copy()).permute(0, 3, 1, 2), tw,
                  stride=2, padding=3)
    ty.backward(torch.from_numpy(dy).permute(0, 3, 1, 2))

    f = lambda x_, w_: conv7x7_s2(x_, w_, True)
    _, vjp = jax.vjp(f, jnp.asarray(x), jnp.asarray(w))
    _, gw = vjp(jnp.asarray(dy))
    np.testing.assert_allclose(
        np.asarray(gw), tw.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-4, atol=1e-4)


def test_stem_bf16_s2d_path_matches_f32(rng):
    """bf16 stem takes the space-to-depth 4x4 lowering; values match the
    f32 native-conv path within bf16 tolerance."""
    x = rng.standard_normal((1, 32, 48, 3), dtype=np.float32)
    w = rng.standard_normal((7, 7, 3, 16), dtype=np.float32) * 0.1
    y32 = conv7x7_s2(jnp.asarray(x), jnp.asarray(w), True)
    y16 = conv7x7_s2(jnp.asarray(x, jnp.bfloat16),
                     jnp.asarray(w, jnp.bfloat16), False)
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("dilation", [2, 4])
def test_bf16_shifted_path_matches_f32(rng, dilation):
    """bf16 dilated convs take the shifted-matmul lowering; values and
    gradients agree with the f32 XLA-conv path within bf16 tolerance."""
    d = dilation
    x = rng.standard_normal((1, 12, 16, 8), dtype=np.float32)
    w = rng.standard_normal((3, 3, 8, 8), dtype=np.float32) * 0.1
    dy = rng.standard_normal((1, 12, 16, 8), dtype=np.float32)

    y32, vjp32 = jax.vjp(lambda a, b: conv3x3_s1(a, b, d, True),
                         jnp.asarray(x), jnp.asarray(w))
    gx32, gw32 = vjp32(jnp.asarray(dy))
    y16, vjp16 = jax.vjp(
        lambda a, b: conv3x3_s1(a, b, d, False),
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16))
    gx16, gw16 = vjp16(jnp.asarray(dy, jnp.bfloat16))
    for a16, a32 in ((y16, y32), (gx16, gx32), (gw16, gw32)):
        np.testing.assert_allclose(
            np.asarray(a16, np.float32), np.asarray(a32),
            rtol=0.06, atol=0.06)


def test_custom_vjp_matches_autodiff_of_native_conv(rng):
    """The custom backward must be numerically interchangeable with plain
    autodiff of the same forward (same math, different lowering)."""
    x = jnp.asarray(rng.standard_normal((1, 10, 14, 8), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8), dtype=np.float32) * 0.1)

    def native(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), ((2, 2), (2, 2)), rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)

    loss_c = lambda x_, w_: jnp.sum(conv3x3_s1(x_, w_, 2, True) ** 2)
    loss_n = lambda x_, w_: jnp.sum(native(x_, w_) ** 2)
    gc = jax.grad(loss_c, argnums=(0, 1))(x, w)
    gn = jax.grad(loss_n, argnums=(0, 1))(x, w)
    for a, b in zip(gc, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout,d", [(128, 128, 1), (128, 128, 2),
                                        (128, 256, 4)])
def test_conv3x3_dil_pallas_matches_xla(rng, cin, cout, d):
    """The Pallas shifted-matmul lowering (interpret mode on CPU) == the
    XLA dilated conv, at layer3/4-like geometry (H % 2d == 0, lane-aligned
    channels)."""
    from adaptsegnet_tpu.ops.pallas.conv3x3_dil import conv3x3_dil_mxu

    x = jnp.asarray(rng.standard_normal((2, 16, 24, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                    jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_dil_mxu(x, k, d, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nb,d", [(2, 2), (4, 4), (2, 1)])
def test_conv3x3_dil_pallas_batched_matches_xla(rng, nb, d):
    """The NB-images-per-block variant (r5 eval-bs8 experiment,
    ADAPTSEG_EVAL_BATCHED_CONV) == the XLA dilated conv."""
    from adaptsegnet_tpu.ops.pallas.conv3x3_dil import conv3x3_dil_mxu_batched

    cin = cout = 128
    x = jnp.asarray(rng.standard_normal((4, 16, 24, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                    jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_dil_mxu_batched(x, k, d, interpret=True, nb=nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv1x1_forward_and_grads_match_torch(rng):
    from adaptsegnet_tpu.ops.conv1x1 import conv1x1_s1

    cin, cout = 12, 20
    x = rng.standard_normal((2, 8, 10, cin), dtype=np.float32)
    w = rng.standard_normal((1, 1, cin, cout), dtype=np.float32) * 0.1
    dy = rng.standard_normal((2, 8, 10, cout), dtype=np.float32)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1)).requires_grad_(True)
    ty = F.conv2d(tx, tw)
    ty.backward(torch.from_numpy(dy).permute(0, 3, 1, 2))

    y, vjp = jax.vjp(conv1x1_s1, jnp.asarray(x), jnp.asarray(w))
    gx, gw = vjp(jnp.asarray(dy))
    np.testing.assert_allclose(
        np.asarray(y), ty.detach().permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gx), tx.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gw), tw.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-4, atol=1e-4)
