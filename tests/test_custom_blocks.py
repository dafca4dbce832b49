"""Custom-layer zoo tests (C7): pixel shuffle, spectral norm, instance norm,
PReLU, decoder head, discriminator stage blocks, Warper norm options."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.models.custom_blocks import (
    AdvancedDecoderOutput,
    Connection,
    DownDiscriminatorBlock,
    InstanceNorm2d,
    KeepDiscriminatorBlock,
    OneOneConvolution,
    PReLU,
    SpectralConv2d,
    SpectralConvTranspose2d,
    pixel_shuffle,
)
from adaptsegnet_tpu.models import Warper
from adaptsegnet_tpu.models.layers import ConvTranspose2d
from adaptsegnet_tpu.ops.conv_transpose4x4 import conv_transpose4x4_stride2


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 4, 6, 16), dtype=np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.pixel_shuffle(t, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 10, 5), dtype=np.float32)
    ours = np.asarray(InstanceNorm2d().apply({}, jnp.asarray(x)))
    ref = F.instance_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_prelu_matches_torch(rng):
    x = rng.standard_normal((1, 4, 4, 3), dtype=np.float32)
    m = PReLU()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(v, jnp.asarray(x)))
    ref = F.prelu(torch.from_numpy(x), torch.tensor([0.25])).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_spectral_conv_matches_torch(rng):
    """One power iteration from the same u: outputs must match torch's
    spectral_norm-wrapped conv."""
    x = rng.standard_normal((1, 8, 8, 6), dtype=np.float32)
    m = SpectralConv2d(features=4, kernel_size=3, padding=1, use_bias=False)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])  # HWIO
    u0 = np.asarray(v["spectral"]["u"])

    conv = torch.nn.Conv2d(6, 4, 3, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
    sn = torch.nn.utils.spectral_norm(conv, eps=1e-12)
    with torch.no_grad():
        sn.weight_u.copy_(torch.from_numpy(u0))
    sn.train()
    ref = sn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    out, mut = m.apply(v, jnp.asarray(x), update_stats=True,
                       mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)
    # u updated.
    assert not np.allclose(np.asarray(mut["spectral"]["u"]), u0)


def test_advanced_decoder_output_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128), dtype=np.float32))
    m = AdvancedDecoderOutput(out_ch=3)
    v = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 16, 16, 3)  # pixel shuffle x2


def test_discriminator_blocks_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8), dtype=np.float32))
    down = DownDiscriminatorBlock(features=16)
    v = down.init(jax.random.PRNGKey(0), x)
    out, _ = down.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 8, 8, 16)

    keep = KeepDiscriminatorBlock(features=16, norm="Spectral")
    v = keep.init(jax.random.PRNGKey(1), x)
    out, _ = keep.apply(v, x, train=True, mutable=["spectral"])
    assert out.shape == (1, 15, 15, 16)  # k4/s1/p1 shrinks by 1


@pytest.mark.parametrize("norm", ["Instance", "Spectral"])
def test_warper_norm_options(rng, norm):
    m = Warper(norm=norm)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3), dtype=np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros_like(x))
    mutable = ["spectral"] if norm == "Spectral" else []
    if mutable:
        (flow, wl), _ = jax.jit(
            lambda v, y: m.apply(v, y, train=True, mutable=mutable)
        )(v, x)
    else:
        flow, wl = jax.jit(lambda v, y: m.apply(v, y, train=True))(v, x)
    assert flow.shape == (1, 512, 512, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_conv_transpose4x4_matches_torch(rng):
    for cin, cout, h, w, bias in [(3, 8, 6, 10, True), (16, 5, 8, 8, False)]:
        x = rng.standard_normal((2, h, w, cin), dtype=np.float32)
        wt = rng.standard_normal((cin, cout, 4, 4), dtype=np.float32) * 0.1
        b = rng.standard_normal(cout).astype(np.float32) if bias else None
        ref = F.conv_transpose2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(wt),
            None if b is None else torch.from_numpy(b), stride=2, padding=1,
        ).permute(0, 2, 3, 1).numpy()
        k = jnp.asarray(np.transpose(wt, (2, 3, 0, 1)))
        out = conv_transpose4x4_stride2(
            jnp.asarray(x), k, None if b is None else jnp.asarray(b))
        assert out.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_conv_transpose4x4_grad_matches_torch(rng):
    x = rng.standard_normal((1, 6, 8, 4), dtype=np.float32)
    wt = rng.standard_normal((4, 3, 4, 4), dtype=np.float32) * 0.1
    tx = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    tw = torch.from_numpy(wt).requires_grad_(True)
    F.conv_transpose2d(tx, tw, stride=2, padding=1).sum().backward()

    k = jnp.asarray(np.transpose(wt, (2, 3, 0, 1)))
    gx, gk = jax.grad(
        lambda a, b: jnp.sum(conv_transpose4x4_stride2(a, b)), argnums=(0, 1)
    )(jnp.asarray(x), k)
    np.testing.assert_allclose(
        np.asarray(gx), tx.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gk), tw.grad.permute(2, 3, 0, 1).numpy(),
        rtol=1e-4, atol=1e-5)


def test_conv_transpose_module_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 6), dtype=np.float32))
    m = ConvTranspose2d(features=4)
    v = m.init(jax.random.PRNGKey(0), x)
    assert v["params"]["conv"]["kernel"].shape == (4, 4, 6, 4)
    assert m.apply(v, x).shape == (1, 16, 16, 4)


def test_spectral_conv_transpose_matches_torch(rng):
    """torch spectral_norm on ConvTranspose2d normalizes over dim=1."""
    x = rng.standard_normal((1, 8, 8, 6), dtype=np.float32)
    m = SpectralConvTranspose2d(features=4, use_bias=False)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])  # HWIO
    u0 = np.asarray(v["spectral"]["u"])

    conv = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 3, 0, 1)))
    sn = torch.nn.utils.spectral_norm(conv, eps=1e-12)
    assert tuple(sn.weight_u.shape) == (4,)  # dim=1 -> out_channels
    with torch.no_grad():
        sn.weight_u.copy_(torch.from_numpy(u0))
    sn.train()
    ref = sn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    out, mut = m.apply(v, jnp.asarray(x), update_stats=True,
                       mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(out), ref.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    assert not np.allclose(np.asarray(mut["spectral"]["u"]), u0)


def test_one_one_convolution_matches_torch(rng):
    x = rng.standard_normal((1, 4, 4, 8), dtype=np.float32)
    m = OneOneConvolution(features=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # forward = the 'input' 1x1 conv only (reference custom_layers.py:62-64);
    # the unused one_one branch exists as params.
    assert "one_one_kernel" in v["params"]
    w = np.asarray(v["params"]["input"]["conv"]["kernel"])
    b = np.asarray(v["params"]["input"]["conv"]["bias"])
    ref = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   torch.from_numpy(b)).permute(0, 2, 3, 1).numpy()
    out = m.apply(v, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_connection_applies_projections(rng):
    m = Connection(num_layers=6, warp_channels=2)
    warp_list = [jnp.asarray(rng.standard_normal((1, 4, 4, 512), dtype=np.float32))
                 for _ in range(8)]
    v = m.init(jax.random.PRNGKey(0), warp_list)
    out = m.apply(v, warp_list)
    assert len(out) == 4  # 3 projections + passthrough tail
    assert all(o.shape == (1, 4, 4, 2) for o in out[:3])
    assert out[-1] is warp_list[-1]


def test_warper_dropout_active_in_train(rng):
    m = Warper(use_dropout=True)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3), dtype=np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros_like(x))
    apply_train = jax.jit(
        lambda v, y, k: m.apply(v, y, train=True, rngs={"dropout": k},
                                mutable=["batch_stats"])[0][0]
    )
    f1 = apply_train(v, x, jax.random.PRNGKey(1))
    f2 = apply_train(v, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    # eval mode: deterministic, no rng needed
    e1 = m.apply(v, x, train=False)[0]
    e2 = m.apply(v, x, train=False)[0]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
