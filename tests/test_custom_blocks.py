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
    DownDiscriminatorBlock,
    InstanceNorm2d,
    KeepDiscriminatorBlock,
    PReLU,
    SpectralConv2d,
    pixel_shuffle,
)
from adaptsegnet_tpu.models import Warper


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
