"""Golden tests: conv1 patch-matrix Pallas kernels vs torch, all three
directions (ops/pallas/conv4x4_patch.py, interpret mode on CPU).

Torch reference: the discriminator's first layer is
Conv2d(C, ndf, 4, stride=2, padding=1) (reference model/discriminator.py:10).
The kernel consumes the s2d parity PHASES of the (padded) input — whose
entries include the conv pad positions as real inputs — so the torch
oracle runs conv2d with padding=0 on an explicitly padded variable: its
input grad then covers the pad entries, matching the op's dphases.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.pallas.conv4x4_patch import (
    conv4x4_s2_phases_planar,
)


def _planar_phases(xp):
    """(N, H+2, W+2, C) padded dense -> 4 planar (N, C, Hb, Wb) phases,
    phase_rs[u, v] = xp[2u + r, 2v + s] (index 2r + s)."""
    n, hp, wp, c = xp.shape
    hb, wb = (hp - 2) // 2 + 1, (wp - 2) // 2 + 1
    out = []
    for r in (0, 1):
        for s in (0, 1):
            p = xp[:, r::2, s::2][:, :hb, :wb]
            out.append(jnp.transpose(jnp.asarray(p), (0, 3, 1, 2)))
    return tuple(out)


def _torch_ref(xp, w, b, g=None):
    """Forward (+grads wrt padded input / weights / bias) via torch."""
    txp = torch.from_numpy(xp).permute(0, 3, 1, 2).requires_grad_(True)
    tw = torch.from_numpy(w.transpose(3, 2, 0, 1)).requires_grad_(True)
    tb = torch.from_numpy(b).requires_grad_(True)
    y = F.conv2d(txp, tw, tb, stride=2, padding=0)
    if g is None:
        return y.detach().permute(0, 2, 3, 1).numpy(), None, None, None
    y.backward(torch.from_numpy(g).permute(0, 3, 1, 2))
    return (
        y.detach().permute(0, 2, 3, 1).numpy(),
        txp.grad.permute(0, 2, 3, 1).numpy(),
        tw.grad.permute(2, 3, 1, 0).numpy(),
        tb.grad.numpy(),
    )


CASES = [
    (1, 8, 12, 5, 8),
    (2, 8, 16, 19, 16),   # the real channel count
    (1, 6, 8, 3, 8),      # R=... odd height factor path
]


@pytest.mark.parametrize("n,h,w,c,cout", CASES)
def test_forward_matches_torch(rng, n, h, w, c, cout):
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    wk = rng.standard_normal((4, 4, c, cout), dtype=np.float32) * 0.1
    b = rng.standard_normal((cout,), dtype=np.float32)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref, _, _, _ = _torch_ref(xp, wk, b)
    got = conv4x4_s2_phases_planar(
        _planar_phases(xp), jnp.asarray(wk), jnp.asarray(b), True
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,h,w,c,cout", CASES[:2])
def test_gradients_match_torch(rng, n, h, w, c, cout):
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    wk = rng.standard_normal((4, 4, c, cout), dtype=np.float32) * 0.1
    b = rng.standard_normal((cout,), dtype=np.float32)
    g = rng.standard_normal((n, h // 2, w // 2, cout), dtype=np.float32)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    _, dxp, dw, db = _torch_ref(xp, wk, b, g)

    phases = _planar_phases(xp)
    f = lambda ps, w_, b_: conv4x4_s2_phases_planar(ps, w_, b_, True)
    _, vjp = jax.vjp(f, phases, jnp.asarray(wk), jnp.asarray(b))
    dphases, dwk, dbk = vjp(jnp.asarray(g))

    ref_dphases = _planar_phases(dxp)
    for got, ref in zip(dphases, ref_dphases):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwk), dw, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dbk), db, rtol=1e-4, atol=1e-5)


def test_planar_producer_matches_cminor(rng):
    """upsample_softmax_s2d_planar == transpose(upsample_softmax_s2d)."""
    from adaptsegnet_tpu.ops.resize import (
        upsample_softmax_s2d,
        upsample_softmax_s2d_planar,
    )

    logits = jnp.asarray(rng.standard_normal((2, 5, 7, 19)), jnp.float32)
    ref = upsample_softmax_s2d(logits, (16, 24))
    got = upsample_softmax_s2d_planar(logits, (16, 24))
    assert len(got) == 4
    for p_ref, p_got in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(p_got), np.asarray(p_ref).transpose(0, 3, 1, 2),
            rtol=1e-5, atol=1e-6,
        )


def test_discriminator_planar_dispatch_matches_cminor(rng):
    """FCDiscriminator(PlanarPhases) == FCDiscriminator(c-minor phases):
    same params, same scores (CPU exercises the transpose fallback of
    the dispatch; the kernel itself is pinned by the tests above)."""
    from adaptsegnet_tpu.models import FCDiscriminator
    from adaptsegnet_tpu.ops.resize import (
        PlanarPhases,
        upsample_softmax_s2d,
        upsample_softmax_s2d_planar,
    )

    logits = jnp.asarray(rng.standard_normal((1, 4, 4, 19)), jnp.float32)
    cminor = upsample_softmax_s2d(logits, (32, 32))
    planar = upsample_softmax_s2d_planar(logits, (32, 32))
    assert isinstance(planar, PlanarPhases)

    disc = FCDiscriminator(num_classes=19, ndf=4)
    params = disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 19)))
    ref = disc.apply(params, cminor)
    got = disc.apply(params, planar)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
