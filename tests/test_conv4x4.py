"""conv4x4_stride2: torch parity + custom-VJP == autodiff."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.conv4x4 import conv4x4_stride2


def test_forward_matches_torch(rng):
    x = rng.standard_normal((2, 16, 24, 7), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 7, 5)) * 0.1).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    ours = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(k.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grad_matches_torch(rng):
    """Autodiff grads through the matmul lowering == torch conv grads."""
    x = rng.standard_normal((1, 8, 12, 6), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 6, 3)) * 0.1).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)

    dx, dk, db = jax.grad(
        lambda x, k, b: jnp.sum(conv4x4_stride2(x, k, b)), argnums=(0, 1, 2)
    )(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    tk = torch.from_numpy(k.transpose(3, 2, 0, 1)).requires_grad_(True)
    tb = torch.from_numpy(b).requires_grad_(True)
    F.conv2d(tx, tk, tb, stride=2, padding=1).sum().backward()
    np.testing.assert_allclose(np.asarray(dx),
                               tx.grad.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk),
                               tk.grad.numpy().transpose(2, 3, 1, 0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), tb.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_forward_matches_torch_large_c(rng):
    """Torch parity at a discriminator-scale channel count."""
    x = rng.standard_normal((1, 8, 12, 40), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 40, 5)) * 0.1).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    ours = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(k.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_forward_matches_torch_rgb_stem(rng):
    """C=3 takes the row-parity path (the Warper encoder stem)."""
    x = rng.standard_normal((2, 12, 16, 3), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 3, 8)) * 0.1).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    ours = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(k.transpose(3, 2, 0, 1)),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grad_no_bias(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    k = jnp.asarray((rng.standard_normal((4, 4, 4, 2)) * 0.1).astype(np.float32))
    dx, dk = jax.grad(lambda x, k: jnp.sum(conv4x4_stride2(x, k, None)),
                      argnums=(0, 1))(x, k)
    assert dx.shape == x.shape and dk.shape == k.shape
    assert np.isfinite(np.asarray(dx)).all()


def _phases_of(x):
    """Reference parity-phase split: phase_rs[u, v] = pad1(x)[2u+r, 2v+s]."""
    n, h, w, c = x.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = []
    for r in (0, 1):
        for s in (0, 1):
            out.append(jnp.asarray(xp[:, r::2, s::2]))
    return tuple(out)


def test_s2d_phases_matches_dense(rng):
    from adaptsegnet_tpu.ops.conv4x4 import conv4x4_s2d_phases

    x = rng.standard_normal((2, 16, 24, 19), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 19, 8)) * 0.1).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    dense = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                       jnp.asarray(b)))
    phased = np.asarray(conv4x4_s2d_phases(_phases_of(x), jnp.asarray(k),
                                           jnp.asarray(b)))
    np.testing.assert_allclose(phased, dense, rtol=1e-5, atol=1e-5)


def test_s2d_blocked_matches_dense(rng):
    """conv4x4_s2d_blocked on the channel-concat (r,s,c) block tensor ==
    the dense conv, values AND input-side gradients."""
    from adaptsegnet_tpu.ops.conv4x4 import conv4x4_s2d_blocked

    x = rng.standard_normal((2, 16, 24, 19), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 19, 8)) * 0.1).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    blocks = jnp.concatenate(_phases_of(x), axis=-1)
    dense = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                       jnp.asarray(b)))
    got = np.asarray(conv4x4_s2d_blocked(blocks, jnp.asarray(k),
                                         jnp.asarray(b)))
    np.testing.assert_allclose(got, dense, rtol=1e-5, atol=1e-5)

    gk_dense = jax.grad(lambda k_: jnp.sum(
        conv4x4_stride2(jnp.asarray(x), k_, jnp.asarray(b)) ** 2))(
        jnp.asarray(k))
    gk_blocked = jax.grad(lambda k_: jnp.sum(
        conv4x4_s2d_blocked(blocks, k_, jnp.asarray(b)) ** 2))(
        jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(gk_blocked), np.asarray(gk_dense),
                               rtol=1e-4, atol=1e-4)


def test_s2d_aligned_blocked_matches_dense(rng):
    """conv4x4_s2d_blocked on the 32-ALIGNED zero-padded block tensor
    (blocked='aligned' producer layout) == the dense conv, values AND
    kernel gradients — the zero pad lanes meet zero kernel rows."""
    from adaptsegnet_tpu.ops.conv4x4 import conv4x4_s2d_blocked

    x = rng.standard_normal((2, 16, 24, 19), dtype=np.float32)
    k = (rng.standard_normal((4, 4, 19, 8)) * 0.1).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    blocks = jnp.concatenate(
        [jnp.pad(p, ((0, 0),) * 3 + ((0, 32 - 19),))
         for p in _phases_of(x)], axis=-1)
    assert blocks.shape[-1] == 128
    dense = np.asarray(conv4x4_stride2(jnp.asarray(x), jnp.asarray(k),
                                       jnp.asarray(b)))
    got = np.asarray(conv4x4_s2d_blocked(blocks, jnp.asarray(k),
                                         jnp.asarray(b)))
    np.testing.assert_allclose(got, dense, rtol=1e-5, atol=1e-5)

    gk_dense = jax.grad(lambda k_: jnp.sum(
        conv4x4_stride2(jnp.asarray(x), k_, jnp.asarray(b)) ** 2))(
        jnp.asarray(k))
    gk_aligned = jax.grad(lambda k_: jnp.sum(
        conv4x4_s2d_blocked(blocks, k_, jnp.asarray(b)) ** 2))(
        jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(gk_aligned), np.asarray(gk_dense),
                               rtol=1e-4, atol=1e-4)


def test_upsample_softmax_s2d_blocked_is_phase_concat(rng):
    from adaptsegnet_tpu.ops.resize import upsample_softmax_s2d

    x = jnp.asarray(rng.standard_normal((1, 8, 16, 19), dtype=np.float32))
    phases = upsample_softmax_s2d(x, (32, 64))
    (blocked,) = upsample_softmax_s2d(x, (32, 64), blocked=True)
    np.testing.assert_allclose(
        np.asarray(blocked), np.concatenate([np.asarray(p) for p in phases],
                                            axis=-1))
    (aligned,) = upsample_softmax_s2d(x, (32, 64), blocked="aligned")
    assert aligned.shape[-1] == 128
    np.testing.assert_allclose(
        np.asarray(aligned),
        np.concatenate([np.pad(np.asarray(p), ((0, 0),) * 3 + ((0, 13),))
                        for p in phases], axis=-1))


def test_discriminator_blocked_input_matches_dense(rng):
    """FCDiscriminator((blocked,)) == FCDiscriminator(array): same params,
    same output, same param gradients."""
    from adaptsegnet_tpu.models import FCDiscriminator

    x = rng.standard_normal((1, 32, 48, 19), dtype=np.float32)
    blocked = (jnp.concatenate(_phases_of(x), axis=-1),)
    d = FCDiscriminator(num_classes=19, ndf=8)
    v = d.init(jax.random.PRNGKey(0), jnp.asarray(x))

    dense = d.apply(v, jnp.asarray(x))
    got = d.apply(v, blocked)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)

    gd = jax.grad(lambda p: jnp.sum(d.apply({"params": p}, jnp.asarray(x))))(
        v["params"])
    gb = jax.grad(lambda p: jnp.sum(d.apply({"params": p}, blocked)))(
        v["params"])
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_upsample_softmax_s2d_matches_composition(rng):
    """Blocked producer == s2d(pad(softmax(upsample(x)))) split in channel
    groups (pad positions exactly zero)."""
    from adaptsegnet_tpu.ops.resize import (
        upsample_logits, upsample_softmax_s2d,
    )

    x = jnp.asarray(rng.standard_normal((1, 8, 16, 19), dtype=np.float32))
    out_hw = (32, 64)
    sm = np.asarray(jax.nn.softmax(upsample_logits(x, out_hw), axis=-1))
    want = _phases_of(sm)
    got = upsample_softmax_s2d(x, out_hw)
    for rs in range(4):
        np.testing.assert_allclose(np.asarray(got[rs]), np.asarray(want[rs]),
                                   rtol=1e-5, atol=1e-6)


def test_discriminator_phase_input_matches_dense(rng):
    """FCDiscriminator(tuple) == FCDiscriminator(array): same params, same
    output, same input gradients routed back through the phases."""
    from adaptsegnet_tpu.models import FCDiscriminator

    x = rng.standard_normal((1, 32, 48, 19), dtype=np.float32)
    d = FCDiscriminator(num_classes=19, ndf=8)
    v = d.init(jax.random.PRNGKey(0), jnp.asarray(x))

    dense = d.apply(v, jnp.asarray(x))
    phased = d.apply(v, _phases_of(x))
    np.testing.assert_allclose(np.asarray(phased), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)

    gd = jax.grad(lambda p: jnp.sum(d.apply({"params": p}, jnp.asarray(x))))(
        v["params"])
    gp = jax.grad(lambda p: jnp.sum(d.apply({"params": p}, _phases_of(x))))(
        v["params"])
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_discriminator_phase_init_matches_dense_layout(rng):
    """init() from a tuple input must create the identical param tree
    (paths AND shapes) as from an array input — checkpoint compatibility."""
    from adaptsegnet_tpu.models import FCDiscriminator

    d = FCDiscriminator(num_classes=19, ndf=8)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 19), dtype=np.float32))
    va = d.init(jax.random.PRNGKey(0), x)
    vp = d.init(jax.random.PRNGKey(0), _phases_of(np.asarray(x)))
    assert jax.tree.structure(va) == jax.tree.structure(vp)
    for a, b in zip(jax.tree.leaves(va), jax.tree.leaves(vp)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n,h,w,c,cout", [(2, 32, 48, 32, 128),
                                          (1, 16, 24, 128, 256),
                                          # ho = 6 -> _pick_r = 2: dgrad's
                                          # rho == r window branch
                                          (1, 12, 16, 32, 128)])
def test_conv4x4_s2_pallas_matches_torch(rng, n, h, w, c, cout):
    """Pallas conv4x4/s2 (interpret mode): fwd + dx + dk + db vs torch."""
    from adaptsegnet_tpu.ops.pallas.conv4x4_s2 import conv4x4_s2_mxu

    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    k = (rng.standard_normal((4, 4, c, cout)) * 0.05).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    dy = rng.standard_normal((n, h // 2, w // 2, cout)).astype(np.float32)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    tk = torch.from_numpy(k.transpose(3, 2, 0, 1)).requires_grad_(True)
    tb = torch.from_numpy(b).requires_grad_(True)
    ty = F.conv2d(tx, tk, tb, stride=2, padding=1)
    ty.backward(torch.from_numpy(dy).permute(0, 3, 1, 2))

    y, vjp = jax.vjp(
        lambda x_, k_, b_: conv4x4_s2_mxu(x_, k_, b_, True),
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(b),
    )
    gx, gk, gb = vjp(jnp.asarray(dy))

    np.testing.assert_allclose(
        np.asarray(y), ty.detach().permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx), tx.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gk), tk.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), tb.grad.numpy(),
                               rtol=1e-4, atol=1e-3)
