"""ASPP matmul lowering == dilated-conv lowering (and torch)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.models.deeplab_resnet import ClassifierModule
from adaptsegnet_tpu.ops.aspp import aspp_matmul


def _torch_aspp(x_nhwc, kernels, biases, dilations, n_sum):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    out = None
    for k, b, d in list(zip(kernels, biases, dilations))[:n_sum]:
        w = torch.from_numpy(np.transpose(np.asarray(k), (3, 2, 0, 1)))
        y = F.conv2d(t, w, torch.from_numpy(np.asarray(b)), padding=d,
                     dilation=d)
        out = y if out is None else out + y
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("n_sum", [4, 2])
def test_aspp_matmul_matches_torch(rng, n_sum):
    c, k = 32, 19
    x = rng.standard_normal((1, 16, 24, c), dtype=np.float32)
    kernels = [rng.standard_normal((3, 3, c, k)).astype(np.float32) * 0.1
               for _ in range(4)]
    biases = [rng.standard_normal((k,)).astype(np.float32) for _ in range(4)]
    dils = (2, 4, 6, 8)

    ours = np.asarray(aspp_matmul(
        jnp.asarray(x), [jnp.asarray(w) for w in kernels],
        [jnp.asarray(b) for b in biases], dils, n_sum,
    ))
    ref = _torch_aspp(x, kernels, biases, dils, n_sum)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n_sum", [4, 2])
def test_aspp_matmul_grads_match_torch(rng, n_sum):
    """Custom-VJP grads (concat-cotangent matmul form) == torch conv
    autograd; unused branches (n_sum quirk) get exactly zero."""
    c, k = 16, 19
    x = rng.standard_normal((1, 10, 12, c), dtype=np.float32)
    kernels = [rng.standard_normal((3, 3, c, k)).astype(np.float32) * 0.1
               for _ in range(4)]
    biases = [rng.standard_normal((k,)).astype(np.float32) for _ in range(4)]
    dils = (2, 4, 6, 8)
    g = rng.standard_normal((1, 10, 12, k)).astype(np.float32)

    def f(x_, ks_, bs_):
        return aspp_matmul(x_, ks_, bs_, dils, n_sum)

    out, vjp = jax.vjp(
        f, jnp.asarray(x), [jnp.asarray(w) for w in kernels],
        [jnp.asarray(b) for b in biases],
    )
    dx, dks, dbs = vjp(jnp.asarray(g))

    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    tks = [torch.from_numpy(np.transpose(w, (3, 2, 0, 1))).requires_grad_(True)
           for w in kernels]
    tbs = [torch.from_numpy(b).requires_grad_(True) for b in biases]
    tout = None
    for tw, tb, d in list(zip(tks, tbs, dils))[:n_sum]:
        y = F.conv2d(tx, tw, tb, padding=d, dilation=d)
        tout = y if tout is None else tout + y
    tout.backward(torch.from_numpy(np.transpose(g, (0, 3, 1, 2))))

    np.testing.assert_allclose(
        np.asarray(dx), tx.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-4)
    for i in range(4):
        if i < n_sum:
            np.testing.assert_allclose(
                np.asarray(dks[i]),
                tks[i].grad.permute(2, 3, 1, 0).numpy(),
                rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(dbs[i]),
                                       tbs[i].grad.numpy(),
                                       rtol=1e-4, atol=1e-5)
        else:
            assert not np.any(np.asarray(dks[i]))
            assert not np.any(np.asarray(dbs[i]))


def test_classifier_module_lowerings_agree(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 12, 64), dtype=np.float32))
    m_mat = ClassifierModule(num_classes=19, use_matmul=True)
    m_conv = ClassifierModule(num_classes=19, use_matmul=False)
    v = jax.jit(m_mat.init)(jax.random.PRNGKey(0), x)
    a = jax.jit(m_mat.apply)(v, x)
    b = jax.jit(m_conv.apply)(v, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-4)


def test_classifier_module_param_layout_unchanged(rng):
    x = jnp.zeros((1, 8, 8, 64))
    v = ClassifierModule(num_classes=19).init(jax.random.PRNGKey(0), x)
    p = v["params"]
    assert set(p) == {f"branch{i}" for i in range(4)}
    assert p["branch0"]["conv"]["kernel"].shape == (3, 3, 64, 19)
    assert p["branch3"]["conv"]["bias"].shape == (19,)


def test_aspp_aligned_fwd_matches_base(rng):
    """The aligned forward (32-padded column blocks — lost its r4 in-step
    A/B, kept for direct use; one
    lane-concat of shifted blocks, 0/1 selector matmul) == the base
    shift-add forward up to f32 summation-order rounding."""
    from adaptsegnet_tpu.ops.aspp import _aspp_fwd_aligned, _aspp_fwd_impl

    c, k = 32, 19
    x = jnp.asarray(rng.standard_normal((1, 12, 16, c), dtype=np.float32))
    kernels = [jnp.asarray(
        rng.standard_normal((3, 3, c, k)).astype(np.float32) * 0.1)
        for _ in range(4)]
    biases = [jnp.asarray(rng.standard_normal((k,)).astype(np.float32))
              for _ in range(4)]
    dils = (2, 4, 6, 8)
    base = np.asarray(_aspp_fwd_impl(x, kernels, biases, dils, 4))
    aligned = np.asarray(
        _aspp_fwd_aligned(x, list(kernels), list(biases), list(dils), k,
                          None))
    np.testing.assert_allclose(aligned, base, rtol=1e-5, atol=1e-5)
