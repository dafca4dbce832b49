"""Model golden tests vs the functional torch oracle + structural pins."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.models import (
    DeeplabMulti,
    DeeplabSingle,
    DeeplabVGG,
    FCDiscriminator,
    Warper,
)

from tests import torch_oracle


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def multi_vars():
    model = DeeplabMulti(num_classes=19)
    x = jnp.zeros((1, 64, 96, 3))
    return model, jax.jit(model.init)(jax.random.PRNGKey(0), x)


def test_deeplab_multi_matches_oracle(rng, multi_vars):
    model, variables = multi_vars
    x = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    p1, p2 = jax.jit(model.apply)(variables, jnp.asarray(x))
    assert p1.shape == (1, 8, 12, 19)
    assert p2.shape == (1, 8, 12, 19)
    r1, r2 = torch_oracle.deeplab_multi(variables, x)
    np.testing.assert_allclose(np.asarray(p1), r1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2), r2, rtol=1e-3, atol=1e-4)


def test_deeplab_multi_folded_bn_matches_oracle_nontrivial_stats(rng, multi_vars):
    """The BN-folded conv lowering must match conv->BN with REAL stats
    (at init mean=0/var=1/scale=1 makes the fold a no-op, so this test
    randomizes every BN tensor)."""
    model, variables = multi_vars
    variables = jax.tree.map(np.asarray, variables)

    def randomize(tree, is_stats):
        def rec(node, path):
            out = {}
            for k, v in node.items():
                if isinstance(v, dict):
                    out[k] = rec(v, path + (k,))
                elif path and path[-1] == "bn":
                    if k == "var":
                        out[k] = rng.uniform(0.5, 2.0, v.shape).astype(v.dtype)
                    elif k == "mean":
                        out[k] = rng.standard_normal(v.shape).astype(v.dtype)
                    elif k == "scale":
                        out[k] = rng.uniform(0.5, 1.5, v.shape).astype(v.dtype)
                    else:  # bias
                        out[k] = rng.standard_normal(v.shape).astype(v.dtype) * 0.1
                else:
                    out[k] = v
            return out
        return rec(tree, ())

    variables = {
        "params": randomize(variables["params"], False),
        "batch_stats": randomize(variables["batch_stats"], True),
    }
    variables = jax.tree.map(jnp.asarray, variables)
    x = rng.standard_normal((1, 64, 96, 3), dtype=np.float32) * 0.5
    p1, p2 = jax.jit(model.apply)(variables, jnp.asarray(x))
    r1, r2 = torch_oracle.deeplab_multi(variables, x)
    np.testing.assert_allclose(np.asarray(p1), r1, rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(p2), r2, rtol=1e-3, atol=5e-4)


def test_deeplab_multi_param_count(multi_vars):
    _, variables = multi_vars
    # ResNet-101 backbone (42,500,160 conv+BN-affine params) + two 4-branch
    # ASPP heads: layer5 on 1024 ch, layer6 on 2048 ch, 19 classes:
    # 4*(3*3*1024*19 + 19) + 4*(3*3*2048*19 + 19).
    backbone = n_params(variables["params"]["backbone"])
    l5 = n_params(variables["params"]["layer5"])
    l6 = n_params(variables["params"]["layer6"])
    assert l5 == 4 * (3 * 3 * 1024 * 19 + 19)
    assert l6 == 4 * (3 * 3 * 2048 * 19 + 19)
    assert backbone == 42_500_160


def test_deeplab_single_matches_oracle(rng):
    model = DeeplabSingle(num_classes=19)  # default aspp_sum='first2'
    x = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), jnp.asarray(x))
    out = jax.jit(model.apply)(variables, jnp.asarray(x))
    # ceil-mode pool: 64x96 -> 32x48 -> pool ceil((31)/2)+1 = 17x25 -> /2 = 9x13
    assert out.shape == (1, 9, 13, 19)
    ref = torch_oracle.deeplab_single(variables, x, n_sum=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_deeplab_single_all_branches_differs(rng):
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    m2 = DeeplabSingle(num_classes=19, aspp_sum="first2")
    m4 = DeeplabSingle(num_classes=19, aspp_sum="all")
    v = jax.jit(m2.init)(jax.random.PRNGKey(2), jnp.asarray(x))
    out2 = jax.jit(m2.apply)(v, jnp.asarray(x))
    out4 = jax.jit(m4.apply)(v, jnp.asarray(x))
    assert not np.allclose(np.asarray(out2), np.asarray(out4))
    ref4 = torch_oracle.deeplab_single(v, x, n_sum=4)
    np.testing.assert_allclose(np.asarray(out4), ref4, rtol=1e-3, atol=1e-4)


def test_discriminator_matches_oracle(rng):
    model = FCDiscriminator(num_classes=19)
    x = rng.uniform(0, 1, size=(2, 64, 64, 19)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), jnp.asarray(x))
    out = jax.jit(model.apply)(variables, jnp.asarray(x))
    assert out.shape == (2, 2, 2, 1)  # /32 patch map
    ref = torch_oracle.fc_discriminator(variables, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


def test_discriminator_param_count(rng):
    model = FCDiscriminator(num_classes=19, ndf=64)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 19)))
    expected = 0
    cin = 19
    for cout in [64, 128, 256, 512, 1]:
        expected += 4 * 4 * cin * cout + cout
        cin = cout
    assert n_params(v["params"]) == expected


def test_deeplab_vgg_matches_oracle(rng):
    model = DeeplabVGG(num_classes=19)
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(4), jnp.asarray(x))
    out = jax.jit(model.apply)(variables, jnp.asarray(x))
    assert out.shape == (1, 8, 8, 19)  # stride 8 (three 2x2 pools)
    ref = torch_oracle.deeplab_vgg(variables, x, n_sum=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_warper_matches_oracle(rng):
    model = Warper()
    # Smallest valid input: 512x512 (latent 1x1). Use 512x512 to keep CPU time low.
    x = rng.standard_normal((1, 512, 512, 3), dtype=np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(5), jnp.zeros_like(x))
    flow, warp_list = jax.jit(lambda v, y: model.apply(v, y, train=False))(variables, jnp.asarray(x))
    assert flow.shape == (1, 512, 512, 2)
    assert len(warp_list) == 8
    ref = torch_oracle.warper(variables, x)
    np.testing.assert_allclose(np.asarray(flow), ref, rtol=1e-3, atol=1e-4)


def test_warper_planar_flow_matches_default(rng):
    """planar_flow=True emits the same flow as the default head, just as
    (N, 2, H, W) channel planes, from the SAME parameter tree."""
    x = rng.standard_normal((1, 512, 512, 3), dtype=np.float32)
    ref_model = Warper()
    variables = jax.jit(ref_model.init)(jax.random.PRNGKey(5),
                                        jnp.zeros_like(x))
    ref_flow, _ = jax.jit(
        lambda v, y: ref_model.apply(v, y, train=False)
    )(variables, jnp.asarray(x))

    pl_model = Warper(planar_flow=True)
    pl_flow, _ = jax.jit(
        lambda v, y: pl_model.apply(v, y, train=False)
    )(variables, jnp.asarray(x))  # same variables: identical param tree
    assert pl_flow.shape == (1, 2, 512, 512)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(pl_flow, (0, 2, 3, 1))),
        np.asarray(ref_flow), rtol=1e-4, atol=1e-5,
    )


def test_warper_batch_stats_update(rng):
    model = Warper()
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3), dtype=np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(6), x)
    (_, _), mutated = jax.jit(
        lambda v, y: model.apply(v, y, train=True, mutable=["batch_stats"])
    )(variables, x)
    before = variables["batch_stats"]["encoder_d"]["down1_bn"]["bn"]["mean"]
    after = mutated["batch_stats"]["encoder_d"]["down1_bn"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
