"""Train-step mechanics with tiny stand-in modules (fast on CPU).

The stand-ins honor the segmenter contract — NHWC in, (pred1, pred2) raw
stride-8 logits out — so these tests exercise the real step machinery:
stop-gradient placement, iter-size scan accumulation, optimizer application,
warper stat threading, and metric names.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from adaptsegnet_tpu.models.layers import Conv2d
from adaptsegnet_tpu.train.optim import (
    make_discriminator_tx,
    make_generator_tx,
    generator_param_labels,
)
from adaptsegnet_tpu.train.state import (
    DiscriminatorState,
    GeneratorState,
    TrainState,
)
from adaptsegnet_tpu.train.steps import make_adversarial_step, make_source_only_step

C = 19
HW = (16, 16)      # input size
FEAT = (2, 2)      # stride-8 feature size


class TinySeg(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = Conv2d(8, 3, stride=2, padding=1, name="stem")(x)
        h = nn.relu(h)
        h = Conv2d(8, 3, stride=2, padding=1, name="mid")(h)
        h = nn.relu(h)
        h = Conv2d(8, 3, stride=2, padding=1, name="down")(h)
        p1 = Conv2d(C, 1, name="layer5")(h)
        p2 = Conv2d(C, 1, name="layer6")(h)
        return p1, p2


class TinyD(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = Conv2d(4, 4, stride=2, padding=1, name="conv1")(x)
        h = jnp.where(h >= 0, h, 0.2 * h)
        return Conv2d(1, 4, stride=2, padding=1, name="classifier")(h)


def make_states(key=0, with_d=True, multi=True):
    model = TinySeg()
    kg, k1, k2 = jax.random.split(jax.random.PRNGKey(key), 3)
    gvars = model.init(kg, jnp.zeros((1, *HW, 3)))
    labels = generator_param_labels(gvars["params"], all_1x=True)
    gstate = GeneratorState.create(
        gvars["params"], gvars.get("batch_stats", {}),
        make_generator_tx(labels, base_lr=0.01, num_steps=100),
    )
    d1 = d2 = None
    disc = TinyD()
    if with_d:
        dx = jnp.zeros((1, *HW, C))
        d2 = DiscriminatorState.create(
            disc.init(k2, dx)["params"], make_discriminator_tx(num_steps=100)
        )
        if multi:
            d1 = DiscriminatorState.create(
                disc.init(k1, dx)["params"], make_discriminator_tx(num_steps=100)
            )
    state = TrainState(step=jnp.zeros((), jnp.int32), generator=gstate,
                       d1=d1, d2=d2, warper=None)
    return model, disc, state


def make_batch(rng, iter_size=1, with_target=True):
    batch = {
        "images": rng.standard_normal((iter_size, 2, *HW, 3)).astype(np.float32),
        "labels": rng.integers(0, C, size=(iter_size, 2, *HW)).astype(np.int32),
    }
    batch["labels"][..., :2] = 255  # some ignored pixels
    if with_target:
        batch["target_images"] = rng.standard_normal(
            (iter_size, 2, *HW, 3)
        ).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_source_only_step_decreases_loss(rng):
    model, _, state = make_states(with_d=False)
    step = make_source_only_step(model, input_hw=HW, donate=False)
    batch = make_batch(rng, with_target=False)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss_seg2"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_iter_size_accumulation_matches_mean(rng):
    """iter_size=2 equals a single accumulated update of averaged grads."""
    model, _, state = make_states(with_d=False)
    batch2 = make_batch(rng, iter_size=2, with_target=False)

    step2 = make_source_only_step(model, input_hw=HW, iter_size=2, donate=False)
    state_a, metrics = step2(state, batch2)

    # Manual: average the two micro-batch grads, apply once.
    from adaptsegnet_tpu.ops import cross_entropy_2d, upsample_logits

    def loss_fn(params, img, lab):
        _, p2 = model.apply({"params": params}, img)
        return cross_entropy_2d(upsample_logits(p2, HW), lab)

    g0 = jax.grad(loss_fn)(state.generator.params,
                           batch2["images"][0], batch2["labels"][0])
    g1 = jax.grad(loss_fn)(state.generator.params,
                           batch2["images"][1], batch2["labels"][1])
    gavg = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    manual = state.generator.apply_gradients(gavg)

    for a, b in zip(jax.tree.leaves(state_a.generator.params),
                    jax.tree.leaves(manual.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("gan", ["LS", "Vanilla"])
def test_adversarial_multi_level_step(rng, gan):
    model, disc, state = make_states()
    step = make_adversarial_step(
        model, disc, level="multi-level", gan=gan, input_hw=HW, donate=False
    )
    batch = make_batch(rng)
    p_before = jax.tree.leaves(state.generator.params)
    d1_before = jax.tree.leaves(state.d1.params)
    d2_before = jax.tree.leaves(state.d2.params)
    state, metrics = step(state, batch)
    assert set(metrics) == {
        "loss_seg1", "loss_seg2", "loss_adv_target1", "loss_adv_target2",
        "loss_D1", "loss_D2",
    }
    for v in metrics.values():
        assert np.isfinite(float(v))
    # Everything that should train moved.
    for before, after in [
        (p_before, jax.tree.leaves(state.generator.params)),
        (d1_before, jax.tree.leaves(state.d1.params)),
        (d2_before, jax.tree.leaves(state.d2.params)),
    ]:
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )


def test_adversarial_single_level_d1_untouched(rng):
    model, disc, state = make_states(multi=True)  # build d1 anyway
    step = make_adversarial_step(
        model, disc, level="single-level", input_hw=HW, donate=False
    )
    batch = make_batch(rng)
    d1_before = [np.asarray(x) for x in jax.tree.leaves(state.d1.params)]
    state, metrics = step(state, batch)
    assert float(metrics["loss_seg1"]) == 0.0
    assert float(metrics["loss_D1"]) == 0.0
    for a, b in zip(d1_before, jax.tree.leaves(state.d1.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert not np.isclose(float(metrics["loss_D2"]), 0.0)


def test_d_grads_do_not_leak_into_generator(rng):
    """With lambda_adv = 0 the generator update must ignore D entirely, and
    the D update must still train (stop_gradient placement check)."""
    model, disc, state = make_states()
    step = make_adversarial_step(
        model, disc, level="multi-level", lambda_adv1=0.0, lambda_adv2=0.0,
        lambda_seg=0.0, input_hw=HW, donate=False,
    )
    src_only = make_source_only_step(model, input_hw=HW, donate=False)
    batch = make_batch(rng)

    adv_state, _ = step(state, batch)
    so_state, _ = src_only(
        state, {"images": batch["images"], "labels": batch["labels"]}
    )
    for a, b in zip(jax.tree.leaves(adv_state.generator.params),
                    jax.tree.leaves(so_state.generator.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # D still updated from the detached maps.
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.d2.params),
                        jax.tree.leaves(adv_state.d2.params))
    )


class TinyWarper(nn.Module):
    """Stand-in honoring the Warper contract: images -> ((N,H,W,2) flow,
    warp_list), with an (unused) stats collection."""

    planar_flow = False

    @nn.compact
    def __call__(self, x, train=False):
        flow = Conv2d(2, 3, stride=1, padding=1, name="flow")(x)
        return jnp.tanh(flow) * 0.3, []


def test_planar_ce_gate_matches_dense_path(rng, monkeypatch):
    """ADAPTSEG_WARP_PLANAR_CE=1 (warp kernel emits channel planes, CE
    consumes them) must reproduce the dense source-only warper step: same
    loss, same updated params."""
    from adaptsegnet_tpu.train.state import WarperState

    def build():
        model = TinySeg()
        kg, kw = jax.random.split(jax.random.PRNGKey(0))
        gvars = model.init(kg, jnp.zeros((1, *HW, 3)))
        labels = generator_param_labels(gvars["params"], all_1x=True)
        gstate = GeneratorState.create(
            gvars["params"], gvars.get("batch_stats", {}),
            make_generator_tx(labels, base_lr=0.01, num_steps=100),
        )
        warper = TinyWarper()
        wvars = warper.init(kw, jnp.zeros((1, *HW, 3)), train=False)
        wstate = WarperState(params=wvars["params"],
                             stats={k: v for k, v in wvars.items()
                                    if k != "params"})
        return model, warper, TrainState(
            step=jnp.zeros((), jnp.int32), generator=gstate,
            d1=None, d2=None, warper=wstate,
        )

    batch = make_batch(rng, with_target=False)
    results = {}
    for gate in ("0", "1"):
        monkeypatch.setenv("ADAPTSEG_WARP_PLANAR_CE", gate)
        model, warper, state = build()
        step = make_source_only_step(model, warper, input_hw=HW,
                                     donate=False)
        state, metrics = step(state, batch)
        results[gate] = (state, metrics)

    # f32 reassociation tolerance: the planar CE reduces over a different
    # axis order than the dense one.
    np.testing.assert_allclose(float(results["1"][1]["loss_seg2"]),
                               float(results["0"][1]["loss_seg2"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(results["0"][0].generator.params),
                    jax.tree.leaves(results["1"][0].generator.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", [True, "aligned"])
def test_blocked_s2d_gate_matches_phase_path(rng, mode):
    """blocked_s2d=True (single channel-concat D input, 4 K=4C conv1
    dots — lost its r4 in-step A/B, kept as a keyword for coverage) and
    blocked_s2d='aligned' (32-padded blocks, 4 K=128 dots — also lost
    its r4 A/B, 47.36 vs 44.89 ms) must reproduce the default phase
    path's multi-level step exactly: same losses, same updated params.
    Uses the REAL FCDiscriminator so the supports_s2d_phases branch is
    the one under test."""
    from adaptsegnet_tpu.models import FCDiscriminator

    def build():
        model = TinySeg()
        kg, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        gvars = model.init(kg, jnp.zeros((1, *HW, 3)))
        labels = generator_param_labels(gvars["params"], all_1x=True)
        gstate = GeneratorState.create(
            gvars["params"], gvars.get("batch_stats", {}),
            make_generator_tx(labels, base_lr=0.01, num_steps=100),
        )
        disc = FCDiscriminator(num_classes=C, ndf=4)
        dx = jnp.zeros((1, *HW, C))
        mk = lambda k: DiscriminatorState.create(
            disc.init(k, dx)["params"], make_discriminator_tx(num_steps=100)
        )
        return model, disc, TrainState(
            step=jnp.zeros((), jnp.int32), generator=gstate,
            d1=mk(k1), d2=mk(k2), warper=None,
        )

    batch = make_batch(rng)
    results = {}
    for gate in ("0", "1"):
        model, disc, state = build()
        step = make_adversarial_step(
            model, disc, level="multi-level", input_hw=HW, donate=False,
            blocked_s2d=(mode if gate == "1" else False),
        )
        state, metrics = step(state, batch)
        results[gate] = (state, metrics)

    m0, m1 = results["0"][1], results["1"][1]
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(results["0"][0].generator.params),
                    jax.tree.leaves(results["1"][0].generator.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(results["0"][0].d2.params),
                    jax.tree.leaves(results["1"][0].d2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_conv1_patch_gate_matches_phase_path(rng, monkeypatch):
    """ADAPTSEG_D_CONV1_PATCH=1 (planar phase production + the conv1
    patch-matrix dispatch, r5) must reproduce the default phase path's
    multi-level step exactly: same losses, same updated params. On CPU
    the dispatch takes the transpose fallback; the Pallas kernel itself
    is torch-pinned in tests/test_conv4x4_patch.py."""
    from adaptsegnet_tpu.models import FCDiscriminator

    def build():
        model = TinySeg()
        kg, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        gvars = model.init(kg, jnp.zeros((1, *HW, 3)))
        labels = generator_param_labels(gvars["params"], all_1x=True)
        gstate = GeneratorState.create(
            gvars["params"], gvars.get("batch_stats", {}),
            make_generator_tx(labels, base_lr=0.01, num_steps=100),
        )
        disc = FCDiscriminator(num_classes=C, ndf=4)
        dx = jnp.zeros((1, *HW, C))
        mk = lambda k: DiscriminatorState.create(
            disc.init(k, dx)["params"], make_discriminator_tx(num_steps=100)
        )
        return model, disc, TrainState(
            step=jnp.zeros((), jnp.int32), generator=gstate,
            d1=mk(k1), d2=mk(k2), warper=None,
        )

    batch = make_batch(rng)
    results = {}
    for gate in ("0", "1"):
        monkeypatch.setenv("ADAPTSEG_D_CONV1_PATCH", gate)
        model, disc, state = build()
        step = make_adversarial_step(
            model, disc, level="multi-level", input_hw=HW, donate=False,
        )
        state, metrics = step(state, batch)
        results[gate] = (state, metrics)

    m0, m1 = results["0"][1], results["1"][1]
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(results["0"][0].generator.params),
                    jax.tree.leaves(results["1"][0].generator.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(results["0"][0].d2.params),
                    jax.tree.leaves(results["1"][0].d2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_level_validation():
    model, disc, _ = make_states()
    with pytest.raises(NotImplementedError, match="level choice"):
        make_adversarial_step(model, disc, level="triple-level")
