"""N-step TRAINING parity vs the reference's own modules + choreography.

test_reference_parity.py pins forwards; test_optim.py pins each optimizer
update rule; test_losses.py pins each loss. This test composes all of it:
the reference's literal multi-level training loop — 6 forwards / 5
backwards with detach + requires_grad freezes, poly LR, SGD 1x/10x groups,
two Adams (train_gta2cityscapes_multi.py:498-683) — is rebuilt in torch
from the reference's OWN modules and run for several iterations; the fused
XLA step (train/steps.py make_adversarial_step) must land on the same
parameters. A wiring bug the per-component tests cannot see (loss scaling,
schedule off-by-one, stop_gradient placement, stale-softmax reuse) shows up
here as parameter drift.

Mirrors the reference's INTENDED multi-level forward semantics (upsampled
logits; the as-written `model(images)` crashes on the fork's required
input_size arg — SURVEY.md §3.3) and the frozen-BN default (torch side in
.eval(): normalization by stored running stats, matching bn_mode='frozen';
the batch-stat dynamics have their own parity test in
test_reference_parity.py::test_deeplab_multi_train_mode_bn_vs_reference).

Skipped wholesale if /root/reference is absent.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "model")),
    reason="reference checkout not available",
)

if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from adaptsegnet_tpu.models import DeeplabMulti, FCDiscriminator  # noqa: E402
from adaptsegnet_tpu.train.optim import (  # noqa: E402
    generator_param_labels,
    make_discriminator_tx,
    make_generator_tx,
)
from adaptsegnet_tpu.train.schedule import lr_poly  # noqa: E402
from adaptsegnet_tpu.train.state import (  # noqa: E402
    DiscriminatorState,
    GeneratorState,
    TrainState,
)
from adaptsegnet_tpu.train.steps import make_adversarial_step  # noqa: E402
from adaptsegnet_tpu.utils import pth_interop  # noqa: E402

H, W = 64, 128
N_STEPS = 3
# Reference defaults (train_gta2cityscapes_multi.py:29-69).
LR, LR_D = 2.5e-4, 1e-4
NUM_STEPS, POWER = 250_000, 0.9
L_SEG, L_ADV1, L_ADV2 = 0.1, 0.0002, 0.001


def _randomize(module, seed, scale=0.02, head_scale=0.002):
    """Non-trivial weights incl. BN running stats (same recipe as
    test_reference_parity). The ASPP heads get a much smaller scale: their
    fan-in is 9*1024/9*2048, so N(0, 0.02) head kernels put the logits at
    ~1e5 and the CE training NaNs on the first update — training parity
    needs a numerically sane operating point, not just a finite forward."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) * 1.5 + 0.5
        elif k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith((".weight", ".bias")) and v.ndim == 1:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1 + (
                1.0 if k.endswith(".weight") else 0.0
            )
        else:
            s = head_scale if k.startswith(("layer5.", "layer6.")) else scale
            sd[k] = torch.randn(v.shape, generator=g) * s
    module.load_state_dict(sd)
    return {k: v.numpy().copy() for k, v in module.state_dict().items()}


def _set_requires_grad(module, flag):
    for p in module.parameters():
        p.requires_grad = flag


def _run_reference_loop(model, d1, d2, data, multi=True):
    """The reference's adversarial iteration, verbatim choreography
    (train_gta2cityscapes_multi.py:560-683 multi-level, :385-464
    single-level; GAN='LS', iter_size=1). Single-level touches only D2 —
    D1 exists but never forwards, backwards, or steps."""
    args = SimpleNamespace(learning_rate=LR)
    # The reference's literal param list duplicates every backbone param
    # (model/deeplab_multi.py:212-217 iterates .modules() x .parameters());
    # dedup here so this test pins the CLEAN default dynamics. The
    # duplicate-quirk dynamics (--optim-dup-quirk) have their own parity
    # test in test_optim.py::test_kfold_trace_matches_sequential_duplicates.
    groups = model.optim_parameters(args)
    for grp in groups:
        seen, uniq = set(), []
        for p in grp["params"]:
            if id(p) not in seen:
                seen.add(id(p))
                uniq.append(p)
        grp["params"] = uniq
    opt = torch.optim.SGD(groups, lr=LR, momentum=0.9, weight_decay=5e-4)
    opt_d1 = torch.optim.Adam(d1.parameters(), lr=LR_D, betas=(0.9, 0.99))
    opt_d2 = torch.optim.Adam(d2.parameters(), lr=LR_D, betas=(0.9, 0.99))
    bce = torch.nn.MSELoss()  # GAN='LS' default
    seg_loss = torch.nn.CrossEntropyLoss(ignore_index=255)
    losses = []

    for i_iter, (xs, ys, xt) in enumerate(data):
        opt.zero_grad()
        opt_d2.zero_grad()
        # adjust_learning_rate(_D) (:165-177)
        lr = float(lr_poly(LR, i_iter, NUM_STEPS, POWER))
        opt.param_groups[0]["lr"] = lr
        opt.param_groups[1]["lr"] = lr * 10
        lr_d = float(lr_poly(LR_D, i_iter, NUM_STEPS, POWER))
        opt_d2.param_groups[0]["lr"] = lr_d
        if multi:
            opt_d1.zero_grad()
            opt_d1.param_groups[0]["lr"] = lr_d
            _set_requires_grad(d1, False)
        _set_requires_grad(d2, False)

        # G, source (:595-608 multi; :404-412 single: loss_seg2 only)
        pred1, pred2 = model(torch.from_numpy(xs).permute(0, 3, 1, 2), (W, H))
        labels = torch.from_numpy(ys).long()
        loss_seg2 = seg_loss(pred2, labels)
        if multi:
            loss_seg1 = seg_loss(pred1, labels)
            (loss_seg2 + L_SEG * loss_seg1).backward()
        else:
            loss_seg1 = torch.zeros(())
            loss_seg2.backward()

        # G, target adversarial (:610-631 multi; :416-430 single: D2 only)
        pt1, pt2 = model(torch.from_numpy(xt).permute(0, 3, 1, 2), (W, H))
        d_out2 = d2(F.softmax(pt2, dim=1))
        loss_adv2 = bce(d_out2, torch.zeros_like(d_out2))
        if multi:
            d_out1 = d1(F.softmax(pt1, dim=1))
            loss_adv1 = bce(d_out1, torch.zeros_like(d_out1))
            (L_ADV1 * loss_adv1 + L_ADV2 * loss_adv2).backward()
        else:
            loss_adv1 = torch.zeros(())
            (L_ADV2 * loss_adv2).backward()

        # D on detached source(0) / target(1), each / 2 (:633-679 multi;
        # :434-462 single)
        if multi:
            _set_requires_grad(d1, True)
        _set_requires_grad(d2, True)
        loss_d1 = loss_d2 = 0.0
        for preds, label in (((pred1, pred2), 0.0), ((pt1, pt2), 1.0)):
            p1d, p2d = preds[0].detach(), preds[1].detach()
            o2 = d2(F.softmax(p2d, dim=1))
            l2 = bce(o2, torch.full_like(o2, label)) / 2
            l2.backward()
            loss_d2 += float(l2.detach())
            if multi:
                o1 = d1(F.softmax(p1d, dim=1))
                l1 = bce(o1, torch.full_like(o1, label)) / 2
                l1.backward()
                loss_d1 += float(l1.detach())

        opt.step()
        opt_d2.step()
        if multi:
            opt_d1.step()
        losses.append({
            "loss_seg1": float(loss_seg1),
            "loss_seg2": float(loss_seg2),
            "loss_adv_target1": float(loss_adv1),
            "loss_adv_target2": float(loss_adv2),
            "loss_D1": loss_d1,
            "loss_D2": loss_d2,
        })
    return losses


def _rel_drift(final_ref, final_got, init):
    """max |got - ref| over the tree, relative to how far training MOVED the
    params (the quantity the test is about — absolute param scale would
    mask update errors behind the random init)."""
    diffs, moves = [], []
    for r, g, i in zip(jax.tree.leaves(final_ref), jax.tree.leaves(final_got),
                       jax.tree.leaves(init)):
        diffs.append(np.max(np.abs(np.asarray(g) - np.asarray(r))))
        moves.append(np.max(np.abs(np.asarray(r) - np.asarray(i))))
    return max(diffs), max(max(moves), 1e-12)


@pytest.mark.parametrize("level", ["multi-level", "single-level"])
def test_adversarial_training_matches_reference(level):
    from model.deeplab_multi import DeeplabMulti as RefDeeplabMulti
    from model.discriminator import FCDiscriminator as RefFCDiscriminator

    multi = level == "multi-level"
    torch.manual_seed(7)
    ref = RefDeeplabMulti(num_classes=19).eval()  # frozen-BN semantics
    ref_d1 = RefFCDiscriminator(num_classes=19).train()
    ref_d2 = RefFCDiscriminator(num_classes=19).train()
    sd_g = _randomize(ref, seed=70)
    sd_d1 = _randomize(ref_d1, seed=71)
    sd_d2 = _randomize(ref_d2, seed=72)

    rng = np.random.default_rng(7)
    data = []
    for _ in range(N_STEPS):
        xs = rng.standard_normal((1, H, W, 3)).astype(np.float32)
        xt = rng.standard_normal((1, H, W, 3)).astype(np.float32)
        ys = rng.integers(0, 19, size=(1, H, W)).astype(np.int32)
        ys[:, :4] = 255  # exercise ignore_label
        data.append((xs, ys, xt))

    ref_losses = _run_reference_loop(ref, ref_d1, ref_d2, data, multi=multi)
    sd_g_final = {k: v.detach().numpy().copy()
                  for k, v in ref.state_dict().items()}
    sd_d2_final = {k: v.detach().numpy().copy()
                   for k, v in ref_d2.state_dict().items()}

    # --- fused XLA step from the same init
    model = DeeplabMulti(num_classes=19)
    disc = FCDiscriminator(num_classes=19)
    gvars = jax.jit(model.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, H, W, 3)))
    gvars = pth_interop.merge_variables(
        gvars, pth_interop.resnet_state_dict_to_variables(sd_g))
    init_params = gvars["params"]
    labels_tree = generator_param_labels(init_params)
    gstate = GeneratorState.create(
        init_params, gvars["batch_stats"],
        make_generator_tx(labels_tree, base_lr=LR, num_steps=NUM_STEPS,
                          power=POWER),
    )

    def d_state(sd):
        dvars = jax.jit(disc.init)(jax.random.PRNGKey(1),
                                   jnp.zeros((1, H, W, 19)))
        dvars = pth_interop.merge_variables(
            dvars, pth_interop.discriminator_state_dict_to_variables(sd))
        return DiscriminatorState.create(
            dvars["params"],
            make_discriminator_tx(base_lr=LR_D, num_steps=NUM_STEPS,
                                  power=POWER),
        )

    d1_state, d2_state = d_state(sd_d1), d_state(sd_d2)
    init_d1, init_d2 = d1_state.params, d2_state.params
    state = TrainState(step=jnp.zeros((), jnp.int32), generator=gstate,
                       d1=d1_state, d2=d2_state, warper=None)
    step = make_adversarial_step(
        model, disc, level=level, gan="LS", lambda_seg=L_SEG,
        lambda_adv1=L_ADV1, lambda_adv2=L_ADV2, input_hw=(H, W),
        iter_size=1, donate=False,
    )

    for i, (xs, ys, xt) in enumerate(data):
        batch = {
            "images": jnp.asarray(xs)[None],
            "labels": jnp.asarray(ys)[None],
            "target_images": jnp.asarray(xt)[None],
        }
        state, metrics = step(state, batch)
        # Per-step scalar parity against the reference loop's own values.
        for k, v in ref_losses[i].items():
            got = float(metrics[k])
            assert abs(got - v) < 5e-4 + 2e-3 * abs(v), (i, k, got, v)

    # --- parameter parity after N steps, relative to how far training moved
    ref_final = pth_interop.resnet_state_dict_to_variables(sd_g_final)
    diff, moved = _rel_drift(ref_final["params"], state.generator.params,
                             init_params)
    assert diff / moved < 0.02, (diff, moved)

    ref_d2_final = pth_interop.discriminator_state_dict_to_variables(
        sd_d2_final)
    diff_d, moved_d = _rel_drift(ref_d2_final["params"], state.d2.params,
                                 init_d2)
    # Adam normalizes each coordinate by its own |g| history: where g is
    # near zero the update direction is sign-like and f32 noise can flip
    # single coordinates, so the D bound is intrinsically looser than SGD's.
    assert diff_d / moved_d < 0.15, (diff_d, moved_d)

    if not multi:
        # Single-level never touches D1 (reference :385-464 only builds
        # losses through model_D2; D1 exists but neither forwards nor
        # steps) — its params must come through bit-identical.
        for a, b in zip(jax.tree.leaves(state.d1.params),
                        jax.tree.leaves(init_d1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
