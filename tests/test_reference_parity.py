"""Parity vs the REFERENCE'S OWN torch modules (not a re-written oracle).

These tests import the actual model code from /root/reference/model/ (torch
CPU, read-only import — no code copied), randomize its weights, ship the
state dict through utils/pth_interop, and assert forward equality against
the flax models. A shared misreading of the reference architecture between
our models and tests/torch_oracle.py (same author) would slip through the
oracle tests; it cannot slip through these.

Skipped wholesale if /root/reference is absent (e.g. a user checkout).

Not coverable this way:
  * DeeplabVGG end-to-end — torchvision is not installed and the reference
    constructor is python-2-broken (`range(23)+range(24,30)`,
    model/deeplab_vgg.py:34). We import the reference's Classifier_Module
    (with its early-return quirk) and drive it on the flax feature output.
  * ResNetMulti.warp — hard-codes `.cuda()` (model/deeplab_multi.py:253);
    warp parity is covered by tests/test_sampling.py against
    torch.nn.functional.grid_sample directly.
"""

import os
import sys

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

from adaptsegnet_tpu.models import (  # noqa: E402
    DeeplabMulti,
    DeeplabSingle,
    DeeplabVGG,
    FCDiscriminator,
    Warper,
)
from adaptsegnet_tpu.ops.resize import upsample_logits  # noqa: E402
from adaptsegnet_tpu.utils import pth_interop  # noqa: E402

H, W = 128, 256  # realistic aspect at test-tractable size


def _randomize_state_dict(module, seed):
    """Perturb every tensor (incl. BN running stats) so the fold paths and
    stat handling are exercised with non-trivial values."""
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
            sd[k] = torch.randn(v.shape, generator=g) * 0.02
    module.load_state_dict(sd)
    # .copy(): .numpy() VIEWS the live buffers — a later train-mode forward
    # updates running stats in place and would silently rewrite this dict.
    return {k: v.numpy().copy() for k, v in module.state_dict().items()}


def _max_abs(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_deeplab_multi_vs_reference():
    from model.deeplab_multi import DeeplabMulti as RefDeeplabMulti

    torch.manual_seed(0)
    ref = RefDeeplabMulti(num_classes=19).eval()
    sd = _randomize_state_dict(ref, seed=10)
    x = np.random.default_rng(0).standard_normal((1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        # reference input_size is (W, H): forward upsamples to
        # (input_size[1], input_size[0]) (model/deeplab_multi.py:188-189).
        r1, r2 = ref(torch.from_numpy(x).permute(0, 3, 1, 2), (W, H))
    r1 = r1.permute(0, 2, 3, 1).numpy()
    r2 = r2.permute(0, 2, 3, 1).numpy()

    model = DeeplabMulti(num_classes=19)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    loaded = pth_interop.resnet_state_dict_to_variables(sd)
    variables = pth_interop.merge_variables(variables, loaded)
    p1, p2 = jax.jit(model.apply)(variables, jnp.asarray(x))
    p1 = np.asarray(upsample_logits(p1, (H, W)))
    p2 = np.asarray(upsample_logits(p2, (H, W)))

    d1, d2 = _max_abs(p1, r1), _max_abs(p2, r2)
    assert d1 < 1e-5 and d2 < 1e-5, (d1, d2)


def test_deeplab_single_oracle_vs_reference():
    from model.deeplab import Res_Deeplab as RefResDeeplab

    torch.manual_seed(1)
    ref = RefResDeeplab(num_classes=19).eval()
    sd = _randomize_state_dict(ref, seed=11)
    x = np.random.default_rng(1).standard_normal((1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        r = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    r = r.permute(0, 2, 3, 1).numpy()

    # default aspp_sum='first2' mirrors the reference Classifier_Module
    # early return (model/deeplab.py:113-116).
    model = DeeplabSingle(num_classes=19)
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))
    loaded = pth_interop.resnet_state_dict_to_variables(sd)
    variables = pth_interop.merge_variables(variables, loaded)
    p = jax.jit(model.apply)(variables, jnp.asarray(x))

    d = _max_abs(p, r)
    assert d < 1e-5, d


def test_fc_discriminator_vs_reference():
    from model.discriminator import FCDiscriminator as RefFCDiscriminator

    torch.manual_seed(2)
    ref = RefFCDiscriminator(num_classes=19).eval()
    sd = _randomize_state_dict(ref, seed=12)
    x = np.random.default_rng(2).uniform(0, 1, (2, 64, 128, 19)).astype(np.float32)

    with torch.no_grad():
        r = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    r = r.permute(0, 2, 3, 1).numpy()

    model = FCDiscriminator(num_classes=19)
    variables = jax.jit(model.init)(jax.random.PRNGKey(2), jnp.zeros((1, 64, 128, 19)))
    loaded = pth_interop.discriminator_state_dict_to_variables(sd)
    variables = pth_interop.merge_variables(variables, loaded)
    p = jax.jit(model.apply)(variables, jnp.asarray(x))

    d = _max_abs(p, r)
    assert d < 1e-5, d


@pytest.mark.parametrize("transpose", [False, True])
def test_warper_vs_reference(transpose):
    from model.warper import Warper as RefWarper

    torch.manual_seed(3)
    ref = RefWarper(norm="Batch", transpose=transpose).eval()
    sd = _randomize_state_dict(ref, seed=13 + transpose)
    x = np.random.default_rng(3).standard_normal((1, 512, 512, 3)).astype(np.float32)

    with torch.no_grad():
        rflow, rlist = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    rflow = rflow.permute(0, 2, 3, 1).numpy()

    model = Warper(norm="Batch", transpose=transpose)
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), jnp.zeros((1, 512, 512, 3)))
    loaded = pth_interop.warper_state_dict_to_variables(sd)
    variables = pth_interop.merge_variables(variables, loaded)
    flow, warp_list = jax.jit(
        lambda v, y: model.apply(v, y, train=False)
    )(variables, jnp.asarray(x))

    assert len(warp_list) == len(rlist)
    d = _max_abs(flow, rflow)
    assert d < 1e-5, d


def test_vgg_classifier_quirk_vs_reference():
    """The reference VGG ASPP head sums only the first two branches
    (model/deeplab_vgg.py:17-21 early return). Drive the reference's own
    Classifier_Module on the flax feature tensor and compare heads."""
    # model/deeplab_vgg.py imports torchvision at module level; torchvision
    # is not installed here and only Classifier_Module is needed — stub the
    # import so the module loads.
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    from model.deeplab_vgg import Classifier_Module as RefClassifierModule

    torch.manual_seed(4)
    ref_head = RefClassifierModule(1024, [6, 12, 18, 24], [6, 12, 18, 24], 19).eval()
    head_sd = {
        f"classifier.{k}": v.numpy() for k, v in ref_head.state_dict().items()
    }

    model = DeeplabVGG(num_classes=19)
    x = np.random.default_rng(4).standard_normal((1, 64, 128, 3)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(4), jnp.zeros((1, 64, 128, 3)))
    loaded = pth_interop.vgg_state_dict_to_variables(head_sd)
    variables = pth_interop.merge_variables(variables, loaded)
    out = jax.jit(model.apply)(variables, jnp.asarray(x))

    # Recompute the features torch-side from the SAME flax weights so the
    # head comparison isolates the classifier quirk.
    feats = jax.jit(
        lambda v, y: model.apply(v, y, return_features=True)
    )(variables, jnp.asarray(x))
    with torch.no_grad():
        r = ref_head(torch.from_numpy(np.asarray(feats)).permute(0, 3, 1, 2))
    r = r.permute(0, 2, 3, 1).numpy()

    d = _max_abs(out, r)
    assert d < 1e-5, d


def test_deeplab_multi_train_mode_bn_vs_reference():
    """bn_mode='batch' == the reference's literal training dynamics:
    model.train() normalizes by BATCH statistics with frozen affine while
    running stats update with momentum 0.1
    (train_gta2cityscapes_multi.py:222, model/deeplab_multi.py:130-132).
    Checks forward logits, the running-stat update, and conv-kernel
    gradients against the reference module itself."""
    from model.deeplab_multi import DeeplabMulti as RefDeeplabMulti

    torch.manual_seed(3)
    ref = RefDeeplabMulti(num_classes=19).train()
    sd = _randomize_state_dict(ref, seed=13)
    x = np.random.default_rng(3).standard_normal((2, H, W, 3)).astype(np.float32)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    r1, r2 = ref(tx, (W, H))
    # Scalar loss exercising the train-mode BN backward (grads flow through
    # the batch statistics; the frozen affine stays grad-free).
    (r2.mean() + r1.mean()).backward()
    ref_g_conv1 = ref.conv1.weight.grad.numpy()
    ref_g_l6 = ref.layer6.conv2d_list[0].weight.grad.numpy()
    sd_after = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = DeeplabMulti(num_classes=19, bn_mode="batch")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, H, W, 3))
    )
    variables = pth_interop.merge_variables(
        variables, pth_interop.resnet_state_dict_to_variables(sd)
    )
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(params):
        (p1, p2), mut = model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            mutable=["batch_stats"],
        )
        p1 = upsample_logits(p1, (H, W))
        p2 = upsample_logits(p2, (H, W))
        return jnp.mean(p2) + jnp.mean(p1), (p1, p2, mut["batch_stats"])

    (_, (p1, p2, new_stats)), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)

    # Batch-stat normalization is chaotic under the random N(0, 0.02)
    # weights: a per-layer bisection (torch hooks vs flax intermediates)
    # measured the SAME implementation drifting 5e-5 (layer1) -> 2e-4
    # (layer2) -> 1.3e-2 (layer3, 23 blocks) -> 1.6e-2 (layer4) in f32 with
    # no single-layer jump — i.e. pure f32 amplification through ~100
    # data-dependent rsqrt(var)s, not a semantic difference. So the
    # full-network forward gets a relative bound; the TIGHT (1e-6) check of
    # the BN train dynamics themselves is test_layers.py's single-layer
    # parity vs torch.nn.BatchNorm2d.train().
    r1n = r1.detach().permute(0, 2, 3, 1).numpy()
    r2n = r2.detach().permute(0, 2, 3, 1).numpy()
    d1 = _max_abs(p1, r1n) / (np.abs(r1n).max() + 1e-12)
    d2 = _max_abs(p2, r2n) / (np.abs(r2n).max() + 1e-12)
    assert d1 < 5e-3 and d2 < 5e-3, (d1, d2)

    # Running stats updated like torch (momentum 0.1, unbiased batch var).
    for tk, jk in [
        ("bn1.running_mean", ("bn1", "bn", "mean")),
        ("bn1.running_var", ("bn1", "bn", "var")),
        ("layer3.5.bn2.running_mean",
         ("layer3_block5", "bn2", "bn", "mean")),
    ]:
        node = new_stats["backbone"]
        for part in jk:
            node = node[part]
        dm = _max_abs(node, sd_after[tk])
        assert dm < 1e-4, (tk, dm)

    # Gradient parity: stem conv (through 104 batch-stat BNs) + an ASPP
    # branch. torch OIHW -> HWIO. The stem gradient is intrinsically
    # ill-conditioned in f32 here: torch's OWN f32 backward differs from
    # its f64 backward by 6.3% relative on this exact setup (measured),
    # because the reverse pass re-amplifies through every data-dependent
    # rsqrt(var). We only require agreement with torch-f32 within that
    # same conditioning envelope; the tight (1e-6) backward-semantics
    # check is test_layers.py's single-layer parity.
    g_conv1 = np.transpose(ref_g_conv1, (2, 3, 1, 0))
    dg = _max_abs(grads["backbone"]["conv1"]["conv"]["kernel"], g_conv1)
    scale = np.abs(g_conv1).max() + 1e-12
    assert dg / scale < 0.15, (dg, scale)
    g_l6 = np.transpose(ref_g_l6, (2, 3, 1, 0))
    dg6 = _max_abs(grads["layer6"]["branch0"]["conv"]["kernel"], g_l6)
    assert dg6 / (np.abs(g_l6).max() + 1e-12) < 5e-3, dg6


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_PARITY"),
    reason="full-protocol 512x1024 parity is slow (~10 min CPU); "
           "opt in with RUN_SLOW_PARITY=1",
)
def test_full_protocol_mask_parity_512x1024():
    """The real eval protocol end-to-end vs the reference's own module:
    f32 forward at 512x1024, align-corners upsample to 1024x2048, argmax —
    asserting MASK EQUALITY (the quantity that determines mIoU), not just
    logit closeness at a small size (reference
    evaluate_cityscapes.py:150-169). Runtime: ~6-7 min on this 1-core CPU
    box (dominated by the torch f32 forward + the XLA compile; cached
    compiles cut the JAX side to seconds)."""
    from model.deeplab_multi import DeeplabMulti as RefDeeplabMulti

    Hf, Wf = 512, 1024
    torch.manual_seed(4)
    ref = RefDeeplabMulti(num_classes=19).eval()
    sd = _randomize_state_dict(ref, seed=14)
    x = np.random.default_rng(4).standard_normal(
        (1, Hf, Wf, 3)).astype(np.float32)

    with torch.no_grad():
        _, r2 = ref(torch.from_numpy(x).permute(0, 3, 1, 2), (2048, 1024))
    ref_mask = r2.permute(0, 2, 3, 1).numpy().argmax(-1).astype(np.uint8)

    model = DeeplabMulti(num_classes=19)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(4), jnp.zeros((1, Hf, Wf, 3))
    )
    variables = pth_interop.merge_variables(
        variables, pth_interop.resnet_state_dict_to_variables(sd)
    )

    @jax.jit
    def eval_fn(variables, images):
        _, p2 = model.apply(variables, images)
        up = upsample_logits(p2, (1024, 2048), exact=True)
        return jnp.argmax(up, axis=-1).astype(jnp.uint8)

    mask = np.asarray(eval_fn(variables, jnp.asarray(x)))
    mismatch = int((mask != ref_mask).sum())
    total = mask.size
    # Bitwise-identical argmax is not guaranteed across BLAS/MXU summation
    # orders when two logits tie to within float rounding; demand parity on
    # >= 99.99% of pixels (ties flip only where logits are ~equal, which
    # cannot move mIoU at the reported 0.1 precision).
    assert mismatch / total < 1e-4, (mismatch, total)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_PARITY"),
    reason="full-protocol trained-weights parity is slow (~10 min CPU); "
           "opt in with RUN_SLOW_PARITY=1",
)
def test_full_protocol_mask_parity_trained_weights(tmp_path):
    """Arm (b) of the f32 precision decision (see ops/precision.py): the
    full eval protocol on TRAINED weights. Random init is tie-dominated
    (near-zero logits), the worst case for precision-induced argmax flips;
    released checkpoints have confident margins. Here we briefly train our
    model (hot LR so margins grow fast), export the weights BACK to a torch
    state dict through the real .pth path (variables_to_resnet_state_dict),
    load them into the reference's own module, and assert mask equality at
    the real protocol size (evaluate_cityscapes.py:150-169). On CPU, HIGH
    and HIGHEST are bit-identical (XLA:CPU computes true f32 either way);
    the on-chip decider is scripts/f32_precision_onchip.py, whose 2026-08-19
    verdict (zero confident-pixel flips under either setting) made HIGH the
    default — record in ops/precision.py."""
    from model.deeplab_multi import DeeplabMulti as RefDeeplabMulti

    from adaptsegnet_tpu.train.build import build_train_state
    from adaptsegnet_tpu.train.config import TrainConfig
    from adaptsegnet_tpu.train.steps import make_source_only_step

    Ht, Wt = 128, 256  # training size (weights are size-agnostic)
    cfg = TrainConfig(
        source_only=True, warper=False, restore_from="",
        input_size=f"{Wt},{Ht}", num_steps=100, learning_rate=0.02,
    )
    state, modules = build_train_state(cfg, example_hw=(Ht, Wt))
    step_fn = make_source_only_step(
        modules["model"], None, input_hw=(Ht, Wt), iter_size=1, donate=False,
    )
    # Spatially structured 4-class labels: CE collapses onto them quickly,
    # giving confident (checkpoint-like) margins after a few hot steps.
    rng = np.random.default_rng(7)
    labels = np.zeros((Ht, Wt), np.int32)
    labels[: Ht // 2, : Wt // 2] = 0
    labels[: Ht // 2, Wt // 2:] = 5
    labels[Ht // 2:, : Wt // 2] = 11
    labels[Ht // 2:, Wt // 2:] = 13
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((1, 1, Ht, Wt, 3)), jnp.float32
        ),
        "labels": jnp.asarray(labels[None, None], jnp.int32),
    }
    loss0 = None
    for _ in range(25):
        state, metrics = step_fn(state, batch)
        if loss0 is None:
            loss0 = float(metrics["loss_seg2"])
    lossN = float(metrics["loss_seg2"])
    assert lossN < loss0, (loss0, lossN)  # margins actually grew

    trained = {
        "params": state.generator.params,
        "batch_stats": state.generator.batch_stats,
    }
    sd = pth_interop.variables_to_resnet_state_dict(trained)
    ref = RefDeeplabMulti(num_classes=19).eval()
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    )

    Hf, Wf = 512, 1024
    x = np.random.default_rng(11).standard_normal(
        (1, Hf, Wf, 3)).astype(np.float32)
    with torch.no_grad():
        _, r2 = ref(torch.from_numpy(x).permute(0, 3, 1, 2), (2048, 1024))
    ref_mask = r2.permute(0, 2, 3, 1).numpy().argmax(-1).astype(np.uint8)

    model = modules["model"]

    @jax.jit
    def eval_fn(variables, images):
        _, p2 = model.apply(variables, images)
        up = upsample_logits(p2, (1024, 2048), exact=True)
        return jnp.argmax(up, axis=-1).astype(jnp.uint8)

    mask = np.asarray(eval_fn(trained, jnp.asarray(x)))
    flips = mask != ref_mask
    mismatch = int(flips.sum())
    # This setup is MORE tie-dominated than random init (measured: our
    # logits match torch to 3.3e-6 max-abs, yet 6.5k pixels flip because
    # torch's own top1-top2 margin there is <= 2.9e-6 — 25 hot steps on 4
    # classes leave the other 15 logit rows near-identical, creating
    # exact-tie plains). So assert the stronger, setup-independent
    # statement: any flip at a pixel where torch itself had a REAL margin
    # is a genuine parity bug; tie flips (margin ~ f32 rounding of O(6)
    # logits) are unavoidable across BLAS summation orders.
    ref_up = r2.permute(0, 2, 3, 1).numpy()
    srt = np.sort(ref_up, axis=-1)
    margin = (srt[..., -1] - srt[..., -2])[flips]
    if mismatch:
        assert float(margin.max()) < 1e-4, (
            "flip at a non-tied pixel", mismatch, float(margin.max()))
    assert mismatch / mask.size < 1e-2, (mismatch, mask.size)
