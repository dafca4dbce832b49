"""Fused jit/pjit train steps: source-only, single-level, multi-level.

The reference runs up to six forward and five backward passes per iteration
as separate CUDA launches with detach/requires_grad bookkeeping
(train_gta2cityscapes_multi.py:385-464 single-level, :578-683 multi-level;
SURVEY.md §3.2-3.3). Here each mode is ONE XLA program:

  * the generator loss (source CE [+ lambda_seg aux CE] + lambda_adv *
    GAN(D(softmax(target preds)), source_label)) is differentiated wrt
    generator params only — discriminator params enter as constants, which
    is exactly the reference's `requires_grad=False` freeze (:390-391);
  * the discriminator losses reuse the softmax maps from the generator pass
    through `stop_gradient` — the reference's `.detach()` (:440, :452) —
    and are differentiated wrt discriminator params;
  * iter-size gradient accumulation (:266, :385) is a `lax.scan` over a
    leading micro-batch axis inside the step;
  * all three optimizers then apply in the same program.

Under a data-parallel `Mesh`, batches arrive sharded on the 'data' axis and
XLA inserts the gradient all-reduce over ICI (replacing nn.DataParallel).

Warper semantics (fork quirk, kept faithfully): in source-only and
single-level modes the flow field predicted from the SOURCE batch warps the
upsampled main logits — including the target branch in single-level
(:403 computes `warper` once from source images; :421 reuses it for the
target forward). Warper params receive no updates (never in an optimizer);
its BN runs in batch-stats mode with running stats updated.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops import (
    cross_entropy_2d,
    cross_entropy_2d_planar,
    gan_loss,
    upsample_logits,
)
from adaptsegnet_tpu.ops.resize import (
    upsample_softmax_s2d,
    upsample_softmax_s2d_planar,
)
from adaptsegnet_tpu.ops.pallas.upsample_warp import upsample_warp
from adaptsegnet_tpu.train.state import TrainState

SOURCE_LABEL = 0.0  # reference :363
TARGET_LABEL = 1.0  # reference :364


def _tree_zeros_like(tree):
    return jax.tree.map(jnp.zeros_like, tree)


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _forward_warper(warper_module, wstate, images):
    """Warper forward in train mode, collecting live-stat mutations
    (BN running stats / spectral-norm u vectors, per the norm variant)."""
    mutable = list(wstate.stats.keys())
    (flow, _), mut = warper_module.apply(
        {"params": wstate.params, **wstate.stats},
        images,
        train=True,
        mutable=mutable,
    )
    return flow, {k: mut[k] for k in mutable}


def _seg_forward(model, params, batch_stats, images, input_hw, flow=None,
                 planar=False, mutable_stats=False, planar_out=False):
    """Segmenter forward ->
    (pred1_up, pred2_up, (pred1_raw, pred2_raw), batch_stats').

    The raw (un-upsampled) logits are load-bearing: the adversarial step
    feeds them to upsample_softmax_s2d so the discriminator consumes
    blocked phases with no space-to-depth relayout.

    bf16 models get the fast in-dtype resize (the exact f32 interpolation
    only matters for bit-parity eval; in training it costs real time in both
    fwd and bwd at full resolution).

    When `flow` is given (warper-on modes), the main head's upsample and the
    flow warp are FUSED into the Pallas MXU-contraction kernel
    (ops/pallas/upsample_warp.py) instead of resize-then-gather — the gather
    warp's scatter-add backward alone cost ~57 ms/step at (512, 1024) on
    v5e. Same math as warp_with_flow(upsample_logits(...)), summed in a
    different order.

    `mutable_stats` (bn_mode='batch' models) collects the running-stat
    updates of the reference's train-mode BN; otherwise batch_stats pass
    through unchanged.
    """
    exact = getattr(model, "dtype", jnp.float32) == jnp.float32
    variables = {"params": params, "batch_stats": batch_stats}
    if mutable_stats:
        (pred1, pred2), mut = model.apply(
            variables, images, mutable=["batch_stats"]
        )
        batch_stats = mut["batch_stats"]
    else:
        pred1, pred2 = model.apply(variables, images)
    pred1_up = upsample_logits(pred1, input_hw, exact=exact)
    if flow is None:
        pred2_up = upsample_logits(pred2, input_hw, exact=exact)
    else:
        pred2_up = upsample_warp(pred2, flow, input_hw, planar=planar,
                                 planar_out=planar_out)
    return pred1_up, pred2_up, (pred1, pred2), batch_stats


def make_source_only_step(
    model,
    warper_module=None,
    input_hw: tuple[int, int] = (512, 1024),
    iter_size: int = 1,
    donate: bool = True,
):
    """Source-domain CE pretraining step (reference :230-314).

    batch: dict(images=(iter_size, B, H, W, 3), labels=(iter_size, B, H, W)).
    Returns (new_state, metrics{loss_seg2}).
    """
    planar = bool(getattr(warper_module, "planar_flow", False))
    bn_batch = getattr(model, "bn_mode", "frozen") == "batch"
    # DEFAULT since the r4 on-chip A/B (3-run medians, in-step bench.py
    # --train source-only-warper: 30.78 ms vs 32.30 ms base —
    # scripts/campaign_results.json 2026-08-19): warped pred2 emitted as
    # (N, C, H, W) planes straight out of the warp kernel and consumed by
    # the planar CE — no c-minor (H, W, 19) tensor (whose HBM tiles pad
    # 19 -> 128 lanes) between them. Source-only only: here pred2 feeds
    # nothing but the CE. Set =0 to A/B the dense c-minor path.
    planar_ce = (
        warper_module is not None
        and os.environ.get("ADAPTSEG_WARP_PLANAR_CE", "1") == "1"
    )

    def step(state: TrainState, batch):
        gstate = state.generator

        def micro(carry, mb):
            grads_acc, loss_acc, wstats, bstats = carry
            flow = None
            if warper_module is not None:
                flow, wstats = _forward_warper(
                    warper_module, state.warper.replace(stats=wstats),
                    mb["images"],
                )

            def loss_fn(params):
                _, pred2, _, new_bstats = _seg_forward(
                    model, params, bstats, mb["images"], input_hw,
                    flow=flow, planar=planar, mutable_stats=bn_batch,
                    planar_out=planar_ce,
                )
                ce = (cross_entropy_2d_planar if planar_ce
                      else cross_entropy_2d)
                return ce(pred2, mb["labels"]), new_bstats

            (loss, bstats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(gstate.params)
            grads = jax.tree.map(lambda g: g / iter_size, grads)
            return (_tree_add(grads_acc, grads), loss_acc + loss / iter_size,
                    wstats, bstats), None

        init = (
            _tree_zeros_like(gstate.params),
            jnp.zeros((), jnp.float32),
            state.warper.stats if state.warper is not None else None,
            gstate.batch_stats,
        )
        if iter_size == 1:
            # No accumulation pass: saves a zeros-init + whole-tree add
            # (~2.4 ms/step measured on the profiler as copy_add_fusion).
            mb = jax.tree.map(lambda x: x[0], batch)
            (grads, loss_seg2, wstats, bstats), _ = micro(init, mb)
        else:
            (grads, loss_seg2, wstats, bstats), _ = jax.lax.scan(
                micro, init, batch
            )

        new_g = gstate.apply_gradients(grads)
        if bn_batch:
            new_g = new_g.replace(batch_stats=bstats)
        new_warper = (
            state.warper.replace(stats=wstats)
            if state.warper is not None
            else None
        )
        new_state = state.replace(
            step=state.step + 1, generator=new_g, warper=new_warper
        )
        return new_state, {"loss_seg2": loss_seg2}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_adversarial_step(
    model,
    discriminator,
    level: str = "multi-level",
    gan: str = "LS",
    lambda_seg: float = 0.1,
    lambda_adv1: float = 0.0002,
    lambda_adv2: float = 0.001,
    input_hw: tuple[int, int] = (512, 1024),
    iter_size: int = 1,
    warper_module=None,
    donate: bool = True,
    blocked_s2d: bool | str = False,
):
    """Fused G/D adversarial step (reference :316-496 and :498-722).

    batch: dict(
        images=(iter_size, B, H, W, 3),  source images
        labels=(iter_size, B, H, W),     source labels
        target_images=(iter_size, B, H, W, 3),
    ).
    Returns (new_state, metrics) with the reference's log names.
    """
    criterion = gan_loss(gan)
    multi = level == "multi-level"
    planar = bool(getattr(warper_module, "planar_flow", False))
    bn_batch = getattr(model, "bn_mode", "frozen") == "batch"
    # blocked_s2d (blocked-4C D input) LOST its r4 on-chip A/B: in-step
    # bench.py --train multi-level 46.27 ms vs 45.73 ms base (3-run
    # medians, scripts/campaign_results.json 2026-08-19) — the
    # channel-concat's lane shuffle costs more than the 4 K=4C vs 16 K=C
    # dot consolidation saves. Kept as a keyword (default False) so the
    # equivalence test still exercises the blocked lowering.
    #
    # blocked_s2d='aligned' (phases zero-padded 19 -> 32 before the
    # concat: one 128-lane tile, 4 K=128 conv1 dots) LOST its r4 on-chip
    # A/B even harder than blocked-4C: 47.36 ms vs 44.89 ms base (3-run
    # medians, scripts/campaign_results.json 2026-08-19). The pad+concat
    # writes don't fuse away and cost more than the 16-K=19-dot waste
    # they remove — with blocked-4C's 46.27 this pins the conv1 dot
    # consolidation itself as the loss, not the concat alignment. Kept
    # as a keyword value for the equivalence test only.
    if level not in ("single-level", "multi-level"):
        raise NotImplementedError(f"level choice {level!r} is not implemented")
    # DEFAULT since the r5 on-chip A/B (3-run in-step medians, bench.py
    # --train multi-level: 44.74 ms vs 44.89 ms base, runs 44.73/44.88/
    # 44.74 vs 44.89/44.85/44.92 — scripts/campaign_results.json
    # 2026-08-20): PLANAR phase production + the Pallas conv1 patch-matrix
    # kernel (ops/pallas/conv4x4_patch.py) — targets the 16 K=19 conv1
    # dots (3.1 ms/step at ~21 TF/s, the r3 ledger's biggest non-roofline
    # item) by building the patch matrix in VMEM instead of consolidating
    # dots through HBM concats (which lost twice, see the blocked_s2d NOTE
    # above). The win is small (~0.15 ms): the kernel replaces the dots at
    # roofline but the planar phase producer gives some of it back — see
    # the r5 ledger in ROADMAP.md. Set =0 for the lane-phase + XLA-dot arm.
    conv1_patch = os.environ.get("ADAPTSEG_D_CONV1_PATCH", "1") == "1"

    def d_apply(dparams, score_maps):
        return discriminator.apply({"params": dparams}, score_maps)

    def step(state: TrainState, batch):
        gstate = state.generator

        def micro(carry, mb):
            (g_acc, d1_acc, d2_acc, m_acc, wstats, bstats) = carry

            flow = None
            if warper_module is not None and not multi:
                # Fork quirk: flow comes from the SOURCE images and is reused
                # for the target forward (:403, :421).
                flow, wstats = _forward_warper(
                    warper_module, state.warper.replace(stats=wstats),
                    mb["images"],
                )

            def g_loss_fn(params):
                # bn_mode='batch': running stats update source-then-target,
                # the reference's forward order (:399-421, :595-631).
                p1_s, p2_s, raw_s, bstats1 = _seg_forward(
                    model, params, bstats, mb["images"], input_hw,
                    flow=flow, planar=planar, mutable_stats=bn_batch,
                )
                p1_t, p2_t, raw_t, bstats2 = _seg_forward(
                    model, params, bstats1, mb["target_images"],
                    input_hw, flow=flow, planar=planar,
                    mutable_stats=bn_batch,
                )

                loss_seg2 = cross_entropy_2d(p2_s, mb["labels"])
                loss_seg1 = (
                    cross_entropy_2d(p1_s, mb["labels"])
                    if multi
                    else jnp.zeros(())
                )
                seg_loss = loss_seg2 + lambda_seg * loss_seg1

                # Discriminator inputs: softmax of the upsampled logits
                # (reference :423). When the main head is NOT warped, emit
                # them directly in stride-2 parity-phase (blocked) form —
                # the D's 4x4/s2 conv1 then runs shuffle-free
                # (ops/resize.upsample_softmax_s2d + conv4x4_s2d_phases;
                # the space-to-depth relayout cost ~7.6 ms/step over the
                # six D applications). Warped main heads (single-level
                # warper-on) keep the dense-softmax path.
                if flow is None and getattr(
                    discriminator, "supports_s2d_phases", False
                ):
                    # blocked=True: single channel-concat tensor -> conv1
                    # runs 4 K=4C dots instead of 16 K=C
                    # (conv4x4_s2d_blocked). Default False — see the
                    # blocked_s2d NOTE above (lost the r4 in-step A/B).
                    if conv1_patch:
                        sm_of = lambda raw: upsample_softmax_s2d_planar(
                            raw, input_hw
                        )
                    else:
                        sm_of = lambda raw: upsample_softmax_s2d(
                            raw, input_hw, blocked=blocked_s2d
                        )
                    sm2_t = sm_of(raw_t[1])
                    sm2_s = sm_of(raw_s[1])
                    sm1_t = sm_of(raw_t[0]) if multi else None
                    sm1_s = sm_of(raw_s[0]) if multi else None
                else:
                    sm2_t = jax.nn.softmax(p2_t, axis=-1)
                    sm2_s = jax.nn.softmax(p2_s, axis=-1)
                    sm1_t = jax.nn.softmax(p1_t, axis=-1) if multi else None
                    sm1_s = jax.nn.softmax(p1_s, axis=-1) if multi else None

                # G tries to make target preds look source-like (label 0);
                # D params are constants here == requires_grad=False freeze.
                loss_adv2 = criterion(
                    d_apply(state.d2.params, sm2_t), SOURCE_LABEL
                )
                if multi:
                    loss_adv1 = criterion(
                        d_apply(state.d1.params, sm1_t), SOURCE_LABEL
                    )
                else:
                    loss_adv1 = jnp.zeros(())
                adv_loss = lambda_adv1 * loss_adv1 + lambda_adv2 * loss_adv2
                total = seg_loss + adv_loss

                aux = {
                    "sm1_s": sm1_s,
                    "sm2_s": sm2_s,
                    "sm1_t": sm1_t,
                    "sm2_t": sm2_t,
                    "loss_seg1": loss_seg1,
                    "loss_seg2": loss_seg2,
                    "loss_adv_target1": loss_adv1,
                    "loss_adv_target2": loss_adv2,
                    "bstats": bstats2,
                }
                return total, aux

            (_, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                gstate.params
            )

            # --- discriminator losses on detached maps (reference :440-461,
            # :642-679): each domain contributes gan_loss / 2.
            def d_loss_fn(dparams, sm_s, sm_t):
                l_s = criterion(d_apply(dparams, jax.lax.stop_gradient(sm_s)),
                                SOURCE_LABEL) / 2.0
                l_t = criterion(d_apply(dparams, jax.lax.stop_gradient(sm_t)),
                                TARGET_LABEL) / 2.0
                return l_s + l_t

            loss_d2, d2_grads = jax.value_and_grad(d_loss_fn)(
                state.d2.params, aux["sm2_s"], aux["sm2_t"]
            )
            if multi:
                loss_d1, d1_grads = jax.value_and_grad(d_loss_fn)(
                    state.d1.params, aux["sm1_s"], aux["sm1_t"]
                )
            else:
                loss_d1, d1_grads = jnp.zeros(()), d1_acc

            scale = lambda t: jax.tree.map(lambda g: g / iter_size, t)
            metrics = {
                "loss_seg1": aux["loss_seg1"] / iter_size,
                "loss_seg2": aux["loss_seg2"] / iter_size,
                "loss_adv_target1": aux["loss_adv_target1"] / iter_size,
                "loss_adv_target2": aux["loss_adv_target2"] / iter_size,
                "loss_D1": loss_d1 / iter_size,
                "loss_D2": loss_d2 / iter_size,
            }
            carry = (
                _tree_add(g_acc, scale(g_grads)),
                _tree_add(d1_acc, scale(d1_grads)) if multi else d1_acc,
                _tree_add(d2_acc, scale(d2_grads)),
                _tree_add(m_acc, metrics),
                wstats,
                aux["bstats"],
            )
            return carry, None

        init = (
            _tree_zeros_like(gstate.params),
            _tree_zeros_like(state.d1.params) if multi else None,
            _tree_zeros_like(state.d2.params),
            {
                k: jnp.zeros((), jnp.float32)
                for k in (
                    "loss_seg1", "loss_seg2", "loss_adv_target1",
                    "loss_adv_target2", "loss_D1", "loss_D2",
                )
            },
            state.warper.stats if (warper_module is not None and not multi)
            else None,
            gstate.batch_stats,
        )
        if iter_size == 1:
            mb = jax.tree.map(lambda x: x[0], batch)
            (g_grads, d1_grads, d2_grads, metrics, wstats, bstats), _ = micro(
                init, mb
            )
        else:
            (g_grads, d1_grads, d2_grads, metrics, wstats, bstats), _ = (
                jax.lax.scan(micro, init, batch)
            )

        new_g = gstate.apply_gradients(g_grads)
        if bn_batch:
            new_g = new_g.replace(batch_stats=bstats)
        new_state = state.replace(
            step=state.step + 1,
            generator=new_g,
            d1=state.d1.apply_gradients(d1_grads) if multi else state.d1,
            d2=state.d2.apply_gradients(d2_grads),
            warper=(
                state.warper.replace(stats=wstats)
                if wstats is not None
                else state.warper
            ),
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
