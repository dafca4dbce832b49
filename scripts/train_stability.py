#!/usr/bin/env python
"""On-chip training-stability curve at the real geometry (verdict r4 #6).

The reference ships a measured mIoU-vs-step curve (GTA5_pretrain:1-60,
peak 39.47 @ 95k); real GTA5/Cityscapes data is absent here, so this is
the best available proxy: a few hundred REAL multi-level adversarial
steps at 512x1024 bs1 under the shipped defaults (poly LR from 2.5e-4,
SGD 1x/10x groups, Adam(0.9, 0.99) Ds, LS-GAN) on structured synthetic
data — checkerboard class labels over smoothly-varying images, so the
CE has real signal — logging every loss scalar per step. Run once with
and once without --optim-dup-quirk (the k-fold momentum transform that
mirrors the reference's duplicated-param compounding, train/optim.py).

Success criteria checked at the end (and on every log line):
  * no NaN/Inf in any loss at any step;
  * loss_seg2 decreases: mean of the last 10% of steps < mean of the
    first 10%;
  * the GAN pair stays in its healthy band (neither D loss collapses to
    0 nor explodes; LS-GAN: 0 <= loss_D <= ~1 at these scales).

Usage:
  python scripts/train_stability.py [--steps 300] [--quirk] [--out FILE]

Writes JSONL {step, loss_seg1, loss_seg2, loss_adv_target1,
loss_adv_target2, loss_D1, loss_D2, lr, seconds} per logged step to
scripts/stability_{base|quirk}.jsonl (committed as the round artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batch(rng: np.random.Generator, hw, num_classes=19):
    """Structured synthetic pair: blurred random field images + blocky
    class labels correlated with the image content (so CE is learnable),
    plus a shifted-statistics 'target' image (domain gap stand-in)."""
    h, w = hw
    base = rng.standard_normal((1, h // 16, w // 16, 3)).astype(np.float32)
    img = np.kron(base, np.ones((1, 16, 16, 1), np.float32))
    img = img * 40.0 + rng.standard_normal((1, h, w, 3)).astype(
        np.float32) * 5.0
    # Labels follow the dominant channel of the low-res field per block,
    # quantized to classes; a random 5% is ignore (255) like real GT.
    field = base.sum(axis=-1)  # (1, h/16, w/16)
    q = np.digitize(field, np.quantile(field, np.linspace(0, 1, num_classes,
                                                          endpoint=False)[1:]))
    lab = np.kron(q, np.ones((1, 16, 16), np.int64)).astype(np.int32)
    lab[rng.random(lab.shape) < 0.05] = 255
    tgt = img[:, :, ::-1] * 0.8 + 10.0  # mirrored + shifted stats
    return img, lab, np.ascontiguousarray(tgt)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--quirk", action="store_true")
    p.add_argument("--log-every", type=int, default=1)
    p.add_argument("--lr", type=float, default=None,
                   help="override the generator LR (the 'hot' arm: the "
                   "shipped 2.5e-4 barely moves CE from RANDOM init in "
                   "300 steps — the reference always starts from ImageNet "
                   "weights — so a 0.01 arm is used to demonstrate the "
                   "optimizer actually learns, not just stays finite)")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from adaptsegnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from adaptsegnet_tpu.train.build import build_train_state
    from adaptsegnet_tpu.train.config import TrainConfig
    from adaptsegnet_tpu.train.steps import make_adversarial_step

    hw = (512, 1024)
    cfg = TrainConfig(
        source_only=False, level="multi-level", warper=False,
        compute_dtype="bfloat16", restore_from="",
        optim_dup_quirk=args.quirk,
        # Poly LR over the reference horizon: a 300-step prefix of the
        # real schedule, exactly what a real run's first steps see.
        **({"learning_rate": args.lr} if args.lr else {}),
    )
    state, modules = build_train_state(cfg, example_hw=hw)
    step_fn = make_adversarial_step(
        modules["model"], modules["discriminator"], level="multi-level",
        input_hw=hw, iter_size=1, donate=True,
    )

    arm = "quirk" if args.quirk else "base"
    if args.lr:
        arm = f"hotlr{args.lr:g}" + ("_quirk" if args.quirk else "")
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"stability_{arm}.jsonl",
    )
    rng = np.random.default_rng(1338)
    seg2 = []
    t0 = time.time()
    with open(out_path, "w") as f:
        for it in range(args.steps):
            img, lab, tgt = synthetic_batch(rng, hw)
            batch = {
                "images": jnp.asarray(img[None]),
                "labels": jnp.asarray(lab[None]),
                "target_images": jnp.asarray(tgt[None]),
            }
            state, metrics = step_fn(state, batch)
            if it % args.log_every == 0 or it == args.steps - 1:
                m = {k: float(v) for k, v in metrics.items()}
                for k, v in m.items():
                    if not np.isfinite(v):
                        print(f"FATAL: {k}={v} at step {it}", flush=True)
                        sys.exit(1)
                rec = dict(step=it, seconds=round(time.time() - t0, 1), **m)
                f.write(json.dumps(rec) + "\n")
                f.flush()
                if it % 25 == 0:
                    print(f"[{rec['seconds']:8.1f}s] step {it}: "
                          f"seg2 {m['loss_seg2']:.4f} seg1 "
                          f"{m['loss_seg1']:.4f} D2 {m['loss_D2']:.4f} "
                          f"adv2 {m['loss_adv_target2']:.4f}", flush=True)
                seg2.append(m["loss_seg2"])

    k = max(len(seg2) // 10, 1)
    head, tail = float(np.mean(seg2[:k])), float(np.mean(seg2[-k:]))
    ok = tail < head
    print(json.dumps({
        "arm": arm,
        "steps": args.steps, "seg2_first10pct": round(head, 4),
        "seg2_last10pct": round(tail, 4), "decreasing": ok,
        "out": out_path,
    }), flush=True)
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
