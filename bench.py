#!/usr/bin/env python
"""Benchmark: DeeplabMulti eval throughput at 512x1024 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images/sec/chip for the reference eval protocol — DeeplabMulti
forward at 512x1024 + bilinear align-corners upsample of pred2 to 1024x2048
+ argmax (reference evaluate_cityscapes.py:150-169). The reference publishes
no throughput numbers (BASELINE.json published: {}), so vs_baseline is
reported against a conservative CUDA-8-era estimate of ~5 img/s for this
model/protocol.

Timing methodology: on this tunneled TPU backend `block_until_ready` returns
before execution finishes, so per-call timing lies. We instead enqueue N
executions (they serialize on the device queue), force ONE true host sync
via a scalar device->host transfer, and subtract the idle transfer latency.
Validated against an 8192^3 bf16 matmul reaching ~93% of v5e peak.

Flags: --train benches the fused multi-level adversarial train step instead;
--dtype float32 for the parity-precision path (default bfloat16).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x) -> float:
    """True host sync: pull a scalar derived from x."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32) if hasattr(x, "astype") else x))


def _measure(run_once, make_sync_value, iters: int) -> float:
    """Seconds per iteration: enqueue `iters` runs, one terminal sync."""
    import jax.numpy as jnp

    # Warmup + establish idle sync latency.
    out = run_once()
    _sync(make_sync_value(out))
    t0 = time.perf_counter()
    _sync(make_sync_value(out))
    idle = time.perf_counter() - t0

    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = run_once()
    _sync(make_sync_value(last))
    total = time.perf_counter() - t0
    return max(total - idle, 1e-9) / iters


def bench_eval(dtype: str, iters: int, batch: int) -> float:
    import jax
    import jax.numpy as jnp

    from adaptsegnet_tpu.eval.evaluator import make_eval_fn
    from adaptsegnet_tpu.models import DeeplabMulti

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = DeeplabMulti(num_classes=19, dtype=jdtype)
    x = jnp.zeros((batch, 512, 1024, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    eval_fn = make_eval_fn(model, out_hw=(1024, 2048), output_index=1,
                           dtype=jdtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((batch, 512, 1024, 3)), jnp.float32)

    sec = _measure(lambda: eval_fn(variables, img), lambda m: m, iters)
    return batch / sec


def bench_train(dtype: str, iters: int, batch: int,
                level: str = "multi-level") -> float:
    import jax
    import jax.numpy as jnp

    from adaptsegnet_tpu.train.build import build_train_state
    from adaptsegnet_tpu.train.config import TrainConfig
    from adaptsegnet_tpu.train.steps import make_adversarial_step

    hw = (512, 1024)
    cfg = TrainConfig(
        source_only=False, level=level, warper=False,
        compute_dtype=dtype, restore_from="",
    )
    state, modules = build_train_state(cfg, example_hw=hw)
    step_fn = make_adversarial_step(
        modules["model"], modules["discriminator"], level=level,
        input_hw=hw, iter_size=1, donate=False,
    )
    rng = np.random.default_rng(0)
    b = {
        "images": jnp.asarray(rng.standard_normal((1, batch, *hw, 3)),
                              jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 19, size=(1, batch, *hw)),
                              jnp.int32),
        "target_images": jnp.asarray(
            rng.standard_normal((1, batch, *hw, 3)), jnp.float32
        ),
    }

    def run_once():
        _, metrics = step_fn(state, b)
        return metrics

    return _measure(run_once, lambda m: m["loss_seg2"], iters)


def bench_source_only(dtype: str, iters: int, batch: int,
                      warper: bool) -> float:
    """Reference default mode (SOURCE_ONLY=True, --warper default True):
    CE pretraining step; warper-on exercises the fused Pallas
    upsample+warp kernel."""
    import jax.numpy as jnp

    from adaptsegnet_tpu.train.build import build_train_state
    from adaptsegnet_tpu.train.config import TrainConfig
    from adaptsegnet_tpu.train.steps import make_source_only_step

    hw = (512, 1024)
    cfg = TrainConfig(source_only=True, warper=warper, compute_dtype=dtype,
                      restore_from="")
    state, modules = build_train_state(cfg, example_hw=hw)
    step_fn = make_source_only_step(
        modules["model"],
        warper_module=modules.get("warper") if warper else None,
        input_hw=hw, iter_size=1, donate=False,
    )
    rng = np.random.default_rng(0)
    b = {
        "images": jnp.asarray(rng.standard_normal((1, batch, *hw, 3)),
                              jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 19, size=(1, batch, *hw)),
                              jnp.int32),
    }

    def run_once():
        _, metrics = step_fn(state, b)
        return metrics

    return _measure(run_once, lambda m: m["loss_seg2"], iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true",
                   help="bench ONLY the train step (single JSON line); "
                        "--mode picks which")
    p.add_argument("--mode", default="multi-level",
                   choices=["multi-level", "single-level", "source-only",
                            "source-only-warper"],
                   help="with --train: which fused step to bench")
    p.add_argument("--eval-only", action="store_true",
                   help="bench ONLY bf16 eval at --batch (single JSON line)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    baseline_est = 5.0  # img/s, CUDA-8-era GPU estimate (none published)

    if args.train:
        if args.mode.startswith("source-only"):
            step_time = bench_source_only(
                args.dtype, args.iters, args.batch,
                warper=args.mode.endswith("warper"),
            )
        else:
            step_time = bench_train(args.dtype, args.iters, args.batch,
                                    level=args.mode)
        print(json.dumps({
            "metric": (f"{args.mode} train step time "
                       f"(512x1024, bs{args.batch})"),
            "value": round(step_time * 1000.0, 2),
            "unit": "ms/step",
            "vs_baseline": None,
        }))
        return
    if args.eval_only:
        ips = bench_eval(args.dtype, args.iters, args.batch)
        print(json.dumps({
            "metric": "DeeplabMulti eval images/sec/chip @512x1024->1024x2048 argmax",
            "value": round(ips, 2),
            "unit": "images/sec",
            "vs_baseline": round(ips / baseline_est, 2),
        }))
        return

    # Default: the full perf story in one JSON line. Headline = best-batch
    # bf16 eval throughput; extras record the f32 bit-parity eval path (the
    # number that gates released-checkpoint mIoU reproduction) and one
    # fused train step per trainer mode (multi-level, single-level,
    # source-only with and without the warper) so every number the README
    # quotes is driver-reproducible.
    ips_b1 = bench_eval("bfloat16", args.iters, 1)
    ips_b8 = bench_eval("bfloat16", args.iters, 8)
    ips_f32 = bench_eval("float32", max(args.iters // 3, 5), 1)
    sub_iters = max(args.iters // 3, 5)
    step_ms = bench_train("bfloat16", sub_iters, 1) * 1000.0
    sl_ms = bench_train("bfloat16", sub_iters, 1,
                        level="single-level") * 1000.0
    so_warp_ms = bench_source_only(
        "bfloat16", sub_iters, 1, warper=True
    ) * 1000.0
    so_ms = bench_source_only("bfloat16", sub_iters, 1, warper=False) * 1000.0
    best_ips, best_batch = max((ips_b1, 1), (ips_b8, 8))
    print(json.dumps({
        "metric": "DeeplabMulti eval images/sec/chip @512x1024->1024x2048 argmax",
        "value": round(best_ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(best_ips / baseline_est, 2),
        "extra": {
            "eval_bf16_bs1_img_per_s": round(ips_b1, 2),
            "eval_bf16_bs8_img_per_s": round(ips_b8, 2),
            "eval_f32_parity_bs1_img_per_s": round(ips_f32, 2),
            "train_multilevel_bf16_bs1_ms": round(step_ms, 2),
            "train_singlelevel_bf16_bs1_ms": round(sl_ms, 2),
            "train_sourceonly_warper_bf16_bs1_ms": round(so_warp_ms, 2),
            "train_sourceonly_bf16_bs1_ms": round(so_ms, 2),
            "best_batch": best_batch,
        },
    }))


if __name__ == "__main__":
    main()
