"""`python -m adaptsegnet_tpu.cli.profile_step` — per-op step profile.

Traces N iterations of a fused train step (multi-level adversarial by
default; --source-only [--warper] for the CE pretraining modes) with
jax.profiler and prints the xprof framework_op_stats breakdown: top ops by
device self time plus a rollup by op type. This is the harness behind every
perf decision in ops/ (the NOTEs citing "in-step" per-op times); the
reference has no profiling story at all (SURVEY §5.1).

Synthetic inputs, random init — the op mix and layouts are identical to
real training, so per-op times transfer.
"""

from __future__ import annotations

import argparse
import tempfile

import numpy as np

from adaptsegnet_tpu.utils.profiling import op_stats, print_op_stats, trace


def get_arguments(argv=None):
    p = argparse.ArgumentParser(description="Per-op train-step profile")
    p.add_argument("--top", type=int, default=40,
                   help="rows of the per-op table")
    p.add_argument("--iters", type=int, default=6,
                   help="traced step executions")
    p.add_argument("--source-only", action="store_true",
                   help="profile the CE pretraining step instead")
    p.add_argument("--warper", action="store_true",
                   help="with --source-only: include the Warper path")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--trace-dir", default=None,
                   help="keep the raw trace here (default: temp dir)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_arguments(argv)

    import jax
    import jax.numpy as jnp

    from adaptsegnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from adaptsegnet_tpu.train.build import build_train_state
    from adaptsegnet_tpu.train.config import TrainConfig
    from adaptsegnet_tpu.train.steps import (
        make_adversarial_step,
        make_source_only_step,
    )

    hw = (512, 1024)
    if args.source_only:
        cfg = TrainConfig(source_only=True, warper=args.warper,
                          compute_dtype=args.dtype, restore_from="")
        state, modules = build_train_state(cfg, example_hw=hw)
        step_fn = make_source_only_step(
            modules["model"],
            warper_module=modules.get("warper") if args.warper else None,
            input_hw=hw, iter_size=1, donate=False,
        )
    else:
        cfg = TrainConfig(source_only=False, level="multi-level",
                          warper=False, compute_dtype=args.dtype,
                          restore_from="")
        state, modules = build_train_state(cfg, example_hw=hw)
        step_fn = make_adversarial_step(
            modules["model"], modules["discriminator"], level="multi-level",
            input_hw=hw, iter_size=1, donate=False,
        )

    rng = np.random.default_rng(0)
    b = {
        "images": jnp.asarray(
            rng.standard_normal((1, args.batch, *hw, 3)), jnp.float32),
        "labels": jnp.asarray(
            rng.integers(0, 19, size=(1, args.batch, *hw)), jnp.int32),
    }
    if not args.source_only:
        b["target_images"] = jnp.asarray(
            rng.standard_normal((1, args.batch, *hw, 3)), jnp.float32)

    # Warm up (compile) with one true sync — block_until_ready lies on the
    # tunneled backend, a scalar pull does not (see bench.py).
    _, m = step_fn(state, b)
    print("warm:", float(jnp.sum(m["loss_seg2"])))

    tdir = args.trace_dir or tempfile.mkdtemp(prefix="xprof_step_")
    with trace(tdir):
        last = None
        for _ in range(args.iters):
            _, last = step_fn(state, b)
        print("traced:", float(jnp.sum(last["loss_seg2"])))

    rows = op_stats(tdir, device_only=jax.default_backend() == "tpu")
    print_op_stats(rows, top=args.top, iters=args.iters)
    print("\ntrace dir:", tdir)


if __name__ == "__main__":
    main()
