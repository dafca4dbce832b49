#!/usr/bin/env python
"""Benchmark: DeeplabMulti eval throughput at 512x1024 on one chip.

Prints ONE JSON line (stdout):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

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

Resilience (the axon tunnel is known to wedge for 30-45 min and to fail
backend init transiently — it cost round 3 its whole perf record): the
default mode is an ORCHESTRATOR. It first probes the backend in a
subprocess (a wedged call blocks forever, so the probe must be killable)
and retries with backoff for up to ADAPTSEG_BENCH_PROBE_BUDGET_S (default
3900 s). Each metric then runs in its own subprocess with a generous
timeout; every completed metric is immediately mirrored to stderr and to
bench_partial.json, so a mid-run wedge can no longer zero the record. The
final stdout line carries whatever was measured ("partial": true if
incomplete), and SIGTERM/SIGINT emit it too before exiting.

Flags: --train benches one fused train step (--mode picks which) in-process;
--eval-only benches bf16/f32 eval in-process. These are the worker modes
the orchestrator invokes. --dtype float32 for the parity-precision path.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache in .jax_cache/ (CLAUDE.md).

    Wired here (not just via env) so the orchestrator's per-metric
    subprocesses pay each cold compile exactly once across runs.
    """
    from adaptsegnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()


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
    _enable_compile_cache()
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
    _enable_compile_cache()
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
    _enable_compile_cache()
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


BASELINE_EST = 5.0  # img/s, CUDA-8-era GPU estimate (none published)

_PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "print(float(jnp.sum(jnp.ones((8, 8)))))"
)


def _log(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def probe_backend(budget_s: float, attempt_timeout_s: float = 240.0,
                  sleep_s: float = 120.0) -> bool:
    """True once a tiny jnp.sum completes in a killable subprocess.

    CLAUDE.md: a wedged tunnel blocks every compile/exec (jax.devices()
    still answers) and recovers on its own in ~30-45 min; backend init can
    also fail outright (BENCH_r03). Both shapes are retried until budget.
    """
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=attempt_timeout_s,
            )
            if r.returncode == 0:
                if attempt > 1:
                    _log(f"backend alive after {attempt} probe attempts")
                return True
            tail = (r.stderr or "").strip().splitlines()[-1:]
            _log(f"probe attempt {attempt} rc={r.returncode}: {tail}")
        except subprocess.TimeoutExpired:
            _log(f"probe attempt {attempt} timed out "
                 f"({attempt_timeout_s:.0f}s) — tunnel likely wedged")
        if time.monotonic() + sleep_s >= deadline:
            return False
        time.sleep(sleep_s)


def _run_metric(argv: list[str], timeout_s: float, env: dict | None = None):
    """Run one worker-mode bench in a subprocess; return its parsed JSON.

    Killing an in-flight TPU process can wedge the tunnel (CLAUDE.md), so
    the timeout is generous and a kill is last-resort, logged loudly.
    """
    cmd = [sys.executable, os.path.abspath(__file__)] + argv
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s,
                           env={**os.environ, **(env or {})})
    except subprocess.TimeoutExpired:
        _log(f"metric {' '.join(argv)} KILLED after {timeout_s:.0f}s — "
             "the tunnel may now be wedged; re-probing before next metric")
        return None, True
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-3:]
        _log(f"metric {' '.join(argv)} rc={r.returncode}: {tail}")
        return None, False
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            return json.loads(line), False
        except json.JSONDecodeError:
            continue
    _log(f"metric {' '.join(argv)} produced no JSON line")
    return None, False


def _final_line(extra: dict, partial: bool) -> str:
    ips_b1 = extra.get("eval_bf16_bs1_img_per_s")
    ips_b8 = extra.get("eval_bf16_bs8_img_per_s")
    cands = [(v, b) for v, b in ((ips_b1, 1), (ips_b8, 8)) if v is not None]
    best_ips, best_batch = max(cands) if cands else (None, None)
    out = {
        "metric": ("DeeplabMulti eval images/sec/chip "
                   "@512x1024->1024x2048 argmax"),
        "value": round(best_ips, 2) if best_ips is not None else None,
        "unit": "images/sec",
        "vs_baseline": (round(best_ips / BASELINE_EST, 2)
                        if best_ips is not None else None),
        "extra": dict(extra, best_batch=best_batch),
    }
    if partial:
        out["partial"] = True
    return json.dumps(out)


def orchestrate(iters: int, wall_budget_s: float, probe_budget_s: float,
                metric_timeout_s: float) -> int:
    """Default mode: full perf story, one metric per subprocess.

    Headline = best-batch bf16 eval throughput; extras record the f32
    bit-parity eval path (the number that gates released-checkpoint mIoU
    reproduction) and one fused train step per trainer mode so every number
    the README quotes is driver-reproducible. Persistent .jax_cache makes
    the per-subprocess recompiles cheap after the first run.
    """
    t_start = time.monotonic()
    sub_iters = max(iters // 3, 5)
    specs = [
        ("eval_bf16_bs1_img_per_s",
         ["--eval-only", "--batch", "1", "--iters", str(iters)], {}),
        ("eval_bf16_bs8_img_per_s",
         ["--eval-only", "--batch", "8", "--iters", str(iters)], {}),
        # The f32 mIoU-reproduction path as shipped (HIGH MXU precision —
        # on-chip decision record in ops/precision.py: zero argmax flips vs
        # torch at any pixel with top1-top2 margin > 1e-4).
        ("eval_f32_parity_bs1_img_per_s",
         ["--eval-only", "--dtype", "float32", "--batch", "1",
          "--iters", str(sub_iters)], {}),
        # The opt-in closest-to-torch arm (6-pass limb emulation).
        ("eval_f32_highest_bs1_img_per_s",
         ["--eval-only", "--dtype", "float32", "--batch", "1",
          "--iters", str(sub_iters)],
         {"ADAPTSEG_F32_PRECISION": "highest"}),
        ("train_multilevel_bf16_bs1_ms",
         ["--train", "--mode", "multi-level", "--iters", str(sub_iters)], {}),
        ("train_singlelevel_bf16_bs1_ms",
         ["--train", "--mode", "single-level", "--iters", str(sub_iters)],
         {}),
        ("train_sourceonly_warper_bf16_bs1_ms",
         ["--train", "--mode", "source-only-warper",
          "--iters", str(sub_iters)], {}),
        ("train_sourceonly_bf16_bs1_ms",
         ["--train", "--mode", "source-only", "--iters", str(sub_iters)], {}),
    ]
    extra: dict = {}
    done_all = True

    def emit_now(signum=None, frame=None):
        # One JSON line on stdout even when killed mid-run.
        print(_final_line(extra, partial=True), flush=True)
        sys.exit(1)

    signal.signal(signal.SIGTERM, emit_now)
    signal.signal(signal.SIGINT, emit_now)

    if not probe_backend(probe_budget_s):
        _log(f"backend never came up within {probe_budget_s:.0f}s")
        print(_final_line(extra, partial=True), flush=True)
        return 1

    need_probe = False
    for key, argv, env in specs:
        elapsed = time.monotonic() - t_start
        if elapsed + 60 > wall_budget_s:
            _log(f"wall budget {wall_budget_s:.0f}s exhausted; stopping "
                 f"before {key}")
            done_all = False
            break
        if need_probe:
            # A timed-out metric may have wedged the tunnel; wait for
            # recovery (bounded by remaining wall budget) before burning
            # the next metric's run on a dead backend.
            remaining = wall_budget_s - (time.monotonic() - t_start) - 60
            if remaining <= 0 or not probe_backend(min(probe_budget_s,
                                                       remaining)):
                _log("backend did not recover; stopping")
                done_all = False
                break
            need_probe = False
        parsed, timed_out = _run_metric(
            argv, min(metric_timeout_s,
                      max(wall_budget_s - (time.monotonic() - t_start), 60)),
            env=env,
        )
        need_probe = timed_out
        if parsed is None:
            extra[key] = None
            done_all = False
        else:
            extra[key] = parsed["value"]
        _log(f"{key} = {extra[key]}")
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_partial.json"), "w") as f:
            json.dump(extra, f, indent=1)

    partial = (not done_all) or any(v is None for v in extra.values())
    print(_final_line(extra, partial=partial), flush=True)
    return 0 if extra.get("eval_bf16_bs1_img_per_s") is not None else 1


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
                   help="bench ONLY eval at --batch/--dtype "
                        "(single JSON line)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

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
            "metric": ("DeeplabMulti eval images/sec/chip "
                       "@512x1024->1024x2048 argmax"),
            "value": round(ips, 2),
            "unit": "images/sec",
            "vs_baseline": round(ips / BASELINE_EST, 2),
        }))
        return

    sys.exit(orchestrate(
        iters=args.iters,
        wall_budget_s=float(os.environ.get(
            "ADAPTSEG_BENCH_WALL_BUDGET_S", "5400")),
        probe_budget_s=float(os.environ.get(
            "ADAPTSEG_BENCH_PROBE_BUDGET_S", "3900")),
        metric_timeout_s=float(os.environ.get(
            "ADAPTSEG_BENCH_METRIC_TIMEOUT_S", "1500")),
    ))


if __name__ == "__main__":
    main()
