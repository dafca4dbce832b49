#!/usr/bin/env python
"""On-chip perf campaign: 3-run medians + the five opt-in gate A/Bs.

Runs bench.py worker modes sequentially (one process at a time — this box
has one CPU core and one tunneled TPU chip), collects each run's JSON line,
and writes medians to scripts/campaign_results.json incrementally, so a
tunnel wedge mid-campaign keeps everything measured so far.

Gate discipline (ROADMAP.md / ops NOTEs): only IN-STEP bench.py numbers
flip a gate's default. Each gate is A/B'd against the baseline arm of
the train mode it affects. Live gate arms: NONE — every gate through
round 5 is decided.

2026-08-19/20/21 outcomes (medians in campaign_results.json):
STEM_WGRAD_RP, WARP_PLANAR_CE, WARP_PIXEL_LANES (26.55 vs 30.43) and
D_CONV1_PATCH (44.74 vs 44.89) won and are now defaults;
PALLAS_CONV3X3_D1, D_BLOCKED_S2D, WARP_LANE_TILE, ASPP_ALIGNED,
D_ALIGNED_S2D and EVAL_BATCHED_CONV (173.34 vs 181.8 img/s bs8) lost
and their env gates were retired (NOTEs at the sites; losing medians
listed at the configs table below).

Usage: python scripts/campaign.py [--runs 3] [--iters 15] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
OUT = os.path.join(REPO, "scripts", "campaign_results.json")


def log(msg):
    print(f"[campaign {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_bench(argv, env_extra, timeout_s=2400):
    env = dict(os.environ, **env_extra)
    try:
        r = subprocess.run([sys.executable, BENCH] + argv,
                           capture_output=True, text=True,
                           timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        log(f"TIMEOUT: {argv} {env_extra}")
        return None
    if r.returncode != 0:
        log(f"rc={r.returncode}: {argv} {env_extra}: "
            f"{(r.stderr or '').strip().splitlines()[-2:]}")
        return None
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            return json.loads(line)["value"]
        except (json.JSONDecodeError, KeyError):
            continue
    return None


def median_of(argv, env_extra, runs):
    vals = []
    for i in range(runs):
        v = run_bench(argv, env_extra)
        log(f"  run {i + 1}/{runs}: {v}")
        if v is not None:
            vals.append(v)
    return (round(statistics.median(vals), 2) if vals else None), vals


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--quick", action="store_true",
                   help="1 run per config (gate screening)")
    p.add_argument("--only", default="",
                   help="comma list of result keys to (re)run")
    args = p.parse_args()
    runs = 1 if args.quick else args.runs
    it = str(args.iters)

    train = ["--train", "--iters", it, "--mode"]
    ml, sow = train + ["multi-level"], train + ["source-only-warper"]
    # Retired arms are REMOVED, not just commented: their env vars are no
    # longer read by the code, so a re-run would record a baseline number
    # mislabeled as a gate measurement (advisor r4). The losing medians
    # stay on record in campaign_results.json and as NOTEs at the sites:
    #   ml_gate_conv3x3_d1 47.55 | ml_gate_d_blocked_s2d 46.27
    #   ml_gate_aspp_aligned 46.6 / eval 186.2 | ml_gate_d_aligned_s2d 47.36
    #   sow_gate_warp_lane_tile 35.44
    # Winners now defaults (their old "=1" arms would also re-measure the
    # default): ml_gate_stem_wgrad_rp 44.76, sow_gate_warp_planar_ce 30.78.
    configs = [
        # (key, argv, env)
        ("train_multilevel_bf16_bs1_ms", ml, {}),
        ("train_sourceonly_warper_bf16_bs1_ms", sow, {}),
        # r4 pixel-lane warp kernels (ops/pallas/upsample_warp.py
        # _env_pixel_lanes): lanes over pixels, no padded E2/S2 matmuls.
        ("sow_gate_warp_pixel_lanes", sow, {"ADAPTSEG_WARP_PIXEL_LANES": "1"}),
        # r5 conv1 patch-matrix kernel (ops/pallas/conv4x4_patch.py):
        # planar phases + in-VMEM patch build vs the 16 K=19 XLA dots.
        # WON its 2026-08-20 A/B (44.74 vs 44.89) and is now the default;
        # this arm now re-measures the default (kept for history).
        ("ml_gate_d_conv1_patch", ml, {"ADAPTSEG_D_CONV1_PATCH": "1"}),
        # eval_gate_bs8_batched_conv (NB-image-blocked Pallas
        # conv3x3_dil fwd in the bs8 eval graph) LOST its 2026-08-21
        # A/B: 173.34 vs 181.8 img/s — gate retired, NOTE at
        # ops/conv3x3.py _fwd_conv; arm removed so a re-run can't record
        # a baseline as a gate number.
        ("train_singlelevel_bf16_bs1_ms", train + ["single-level"], {}),
        ("train_sourceonly_bf16_bs1_ms", train + ["source-only"], {}),
        ("eval_bf16_bs1_img_per_s",
         ["--eval-only", "--batch", "1", "--iters", "30"], {}),
        ("eval_bf16_bs8_img_per_s",
         ["--eval-only", "--batch", "8", "--iters", "30"], {}),
        # The f32 path as shipped (HIGH since the 2026-08-19 on-chip
        # decision — record in ops/precision.py) and the opt-in HIGHEST arm.
        ("eval_f32_parity_bs1_img_per_s",
         ["--eval-only", "--dtype", "float32", "--batch", "1",
          "--iters", it], {"ADAPTSEG_F32_PRECISION": "high"}),
        ("eval_f32_highest_bs1_img_per_s",
         ["--eval-only", "--dtype", "float32", "--batch", "1",
          "--iters", it], {"ADAPTSEG_F32_PRECISION": "highest"}),
    ]
    only = {k for k in args.only.split(",") if k}

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for key, argv, env in configs:
        if only and key not in only:
            continue
        if not only and key in results and results[key].get("median"):
            log(f"{key}: already have {results[key]['median']}, skipping")
            continue
        log(f"{key}: {argv} {env}")
        med, vals = median_of(argv, env, runs)
        results[key] = {"median": med, "runs": vals, "env": env,
                        "iters": args.iters,
                        "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        log(f"{key}: median {med}")
    log(f"done -> {OUT}")


if __name__ == "__main__":
    main()
