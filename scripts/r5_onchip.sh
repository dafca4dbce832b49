#!/bin/bash
# Serial on-chip queue for the round-5 close-out. One TPU process at a
# time; every stage gets a generous internal timeout so nothing SIGTERMs
# an in-flight TPU program (that wedges the axon tunnel for ~30 min —
# CLAUDE.md). Run from the repo root:  bash scripts/r5_onchip.sh
set -u
cd "$(dirname "$0")/.."
LOG=scripts/r5_onchip.log
stamp() { echo "[r5 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

stamp "stage 0: block until the tunnel answers (no timeout, no kill)"
python - <<'EOF' 2>&1 | grep -v WARNING | tee -a "$LOG"
import time; t0 = time.time()
import jax, jax.numpy as jnp
print("tunnel alive:", float(jnp.sum(jnp.ones((128, 128)))),
      f"after {time.time()-t0:.0f}s", flush=True)
EOF

stamp "stage 1: verify smoke (train 3 steps -> evaluate -> compute_iou)"
timeout 1200 python train_gta2cityscapes_multi.py \
  --data-dir /tmp/verify/gta5 --data-list /tmp/verify/gta5/train.txt \
  --input-size 64,32 --input-size-target 64,32 \
  --num-steps 100 --num-steps-stop 3 --save-pred-every 100 \
  --snapshot-dir /tmp/verify/snap --log-dir /tmp/verify/log \
  --no-warper --restore-from '' --no-orbax-checkpoints --source-only \
  >>"$LOG" 2>&1 && stamp "train smoke OK" || stamp "train smoke FAILED rc=$?"
timeout 1200 python evaluate_cityscapes.py --model DeeplabMulti \
  --data-dir /tmp/verify/cs --data-list /tmp/verify/cs/val.txt \
  --restore-from /tmp/verify/snap/source_only/GTA5_3.pth \
  --save /tmp/verify/result --input-size 64,32 --output-size 64,32 \
  >>"$LOG" 2>&1 && stamp "eval smoke OK" || stamp "eval smoke FAILED rc=$?"
timeout 600 python compute_iou.py --gt_dir /tmp/verify/cs/gtFine/val \
  --pred_dir /tmp/verify/result --devkit_dir /tmp/verify/devkit \
  --single-dir >>"$LOG" 2>&1 \
  && stamp "iou smoke OK" || stamp "iou smoke FAILED rc=$?"

stamp "stage 2: fresh per-op ledger, multi-level @ shipped r5 defaults"
timeout 2400 python -m adaptsegnet_tpu.cli.profile_step --top 48 --iters 6 \
  > scripts/profile_r5_multilevel.txt 2>scripts/profile_r5_multilevel.err \
  && stamp "profile OK -> scripts/profile_r5_multilevel.txt" \
  || stamp "profile FAILED rc=$?"

stamp "stage 3: timed full bench.py (driver-window validation)"
T0=$(date +%s)
timeout 2400 python bench.py > /tmp/bench_r5_local.json 2>>"$LOG"
RC=$?
stamp "bench rc=$RC elapsed $(( $(date +%s) - T0 ))s"
tail -c 2000 /tmp/bench_r5_local.json >> "$LOG"; echo >> "$LOG"

stamp "queue done"
