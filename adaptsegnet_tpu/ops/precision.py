"""The f32 bit-parity path's MXU precision, in one place.

TPU MXUs multiply in bf16; an f32 matmul/conv is emulated by splitting
each operand into bf16 limbs. XLA's passes:

  HIGHEST  6 passes (3 limbs x 3 limbs, dropped tiny terms) — closest to
           a true f32 multiply.
  HIGH     3 passes — drops the low-low limb products; ~2x faster.
  DEFAULT  1 pass — plain bf16 multiplies; breaks torch-exact eval.

Default: HIGH, decided by the on-chip experiment that was built to decide
it (scripts/f32_precision_onchip.py, 2026-08-19, trained checkpoint-like
weights, full eval protocol 512x1024 f32 forward -> exact 1024x2048
align-corners upsample -> argmax vs the torch-CPU reference mask):

  HIGHEST: 6426/2.1M pixels flipped (0.31%), all at torch top1-top2
           margins <= 3.3e-6;
  HIGH:    55777 flipped (2.7%), all at margins <= 2.9e-5;
  BOTH:    zero flips at any pixel where torch's margin > 1e-4.

So on the real MXU *neither* setting is bit-identical to torch-CPU — the
6-pass emulation only shrinks the tie-pixel flip set — and every flip in
either arm sits on a torch near-tie where the reference's own answer is
f32-noise. mIoU at its reported 0.1 precision is unaffected either way,
and on CPU (where the torch-golden suite actually validates bit-parity,
incl. the RUN_SLOW_PARITY full-protocol mask-equality test) XLA computes
true f32 regardless of this setting, so HIGH == HIGHEST bitwise there.
HIGH runs the eval protocol ~2x faster (68.5 vs 34.8 img/s measured), so
it is the default; HIGHEST remains opt-in for the closest-to-torch
posture:

  ADAPTSEG_F32_PRECISION=highest   (env var, read at import)
"""

from __future__ import annotations

import os

import jax

_CHOICES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}
_requested = os.environ.get("ADAPTSEG_F32_PRECISION", "high").lower()
if _requested not in _CHOICES:
    raise ValueError(
        f"ADAPTSEG_F32_PRECISION={_requested!r} is not supported; choose "
        f"one of {sorted(_CHOICES)} (DEFAULT precision breaks torch-exact "
        "eval and is deliberately not offered)."
    )
F32_PRECISION = _CHOICES[_requested]
