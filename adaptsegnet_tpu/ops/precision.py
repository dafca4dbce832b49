"""The f32 bit-parity path's MXU precision, in one place.

TPU MXUs multiply in bf16; an f32 matmul/conv is emulated by splitting
each operand into bf16 limbs. XLA's passes:

  HIGHEST  6 passes (3 limbs x 3 limbs, dropped tiny terms) — closest to
           a true f32 multiply; what torch-CPU parity was validated at.
  HIGH     3 passes — drops the low-low limb products; ~2x faster.
  DEFAULT  1 pass — plain bf16 multiplies; breaks torch-exact eval.

The f32 path exists to reproduce released-checkpoint mIoU bit-for-bit
(CLAUDE.md invariant), so HIGHEST is the default. Measured on the real
chip at the full eval protocol (512x1024 f32 forward -> 1024x2048
align-corners upsample -> argmax): HIGH runs the protocol at 81.0 img/s
vs HIGHEST's 34.3 (2.4x), drifts logits by ~9e-5 RELATIVE, and flipped
1.9e-5 of argmax pixels on a random-init model (near-zero logits, so
tie-dominated — an upper-bound-ish flip rate). NOT bit-identical, so
HIGH is opt-in only:

  ADAPTSEG_F32_PRECISION=high   (env var, read at import)

for users who want the 2.4x and can tolerate tie-break flips invisible
at mIoU's reported 0.1 precision.
"""

from __future__ import annotations

import os

import jax

_CHOICES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}
_requested = os.environ.get("ADAPTSEG_F32_PRECISION", "highest").lower()
if _requested not in _CHOICES:
    raise ValueError(
        f"ADAPTSEG_F32_PRECISION={_requested!r} is not supported; choose "
        f"one of {sorted(_CHOICES)} (DEFAULT precision breaks torch-exact "
        "eval and is deliberately not offered)."
    )
F32_PRECISION = _CHOICES[_requested]
