"""Polynomial LR decay (reference train_gta2cityscapes_multi.py:162-177)."""

from __future__ import annotations

import jax.numpy as jnp


def lr_poly(base_lr: float, step, max_steps: int, power: float = 0.9):
    """base_lr * (1 - step/max_steps)^power — works on traced or python ints.

    Applied per *outer* iteration (the reference adjusts before each
    iter-size accumulation window and steps optimizers once per window).
    """
    frac = 1.0 - jnp.asarray(step, jnp.float32) / float(max_steps)
    return base_lr * jnp.power(jnp.maximum(frac, 0.0), power)
