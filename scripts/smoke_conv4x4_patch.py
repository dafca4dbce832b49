#!/usr/bin/env python
"""On-chip smoke for the conv1 patch-matrix kernels at the real geometry.

Runs fwd + full VJP of conv4x4_s2_phases_planar at (1, 19, 257, 513) bf16
and checks values against the XLA c-minor phase lowering on the same chip.
Run DIRECTLY (not under pytest) so a Mosaic failure prints the real
MosaicError instead of `remote_compile: HTTP 500` (CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from adaptsegnet_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.conv4x4 import conv4x4_s2d_phases
from adaptsegnet_tpu.ops.pallas.conv4x4_patch import (
    conv4x4_s2_phases_planar,
    supported,
)

N, C, HB, WB, COUT = 1, 19, 257, 513, 64
rng = np.random.default_rng(0)
phases = tuple(
    jnp.asarray(rng.standard_normal((N, C, HB, WB)), jnp.bfloat16)
    for _ in range(4)
)
k = jnp.asarray(rng.standard_normal((4, 4, C, COUT)) * 0.1, jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((COUT,)), jnp.bfloat16)
g = jnp.asarray(rng.standard_normal((N, HB - 1, WB - 1, COUT)), jnp.bfloat16)

assert supported(phases[0].shape, COUT, jnp.bfloat16), "gate should hold"


def f_kernel(ps, k_, b_):
    return conv4x4_s2_phases_planar(ps, k_, b_)


def f_xla(ps, k_, b_):
    return conv4x4_s2d_phases(
        tuple(jnp.transpose(p, (0, 2, 3, 1)) for p in ps), k_, b_
    )


for name, f in (("kernel", f_kernel), ("xla", f_xla)):
    t0 = time.time()
    out, vjp = jax.vjp(f, phases, k, b)
    dphases, dk, db = vjp(g)
    print(f"{name}: compiled+ran in {time.time() - t0:.1f}s "
          f"out={float(jnp.sum(out.astype(jnp.float32))):.3f} "
          f"dk={float(jnp.sum(dk.astype(jnp.float32))):.3f} "
          f"db={float(jnp.sum(db.astype(jnp.float32))):.3f} "
          f"dp0={float(jnp.sum(dphases[0].astype(jnp.float32))):.3f}",
          flush=True)
    if name == "kernel":
        ref = None
        got = (out, dphases, dk, db)
    else:
        ref = (out, dphases, dk, db)

names = ("out", "dphases", "dk", "db")
for nm, a, bb in zip(names, got, ref):
    fa = np.asarray(jax.tree.map(
        lambda t: t.astype(jnp.float32), a if nm != "dphases" else jnp.stack(a)
    ))
    fb = np.asarray(jax.tree.map(
        lambda t: t.astype(jnp.float32),
        bb if nm != "dphases" else jnp.stack(bb),
    ))
    err = float(np.max(np.abs(fa - fb))) / max(float(np.max(np.abs(fb))), 1e-9)
    print(f"{nm}: max rel err {err:.2e}", flush=True)
    assert err < 0.05, (nm, err)
print("SMOKE_OK", flush=True)
