"""4x4 / stride-2 / pad-1 TRANSPOSED convolution as phase matmuls.

The reference Warper's transpose=True decoder upsamples with
ConvTranspose2d(kernel_size=4, stride=2, padding=1)
(model/custom_layers.py:14-22,36-44,176-179). XLA lowers conv_transpose as
an input-dilated strided conv — the same pathological pattern as the
forward 4x4/s2 conv (see ops/conv4x4.py). TPU-shaped lowering instead:

Output y(p, q, o) with p = 2u + a, q = 2v + b (phase a, b in {0,1}) receives
exactly 2x2 input taps per spatial dim:
    y(2u + a, 2v + b) = sum_{dr, ds in {0,1}} x_p(u + a + dr, v + b + ds) @ W[r, s]
with x_p = pad(x, 1) and kernel tap  r = 3 - 2*dr - a,  s = 3 - 2*ds - b
(derived from torch's y[p] += x[i] * W[p - 2i + pad]). That is 16 static
-slice matmuls with K = Cin, interleaved back by a depth-to-space reshape —
the exact inverse layout of the conv4x4 space-to-depth trick, same math as
torch bit-for-bit in f32 HIGHEST.

Kernel layout here is HWIO (4, 4, Cin, Cout): torch's ConvTranspose2d
weight (Cin, Cout, kh, kw) transposed (2, 3, 0, 1) — see utils/pth_interop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.precision import F32_PRECISION


def _dot(a, b, f32_exact):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=F32_PRECISION if f32_exact else None,
    )


def conv_transpose4x4_stride2(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """torch ConvTranspose2d(Cin, Cout, kernel_size=4, stride=2, padding=1).

    x: (N, H, W, Cin) -> (N, 2H, 2W, Cout); kernel: HWIO (4, 4, Cin, Cout).
    """
    n, h, w, c = x.shape
    kh, kw, kc, cout = kernel.shape
    assert (kh, kw) == (4, 4) and kc == c, (kernel.shape, x.shape)
    f32 = x.dtype == jnp.float32
    kernel = kernel.astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # phases[a][b] has shape (n, h, w, cout)
    phases = [[None, None], [None, None]]
    for a in (0, 1):
        for b in (0, 1):
            acc = None
            for dr in (0, 1):
                for ds in (0, 1):
                    r, s = 3 - 2 * dr - a, 3 - 2 * ds - b
                    xs = jax.lax.slice(
                        xp,
                        (0, a + dr, b + ds, 0),
                        (n, a + dr + h, b + ds + w, c),
                    )
                    y = _dot(xs, kernel[r, s], f32)
                    acc = y if acc is None else acc + y
            phases[a][b] = acc
    # Interleave: out[n, 2u+a, 2v+b, o] = phases[a][b][n, u, v, o].
    out = jnp.stack(
        [jnp.stack(row, axis=3) for row in phases], axis=2
    )  # (n, h, 2, w, 2, cout)
    out = out.reshape(n, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
