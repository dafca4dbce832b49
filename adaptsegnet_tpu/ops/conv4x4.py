"""4x4 / stride-2 / pad-1 convolution as space-to-depth + matmuls.

Every discriminator layer and every Warper encoder layer is a
Conv2d(kernel=4, stride=2, padding=1) (reference model/discriminator.py:10-14,
model/custom_layers.py:76,87-91). XLA's strided-conv lowering on this TPU
runs these at 2-6 TFLOP/s (measured) — pathological for what is dense
matmul work.

Identity: with x_p = pad(x, 1) and the space-to-depth blocks
B(u, v)[r, s, c] = x_p(2u + r, 2v + s, c)  (shape (H/2+1, W/2+1, 4C)),
    out(i, j) = sum_{a,b in {0,1}}  B(i+a, j+b) @ W'[a, b]
where W'[a, b][(r, s, c), o] = W[2a + r, 2b + s, c, o]. Four static-slice
matmuls with K = 4C — clean MXU shapes, ~10x faster, exact same math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv4x4_stride2(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """torch Conv2d(Cin, Cout, kernel_size=4, stride=2, padding=1) on NHWC.

    x: (N, H, W, C) with H, W even; kernel: HWIO (4, 4, C, Cout).
    """
    n, h, w, c = x.shape
    kh, kw, kc, cout = kernel.shape
    assert (kh, kw) == (4, 4) and kc == c and h % 2 == 0 and w % 2 == 0
    oh, ow = h // 2, w // 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hb, wb = oh + 1, ow + 1
    # Space-to-depth: (N, 2*hb, 2*wb, C) -> (N, hb, wb, 2*2*C), channel
    # order (r, s, c).
    blocks = xp.reshape(n, hb, 2, wb, 2, c).transpose(0, 1, 3, 2, 4, 5)
    blocks = blocks.reshape(n, hb, wb, 4 * c)

    # W'[a, b]: (4C, Cout) with row order (r, s, c).
    wk = kernel.reshape(2, 2, 2, 2, c, cout)  # (a, r, b, s, c, o)
    out = None
    for a in (0, 1):
        for b in (0, 1):
            wab = wk[a, :, b].reshape(4 * c, cout)
            xab = jax.lax.slice(
                blocks, (0, a, b, 0), (n, a + oh, b + ow, 4 * c)
            )
            y = jax.lax.dot_general(
                xab, wab,
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # f32 inputs keep (multi-pass) f32 MXU precision — parity
                # with XLA's conv lowering; bf16 takes the fast single pass.
                precision=(jax.lax.Precision.HIGHEST
                           if x.dtype == jnp.float32 else None),
            )
            out = y if out is None else out + y
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
