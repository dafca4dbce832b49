"""3x3 conv emitting PLANAR (N, Cout, H, W) output — for tiny-Cout heads.

The Warper's flow head (reference model/warper.py:216-241 final stage,
custom_layers.py:171-188) is a 3x3 conv with TWO output channels at full
input resolution. On TPU, XLA lowers the NHWC conv to a
{3,0,2,1:T(2,128)} channel-minor output layout, and every downstream
elementwise consumer (tanh / grid add / clip in the warp sampler) then
reads it as a strided near-scalar gather — profiled at ~10 ms/step at
(512, 1024) for what is 4 MB of data, with the 2-wide conv itself another
~4.5 ms. Emitting channel PLANES sidesteps the layout entirely: one
(N, Cin, H, W) relayout of the input, then nine tap-shifted
(Cout, Cin) x (Cin, N*H*W) dot_generals accumulated in f32.

Exact same math as lax.conv_general_dilated(k=3, s=1, p=1) with HWIO
weights; only the output layout differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.precision import F32_PRECISION


def conv3x3_planar_out(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
) -> jnp.ndarray:
    """x: (N, H, W, Cin); kernel: (3, 3, Cin, Cout) HWIO; bias: (Cout,).

    Returns (N, Cout, H, W) in x.dtype. f32 inputs run HIGHEST-precision
    dots (the bit-parity convention of models/layers.py Conv2d).
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    precision = (
        F32_PRECISION if x.dtype == jnp.float32 else None
    )
    xt = jnp.transpose(x, (0, 3, 1, 2))  # (n, cin, h, w)
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1)))
    kernel = kernel.astype(x.dtype)
    acc = None
    for dy in range(3):
        for dx in range(3):
            wtap = jnp.transpose(kernel[dy, dx], (1, 0))  # (cout, cin)
            seg = xp[:, :, dy:dy + h, dx:dx + w]
            t = jax.lax.dot_general(
                wtap, seg,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # (cout, n, h, w)
            acc = t if acc is None else acc + t
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)[:, None, None, None]
    return jnp.transpose(acc, (1, 0, 2, 3)).astype(x.dtype)
