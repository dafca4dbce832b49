"""Stride-1 1x1 conv as an explicit MXU matmul (custom VJP).

The bottleneck 1x1 convs (conv1/conv3/downsample of the ResNet blocks,
reference model/deeplab_multi.py:59-103) are pure channel matmuls. XLA's
conv_general_dilated lowering for them is fine in isolation, but inside
the fused train step it is layout-sensitive: when the neighboring 3x3
convs run as Pallas kernels (ops/pallas/conv3x3_dil.py, default row-major
tiled layouts), XLA keeps feeding its conv emitter relayout-hostile
activation layouts — profiled at 2.5-7.3 ms per layer4 block (vs a
44-87 us matmul roofline). Lowering the 1x1s as reshape + dot_general
pins the same plain layout on both sides of the Pallas boundary and the
whole chain stays at MXU-friendly shapes (M = N*H*W, K/N = C).

bf16 path only — the f32 bit-parity path keeps the HIGHEST-precision XLA
conv lowering end-to-end (CLAUDE.md invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def conv1x1_s1(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """y[n,h,w,o] = x[n,h,w,:] @ k[0,0,:,o]; NHWC, HWIO (1,1,Cin,Cout).

    The PRIMAL (eval, fwd-only) keeps XLA's conv lowering — in the eval
    graph the conv emitter fuses with its neighbors and wins. The dot
    lowering applies on the VJP path (the train step), where it pins the
    plain layout next to the Pallas 3x3 kernels.
    """
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fwd_impl(x, k):
    n, h, w, cin = x.shape
    cout = k.shape[-1]
    # bf16 out directly: the MXU accumulates f32 internally; asking for an
    # f32 result materializes a 4-byte intermediate the epilogue then
    # casts — measured HBM waste at (8192, 2048) shapes.
    y = jax.lax.dot_general(
        x.reshape(n * h * w, cin), k.reshape(cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
    )
    return y.reshape(n, h, w, cout)


def _fwd(x, k):
    return _fwd_impl(x, k), (x, k)


def _bwd(res, dy):
    x, k = res
    n, h, w, cin = x.shape
    cout = k.shape[-1]
    dy2 = dy.reshape(n * h * w, cout)
    # dx = dy @ k^T  (contract cout); bf16 out (see _fwd_impl)
    dx = jax.lax.dot_general(
        dy2, k.reshape(cin, cout),
        (((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    ).reshape(x.shape)
    # dk = x^T @ dy  (contract pixels)
    dk = jax.lax.dot_general(
        x.reshape(n * h * w, cin), dy2,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(k.shape).astype(k.dtype)
    return dx, dk


conv1x1_s1.defvjp(_fwd, _bwd)
