"""Shared building blocks: conv/pool/norm with torch-parity semantics.

Everything is NHWC (channels on TPU lanes) with HWIO kernels. Parameter
initializers reproduce the reference's init schemes so from-scratch training
matches: normal(0, 0.01) convs for the DeepLab nets
(reference model/deeplab_multi.py:144-150), torch's default
kaiming-uniform(+uniform bias) for the discriminator, and xavier-normal
(gain 0.02) for the Warper (reference model/warper.py:147-178).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.precision import F32_PRECISION
import numpy as np
from flax import linen as nn

Dtype = Any


def normal_conv_init(stddev: float = 0.01):
    """weight ~ N(0, stddev): the reference's DeepLab conv init."""
    return nn.initializers.normal(stddev=stddev)


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) on OIHW fan_in.

    For HWIO shape (kh, kw, cin, cout): fan_in = kh*kw*cin; bound =
    sqrt(6 / ((1 + a^2) * fan_in)) = 1/sqrt(fan_in) * sqrt(6/(1+5)) =
    1/sqrt(fan_in). Used for the FCDiscriminator, which the reference leaves
    at torch defaults (model/discriminator.py:10-14).
    """
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_default_bias_init(fan_in: int):
    """torch nn.Conv2d default bias: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_normal_init(gain: float = 0.02):
    """torch init.xavier_normal_(gain): N(0, gain^2 * 2/(fan_in+fan_out))."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan_in = kh * kw * cin
        fan_out = kh * kw * cout
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std

    return init


class Conv2d(nn.Module):
    """3x3/1x1/4x4... conv wrapper pinning torch-parity attributes.

    `padding` is symmetric int padding (torch style); `dilation` applies to
    the kernel. Computation runs in `dtype` (bf16 for speed, f32 for parity);
    params are always stored f32.
    """

    features: int
    kernel_size: int | tuple[int, int]
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = normal_conv_init(0.01)
    bias_init: Callable | None = None
    lower_s2_matmul: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = (
            self.kernel_size
            if isinstance(self.kernel_size, tuple)
            else (self.kernel_size, self.kernel_size)
        )
        bias_init = self.bias_init or nn.initializers.zeros_init()
        if (
            self.lower_s2_matmul
            and ks == (4, 4)
            and self.stride == 2
            and self.padding == 1
            and self.dilation == 1
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            # Discriminator/Warper-encoder shape: matmul lowering
            # (ops/conv4x4.py) instead of XLA's slow strided conv. Same
            # param layout as nn.Conv ('conv'/{kernel,bias}).
            from adaptsegnet_tpu.ops.conv4x4 import conv4x4_stride2

            class _P(nn.Module):
                cin: int
                cout: int
                use_bias: bool
                kernel_init: Callable
                bias_init: Callable

                @nn.compact
                def __call__(self):
                    k = self.param(
                        "kernel", self.kernel_init, (4, 4, self.cin, self.cout)
                    )
                    b = (
                        self.param("bias", self.bias_init, (self.cout,))
                        if self.use_bias
                        else None
                    )
                    return k, b

            k, b = _P(
                x.shape[-1], self.features, self.use_bias,
                self.kernel_init, bias_init, name="conv",
            )()
            x = x.astype(self.dtype)
            return conv4x4_stride2(
                x, jnp.asarray(k, self.dtype),
                None if b is None else jnp.asarray(b, self.dtype),
            )
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            # f32 = parity path: force true-f32 MXU passes (TPU DEFAULT
            # multiplies f32 operands in bf16). See conv_bn_folded.
            precision=(F32_PRECISION
                       if self.dtype == jnp.float32 else None),
            name="conv",
        )(x)


class ConvTranspose2d(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) — the Warper transpose-decoder
    upsampler (reference model/custom_layers.py:36-44,176-179).

    Lowered to phase matmuls (ops/conv_transpose4x4.py) instead of XLA's
    input-dilated strided conv. Param layout matches Conv2d
    ('conv'/{kernel,bias}) with kernel HWIO (4, 4, Cin, Cout) = torch's
    (Cin, Cout, 4, 4) transposed (2, 3, 0, 1).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = xavier_normal_init(0.02)
    bias_init: Callable | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if (self.kernel_size, self.stride, self.padding) != (4, 2, 1):
            raise NotImplementedError(
                "ConvTranspose2d implements the reference's only transpose "
                "shape: kernel 4, stride 2, padding 1"
            )
        from adaptsegnet_tpu.ops.conv_transpose4x4 import (
            conv_transpose4x4_stride2,
        )

        class _P(nn.Module):
            cin: int
            cout: int
            use_bias: bool
            kernel_init: Callable
            bias_init: Callable

            @nn.compact
            def __call__(self):
                k = self.param(
                    "kernel", self.kernel_init, (4, 4, self.cin, self.cout)
                )
                b = (
                    self.param("bias", self.bias_init, (self.cout,))
                    if self.use_bias
                    else None
                )
                return k, b

        k, b = _P(
            x.shape[-1], self.features, self.use_bias,
            self.kernel_init, self.bias_init or nn.initializers.zeros_init(),
            name="conv",
        )()
        x = x.astype(self.dtype)
        return conv_transpose4x4_stride2(
            x, jnp.asarray(k, self.dtype),
            None if b is None else jnp.asarray(b, self.dtype),
        )


class BatchNorm2d(nn.Module):
    """BatchNorm with torch semantics (eps 1e-5, momentum 0.1).

    `use_running_average=True` (the default everywhere in the backbone)
    normalizes with stored statistics — the TPU-native stand-in for the
    reference's frozen-affine BN whose running stats come from the released
    checkpoints (model/deeplab_multi.py:66-78). The Warper's live BN passes
    `use_running_average=False` and updates the 'batch_stats' collection.
    """

    momentum: float = 0.9  # flax convention: ra = m*ra + (1-m)*batch == torch 0.1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class _ConvKernelParams(nn.Module):
    """Param-only holder: <name>/conv/kernel (Conv2d-compatible path)."""

    cin: int
    cout: int
    k: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        class _Inner(nn.Module):
            cin: int
            cout: int
            k: int
            kernel_init: Callable

            @nn.compact
            def __call__(self):
                return self.param(
                    "kernel", self.kernel_init,
                    (self.k, self.k, self.cin, self.cout),
                )

        return _Inner(self.cin, self.cout, self.k, self.kernel_init,
                      name="conv")()


class _FrozenBNParams(nn.Module):
    """Param/stat holder: <name>/bn/{scale,bias} + batch_stats mean/var
    (BatchNorm2d-compatible paths)."""

    features: int

    @nn.compact
    def __call__(self):
        class _Inner(nn.Module):
            features: int

            @nn.compact
            def __call__(self):
                scale = self.param("scale", nn.initializers.ones_init(),
                                   (self.features,))
                bias = self.param("bias", nn.initializers.zeros_init(),
                                  (self.features,))
                mean = self.variable(
                    "batch_stats", "mean",
                    lambda: jnp.zeros((self.features,), jnp.float32))
                var = self.variable(
                    "batch_stats", "var",
                    lambda: jnp.ones((self.features,), jnp.float32))
                return scale, bias, mean.value, var.value

        return _Inner(self.features, name="bn")()


class _BNTrainFrozenAffine(nn.Module):
    """Train-mode BatchNorm with FROZEN affine: the reference's backbone BN
    dynamics under model.train() (train_gta2cityscapes_multi.py:222 +
    model/deeplab_multi.py:130-132 — affine requires_grad=False, but
    normalization uses BATCH statistics and running stats update with
    torch momentum 0.1).

    Param/stat paths match _FrozenBNParams (<name>/bn/{scale,bias} +
    batch_stats mean/var) so checkpoints and optimizer labels are shared
    between bn modes. Gradients flow through the batch statistics (torch's
    train-mode BN backward); the affine and the running-stat updates are
    stop_gradient'ed.
    """

    features: int
    momentum: float = 0.1  # torch convention: ra = (1-m)*ra + m*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, y):
        class _Inner(nn.Module):
            features: int
            momentum: float
            epsilon: float

            @nn.compact
            def __call__(self, y):
                scale = self.param("scale", nn.initializers.ones_init(),
                                   (self.features,))
                bias = self.param("bias", nn.initializers.zeros_init(),
                                  (self.features,))
                ra_mean = self.variable(
                    "batch_stats", "mean",
                    lambda: jnp.zeros((self.features,), jnp.float32))
                ra_var = self.variable(
                    "batch_stats", "var",
                    lambda: jnp.ones((self.features,), jnp.float32))
                yf = y.astype(jnp.float32)
                mean = jnp.mean(yf, axis=(0, 1, 2))
                # Biased variance normalizes; unbiased updates running var
                # (torch F.batch_norm training semantics). Two-pass form:
                # E[x^2]-mean^2 cancels catastrophically in f32 and the
                # error compounds over the backbone's ~100 BNs (measured
                # 0.03 logit drift vs torch; two-pass restores <5e-4).
                var = jnp.mean(jnp.square(yf - mean), axis=(0, 1, 2))
                if not self.is_initializing():
                    m = self.momentum
                    n = y.shape[0] * y.shape[1] * y.shape[2]
                    unbiased = var * (n / max(n - 1, 1))
                    sg = jax.lax.stop_gradient
                    ra_mean.value = (1 - m) * ra_mean.value + m * sg(mean)
                    ra_var.value = (1 - m) * ra_var.value + m * sg(unbiased)
                sg = jax.lax.stop_gradient
                out = (yf - mean) * jax.lax.rsqrt(var + self.epsilon)
                out = out * sg(scale) + sg(bias)
                return out.astype(y.dtype)

        return _Inner(self.features, self.momentum, self.epsilon,
                      name="bn")(y)


def conv_bn_folded(
    parent_compact_self,
    x: jnp.ndarray,
    features: int,
    kernel_size: int,
    conv_name: str,
    bn_name: str,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    epsilon: float = 1e-5,
    kernel_init: Callable = normal_conv_init(0.01),
    dtype: Dtype = jnp.float32,
    bn_mode: str = "frozen",
):
    """Conv (no bias) + frozen inference-mode BatchNorm, BN-folded.

    Computes conv(x, W * s) + (b - mean * s) with s = scale/sqrt(var + eps)
    — numerically the conv -> BN composition, but the normalization runs
    once over the WEIGHTS instead of once over the activations, deleting a
    full activation-bandwidth pass per conv (the backbone has 104 of them).
    Gradients wrt the conv kernel flow through the fold (chain rule), so
    training dynamics match the unfolded form.

    Must be called from a parent module's @nn.compact __call__ (children are
    created in the CALLER's scope so parameter paths stay
    <conv_name>/conv/kernel and <bn_name>/bn/... — checkpoint- and
    optimizer-label-compatible with Conv2d + BatchNorm2d). Only valid for
    frozen-stats BN (the backbone's; the Warper's live BN keeps the
    standard path).
    """
    del parent_compact_self  # documentation-only: caller scope is implicit
    cin = x.shape[-1]
    kernel = _ConvKernelParams(cin, features, kernel_size, kernel_init,
                               name=conv_name)()
    if bn_mode == "batch":
        # Reference train-mode dynamics: normalization depends on the conv
        # OUTPUT's batch statistics, so nothing folds — run the raw conv and
        # normalize after (_BNTrainFrozenAffine, same param paths).
        w_folded = kernel.astype(dtype)
        b_folded = None
    elif bn_mode == "frozen":
        scale, bias, mean, var = _FrozenBNParams(features, name=bn_name)()

        # The backbone BN affine params are FROZEN (reference
        # requires_grad=False + optimizer exclusion,
        # model/deeplab_multi.py:131-132,196-218; our optim labels them
        # lr*0). stop_gradient here lets XLA delete their gradient
        # reductions outright — measured ~4-7 ms/step of pure waste (one
        # sum-over-activations per conv per backbone pass) otherwise.
        s = jax.lax.stop_gradient(
            (scale * jax.lax.rsqrt(var + epsilon)).astype(jnp.float32)
        )
        w_folded = (kernel.astype(jnp.float32) * s).astype(dtype)
        b_folded = jax.lax.stop_gradient((bias - mean * s).astype(dtype))
    else:
        raise ValueError(f"bn_mode must be 'frozen' or 'batch': {bn_mode!r}")
    x = x.astype(dtype)
    # f32 is the bit-parity path: TPU's DEFAULT conv precision multiplies in
    # bf16 even for f32 operands, which silently breaks torch-exact eval on
    # hardware (CPU tests wouldn't catch it). bf16 compute keeps the fast
    # single pass. The f32_exact flag below propagates the same rule into
    # the custom-VJP lowerings.
    f32_exact = dtype == jnp.float32
    if kernel_size == 3 and stride == 1 and padding == dilation:
        # MXU-shaped custom backward (ops/conv3x3.py): dgrad as a forward
        # conv, wgrad as nine dot_generals — ~3-4x faster than XLA's
        # generic conv backwards at these batch-1 shapes.
        from adaptsegnet_tpu.ops.conv3x3 import conv3x3_s1

        y = conv3x3_s1(x, w_folded, dilation, f32_exact)
    elif kernel_size == 7 and stride == 2 and padding == 3:
        # Stem conv: fast space-to-depth wgrad (3-channel input wastes
        # 125/128 MXU lanes in the native wgrad).
        from adaptsegnet_tpu.ops.conv3x3 import conv7x7_s2

        y = conv7x7_s2(x, w_folded, f32_exact)
    elif (kernel_size == 1 and stride == 1 and padding == 0
          and dtype == jnp.bfloat16):
        # 1x1 channel matmul, lowered explicitly so the activation layout
        # stays plain next to the Pallas 3x3 kernels (ops/conv1x1.py —
        # XLA's 1x1 conv emitter went 2.5-7.3 ms/block when the Pallas
        # boundary changed its preferred layouts). f32 keeps the
        # HIGHEST-precision conv path.
        from adaptsegnet_tpu.ops.conv1x1 import conv1x1_s1

        y = conv1x1_s1(x, w_folded)
    else:
        y = jax.lax.conv_general_dilated(
            x, w_folded,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=(F32_PRECISION if f32_exact else None),
        )
    if bn_mode == "batch":
        return _BNTrainFrozenAffine(features, epsilon=epsilon, name=bn_name)(y)
    return y + b_folded


def _pool_fwd_impl(x: jnp.ndarray, ceil_mode: bool) -> jnp.ndarray:
    n, h, w, c = x.shape

    def out_len(L):
        eff = L + 2 - 3
        return (eff + 1) // 2 + 1 if ceil_mode and eff % 2 else eff // 2 + 1

    oh, ow = out_len(h), out_len(w)
    # Padding needed so that the sliding window covers exactly oh/ow steps.
    ph_extra = max(0, (oh - 1) * 2 + 3 - (h + 2))
    pw_extra = max(0, (ow - 1) * 2 + 3 - (w + 2))
    neg = -jnp.inf
    y = jnp.pad(
        x,
        ((0, 0), (1, 1 + ph_extra), (1, 1 + pw_extra), (0, 0)),
        constant_values=neg,
    )
    return jax.lax.reduce_window(
        y,
        neg,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3_s2(x: jnp.ndarray, ceil_mode: bool = False) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1, ceil_mode=...).

    ceil_mode=False: floor output size (ResNetMulti, model/deeplab_multi.py:135).
    ceil_mode=True: ceil output size via extra -inf padding on the bottom/right
    (single-head 'Oracle' ResNet, model/deeplab.py:130).

    Custom VJP: XLA's select_and_scatter backward costs ~2.6 ms/step at
    the backbone shape. The backward below routes each window's cotangent
    to the FIRST max in row-major window-scan order (torch's and
    select_and_scatter's tie rule) using parity-block tap extraction and
    parity scatter-back — row-strided major-axis slices, contiguous
    (W, C) <-> (W/2, 2C) flattens, static pads and compares only.
    """
    return _pool_fwd_impl(x, ceil_mode)


def _pool_fwd(x, ceil_mode):
    out = _pool_fwd_impl(x, ceil_mode)
    return out, (x, out)


def _pool_bwd(ceil_mode, res, g):
    x, out = res
    n, h, w, c = x.shape
    oh, ow = out.shape[1], out.shape[2]
    neg = -jnp.inf
    # Pad to exactly (2oh+2, 2ow+2) so both row parities have oh+1 rows
    # and the (s, c) lane flatten is uniform.
    pb, pr = 2 * oh + 1 - h, 2 * ow + 1 - w
    xp = jnp.pad(x, ((0, 0), (1, pb), (1, pr), (0, 0)),
                 constant_values=neg)
    b_par = []
    for r in (0, 1):
        br = xp[:, r::2]  # (n, oh+1, 2ow+2, c): rows 2u+r
        b_par.append(br.reshape(n, oh + 1, ow + 1, 2 * c))

    def tap(dy, dx):
        a, r = divmod(dy, 2)
        b, s = divmod(dx, 2)
        return b_par[r][:, a:a + oh, b:b + ow, s * c:(s + 1) * c]

    zero = jnp.zeros((), g.dtype)
    seen = jnp.zeros(out.shape, jnp.bool_)
    dm = {}
    for dy in range(3):
        for dx in range(3):
            eq = tap(dy, dx) == out
            dm[(dy, dx)] = jnp.where(eq & ~seen, g, zero)
            seen = seen | eq

    # Scatter back: group taps by parity, place each at its (a, b) offset
    # on an (oh+1, ow+1) canvas, then invert the block build.
    rows = []
    for r in (0, 1):
        halves = []
        for s in (0, 1):
            acc = None
            for dy in range(r, 3, 2):
                for dx in range(s, 3, 2):
                    a, b = dy // 2, dx // 2
                    t = jnp.pad(dm[(dy, dx)],
                                ((0, 0), (a, 1 - a), (b, 1 - b), (0, 0)))
                    acc = t if acc is None else acc + t
            halves.append(acc)
        qr = jnp.concatenate(halves, axis=-1)  # (n, oh+1, ow+1, 2c)
        rows.append(qr.reshape(n, oh + 1, 2 * ow + 2, c))
    dxp = jnp.stack(rows, axis=2).reshape(n, 2 * oh + 2, 2 * ow + 2, c)
    return (dxp[:, 1:1 + h, 1:1 + w].astype(x.dtype),)


max_pool_3x3_s2.defvjp(_pool_fwd, _pool_bwd)


def _pool2_fwd_impl(x: jnp.ndarray) -> jnp.ndarray:
    neg = -jnp.inf
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


@jax.custom_vjp
def max_pool_2x2_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=2, stride=2) — VGG-16 pools (torchvision).

    Custom VJP with torch's first-max tie rule (same machinery as
    max_pool_3x3_s2, simpler because windows don't overlap: each input
    pixel belongs to exactly one window).
    """
    return _pool2_fwd_impl(x)


def _pool2_fwd(x):
    out = _pool2_fwd_impl(x)
    return out, (x, out)


def _pool2_bwd(res, g):
    x, out = res
    n, h, w, c = x.shape
    oh, ow = h // 2, w // 2
    if h % 2 or w % 2:
        # VALID floor-mode pooling never reads the odd trailing row/col, so
        # its gradient is zero: recurse on the even crop and pad back. (The
        # parity-block reshape below requires even dims.)
        (dx_even,) = _pool2_bwd((x[:, : 2 * oh, : 2 * ow], out), g)
        return (jnp.pad(dx_even, ((0, 0), (0, h % 2), (0, w % 2), (0, 0))),)
    b_par = [x[:, r::2].reshape(n, oh, ow, 2 * c) for r in (0, 1)]

    zero = jnp.zeros((), g.dtype)
    seen = jnp.zeros(out.shape, jnp.bool_)
    dm = {}
    for r in (0, 1):
        for s in (0, 1):
            eq = b_par[r][..., s * c:(s + 1) * c] == out
            dm[(r, s)] = jnp.where(eq & ~seen, g, zero)
            seen = seen | eq

    rows = []
    for r in (0, 1):
        qr = jnp.concatenate([dm[(r, 0)], dm[(r, 1)]], axis=-1)
        rows.append(qr.reshape(n, oh, w, c))
    dx = jnp.stack(rows, axis=2).reshape(n, h, w, c)
    return (dx.astype(x.dtype),)


max_pool_2x2_s2.defvjp(_pool2_fwd, _pool2_bwd)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)
