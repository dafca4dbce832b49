"""Backbone 3x3 conv with a TPU-shaped custom backward.

XLA's autodiff backward for the (dilated) stride-1 3x3 convs that dominate
the DeepLab backbone (reference model/deeplab_multi.py:59-103 bottlenecks)
measures ~40-50 TF/s on v5e — the generic conv-backward lowerings tile
poorly at batch-1 64x128 feature maps. Both halves have exact
reformulations that hit the MXU properly (measured in isolation):

  * dgrad: for stride 1 and padding == dilation, the transpose of the conv
    IS the same conv with the kernel spatially flipped and in/out channels
    swapped — so it reuses XLA's *forward* conv lowering
    (1.14 -> 0.31 ms at C=512, bit-identical).
  * wgrad: dk[ky, kx] = x_shifted(ky, kx)^T @ dy — nine dot_generals with
    contraction over (batch, H, W), M = N = C: clean MXU shapes
    (0.75 -> 0.20 ms at C=512, ~MXU peak).

Same math as autodiff up to float reassociation; grad parity vs torch is
pinned in tests/test_conv3x3.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from adaptsegnet_tpu.ops.precision import F32_PRECISION

from adaptsegnet_tpu.ops.pallas import conv3x3_dil


def _prec(x_dtype, f32_exact: bool):
    return F32_PRECISION if (
        f32_exact and x_dtype == jnp.float32
    ) else None


def _fwd_conv(x, k, dilation, f32_exact, use_pallas=False):
    # NOTE (measured, don't repeat): replacing the dilated conv with nine
    # pad-slice shifted dot_generals IN XLA wins STANDALONE (2.4-2.9 ->
    # ~1.5 ms at the layer3/4 shapes) but loses IN-STEP. Both variants were
    # tried: fwd+dgrad shifted -> multi-level step 64 -> 73 ms; fwd-only
    # shifted (d>=4, bf16) -> eval 6.11 -> 5.97 ms/img but train 62.8 ->
    # 65.9 ms. Inside the fused program XLA overlaps/fuses its native conv
    # with the BN-folded epilogues and neighboring ops, which the
    # slice+dot chain blocks. Only in-step numbers decide here.
    #
    # The PALLAS shifted-matmul kernel (ops/pallas/conv3x3_dil.py) is a
    # different animal: the shifts happen in VMEM (no HBM shift copies),
    # and a device-loop profile pins it at ~98% of the MXU roofline
    # (50 us vs 49 theoretical at layer3's C=256 d=2; XLA's conv: 64 us
    # standalone but 250-380 us inside the fused TRAIN step). It is used
    # ONLY on the VJP path (use_pallas below, set by the custom-vjp fwd
    # rule): in the fwd-only EVAL graph XLA's conv emitter fuses with the
    # BN epilogues and wins (eval measured 221 -> 180 img/s when the
    # Pallas fwd was allowed there).
    # NOTE (measured, don't repeat): allowing the Pallas kernel (alone or
    # with the dot 1x1s) into the fwd-only eval graph at batch 8 LOSES
    # (180.6 -> 160.4 / 175.8 img/s) even though it wins per-op — eval's
    # whole-graph fusion beats the kernel boundary. The bs8-vs-bs1 eval
    # gap itself is XLA's dilated emitter running ~30% slower PER IMAGE
    # at batch 8 (97 -> 127 us/img/conv across layer3's 23 blocks,
    # per-program xprof compare); use batch 1 per chip and scale via the
    # data mesh.
    # NOTE (measured 2026-08-21, don't repeat): the r5 batch-blocked
    # Pallas fwd (conv3x3_dil_mxu_batched, NB images per block; was
    # gated ADAPTSEG_EVAL_BATCHED_CONV) LOST its eval-bs8 A/B: 173.34
    # img/s (3-run median, runs 173.34/173.05/174.98) vs 181.8 baseline
    # — scripts/campaign_results.json. With the r3 evidence (XLA's
    # dilated emitter ~30% more device time PER IMAGE at bs8, 97 -> 127
    # us/img/conv; every per-op-winning Pallas/dot alternative losing to
    # eval's whole-graph fusion), the bs8-slower-than-bs1 gap is now a
    # DECIDED fact at this shape: batch 1 per chip + the data-parallel
    # mesh is the recommendation, not a workaround. The batched kernel
    # stays (interpret-mode parity test) as the record of the attempt.
    d = dilation
    cout = k.shape[-1]
    if use_pallas and conv3x3_dil.supported(x, cout, d):
        return conv3x3_dil.conv3x3_dil_mxu(x, k, d)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=((d, d), (d, d)),
        rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_prec(x.dtype, f32_exact),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_s1(x: jnp.ndarray, k: jnp.ndarray, dilation: int = 1,
               f32_exact: bool = True) -> jnp.ndarray:
    """conv3x3(x, k, stride=1, padding=dilation, dilation=dilation), NHWC.

    k: HWIO (3, 3, Cin, Cout). Output spatial size == input spatial size.
    """
    return _fwd_conv(x, k, dilation, f32_exact)


def _conv3x3_fwd(x, k, dilation, f32_exact):
    # VJP path = the train step: Pallas lowering where supported.
    return _fwd_conv(x, k, dilation, f32_exact, use_pallas=True), (x, k)


def _conv3x3_bwd(dilation, f32_exact, res, dy):
    x, k = res
    d = dilation
    n, h, w, cin = x.shape
    cout = k.shape[-1]
    prec = _prec(x.dtype, f32_exact)

    # dgrad: same-shape conv of dy with the flipped, io-swapped kernel —
    # which means the roofline Pallas lowering serves it too.
    kf = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    if conv3x3_dil.supported(dy, cin, d):
        dx = conv3x3_dil.conv3x3_dil_mxu(dy, kf, d).astype(x.dtype)
    else:
        dx = jax.lax.conv_general_dilated(
            dy, kf, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
        ).astype(x.dtype)

    # wgrad: nine shifted (N*H*W, Cin)^T @ (N*H*W, Cout) dot_generals.
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    dyf = dy.reshape(-1, cout)
    rows = []
    for ky in range(3):
        row = []
        for kx in range(3):
            xs = jax.lax.slice(
                xp, (0, ky * d, kx * d, 0), (n, ky * d + h, kx * d + w, cin)
            )
            row.append(jax.lax.dot_general(
                xs.reshape(-1, cin), dyf,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ))
        rows.append(jnp.stack(row))
    dk = jnp.stack(rows).astype(k.dtype)
    return dx, dk


conv3x3_s1.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def _stem_fwd_conv(x, k, f32_exact):
    if x.dtype == jnp.bfloat16 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        # bf16 speed path: XLA's native 7x7/s2 conv on the 3-channel image
        # wastes 125/128 MXU lanes — profiled at 0.8 ms/img in eval (~60x
        # off roofline). Space-to-depth the input (2x2 -> 12 ch) and the
        # stride-2 7x7 becomes a stride-1 VALID 4x4 conv over 12 channels:
        #   out(y,x) = sum_{a,b<4, r,s<2} k'[2a+r, 2b+s] B(y+a, x+b)[r,s]
        # with k' the kernel zero-padded to 8x8. Exact same sum per output
        # (reassociated). The f32 parity path keeps the native conv.
        # The full 2x2 space-to-depth reshuffle costs more than it saves
        # (0.63 ms reshape + 0.28 ms transpose on the C-minor image); a
        # row-parity split keeps every move cheap: strided slices on the
        # MAJOR (row) axis are clean DMA and the (W, C) -> (W/2, 2C)
        # flatten is contiguous. One C=6 VALID 4x4 conv per row parity.
        n, h, w, c = x.shape
        cout = k.shape[-1]
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        hb, wb = (h + 6) // 2, (w + 6) // 2
        kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8, 8, c, cout)
        # kp[2a+r, 2b+s] -> per-parity 4x4 kernels over (s, c) channels
        kr = kp.reshape(4, 2, 4, 2, c, cout).transpose(1, 0, 2, 3, 4, 5)
        kr = kr.reshape(2, 4, 4, 2 * c, cout)
        out = None
        for r in (0, 1):
            br = xp[:, r::2].reshape(n, hb, wb, 2 * c)
            y = jax.lax.conv_general_dilated(
                br, kr[r].astype(x.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
        return out
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_prec(x.dtype, f32_exact),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv7x7_s2(x: jnp.ndarray, k: jnp.ndarray,
               f32_exact: bool = True) -> jnp.ndarray:
    """The ResNet stem conv (7x7, stride 2, padding 3) with a fast wgrad.

    Forward keeps XLA's native lowering (fastest measured). The backward
    weight grad on a 3-channel input wastes 3/128 MXU lanes natively
    (~1 TF/s, 2.4 ms/step in the trace); reformulated over the 2x2
    space-to-depth input (12 channels, 16 shifted dot_generals) it runs in
    a fraction of that. dx is emitted but DCE'd whenever the image input
    has no cotangent (always, in this framework).
    """
    return _stem_fwd_conv(x, k, f32_exact)


def _stem_fwd(x, k, f32_exact):
    return _stem_fwd_conv(x, k, f32_exact), (x, k)


def _stem_bwd(f32_exact, res, dy):
    x, k = res
    n, h, w, c = x.shape
    cout = k.shape[-1]
    oh, ow = h // 2, w // 2
    prec = _prec(x.dtype, f32_exact)

    # dgrad (dead in practice — the image has no grad — but required by the
    # VJP signature; XLA removes it): input-dilated conv with flipped kernel.
    kf = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    # Asymmetric high padding covers the stride-2 remainder:
    # out = (oh-1)*2 + 7 - (3 + ph) must equal h.
    ph = (h + 2 * 3 - 7) % 2
    pw = (w + 2 * 3 - 7) % 2
    dx = jax.lax.conv_general_dilated(
        dy, kf, (1, 1), ((3, 3 + ph), (3, 3 + pw)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
    ).astype(x.dtype)

    # wgrad over the space-to-depth transform:
    # dk[2p + a, 2q + b, c, o] = sum_{i,j} x2[i + p, j + q, (a, b, c)] dy[i, j, o]
    # with x2[u, v, (a, b, c)] = xpad[2u + a, 2v + b, c].
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    hb, wb = xp.shape[1] // 2, xp.shape[2] // 2
    dyf = dy.reshape(-1, cout)
    dk8 = [[None] * 4 for _ in range(4)]
    if os.environ.get("ADAPTSEG_STEM_WGRAD_RP", "1") == "1":
        # DEFAULT since the r4 on-chip A/B (3-run medians, in-step
        # bench.py --train multi-level: 44.76 ms vs 45.73 ms base —
        # scripts/campaign_results.json 2026-08-19): build the
        # s2d slices per ROW parity — a major-axis strided slice plus a
        # contiguous (W, C) -> (W/2, 2C) flatten, both cheap — instead of
        # the 6D reshape+transpose of the RGB-minor image, which the step
        # profile pins at ~1.5 ms/step (transpose(jvp)/backbone/
        # {reshape,transpose}) across the two backward passes. Costs 32
        # K=2C dots instead of 16 K=4C (one extra streaming pass set,
        # ~0.27 ms) against the ~1.5 ms shuffle it deletes. Set =0 to
        # A/B the original 6D-shuffle build.
        x2r = [
            xp[:, a::2].reshape(n, hb, wb, 2 * c) for a in (0, 1)
        ]  # x2r[a][u, v, (b, c)] = xpad[2u + a, 2v + b, c]
        for p in range(4):
            for q in range(4):
                ga = []
                for a in (0, 1):
                    xs = jax.lax.slice(
                        x2r[a], (0, p, q, 0), (n, p + oh, q + ow, 2 * c)
                    ).reshape(-1, 2 * c)
                    g = jax.lax.dot_general(
                        xs, dyf, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )  # (2c, cout), row order (b, c)
                    ga.append(g.reshape(2, c, cout))
                dk8[p][q] = jnp.stack(ga)  # (a, b, c, cout)
    else:
        x2 = xp.reshape(n, hb, 2, wb, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x2 = x2.reshape(n, hb, wb, 4 * c)
        for p in range(4):
            for q in range(4):
                xs = jax.lax.slice(
                    x2, (0, p, q, 0), (n, p + oh, q + ow, 4 * c)
                ).reshape(-1, 4 * c)
                g = jax.lax.dot_general(
                    xs, dyf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )  # (4c, cout), row order (a, b, c)
                dk8[p][q] = g.reshape(2, 2, c, cout)
    # Reassemble k8[2p + a, 2q + b] = dk8[p][q][a, b], then crop 8x8 -> 7x7.
    dk = jnp.stack([jnp.stack(r) for r in dk8])  # (p, q, a, b, c, o)
    dk = dk.transpose(0, 2, 1, 3, 4, 5).reshape(8, 8, c, cout)
    return dx, dk[:7, :7].astype(k.dtype)


conv7x7_s2.defvjp(_stem_fwd, _stem_bwd)
