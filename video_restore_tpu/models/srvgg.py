"""SRVGGNetCompact (realesr-general-x4v3) as a pure-functional JAX model.

Independent re-implementation of the compact VGG-style SR net the reference
configures at /root/reference/video_upscaler.py:316-318:
``SRVGGNetCompact(3, 3, num_feat=64, num_conv=32, upscale=4, act_type='prelu')``.

Architecture (from the published Real-ESRGAN v3 design and checkpoint
shapes): input conv + PReLU, ``num_conv`` x (3x3 conv + PReLU) at LR
resolution, output conv to ``out_ch * upscale**2`` channels, pixel-shuffle,
plus a nearest-upsampled input residual.

The ``num_conv`` identical body convs are stacked and run with ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from video_restore_tpu.ops.conv import conv2d, pixel_shuffle, prelu, upsample_nearest

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SRVGGSpec:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 32
    scale: int = 4


def _conv_init(key, cin, cout, dtype):
    fan_in = 9 * cin
    std = (2.0 / fan_in) ** 0.5 * 0.1
    return {
        "w": jax.random.normal(key, (3, 3, cin, cout), dtype) * std,
        "b": jnp.zeros((cout,), dtype),
    }


def init_srvgg(key: jax.Array, spec: SRVGGSpec, dtype=jnp.float32) -> Params:
    nf = spec.num_feat
    keys = jax.random.split(key, spec.num_conv + 2)
    body = [
        {**_conv_init(keys[i + 1], nf, nf, dtype), "alpha": jnp.full((nf,), 0.25, dtype)}
        for i in range(spec.num_conv)
    ]
    return {
        "conv_in": _conv_init(keys[0], spec.num_in_ch, nf, dtype),
        "alpha_in": jnp.full((nf,), 0.25, dtype),
        "body": jax.tree.map(lambda *xs: jnp.stack(xs), *body),
        "conv_out": _conv_init(
            keys[-1], nf, spec.num_out_ch * spec.scale**2, dtype
        ),
    }


def default_use_srvgg_stripe() -> bool:
    """Fused conv+PReLU stripe kernel for the SRVGG body — production
    default on TPU (the XLA scan of 32 separate 64-lane convs measured
    ~18 TF/s effective); opt out with VRT_SRVGG_STRIPE=0. =1 forces it
    on non-TPU backends (interpret-mode validation, mirrors
    rrdbnet.default_use_stripe)."""
    import os

    v = os.environ.get("VRT_SRVGG_STRIPE")
    if v == "0":
        return False
    if v == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _stripe_group() -> int:
    """Convs fused per kernel call (halo rows = group). Measured on v5e
    (config 4, fps/chip): group=4 -> 5.70, group=8 -> 6.11, group=16 ->
    Mosaic compile-helper stall (same cliff as the 15-conv whole-RRDB
    kernel). VRT_SRVGG_GROUP overrides for tuning."""
    import os

    try:
        return max(1, int(os.environ.get("VRT_SRVGG_GROUP", "8")))
    except ValueError:
        return 8


def _stripe_kform(two_d: bool = False) -> str:
    """Contraction form of the fused body kernel: 'roll' = dy-folded
    3-matmul form with fp32 partial rolls; 'im2col' = dx folded into K
    (one (M, 9nf) x (9nf, nf) matmul per conv, no rolls); 'pack' =
    N-packed dx (ONE (M, 3nf) x (3nf, 3nf) matmul + slice/roll/add —
    lane occupancy 50%->75%, the same trick as the RDB body's
    NPACK_DEFAULT). VRT_SRVGG_KFORM overrides; the measured default
    (v5e, tools/bench_srvgg.py, 1080x1920 nf=64 g=8) is 'pack' for the
    2D-blocked body — 65.1 TF/s vs roll's 48.1, +35%: the nf=64 convs
    are 50% lane-occupied in roll form, 75% packed — and 'roll' for the
    full-width form, which was only ever measured in roll form."""
    import os

    v = os.environ.get("VRT_SRVGG_KFORM", "")
    if v in ("roll", "im2col", "pack"):
        return v
    return "pack" if two_d else "roll"


@partial(jax.jit, static_argnames=("scale", "stripe", "precision"))
def _apply(
    params: Params, x: jax.Array, scale: int, stripe: bool = False,
    precision: str = "bf16",
) -> jax.Array:
    from video_restore_tpu.models.rrdbnet import default_use_glue_kernel

    if stripe and default_use_glue_kernel():
        # stem conv_in + PReLU as the fused glue kernel: XLA ran the
        # cin=3 conv + per-channel PReLU in a transposed T(2,128) layout
        # (~16 ms/frame traced at 1080p, config 4) — same kernel
        # geometry as the RRDB conv_first, so the program is cached
        from video_restore_tpu.ops.pallas_tail import conv3x3_fused

        feat = conv3x3_fused(
            x, params["conv_in"]["w"], params["conv_in"]["b"],
            alpha=params["alpha_in"], act="prelu",
        )
    else:
        feat = prelu(
            conv2d(x, params["conv_in"]["w"], params["conv_in"]["b"]),
            params["alpha_in"],
        )

    if stripe:
        from video_restore_tpu.ops.pallas_srvgg import (
            fold_dy,
            srvgg_stripe2d_padded,
            srvgg_stripe2d_selection,
            srvgg_stripe_padded,
        )
        from video_restore_tpu.ops.pallas_stripe import (
            pad_stripe2d_entry,
            pad_stripe_entry,
            unpad_stripe2d_exit,
            unpad_stripe_exit,
        )

        nf = feat.shape[-1]
        fh, fw = feat.shape[1], feat.shape[2]
        nconv = params["body"]["w"].shape[0]
        g = _stripe_group()
        while nconv % g:  # fall back to a divisor for odd num_conv
            g -= 1
        ngroups = nconv // g
        wsg = fold_dy(params["body"]["w"])  # (nconv, 3, 3nf, nf)
        blocks = srvgg_stripe2d_selection(fh, fw, g)
        kform = _stripe_kform(two_d=blocks is not None)
        if kform == "im2col":
            wsg = wsg.reshape(ngroups, g, 9 * nf, nf)
        elif kform == "pack":
            # N-packed dx: (3, 3nf, nf) -> (3nf, 3nf), lane blocks
            # [dx=0 | dx=1 | dx=2] (pack_prefix_weights' transform)
            wsg = jnp.swapaxes(wsg, -3, -2).reshape(
                ngroups, g, 3 * nf, 3 * nf
            )
        else:
            wsg = wsg.reshape(ngroups, g, 3, 3 * nf, nf)
        bsg = params["body"]["b"].reshape(ngroups, g, nf)
        asg = params["body"]["alpha"].reshape(ngroups, g, nf)
        # W8A8 int8 body (rrdbnet.default_precision; not wired for the
        # opt-in im2col contraction form — it stays bf16 there)
        ssg = None
        if precision == "int8" and kform != "im2col":
            from video_restore_tpu.ops.pallas_stripe import (
                quantize_prefix_weights,
            )

            (wsg,), (ssg,) = quantize_prefix_weights((wsg,))

        if blocks is not None:
            # full-frame 2D-blocked body: no tile overlap, margin-DMA
            # W blocks bound VMEM at any width (the full-width form at
            # 1920-wide needed bh<=16 = 2x halo tax)
            bh2, bw2 = blocks
            xp = pad_stripe2d_entry(feat, block_h=bh2, block_w=bw2)

            # split edge/interior launches (mask-free interior — the
            # rdb_stripe2d_split pattern) when the geometry admits one;
            # VRT_SRVGG_SPLIT=0 restores the single masked call
            from video_restore_tpu.ops.pallas_srvgg import (
                srvgg_split_ok,
                srvgg_stripe2d_split,
            )

            body2d = (
                srvgg_stripe2d_split
                if srvgg_split_ok(fh, fw, g, bh2, bw2)
                else srvgg_stripe2d_padded
            )

            def gstep(hc, gw):
                wg, bg, ag, sg = gw
                return (
                    body2d(
                        hc, wg, bg, ag, frame_h=fh, frame_w=fw,
                        group=g, block_h=bh2, block_w=bw2, sws=sg,
                    ),
                    None,
                )

            # unroll: the scan carry copy of the padded body array was
            # 7.7 ms/frame in the config-4 trace (vs neutral for the
            # RRDB body scan); VRT_SRVGG_UNROLL=1 restores the rolled
            # form
            import os as _os

            _unr = int(_os.environ.get("VRT_SRVGG_UNROLL", "0")) or ngroups
            xp, _ = lax.scan(gstep, xp, (wsg, bsg, asg, ssg), unroll=_unr)
            if (
                scale in (2, 4)
                and _os.environ.get("VRT_SRVGG_UP", "1") != "0"
                and _os.environ.get("VRT_SRVGG_UP_RAW", "1") != "0"
            ):
                # raw-input fused upsampler: consumes the 2D padded body
                # array in place — the unpad slice + the up kernel's
                # re-pad each rewrote the ~265MB body output for pure
                # layout reasons (round-5; config-4 trace showed ~13
                # ms/frame of boundary copies+pads at 8.078)
                from video_restore_tpu.ops.pallas_srvgg import (
                    srvgg_up_fused_raw,
                )

                return srvgg_up_fused_raw(
                    xp, params["conv_out"]["w"], params["conv_out"]["b"],
                    x, r=scale, frame_h=fh, frame_w=fw,
                    block_h2=bh2, block_w2=bw2,
                )
            feat = unpad_stripe2d_exit(
                xp, fh, fw, nf, block_h=bh2, block_w=bw2
            )
        else:
            xp = pad_stripe_entry(feat)

            def gstep(hc, gw):
                wg, bg, ag, sg = gw
                return (
                    srvgg_stripe_padded(
                        hc, wg, bg, ag, frame_h=fh, frame_w=fw, group=g,
                        sws=sg,
                    ),
                    None,
                )

            xp, _ = lax.scan(gstep, xp, (wsg, bsg, asg, ssg))
            feat = unpad_stripe_exit(xp, fh, fw, nf)
    else:
        def step(h, bp):
            return prelu(conv2d(h, bp["w"], bp["b"]), bp["alpha"]), None

        feat, _ = lax.scan(step, feat, params["body"])
    if (
        stripe
        and scale in (2, 4)
        and os.environ.get("VRT_SRVGG_UP", "1") != "0"
    ):
        # fused upsampler kernel: the XLA pixel_shuffle transposes +
        # 12 TF/s N=48 conv_out cost ~27 ms/frame at 1080p (BENCH_NOTES
        # round 3); the phase-lane form makes both free
        from video_restore_tpu.ops.pallas_srvgg import srvgg_up_fused

        return srvgg_up_fused(
            feat, params["conv_out"]["w"], params["conv_out"]["b"], x,
            r=scale,
        )
    out = conv2d(feat, params["conv_out"]["w"], params["conv_out"]["b"])
    out = pixel_shuffle(out, scale)
    return out + upsample_nearest(x, scale)


def apply_srvgg(
    params: Params,
    x: jax.Array,
    spec: SRVGGSpec,
    stripe: "bool | None" = None,
    precision: "str | None" = None,
) -> jax.Array:
    """Forward pass. x: (N, H, W, 3) float in [0, 1]. Returns (N, H*s, W*s, 3).

    ``precision`` ("bf16"/"int8", default VRT_PRECISION): int8 runs the
    stripe-form conv+PReLU body as W8A8 MXU dots (see
    rrdbnet.default_precision); stripe-mode only."""
    if stripe is None:
        stripe = default_use_srvgg_stripe()
    if precision is None:
        from video_restore_tpu.models.rrdbnet import default_precision

        precision = default_precision()
    return _apply(params, x, spec.scale, stripe, precision=precision)
