"""RRDBNet (ESRGAN generator) as a pure-functional JAX model.

Independent re-implementation of the architecture the reference configures
through basicsr (/root/reference/video_upscaler.py:313-321):

- ``RealESRGAN_x4plus``:        num_feat=64, num_block=23, num_grow_ch=32, scale=4
- ``RealESRGAN_x4plus_anime_6B``: num_block=6, otherwise as above
- ``RealESRGAN_x2plus``:        scale=2 (README.md:27; unimplemented in the
  reference code — implemented for real here)

Architecture (from the published ESRGAN/Real-ESRGAN papers and checkpoint
shapes): conv stem -> ``num_block`` RRDB blocks (each 3 residual-dense blocks
of five 3x3 convs with growth ``num_grow_ch``, LeakyReLU(0.2), residual
scaling 0.2) -> body conv + global skip -> two nearest-2x upsample+conv
stages -> HR conv -> output conv. For scale=2 the input is pixel-unshuffled
by 2 first (12 input channels).

TPU-first design choices:

- NHWC activations / HWIO weights; bf16 compute with fp32 MXU accumulation.
- The ``num_block`` identical RRDB blocks are *stacked* along a leading axis
  and executed with ``lax.scan``, so XLA compiles one block body instead of
  unrolling 345 convolutions (fast compiles, identical math).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from video_restore_tpu.ops.conv import (
    conv2d,
    conv2d_small_cout,
    leaky_relu,
    pixel_shuffle,
    pixel_unshuffle,
    upconv2x,
    upconv2x_phase,
    upsample_nearest,
)


def pixel_shuffle_sd(xc: jax.Array) -> jax.Array:
    """Coarse (c-major sd layout) -> fine: inverse of pixel_unshuffle(2)."""
    return pixel_shuffle(xc, 2)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RRDBNetSpec:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4
    # basicsr (Real-ESRGAN) reaches scale<4 by pixel-unshuffling the input
    # and keeping two 2x upsample stages; the original ESRGAN/KAIR nets
    # (BSRGAN) instead feed the raw input and use log2(scale) stages.
    unshuffle: bool = True
    # torch state_dict naming of the released checkpoint this spec loads:
    # "basicsr" (body.{i}.rdb{j}...) or "esrgan" (RRDB_trunk.{i}.RDB{j}...)
    key_style: str = "basicsr"

    @property
    def stem_in_ch(self) -> int:
        """Input channels after the scale<4 pixel-unshuffle."""
        if not self.unshuffle:
            return self.num_in_ch
        if self.scale == 2:
            return self.num_in_ch * 4
        if self.scale == 1:
            return self.num_in_ch * 16
        return self.num_in_ch

    @property
    def num_upsample(self) -> int:
        """Nearest-up+conv 2x stages in the tail (2 for every basicsr
        variant; log2(scale) for ESRGAN-style nets, e.g. BSRGANx2 has 1)."""
        if self.unshuffle or self.scale == 4:
            return 2
        return 1


def _conv_init(key, kh, kw, cin, cout, gain=1.0, dtype=jnp.float32):
    """Kaiming-normal (fan_in, leaky_relu a=0) init scaled by ``gain`` —
    matches basicsr's default_init_weights(scale=0.1) behaviour for the
    residual-dense convs."""
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5 * gain
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * std
    b = jnp.zeros((cout,), dtype)
    return {"w": w, "b": b}


def _rdb_init(key, nf, gc, dtype):
    ks = jax.random.split(key, 5)
    return {
        "conv1": _conv_init(ks[0], 3, 3, nf, gc, 0.1, dtype),
        "conv2": _conv_init(ks[1], 3, 3, nf + gc, gc, 0.1, dtype),
        "conv3": _conv_init(ks[2], 3, 3, nf + 2 * gc, gc, 0.1, dtype),
        "conv4": _conv_init(ks[3], 3, 3, nf + 3 * gc, gc, 0.1, dtype),
        "conv5": _conv_init(ks[4], 3, 3, nf + 4 * gc, nf, 0.1, dtype),
    }


def init_rrdbnet(key: jax.Array, spec: RRDBNetSpec, dtype=jnp.float32) -> Params:
    """Random init. Body blocks are stacked along axis 0 for lax.scan."""
    nf, gc = spec.num_feat, spec.num_grow_ch
    keys = jax.random.split(key, 7 + spec.num_block * 3)
    body_keys = keys[7:].reshape((spec.num_block, 3) + keys.shape[1:])

    def one_block(bkeys):
        return {
            "rdb1": _rdb_init(bkeys[0], nf, gc, dtype),
            "rdb2": _rdb_init(bkeys[1], nf, gc, dtype),
            "rdb3": _rdb_init(bkeys[2], nf, gc, dtype),
        }

    blocks = [one_block(body_keys[i]) for i in range(spec.num_block)]
    body = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params = {
        "conv_first": _conv_init(keys[0], 3, 3, spec.stem_in_ch, nf, 1.0, dtype),
        "body": body,
        "conv_body": _conv_init(keys[1], 3, 3, nf, nf, 1.0, dtype),
        "conv_up1": _conv_init(keys[2], 3, 3, nf, nf, 1.0, dtype),
        "conv_up2": _conv_init(keys[3], 3, 3, nf, nf, 1.0, dtype),
        "conv_hr": _conv_init(keys[4], 3, 3, nf, nf, 1.0, dtype),
        "conv_last": _conv_init(keys[5], 3, 3, nf, spec.num_out_ch, 1.0, dtype),
    }
    if spec.num_upsample == 1:
        del params["conv_up2"]
    return params


def _rdb_apply(p: Params, x: jax.Array) -> jax.Array:
    """Residual dense block: 5 growing convs, LeakyReLU(0.2), 0.2 residual.

    Naive (torch-ordered) formulation; kept for parity testing. The
    production path uses :func:`_rdb_apply_regrouped` (identical math)."""
    c1 = leaky_relu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"]))
    c2 = leaky_relu(conv2d(jnp.concatenate([x, c1], -1), p["conv2"]["w"], p["conv2"]["b"]))
    c3 = leaky_relu(
        conv2d(jnp.concatenate([x, c1, c2], -1), p["conv3"]["w"], p["conv3"]["b"])
    )
    c4 = leaky_relu(
        conv2d(jnp.concatenate([x, c1, c2, c3], -1), p["conv4"]["w"], p["conv4"]["b"])
    )
    c5 = conv2d(
        jnp.concatenate([x, c1, c2, c3, c4], -1), p["conv5"]["w"], p["conv5"]["b"]
    )
    return c5 * jnp.asarray(0.2, x.dtype) + x


def calibrate_rdb_act_scales(p: Params, x: jax.Array, margin: float = 1.0):
    """Static activation scales for the static-A8 int8 stripe body
    (ops.pallas_stripe ``sas=``): amax/127 of each conv's INPUT in the
    prefix formulation — x for conv1 and the growth tensors c1..c4 for
    convs 2..5 (identical to the dense-block intermediates of
    :func:`_rdb_apply`). Post-training calibration: run on representative
    data; ``margin`` > 1 buys saturation headroom for unseen inputs at
    the cost of one bit-fraction of resolution. Returns a hashable
    5-tuple of python floats (a jit-static argument downstream)."""
    c1 = leaky_relu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"]))
    c2 = leaky_relu(
        conv2d(jnp.concatenate([x, c1], -1), p["conv2"]["w"], p["conv2"]["b"])
    )
    c3 = leaky_relu(
        conv2d(
            jnp.concatenate([x, c1, c2], -1), p["conv3"]["w"], p["conv3"]["b"]
        )
    )
    c4 = leaky_relu(
        conv2d(
            jnp.concatenate([x, c1, c2, c3], -1),
            p["conv4"]["w"],
            p["conv4"]["b"],
        )
    )
    return tuple(
        max(float(jnp.max(jnp.abs(t.astype(jnp.float32)))), 1e-12)
        * margin
        / 127.0
        for t in (x, c1, c2, c3, c4)
    )


def _regroup_rdb_weights(p: Params, nf: int, gc: int):
    """Regroup the 5 dense-block convs *by input source* instead of by
    output.

    conv_k consumes cat(x, c1, .., c_{k-1}); slicing each kernel by input
    source and concatenating along output channels gives one wide conv per
    source:

        T_s = conv(source_s, [W_{s+1}^s | ... | W_5^s])

    with output widths 192/160/128/96/64 instead of 15 convs of width
    32/64. Identical FLOPs and math (fp summation reordered), but MXU
    column occupancy goes from 25-50% to ~100% — the narrow Cout=32 convs
    are the reason the naive form runs at ~10% of TPU peak.
    """
    ws = [p[f"conv{k}"]["w"] for k in range(1, 6)]  # (..., 3,3,Cin_k,Cout_k)

    def src_slice(k, s):
        # input-channel range of source s within conv_k's input
        lo = 0 if s == 0 else nf + (s - 1) * gc
        hi = nf if s == 0 else lo + gc
        return ws[k][..., lo:hi, :]

    grouped = []
    for s in range(5):  # sources: x, c1, c2, c3, c4
        parts = [src_slice(k, s) for k in range(s, 5)]
        grouped.append(jnp.concatenate(parts, axis=-1))
    biases = [p[f"conv{k}"]["b"] for k in range(1, 6)]
    return grouped, biases


def _rdb_apply_regrouped(tp: Params, x: jax.Array) -> jax.Array:
    """Source-major RDB: 5 wide convs, no concats (see _regroup_rdb_weights).

    tp: {"w": (w0..w4), "b": (b1..b5)} from _regroup_rdb_weights."""
    w0, w1, w2, w3, w4 = tp["w"]
    b1, b2, b3, b4, b5 = (b.astype(x.dtype) for b in tp["b"])
    g = w1.shape[-2]  # num_grow_ch (input channels of the c1-source conv)
    t0 = conv2d(x, w0)  # (..., 4*gc + nf)
    c1 = leaky_relu(t0[..., :g] + b1)
    t1 = conv2d(c1, w1)  # (..., 3*gc + nf)
    c2 = leaky_relu(t0[..., g : 2 * g] + t1[..., :g] + b2)
    t2 = conv2d(c2, w2)  # (..., 2*gc + nf)
    c3 = leaky_relu(
        t0[..., 2 * g : 3 * g] + t1[..., g : 2 * g] + t2[..., :g] + b3
    )
    t3 = conv2d(c3, w3)  # (..., gc + nf)
    c4 = leaky_relu(
        t0[..., 3 * g : 4 * g] + t1[..., 2 * g : 3 * g]
        + t2[..., g : 2 * g] + t3[..., :g] + b4
    )
    t4 = conv2d(c4, w4)  # (..., nf)
    c5 = (
        t0[..., 4 * g :] + t1[..., 3 * g :] + t2[..., 2 * g :]
        + t3[..., g:] + t4 + b5
    )
    return c5 * jnp.asarray(0.2, x.dtype) + x


def _rrdb_apply(p: Params, x: jax.Array) -> jax.Array:
    out = _rdb_apply(p["rdb1"], x)
    out = _rdb_apply(p["rdb2"], out)
    out = _rdb_apply(p["rdb3"], out)
    return out * jnp.asarray(0.2, x.dtype) + x


def _rrdb_apply_regrouped(tp: Params, x: jax.Array) -> jax.Array:
    out = _rdb_apply_regrouped(tp["rdb1"], x)
    out = _rdb_apply_regrouped(tp["rdb2"], out)
    out = _rdb_apply_regrouped(tp["rdb3"], out)
    return out * jnp.asarray(0.2, x.dtype) + x


def _accum_rdb_weights(p: Params, nf: int, gc: int):
    """Accumulator-form weights: like _regroup_rdb_weights but every
    source conv (except the last) emits the FULL 4*gc+nf width, with
    zero blocks for destinations the source does not feed.

    Device profile (round 2): with 32-channel growth tensors, the dense
    sums run at 25% VPU lane occupancy and every 32-channel slice at a
    non-128 offset is a lane-shuffle copy — the assembly elementwise +
    copies cost as much as the convs themselves. Padding the conv outputs
    to full width turns the assembly into ONE running full-width
    accumulator add per source (lane-aligned, fused into the conv
    epilogue by XLA) and one aligned 32-channel slice per c_k. The zero
    blocks add ~27% structural MACs, but on convs whose narrow N was
    wasting 50-75% of MXU columns — measured net win on v5e.
    """
    grouped, biases = _regroup_rdb_weights(p, nf, gc)
    width = nf + 4 * gc
    padded = [grouped[0]]  # the x-source conv is already full-width
    for s in range(1, 4):  # c1, c2, c3 sources -> zero-pad leading slots
        w = grouped[s]
        lead = width - w.shape[-1]
        padded.append(
            jnp.concatenate(
                [jnp.zeros(w.shape[:-1] + (lead,), w.dtype), w], axis=-1
            )
        )
    padded.append(grouped[4])  # c4 -> c5 only (nf wide, added at the end)
    return padded, biases


def _rdb_apply_accum(tp: Params, x: jax.Array) -> jax.Array:
    """Accumulator-form RDB (see _accum_rdb_weights). Identical math to
    _rdb_apply_regrouped up to fp summation order."""
    w0, w1, w2, w3, w4 = tp["w"]
    b1, b2, b3, b4, b5 = (b.astype(x.dtype) for b in tp["b"])
    g = w4.shape[-2]  # num_grow_ch (input channels of the c4-source conv)
    a = conv2d(x, w0)  # (..., 4*gc + nf) running accumulator
    c1 = leaky_relu(a[..., :g] + b1)
    a = a + conv2d(c1, w1)
    c2 = leaky_relu(a[..., g : 2 * g] + b2)
    a = a + conv2d(c2, w2)
    c3 = leaky_relu(a[..., 2 * g : 3 * g] + b3)
    a = a + conv2d(c3, w3)
    c4 = leaky_relu(a[..., 3 * g : 4 * g] + b4)
    c5 = a[..., 4 * g :] + conv2d(c4, w4) + b5
    return c5 * jnp.asarray(0.2, x.dtype) + x


def _rrdb_apply_accum(tp: Params, x: jax.Array) -> jax.Array:
    out = _rdb_apply_accum(tp["rdb1"], x)
    out = _rdb_apply_accum(tp["rdb2"], out)
    out = _rdb_apply_accum(tp["rdb3"], out)
    return out * jnp.asarray(0.2, x.dtype) + x


def _rdb_apply_sd(tp: Params, xc) -> "tuple":
    """Source-major RDB in the space-to-depth domain (ops/sdconv.py):
    identical math on a 2x-coarser grid — each of the 4 phase tensors
    carries the fine channels, so slicing/adds/lrelu run per phase
    unchanged while every conv becomes a wide MXU-shaped 2x2 conv."""
    from video_restore_tpu.ops.sdconv import conv3x3_sd, phase_map

    w0, w1, w2, w3, w4 = tp["w"]
    dt = xc[0].dtype
    b1, b2, b3, b4, b5 = (b.astype(dt) for b in tp["b"])
    g = w1.shape[-2] // 4  # fine num_grow_ch (phase-major input channels)
    lr = leaky_relu
    t0 = conv3x3_sd(xc, w0)
    c1 = phase_map(lambda t: lr(t[..., :g] + b1), t0)
    t1 = conv3x3_sd(c1, w1)
    c2 = phase_map(lambda a, b: lr(a[..., g : 2 * g] + b[..., :g] + b2), t0, t1)
    t2 = conv3x3_sd(c2, w2)
    c3 = phase_map(
        lambda a, b, c: lr(
            a[..., 2 * g : 3 * g] + b[..., g : 2 * g] + c[..., :g] + b3
        ),
        t0, t1, t2,
    )
    t3 = conv3x3_sd(c3, w3)
    c4 = phase_map(
        lambda a, b, c, d: lr(
            a[..., 3 * g : 4 * g] + b[..., 2 * g : 3 * g]
            + c[..., g : 2 * g] + d[..., :g] + b4
        ),
        t0, t1, t2, t3,
    )
    t4 = conv3x3_sd(c4, w4)
    return phase_map(
        lambda a, b, c, d, e, x: (
            a[..., 4 * g :] + b[..., 3 * g :] + c[..., 2 * g :]
            + d[..., g:] + e + b5
        ) * jnp.asarray(0.2, dt) + x,
        t0, t1, t2, t3, t4, xc,
    )


def _rrdb_apply_sd(tp: Params, xc) -> "tuple":
    from video_restore_tpu.ops.sdconv import phase_map

    out = _rdb_apply_sd(tp["rdb1"], xc)
    out = _rdb_apply_sd(tp["rdb2"], out)
    out = _rdb_apply_sd(tp["rdb3"], out)
    return phase_map(
        lambda o, x: o * jnp.asarray(0.2, x.dtype) + x, out, xc
    )


def _rrdb_apply_pallas(tp: Params, x: jax.Array) -> jax.Array:
    """RRDB via the fully-fused Pallas kernel (ops/pallas_rdb.py): one HBM
    read and one write per spatial block for the whole 3-RDB chain."""
    from video_restore_tpu.ops.pallas_rdb import rrdb_fused

    return rrdb_fused(x, tp)


def default_precision() -> str:
    """Body matmul precision: "bf16" (default) or "int8" (W8A8 stripe
    body — per-out-channel symmetric int8 weights, per-chunk dynamic
    activation scales, i8xi8->i32 MXU dots; the round-2 probe measured
    the int8 dot at 1.34x bf16 on v5e). VRT_PRECISION overrides; the
    CLI --precision flag sets it. int8 applies to the stripe-form RDB
    body only (86% of the flagship frame) — every other stage keeps its
    measured dtype. Matches the reference's own speed-for-precision
    trade (half=True, /root/reference/video_upscaler.py:335)."""
    import os

    v = os.environ.get("VRT_PRECISION", "bf16").lower()
    if v not in ("bf16", "int8"):
        raise ValueError(
            f"VRT_PRECISION must be bf16 or int8 (got {v!r})"
        )
    return v


def _quantize_stripe_body(body: Params) -> Params:
    """Per-RDB int8 quantization of prefix-form body weights (W8 of the
    W8A8 path); adds an "sw" scale tuple next to "w"/"b". Runs in-jit on
    the (possibly block-stacked) leaves — ~17M weight elements of
    VPU-side amax/round per step, negligible against the body matmuls,
    and it keeps the checkpoint/prepare formats unchanged."""
    from video_restore_tpu.ops.pallas_stripe import quantize_prefix_weights

    out = {}
    for r, tp in body.items():
        qws, sws = quantize_prefix_weights(tp["w"])
        out[r] = {"w": qws, "b": tp["b"], "sw": sws}
    return out


def _rrdb_apply_stripe(tp: Params, xp: jax.Array, h: int, w: int) -> jax.Array:
    """RRDB via the stripe-form fused RDB kernel (ops/pallas_stripe.py):
    measured 2.0x the XLA accum path per RDB on v5e (5.7 vs 11.6 ms on the
    flagship 4x384x504x64 body shape) — full-width stripes, dy-packed
    matmul contraction, prefix accumulator, double-buffered DMA.

    Operates in padded stripe form (see pad_stripe_entry): rdb1/rdb2 run
    as padded stripe kernels and rdb3 fuses the RRDB 0.2-residual into
    its epilogue (rdb_res_stripe_padded, aliasing the block input's
    buffer as its output) — no XLA ops touch the activations between body
    blocks. (A single whole-RRDB kernel computes the same thing but its
    3x op count stalls the Mosaic compile helper >25min; see
    rrdb_stripe_padded, kept for smaller configs.)
    """
    from video_restore_tpu.ops.pallas_stripe import (
        rdb_res_stripe_padded,
        rdb_stripe_padded,
    )

    out = rdb_stripe_padded(
        xp, tp["rdb1"]["w"], tp["rdb1"]["b"], frame_h=h, frame_w=w,
        sws=tp["rdb1"].get("sw"),
    )
    out = rdb_stripe_padded(
        out, tp["rdb2"]["w"], tp["rdb2"]["b"], frame_h=h, frame_w=w,
        sws=tp["rdb2"].get("sw"),
    )
    return rdb_res_stripe_padded(
        out, xp, tp["rdb3"]["w"], tp["rdb3"]["b"], frame_h=h, frame_w=w,
        sws=tp["rdb3"].get("sw"),
    )


def _rrdb_apply_stripe2d(
    tp: Params, xp: jax.Array, h: int, w: int, bh: int, bw: int
) -> jax.Array:
    """RRDB via the 2D-blocked (H stripes x W blocks) padded stripe
    kernels — same chain as _rrdb_apply_stripe, but VMEM-bounded at any
    frame width so the body can run full-frame (no tile overlap).

    When the grid has a true interior, each RDB runs as split
    edge/interior launches (rdb_stripe2d_split): interior blocks skip
    the frame masks (measured ~2.2% of flagship frame time, VRT_NOMASK
    probe), chained by mandatory aliasing. VRT_SPLIT=0 restores the
    single-call kernels."""
    from video_restore_tpu.ops.pallas_stripe import (
        rdb_res_stripe2d_padded,
        rdb_stripe2d_padded,
        rdb_stripe2d_split,
        stripe2d_split_ok,
    )

    kw = dict(frame_h=h, frame_w=w, block_h=bh, block_w=bw)
    if stripe2d_split_ok(h, w, bh, bw):
        out = rdb_stripe2d_split(
            xp, tp["rdb1"]["w"], tp["rdb1"]["b"],
            sws=tp["rdb1"].get("sw"), **kw,
        )
        out = rdb_stripe2d_split(
            out, tp["rdb2"]["w"], tp["rdb2"]["b"],
            sws=tp["rdb2"].get("sw"), **kw,
        )
        # The res variant's x0 scratch block (+~8MB) pushed the unchunked
        # split kernel 984KB over the 127MB VMEM limit at 135x240 in the
        # full flagship program (r4 measured; the isolated A/B only ran
        # the non-res form). Row-chunking the fp32 accumulator is free at
        # equal geometry (BENCH_NOTES 72.1 vs 71.9 TF/s), so the res call
        # defaults to rc=64. VRT_SPLIT_RES=0 falls back to the monolithic
        # res kernel (round-3 production); VRT_SPLIT_RES=<rc> overrides.
        res_mode = os.environ.get("VRT_SPLIT_RES", "64")
        if res_mode != "0":
            return rdb_stripe2d_split(
                out, tp["rdb3"]["w"], tp["rdb3"]["b"], x0=xp, res=True,
                row_chunk=int(res_mode), sws=tp["rdb3"].get("sw"), **kw
            )
        return rdb_res_stripe2d_padded(
            out, xp, tp["rdb3"]["w"], tp["rdb3"]["b"],
            sws=tp["rdb3"].get("sw"), **kw,
        )
    out = rdb_stripe2d_padded(
        xp, tp["rdb1"]["w"], tp["rdb1"]["b"],
        sws=tp["rdb1"].get("sw"), **kw,
    )
    out = rdb_stripe2d_padded(
        out, tp["rdb2"]["w"], tp["rdb2"]["b"],
        sws=tp["rdb2"].get("sw"), **kw,
    )
    return rdb_res_stripe2d_padded(
        out, xp, tp["rdb3"]["w"], tp["rdb3"]["b"],
        sws=tp["rdb3"].get("sw"), **kw,
    )


def default_use_pallas() -> bool:
    """Opt-in (VRT_PALLAS=1): the fused Pallas RDB kernel is correct on TPU
    but does not yet beat XLA's conv path (small per-block matmuls +
    relayout copies dominate); the source-major XLA path is the production
    default."""
    import os

    if os.environ.get("VRT_PALLAS") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@partial(
    jax.jit,
    static_argnames=(
        "scale", "naive", "use_pallas", "sd", "accum", "stripe", "prepared",
        "unshuffle", "differentiable", "precision",
    ),
)
def _apply(
    params: Params,
    x: jax.Array,
    scale: int,
    naive: bool = False,
    use_pallas: bool = False,
    sd: bool = False,
    accum: bool = False,
    stripe: bool = False,
    prepared: bool = False,
    unshuffle: bool = True,
    differentiable: bool = False,
    precision: str = "bf16",
) -> jax.Array:
    if unshuffle and scale == 2:
        x = pixel_unshuffle(x, 2)
    elif unshuffle and scale == 1:
        x = pixel_unshuffle(x, 4)
    if sd and (x.shape[1] % 2 or x.shape[2] % 2):
        if prepared:
            raise ValueError(
                "sd-prepared params require even spatial extents "
                f"(got {x.shape[1]}x{x.shape[2]})"
            )
        sd = False  # sd domain needs even extents

    nf = params["conv_first"]["w"].shape[-1]
    if prepared and not naive:
        w1 = params["body"]["rdb1"]["w"][1]
        if sd:
            gc = w1.shape[-2] // 4
        elif stripe:
            gc = w1.shape[-2] // 3  # dy-folded K = 3*gc
        else:
            gc = w1.shape[-2]
    else:
        gc = params["body"]["rdb1"]["conv1"]["w"].shape[-1]

    if sd:
        # run stem + body on the 2x-coarser space-to-depth grid (exact)
        from video_restore_tpu.ops.sdconv import (
            conv3x3_sd,
            make_sd_kernels,
            phase_map,
            sd_merge,
            sd_split,
        )

        if prepared:
            k_first = params["conv_first_sd"]
            k_body = params["conv_body_sd"]
            body = params["body"]
        else:
            k_first = make_sd_kernels(params["conv_first"]["w"])
            k_body = make_sd_kernels(params["conv_body"]["w"])
            body = {}
            for r in ("rdb1", "rdb2", "rdb3"):
                ws, bs = _regroup_rdb_weights(params["body"][r], nf, gc)
                body[r] = {
                    "w": tuple(make_sd_kernels(w) for w in ws),
                    "b": tuple(bs),
                }

        xc = sd_split(x)
        feat = conv3x3_sd(xc, k_first, params["conv_first"]["b"])

        def block_step(h, bp):
            return _rrdb_apply_sd(bp, h), None

        body_out, _ = lax.scan(block_step, feat, body)
        body_out = conv3x3_sd(body_out, k_body, params["conv_body"]["b"])
        feat = sd_merge(phase_map(lambda a, b: a + b, feat, body_out))
    else:
        if not naive and not differentiable and default_use_glue_kernel():
            # XLA runs the cin=3 stem at 0.8 TF/s in a T(1,128) f32
            # layout at full-frame widths (8.9 ms/frame traced)
            from video_restore_tpu.ops.pallas_tail import conv3x3_fused

            feat = conv3x3_fused(
                x, params["conv_first"]["w"], params["conv_first"]["b"]
            )
        else:
            feat = conv2d(
                x, params["conv_first"]["w"], params["conv_first"]["b"]
            )

        if naive:
            def block_step(h, bp):
                return _rrdb_apply(bp, h), None

            body = params["body"]
        else:
            # source-major regroup of the stacked body weights (operates on
            # the (num_block, ...) stacked leaves directly; skipped when
            # the caller pre-transformed via prepare_rrdbnet)
            if prepared:
                body = params["body"]
            else:
                if stripe:
                    from video_restore_tpu.ops.pallas_stripe import (
                        prefix_rdb_weights,
                        production_prefix_weights,
                    )

                    def regroup(p, nf, gc):
                        ws, bs = prefix_rdb_weights(p, nf, gc)
                        return production_prefix_weights(ws), bs
                elif accum:
                    regroup = _accum_rdb_weights
                else:
                    regroup = _regroup_rdb_weights
                body = {}
                for r in ("rdb1", "rdb2", "rdb3"):
                    ws, bs = regroup(params["body"][r], nf, gc)
                    body[r] = {"w": tuple(ws), "b": tuple(bs)}

            if stripe:
                rrdb_fn = None  # padded-form chain below
            elif use_pallas:
                rrdb_fn = _rrdb_apply_pallas
            elif accum:
                rrdb_fn = _rrdb_apply_accum
            else:
                rrdb_fn = _rrdb_apply_regrouped

            def block_step(h, bp):
                return rrdb_fn(bp, h), None

        if not naive and stripe and precision == "int8":
            # W8A8 body: quantize the prefix-form weights in-jit (per
            # out-channel scales, "sw" leaves ride the body scan like
            # the weights) — checkpoint/prepare formats stay bf16
            body = _quantize_stripe_body(body)

        if not naive and stripe:
            # pad once, run the whole 23-block body in padded stripe form,
            # slice once — no XLA pads inside the scan
            from video_restore_tpu.ops.pallas_stripe import (
                pad_stripe2d_entry,
                pad_stripe_entry,
                stripe2d_selection,
                unpad_stripe2d_exit,
                unpad_stripe_exit,
            )

            fh, fw = feat.shape[1], feat.shape[2]
            # unroll>1 elides the lax.scan carry copies (the padded body
            # array is ~660MB at full frame; the trace showed ~6 ms/frame
            # of scan carry copies) at the cost of a larger program
            unroll = int(os.environ.get("VRT_BODY_UNROLL", "1"))
            blocks = stripe2d_selection(fh, fw)
            if blocks is not None:
                bh2, bw2 = blocks
                xp = pad_stripe2d_entry(feat, block_h=bh2, block_w=bw2)

                def stripe_step(hc, bp):
                    return (
                        _rrdb_apply_stripe2d(bp, hc, fh, fw, bh2, bw2),
                        None,
                    )

                body_out, _ = lax.scan(stripe_step, xp, body, unroll=unroll)
                body_out = unpad_stripe2d_exit(
                    body_out, fh, fw, nf, block_h=bh2, block_w=bw2
                )
            else:
                xp = pad_stripe_entry(feat)

                def stripe_step(hc, bp):
                    return _rrdb_apply_stripe(bp, hc, fh, fw), None

                body_out, _ = lax.scan(stripe_step, xp, body, unroll=unroll)
                body_out = unpad_stripe_exit(body_out, fh, fw, nf)
        else:
            body_out, _ = lax.scan(block_step, feat, body)
        if not naive and not differentiable and default_use_glue_kernel():
            # conv_body + residual fused (XLA form: ~16 TF/s + an 8.9 ms
            # add/convert fusion at full-frame widths)
            from video_restore_tpu.ops.pallas_tail import conv3x3_fused

            feat = conv3x3_fused(
                body_out,
                params["conv_body"]["w"], params["conv_body"]["b"],
                feat,
            )
        else:
            body_out = conv2d(
                body_out, params["conv_body"]["w"], params["conv_body"]["b"]
            )
            feat = feat + body_out

    # ESRGAN-style x2 nets (BSRGANx2) have a single upsample stage and no
    # conv_up2 param (RRDBNetSpec.num_upsample)
    if naive:
        feat = leaky_relu(
            conv2d(
                upsample_nearest(feat, 2),
                params["conv_up1"]["w"], params["conv_up1"]["b"],
            )
        )
        if "conv_up2" in params:
            feat = leaky_relu(
                conv2d(
                    upsample_nearest(feat, 2),
                    params["conv_up2"]["w"], params["conv_up2"]["b"],
                )
            )
    elif not differentiable and default_use_sd_tail():
        return _tail_sdt(params, feat)
    elif (
        not differentiable
        and default_use_tail_kernel()
        and "conv_up2" not in params
        and os.environ.get("VRT_X2_TAIL", "1") != "0"
    ):
        # Single-upsample-stage tail (ESRGAN-style x2 nets with no
        # conv_up2, e.g. BSRGANx2 — NOT RealESRGAN_x2plus, which is an
        # unshuffle basicsr variant with num_upsample=2 and takes the
        # two-stage branch below): assembled from the existing kernel
        # family —
        # up1_fused IS lrelu(upconv2x), then the two plain convs run as
        # conv3x3_fused (XLA's conv_last at cout=3 was the 4 TF/s
        # lane-occupancy disaster at 4K)
        from video_restore_tpu.ops.pallas_tail import (
            conv3x3_fused,
            up1_fused,
        )

        feat = up1_fused(
            feat, params["conv_up1"]["w"], params["conv_up1"]["b"]
        )
        feat = conv3x3_fused(
            feat, params["conv_hr"]["w"], params["conv_hr"]["b"],
            act="lrelu",
        )
        return conv3x3_fused(
            feat, params["conv_last"]["w"], params["conv_last"]["b"]
        )
    elif (
        not differentiable
        and default_use_tail_kernel()
        and "conv_up2" in params
    ):
        from video_restore_tpu.ops.pallas_tail import tail_fused, up1_fused

        # upconv1 ahead of the kernel: the XLA conv_transpose runs ~6 TF/s
        # in a T(1,128) layout at full-frame widths (44 ms/frame traced);
        # default is the fused phase-form stripe kernel (up1_fused, free
        # fine-grid reshape). VRT_UP1_KERNEL=0 restores the XLA form,
        # VRT_UP1_PHASE=1 the XLA phase form (measured alternatives).
        if os.environ.get("VRT_UP1_KERNEL", "1") != "0":
            if os.environ.get("VRT_TAIL_Q") == "1":
                # quad tail: consume up1's raw (b, o)-packed output
                # directly (the two-kernel chain paid ~20 ms/frame of
                # relayout glue at full frame)
                from video_restore_tpu.ops.pallas_tail import tail_fused_q

                xq = up1_fused(
                    feat,
                    params["conv_up1"]["w"], params["conv_up1"]["b"],
                    masked=True,
                )
                return tail_fused_q(
                    xq,
                    params["conv_up2"]["w"], params["conv_up2"]["b"],
                    params["conv_hr"]["w"], params["conv_hr"]["b"],
                    params["conv_last"]["w"], params["conv_last"]["b"],
                    h2=2 * feat.shape[1], w1=feat.shape[2],
                )
            if os.environ.get("VRT_UP1_RAW", "1") != "0":
                # single-glue-op chain: up1 emits its raw masked padded
                # form and ONE fused crop+pad builds the tail's
                # pre-padded input — vs ~20 ms/frame of relayout glue
                # traced in the two-kernel chain at full frame. The
                # layout invariant lives in pallas_tail next to the
                # kernels. VRT_TAIL_RAW=1 (round 4): skip even that pad —
                # the tail kernel DMAs the raw (b, o)-paired output
                # directly and unpacks lanes in VMEM.
                from video_restore_tpu.ops.pallas_tail import (
                    tail_geom,
                    up1_raw_to_tail_input,
                )

                fh2, fw2 = feat.shape[1], feat.shape[2]
                xq = up1_fused(
                    feat,
                    params["conv_up1"]["w"], params["conv_up1"]["b"],
                    masked=True,
                )
                h2t, w2t = 2 * fh2, 2 * fw2
                if os.environ.get("VRT_TAIL_RAW", "1") != "0":
                    # default since round 4: measured 1.075 -> 1.089
                    # fps/chip on the flagship (deletes the ~2.1GB/frame
                    # pre-pad rewrite); geometry guard below falls back
                    # to the single-pad chain when raw rows don't cover
                    # the stripe grid
                    from video_restore_tpu.ops.pallas_tail import (
                        tail_fused_raw,
                    )

                    bh2t, _, _, hp2t, _ = tail_geom(
                        h2t, w2t, feat.shape[-1]
                    )
                    hq = xq.shape[1]
                    # the block-pipelined raw kernel needs the raw rows
                    # to cover the stripe grid (tail_fused_raw's guard)
                    if hp2t <= hq and bh2t % 2 == 0 and hq % 2 == 0:
                        return tail_fused_raw(
                            xq,
                            params["conv_up2"]["w"], params["conv_up2"]["b"],
                            params["conv_hr"]["w"], params["conv_hr"]["b"],
                            params["conv_last"]["w"],
                            params["conv_last"]["b"],
                            h2=h2t, w2=w2t,
                        )
                return tail_fused(
                    up1_raw_to_tail_input(xq, h2t, w2t),
                    params["conv_up2"]["w"], params["conv_up2"]["b"],
                    params["conv_hr"]["w"], params["conv_hr"]["b"],
                    params["conv_last"]["w"], params["conv_last"]["b"],
                    pre_padded=True, h2=h2t, w2=w2t,
                )
            feat = up1_fused(
                feat, params["conv_up1"]["w"], params["conv_up1"]["b"]
            )
        elif os.environ.get("VRT_UP1_PHASE") == "1":
            feat = leaky_relu(
                upconv2x_phase(
                    feat, params["conv_up1"]["w"], params["conv_up1"]["b"]
                )
            )
        else:
            feat = leaky_relu(
                upconv2x(
                    feat, params["conv_up1"]["w"], params["conv_up1"]["b"]
                )
            )
        return tail_fused(
            feat,
            params["conv_up2"]["w"], params["conv_up2"]["b"],
            params["conv_hr"]["w"], params["conv_hr"]["b"],
            params["conv_last"]["w"], params["conv_last"]["b"],
        )
    else:
        feat = leaky_relu(
            upconv2x(feat, params["conv_up1"]["w"], params["conv_up1"]["b"])
        )
        if "conv_up2" in params:
            feat = leaky_relu(
                upconv2x(feat, params["conv_up2"]["w"], params["conv_up2"]["b"])
            )
    feat = leaky_relu(conv2d(feat, params["conv_hr"]["w"], params["conv_hr"]["b"]))
    if not naive and os.environ.get("VRT_PACKED_LAST") == "1":
        # cout=3 at 4K runs the MXU at 2.3% lane occupancy (4.6 TF/s,
        # 28.7ms/frame measured) — but on v5e the packed form's win is
        # eaten by relayout copies around the tail's 5-D conv_transpose
        # layout (31ms/frame of copies measured), so it stays opt-in
        return conv2d_small_cout(
            feat, params["conv_last"]["w"], params["conv_last"]["b"]
        )
    return conv2d(feat, params["conv_last"]["w"], params["conv_last"]["b"])


def _tail_sdt(params: Params, feat: jax.Array) -> jax.Array:
    """sd-throughout tail (exact): phase-major upconvs emit each finer
    grid as a channel-packed space-to-depth tensor, conv_hr/conv_last run
    in the sd domain, and ONE 12-channel pixel_shuffle at the RGB end.
    The full-resolution 64-channel tensors (whose 5-D conv_transpose
    layouts taxed conv_hr/conv_last ~105 ms/frame in the round-2 trace)
    never exist. Matches /root/reference's basicsr tail
    (video_upscaler.py:313-321) bit-for-fp-reassociation."""
    from video_restore_tpu.ops.conv import pixel_shuffle_pm, up_phase_kernel_pm
    from video_restore_tpu.ops.sdconv import conv3x3_sd_packed, make_sd_kernels

    def up_pm(name):
        if f"{name}_pm" in params:  # prepared
            k = params[f"{name}_pm"]
        else:
            k = up_phase_kernel_pm(params[name]["w"])
        return k, jnp.tile(params[name]["b"], 4)

    def sd_k(name):
        if f"{name}_sd4" in params:  # prepared
            return params[f"{name}_sd4"]
        return make_sd_kernels(params[name]["w"])

    k1, b1 = up_pm("conv_up1")
    y = leaky_relu(conv2d(feat, k1, b1))  # sd of the 2x grid
    if "conv_up2" in params or "conv_up2_pm" in params:
        f1 = pixel_shuffle_pm(y, 2)  # one cheap 64-ch shuffle at 2x res
        k2, b2 = up_pm("conv_up2")
        y = leaky_relu(conv2d(f1, k2, b2))  # sd of the 4x grid
    y = leaky_relu(conv3x3_sd_packed(y, sd_k("conv_hr"), params["conv_hr"]["b"]))
    y = conv3x3_sd_packed(y, sd_k("conv_last"), params["conv_last"]["b"])
    return pixel_shuffle_pm(y, 2)


def default_use_sd_tail() -> bool:
    """sd-throughout XLA tail (:func:`_tail_sdt`) — opt-in
    (VRT_SD_TAIL=1). Measured 0.907 vs 0.983 fps/chip on the v5e
    flagship: XLA re-layouts the intermediates anyway, so it stays a
    documented dead-end (same fate as round-2's phase-form upconv)."""
    import os

    return os.environ.get("VRT_SD_TAIL") == "1"


def default_use_tail_kernel() -> bool:
    """Fused Pallas tail (ops/pallas_tail.py: upconv2 + conv_hr +
    conv_last in one stripe kernel) — production default on TPU
    (flagship 0.983 -> 0.992 fps/chip; isolated tail 59 -> 41 ms/call,
    partly offset by the relayout into the kernel). VRT_TAIL_KERNEL=0
    opts out, =1 forces on non-TPU backends (interpret-mode tests)."""
    import os

    v = os.environ.get("VRT_TAIL_KERNEL")
    if v == "0":
        return False
    if v == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def default_use_accum() -> bool:
    """Accumulator-form body (see _accum_rdb_weights) — the production
    default on TPU; opt out with VRT_ACCUM=0 (falls back to the
    source-major regrouped path)."""
    import os

    if os.environ.get("VRT_ACCUM") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def default_use_glue_kernel() -> bool:
    """Stripe-kernel form of the stem conv_first and conv_body+residual
    (ops/pallas_tail.py conv3x3_fused) — default on TPU; VRT_GLUE_KERNEL
    overrides (0/1)."""
    import os

    v = os.environ.get("VRT_GLUE_KERNEL")
    if v == "0":
        return False
    if v == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def default_use_stripe() -> bool:
    """Stripe-form Pallas RDB kernel (ops/pallas_stripe.py) — the
    production default on TPU (measured 2.0x the XLA accum body per RDB
    on v5e, plus padded-form chaining and rdb3-residual fusion across the
    23-block body — see ops/pallas_stripe.py); opt out with VRT_STRIPE=0.
    VRT_STRIPE=1 forces it on non-TPU backends too (interpret-mode
    validation, e.g. the multichip dryrun)."""
    import os

    v = os.environ.get("VRT_STRIPE")
    if v == "0":
        return False
    if v == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def resolve_mode(
    naive: bool = False,
    use_pallas: "bool | None" = None,
    sd: "bool | None" = None,
) -> str:
    if naive:
        return "naive"
    if use_pallas if use_pallas is not None else default_use_pallas():
        return "pallas"
    if sd if sd is not None else default_use_sd():
        return "sd"
    if default_use_stripe():
        return "stripe"
    if default_use_accum():
        return "accum"
    return "regrouped"


@partial(jax.jit, static_argnames=("mode", "num_feat", "num_grow_ch"))
def prepare_rrdbnet(
    params: Params, mode: str, num_feat: int, num_grow_ch: int
) -> Params:
    """One-time weight transformation for the chosen execution mode, so the
    per-step program does no regrouping/sd-kernel assembly (inside a
    chunked lax.map those transforms would otherwise re-run per chunk).

    Returns a params pytree consumed by ``_apply(..., prepared=True)``.
    """
    if mode in ("naive",):
        return params
    nf, gc = num_feat, num_grow_ch
    out = {k: v for k, v in params.items() if k != "body"}
    body = {}
    if mode == "stripe":
        from video_restore_tpu.ops.pallas_stripe import (
            prefix_rdb_weights,
            production_prefix_weights,
        )

        def regroup(p, nf, gc):
            ws, bs = prefix_rdb_weights(p, nf, gc)
            return production_prefix_weights(ws), bs
    elif mode == "accum":
        regroup = _accum_rdb_weights
    else:
        regroup = _regroup_rdb_weights
    for r in ("rdb1", "rdb2", "rdb3"):
        ws, bs = regroup(params["body"][r], nf, gc)
        if mode == "sd":
            from video_restore_tpu.ops.sdconv import make_sd_kernels

            body[r] = {
                "w": tuple(make_sd_kernels(w) for w in ws),
                "b": tuple(bs),
            }
        else:
            body[r] = {"w": tuple(ws), "b": tuple(bs)}
    out["body"] = body
    if mode == "sd":
        from video_restore_tpu.ops.sdconv import make_sd_kernels

        out["conv_first_sd"] = make_sd_kernels(params["conv_first"]["w"])
        out["conv_body_sd"] = make_sd_kernels(params["conv_body"]["w"])
    if default_use_sd_tail():
        from video_restore_tpu.ops.conv import up_phase_kernel_pm
        from video_restore_tpu.ops.sdconv import make_sd_kernels

        out["conv_up1_pm"] = up_phase_kernel_pm(params["conv_up1"]["w"])
        if "conv_up2" in params:
            out["conv_up2_pm"] = up_phase_kernel_pm(params["conv_up2"]["w"])
        out["conv_hr_sd4"] = make_sd_kernels(params["conv_hr"]["w"])
        out["conv_last_sd4"] = make_sd_kernels(params["conv_last"]["w"])
    return out


def default_use_sd() -> bool:
    """Opt-in (VRT_SD=1): the space-to-depth body is exact and lifts real
    MXU throughput from ~28 to ~45 TF/s, but its 16/9 structural-zero MAC
    tax still nets ~8% slower than the regrouped fine path on v5e —
    kept as an option (it may win on hardware with wider MXUs)."""
    import os

    if os.environ.get("VRT_SD") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def apply_rrdbnet(
    params: Params,
    x: jax.Array,
    spec: RRDBNetSpec,
    naive: bool = False,
    use_pallas: "bool | None" = None,
    sd: "bool | None" = None,
    differentiable: bool = False,
    precision: "str | None" = None,
) -> jax.Array:
    """Forward pass. x: (N, H, W, 3) float in [0, 1]. Returns (N, H*s, W*s, 3).

    ``naive=True`` uses the torch-ordered RDB formulation (parity testing).
    The default source-major regrouped path computes identical values much
    faster on TPU (MXU occupancy — see _regroup_rdb_weights) and is the
    production path. Two exact alternatives are opt-IN via env var:
    VRT_SD=1 runs the stem + body in the space-to-depth domain
    (ops/sdconv.py), and VRT_PALLAS=1 uses the fused Pallas RDB kernel;
    both measured slower than the regrouped path in round 1 (see
    BENCH_NOTES.md dead ends).

    ``differentiable=True`` (training) forces the pure-XLA paths: the
    Pallas kernels (stripe body, fused tail) define no VJP, so autodiff
    through the TPU production defaults would fail.

    ``precision`` ("bf16"/"int8", default VRT_PRECISION): int8 runs the
    stripe-form RDB body as W8A8 MXU dots (see default_precision); it
    applies only to the stripe mode — other modes keep bf16."""
    if precision is None:
        precision = default_precision()
    if differentiable:
        return _apply(
            params, x, spec.scale,
            naive=naive, use_pallas=False, sd=False, accum=False,
            stripe=False, unshuffle=spec.unshuffle, differentiable=True,
        )
    if use_pallas is None:
        use_pallas = not naive and default_use_pallas()
    if sd is None:
        sd = not naive and not use_pallas and default_use_sd()
    stripe = (
        not naive and not use_pallas and not sd and default_use_stripe()
    )
    accum = (
        not naive and not use_pallas and not sd and not stripe
        and default_use_accum()
    )
    return _apply(
        params, x, spec.scale, naive, use_pallas, sd, accum, stripe,
        unshuffle=spec.unshuffle, precision=precision,
    )
