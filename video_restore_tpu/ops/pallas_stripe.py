"""Pallas TPU kernel: stripe-form fused Residual Dense Block (round 2).

Second-generation RDB kernel (first generation: ops/pallas_rdb.py). The RDB
is the hot loop of RRDBNet — 69 instances in the 23-block model
(/root/reference/video_upscaler.py:313-321 configures it via basicsr). The
round-1 kernel tiled the frame into square blocks and lost to XLA on halo
overhead: a 64x64 block with a 16px halo computes (96/64)^2 = 2.25x the
useful pixels. This kernel restructures around four measured findings:

1. **Full-width stripes, halo only in H.** The grid walks (batch, stripe)
   rows; each program DMAs a (bh + 10, Wf, nf) window — the W axis is
   padded once at the array level, so the per-program compute overhead is
   (bh+10)/bh = 1.16x at bh=64 instead of 2.25x.

2. **dy-taps folded into the matmul contraction.** A 3x3 conv over cin
   channels is 3 matmuls (one per column tap dx), each contracting
   K = 3*cin (the three row taps stacked along channels: free leading-dim
   slices + one lane concat). The round-1 kernel's 9 matmuls at K=32
   ran the MXU at 25% contraction occupancy; K=96/192 runs at 75%.

3. **Prefix-ordered accumulator.** Destination slots are ordered
   [c5 | c4 | c3 | c2 | c1] (reversed), so every source conv's output is
   a *prefix* of the accumulator and `acc[..., :cout] += t` is a
   lane-offset-0 update — no lane-shuffle relayouts (the round-2 XLA
   profiling showed 32-channel updates at non-128 offsets cost a shuffle
   copy each).

4. **Exact SAME-conv edge semantics.** basicsr's RDB zero-pads at *every*
   conv. A valid-conv chain over a zero-padded input (the round-1 kernel)
   differs in the outer 4-pixel ring; here each growth tensor c_k is
   masked to zero outside the frame before the next conv consumes it,
   which reproduces SAME padding bit-for-bit (up to summation order).

Column alignment uses hardware sublane rolls of the fp32 conv partials
(Mosaic only rotates 32-bit data); output column j stays centered on
input column j for the whole chain, so garbage lives only in the wrapped
columns {0, Wf-1}, outside the masked frame region.

Input DMA is double-buffered across sequential grid steps (scratch slots
persist between iterations with "arbitrary" dimension semantics); output
write-back is pipelined by the standard Pallas output BlockSpec machinery.

**Padded stripe form** (round-2 production path): the body's activations
live in a (B, hp + 2*bh, Wf, 128) layout whose pad regions are exact
zeros — pad_stripe_entry once before the 23-block scan, unpad_stripe_exit
once after, and NO XLA op touches the array in between (an XLA pad before
each of the 69 RDB calls measured 0.63ms each — a full rewrite of the
52MB array — and the separate residual multiply-add another 0.59ms/block).
Each kernel re-establishes the zero invariant through its masked
full-width output block; the bh-row H halos are written as zero blocks by
two extra grid steps through the same block-aligned output pipeline.

**Whole-RRDB fusion** (rrdb_stripe_padded): the 3 RDBs of a block + the
RRDB 0.2-residual run as one kernel; the per-stage halos telescope
(stage k computes bh + 2*(3-k)*5 rows), so total compute matches three
separate stripe kernels while the two intermediate HBM round-trips and
the XLA residual op vanish.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 5  # five chained 3x3 convs
_PADL = 8  # left/right W padding (8-sublane aligned; >= _HALO + 1 spare)


def prefix_rdb_weights(p, nf: int, gc: int):
    """Source-major regroup with REVERSED destination order + dy-stacking.

    From the torch-ordered RDB params {conv1..conv5: {w: (3,3,cin_k,cout_k)}}
    build, per input source s in (x, c1, c2, c3, c4):

        w[s]: (3, 3*cin_s, cout_s)  — indexed by dx; K = dy*cin + c

    where cout_s = nf + (4-s)*gc and the output channels are ordered by
    destination c5, c4, ..., c_{s+1}. Every source's contribution is then
    a *prefix* of the [c5 | c4 | c3 | c2 | c1] accumulator layout.

    Identical math to models.rrdbnet._regroup_rdb_weights (summation
    reordered); see that docstring for the regroup derivation.
    """
    ws = [p[f"conv{k}"]["w"] for k in range(1, 6)]  # (3,3,Cin_k,Cout_k)

    def src_slice(k, s):
        lo = 0 if s == 0 else nf + (s - 1) * gc
        hi = nf if s == 0 else lo + gc
        return ws[k][..., lo:hi, :]

    out = []
    for s in range(5):
        # destinations conv5, conv4, ..., conv_{s+1} (reversed)
        parts = [src_slice(k, s) for k in range(4, s - 1, -1)]
        w = jnp.concatenate(parts, axis=-1)  # (..., 3, 3, cin_s, cout_s)
        # dx-major stack, dy folded into K (dy-major: K = dy*cin + c);
        # batch-agnostic so it applies to (num_block, ...) stacked leaves
        w = jnp.swapaxes(w, -4, -3)  # (..., kw, kh, cin, cout)
        w = w.reshape(w.shape[:-3] + (3 * w.shape[-2], w.shape[-1]))
        out.append(w)
    biases = [p[f"conv{k}"]["b"] for k in range(1, 6)]
    return tuple(out), tuple(biases)


# Which source convs the N-packed contraction pays for (by MXU lane
# occupancy at nf=64/gc=32): s=0 (cout 192: 75->90%), s=1 (160:
# 62.5->93.75%), s=4 (64: 50->75%). s=2 (128) is already 100% and s=3
# (96) unchanged at 75% — packing those would only add slice overhead.
# Measured (tools/bench_rdb.py, v5e, flagship shape): 65.1 -> 79.1 TF/s.
NPACK_DEFAULT: Tuple[int, ...] = (0, 1, 4)


def npack_selection() -> Tuple[int, ...]:
    """Production N-pack selection: NPACK_DEFAULT, VRT_NPACK=0 disables,
    VRT_NPACK=<digits> (e.g. 014) picks a custom source set."""
    import os

    v = os.environ.get("VRT_NPACK")
    if v == "0":
        return ()
    if v and v.isdigit():
        return tuple(sorted({int(c) for c in v} & {0, 1, 2, 3, 4}))
    return NPACK_DEFAULT


def im2col_selection() -> Tuple[int, ...]:
    """Production im2col-form selection (applied after N-packing; a
    source already N-packed is skipped). Default empty pending a real-TPU
    A/B vs the N-packed/per-dx mix; VRT_IM2COL=<digits> (e.g. 23) picks a
    source set, VRT_IM2COL=0 disables."""
    import os

    v = os.environ.get("VRT_IM2COL", "")
    if v == "0" or not v.isdigit():
        return ()
    return tuple(sorted({int(c) for c in v} & {0, 1, 2, 3, 4}))


def production_prefix_weights(ws):
    """Apply the production contraction-form selections (N-pack, then
    im2col for the sources N-packing left alone) to prefix-form weights."""
    npack = npack_selection()
    ws = pack_prefix_weights(ws, npack)
    im2 = tuple(s for s in im2col_selection() if s not in npack)
    return im2col_prefix_weights(ws, im2)


def pack_prefix_weights(ws, pack: Tuple[int, ...] = NPACK_DEFAULT):
    """(3, 3cin, cout) -> N-packed (3cin, 3cout) for the selected source
    convs (lane blocks ordered [dx=0 | dx=1 | dx=2]); the rest pass
    through. Batch-agnostic (applies to (num_block, ...) stacked leaves).
    """
    out = []
    for s, w in enumerate(ws):
        if s in pack:
            w = jnp.swapaxes(w, -3, -2)  # (..., 3cin, 3, cout)
            w = w.reshape(w.shape[:-2] + (3 * w.shape[-1],))
        out.append(w)
    return tuple(out)


def im2col_prefix_weights(ws, sel: Tuple[int, ...]):
    """(3, 3cin, cout) -> im2col form (9cin, cout) for the selected source
    convs (K ordered dx-major, matching the ak9 build in _conv_prefix);
    the rest pass through. Batch-agnostic.

    Contrast with pack_prefix_weights: N-packing folds dx into the matmul
    *output* (3N lanes, then slice + fp32 roll + add); im2col folds dx
    into the *contraction* (K = 9cin) — the three dx taps reduce inside
    the MXU, so the kernel writes cout lanes once instead of 3N, and the
    column alignment moves from fp32 partial rolls to bf16 input slices.
    """
    out = []
    for s, w in enumerate(ws):
        if s in sel:
            w = w.reshape(w.shape[:-3] + (3 * w.shape[-2], w.shape[-1]))
        out.append(w)
    return tuple(out)


def _prefix_layout(w) -> str:
    """Layout of a prefix-form weight leaf (batch-stacked or not):
    "dx" (..., 3, 3cin, cout), "im2col" (..., 9cin, cout), or
    "npacked" (..., 3cin, 3cout). The dx form always has shape[-3] == 3;
    RDB block stacks are 23/6 deep, never 3, so the test is unambiguous
    for every layout this file produces."""
    if w.ndim >= 3 and w.shape[-3] == 3:
        return "dx"
    if w.shape[-2] > w.shape[-1]:
        return "im2col"
    return "npacked"


def quantize_prefix_weights(ws):
    """Per-out-channel symmetric int8 quantization of prefix-form weights
    (W8 of the W8A8 body — VERDICT r4 item 1; the round-2 MXU probe
    measured i8xi8->i32 pallas dots at 1.34x bf16 on v5e).

    Returns (qws, sws): qws[k] is int8 in the same layout as ws[k]; sws[k]
    is fp32 (..., cout) with q * s == w up to rounding. One scale per
    FILTER output channel — for the N-packed layout the scale is computed
    over all three dx lane copies of a channel (they are taps of the same
    filter), so the kernel can sum the three int32 dx partials BEFORE
    dequantizing. Batch-agnostic (applies to (num_block, ...) stacked
    leaves). The reference's own speed-for-precision trade is half=True
    at /root/reference/video_upscaler.py:335.
    """
    qws, sws = [], []
    for w in ws:
        wf32 = w.astype(jnp.float32)
        layout = _prefix_layout(w)
        if layout == "dx":
            amax = jnp.max(jnp.abs(wf32), axis=(-3, -2))
            s = jnp.maximum(amax, 1e-12) / 127.0
            q = wf32 / s[..., None, None, :]
        elif layout == "im2col":
            amax = jnp.max(jnp.abs(wf32), axis=-2)
            s = jnp.maximum(amax, 1e-12) / 127.0
            q = wf32 / s[..., None, :]
        else:  # npacked (..., 3cin, 3cout): view (..., 3cin, 3, cout)
            cout = w.shape[-1] // 3
            wv = wf32.reshape(wf32.shape[:-1] + (3, cout))
            amax = jnp.max(jnp.abs(wv), axis=(-3, -2))
            s = jnp.maximum(amax, 1e-12) / 127.0
            q = (wv / s[..., None, None, :]).reshape(wf32.shape)
        qws.append(
            jnp.clip(jnp.round(q), -127.0, 127.0).astype(jnp.int8)
        )
        sws.append(s)
    return tuple(qws), tuple(sws)


def _quant_act(ak):
    """A8 of the W8A8 body: dynamic symmetric per-chunk activation
    quantization (scale = amax/127 over the row chunk, computed in VMEM —
    a VPU reduce over data already resident, ~us against ms of matmul).
    Returns (int8 tensor, fp32 scalar scale).

    VMEM discipline: the elementwise chain stays in the INPUT dtype —
    an fp32 staging copy of the chunk pushed the production split kernel
    8.05M over the 128M VMEM limit (round-5 compile record). Integers up
    to 256 are exact in bf16, so round/clip at the +-127 range lose
    nothing; the bf16 multiply's ~2^-9 relative error only shifts
    rounding boundaries (a fraction of the quantization LSB that is
    already the noise floor). amax is max/-min of the resident chunk —
    no jnp.abs materialization.

    Scale and its reciprocal stay (1, 1, 1) ARRAYS end to end, and the
    bf16 reduce stops at the lane vector — Mosaic converts only 32-bit
    values to scalars, so any all-axes bf16 reduce (even keepdims)
    fails to lower; the final one-element reduce runs on the tiny fp32
    lane vector instead. The broadcasts are free splats."""
    mx = jnp.max(ak, axis=(0, 1), keepdims=True)  # (1, 1, 3cin) bf16
    mn = jnp.min(ak, axis=(0, 1), keepdims=True)
    amax = jnp.maximum(mx, -mn).astype(jnp.float32)
    amax = jnp.max(amax, keepdims=True)  # (1, 1, 1) fp32
    sa = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    inv = (1.0 / sa).astype(ak.dtype)
    return _round_clip_i8(ak * inv), sa


def _round_clip_i8(qa):
    """Round-half-away + clip to [-127, 127] + cast to int8.

    Round-half-away via copysign(0.5) + truncate-toward-zero:
    math.roundeven (jnp.round) fails to legalize in Mosaic on this
    toolchain, and so does arith.cmpf on bf16 vectors ("Target does
    not support this comparison", round-5 compile record) — so the
    sign pick is BITWISE: OR the operand's sign bit into 0.5's bit
    pattern (i16 ops + same-width bitcasts only). The +-0.5 add
    rounds to the local bf16 grid first, which can perturb the tie
    decision by <= 0.25 LSB for top-octave values — noise far under
    the quantization LSB itself."""
    if qa.dtype == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(qa, jnp.int16)
        half_bits = jnp.bitwise_or(
            jnp.int16(0x3F00),  # bf16 +0.5
            jnp.bitwise_and(bits, jnp.int16(-0x8000)),  # sign bit
        )
        half = jax.lax.bitcast_convert_type(half_bits, jnp.bfloat16)
    else:
        half = jnp.where(qa >= 0, qa.dtype.type(0.5), qa.dtype.type(-0.5))
    qa = jnp.clip(qa + half, -127.5, 127.5).astype(jnp.int32)
    return qa.astype(jnp.int8)


def _quant_act_static(a, scale: float):
    """A8 with a STATIC (calibration-time) scale — the repair path the
    round-5 dynamic-quant measurement pointed at (BENCH_NOTES round-5
    int8 section): the per-chunk amax reduce chain disappears, and the
    conv input is quantized ONCE here instead of 3x through the dy
    lane-concat (the concat then copies int8 rows). The dequant scale
    is pre-folded into the weight scales host-side (fold_static_act_
    scales), so the kernel-side epilogue multiplies by sw only.
    Out-of-range activations saturate at +-127 (symmetric clip) — the
    calibration margin is the quality knob."""
    inv = a.dtype.type(1.0 / scale)
    return _round_clip_i8(a * inv)


def _wgeom(w) -> Tuple[int, int]:
    """(cin, cout) of a prefix-form weight in any of the three layouts:
    (3, 3cin, cout) per-dx, (3cin, 3cout) N-packed, (9cin, cout) im2col
    (the latter two disambiguated by K>N — cout > cin for every RDB conv,
    so 9cin > cout and 3cin < 3cout)."""
    if w.ndim >= 3:
        return w.shape[-2] // 3, w.shape[-1]
    if w.shape[-2] > w.shape[-1]:  # im2col
        return w.shape[-2] // 9, w.shape[-1]
    return w.shape[-2] // 3, w.shape[-1] // 3


def _roll_w(x, d: int):
    """Align column j to source column j+d (hardware sublane roll)."""
    if d == 0:
        return x
    wf = x.shape[1]
    return pltpu.roll(x, (wf - d) % wf, 1)


# fp32 VMEM budget for one packed (rows, Wf, 3*cout) partial; bounds the
# row chunking of the N-packed contraction (ROADMAP: the full-bh packed
# partial at cout=192 is ~86MB and blows VMEM). VRT_NPACK_CHUNK_MB tunes
# it for benching.
def _npack_chunk_bytes() -> int:
    import os

    try:
        return int(
            float(os.environ.get("VRT_NPACK_CHUNK_MB", "10")) * 1024 * 1024
        )
    except ValueError:
        return 10 * 1024 * 1024


def _nodycat_min() -> int:
    """cin threshold at/above which the N-packed contraction skips the
    dy-stack concat (ak build) and instead runs three direct-slice dots
    (one per row tap, K = cin) summed in fp32 — trades the in-kernel ak
    data movement (ROADMAP: part of the 79 -> ~100 TF/s gap) for 3x the
    matmul count at a third of the K. RDB sources have cin of only
    nf=64 / gc=32, so a single tap's K is small and contraction
    occupancy drops — this is a measured-probe knob, not a default.
    Default off (threshold inf); VRT_NODYCAT_MIN=64 enables for the
    nf-wide sources (RDB s=0, SRVGG)."""
    import os

    v = os.environ.get("VRT_NODYCAT_MIN", "")
    return int(v) if v.isdigit() else 1 << 30


def _conv_prefix(a, w, out_dt=jnp.float32, sw=None, sa_static=None):
    """3x3 conv, column-aligned: (e, Wf, cin) x weights -> (e-2, Wf, cout)
    ``out_dt``; output row r/col j centered on input row r+1 / col j.
    Columns {0, Wf-1} are wrapped garbage (handled by the caller's frame
    mask). The per-dx partials stay fp32 through the alignment rolls
    (Mosaic rotates 32-bit data only) and are cast on the final sum.

    ``sw`` (fp32, broadcastable to (.., cout)) selects the W8A8 int8 path:
    ``w`` must then be int8 (quantize_prefix_weights) and each row chunk's
    input is quantized in-VMEM with a dynamic per-chunk scale
    (_quant_act). The dots run i8 x i8 -> i32 on the MXU (measured 1.34x
    bf16 on v5e, BENCH_NOTES round-2 findings); the alignment rolls and
    dx-partial adds stay in int32 (exact, and Mosaic rotates 32-bit
    data), and ONE dequant multiply (sa * sw) lands the chunk in fp32 —
    the downstream prefix accumulator/bias/lrelu epilogue is unchanged
    from the bf16 form.

    Two weight layouts select the contraction form:

    - (3, 3cin, cout): one matmul per column tap dx (three (M,K)x(K,N)
      contractions, K = 3cin from the folded row taps).
    - (3cin, 3cout) *N-packed*: ONE (M,K)x(K,3N) matmul computes all
      three dx partials at once (lane blocks [dx=0 | dx=1 | dx=2]), then
      slice + roll + add. Triples the matmul's N — cout 64/160/192 runs
      the MXU lane tiling at 50/62.5/75%; packed 192/480/576 at
      75/93.75/90% — at the price of per-dx lane-block slices that are
      not 128-aligned for every cout. Rows are chunked so the fp32
      packed partial stays under _NPACK_CHUNK_BYTES.
    """
    e, wf, cin = a.shape
    oh = e - 2
    im2col = w.ndim == 2 and w.shape[0] > w.shape[1]
    npacked = w.ndim == 2 and not im2col
    if sw is not None and im2col:
        raise NotImplementedError(
            "int8 is not wired for the im2col contraction form "
            "(an opt-in measured dead-end, BENCH_NOTES round 3)"
        )
    if sa_static is not None:
        if sw is None:
            raise ValueError("sa_static requires int8 weights (sw)")
        # STATIC A8: quantize the conv input ONCE (vs 3x through the dy
        # concat in the dynamic path) with the calibrated scale; the dy
        # concat below then copies int8 rows. The caller pre-folded the
        # activation scale into sw (fold_static_act_scales), so the
        # dequant epilogue is `* sw` with no per-chunk scalar.
        a = _quant_act_static(a, sa_static)
    # fp32-partial byte budget bounds the row chunk; the dy-stack concat
    # ak is built PER CHUNK (round 4) so its bf16 footprint is bounded
    # too — the full-height build scaled with the window (82MB at the
    # bh=270 probe) and was half of round-3's taller-stripe VMEM OOM
    if im2col:
        rc = max(8, _npack_chunk_bytes() // (wf * w.shape[0] * 2) // 8 * 8)
    elif npacked:
        rc = max(8, _npack_chunk_bytes() // (wf * w.shape[1] * 4) // 8 * 8)
    else:
        rc = max(8, _npack_chunk_bytes() // (wf * w.shape[-1] * 4) // 8 * 8)
    nodycat = npacked and sw is None and cin >= _nodycat_min()
    outs = []
    for r0 in range(0, oh, rc):
        r1 = min(r0 + rc, oh)
        if nodycat:
            # dy-concat-free N-packed form: three direct window slices
            # (no ak build) against the packed weight's dy row blocks,
            # summed in fp32 — K = cin per dot (only selected for large
            # cin where single-tap contraction occupancy stays high)
            n = w.shape[1] // 3
            p = None
            for dy in range(3):
                pd = lax.dot_general(
                    a[r0 + dy : r1 + dy],
                    w[dy * cin : (dy + 1) * cin],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                p = pd if p is None else p + pd
            q = None
            for dx in range(3):
                part = _roll_w(p[:, :, dx * n : (dx + 1) * n], dx - 1)
                q = part if q is None else q + part
            outs.append(q)
            continue
        ak = jnp.concatenate(
            [a[r0:r1], a[r0 + 1 : r1 + 1], a[r0 + 2 : r1 + 2]], axis=2
        )
        if im2col:
            # im2col (9cin, cout): dx folded into K. The three dx taps
            # are column-shifted copies of ak (zero-filled at the wrap
            # columns, which the caller's frame mask discards anyway), so
            # the matmul output is already column-aligned — no fp32
            # partial rolls, and the MXU writes cout lanes once instead
            # of 3N. K > N always distinguishes this layout from the
            # N-packed one below (cout of every RDB conv exceeds its cin,
            # so 9cin > cout and 3cin < 3cout).
            z = jnp.zeros((r1 - r0, 1, ak.shape[2]), ak.dtype)
            ak9 = jnp.concatenate(
                [
                    jnp.concatenate([z, ak[:, :-1]], axis=1),  # col j-1
                    ak,
                    jnp.concatenate([ak[:, 1:], z], axis=1),  # col j+1
                ],
                axis=2,
            )
            outs.append(
                lax.dot_general(
                    ak9,
                    w,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        elif npacked:  # N-packed (3cin, 3cout)
            n = w.shape[1] // 3
            if sw is not None and sa_static is None:
                ak, sa = _quant_act(ak)
            p = lax.dot_general(
                ak,
                w,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if sw is not None else jnp.float32
                ),
            )
            q = None
            for dx in range(3):
                part = _roll_w(p[:, :, dx * n : (dx + 1) * n], dx - 1)
                q = part if q is None else q + part
            if sw is not None:
                q = q.astype(jnp.float32) * (
                    sw if sa_static is not None else sa * sw
                )
            outs.append(q)
        else:  # per-dx (3, 3cin, cout): one matmul per column tap
            if sw is not None and sa_static is None:
                ak, sa = _quant_act(ak)
            acc = None
            for dx in range(3):
                p = lax.dot_general(
                    ak,
                    w[dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if sw is not None else jnp.float32
                    ),
                )
                p = _roll_w(p, dx - 1)
                acc = p if acc is None else acc + p
            if sw is not None:
                acc = acc.astype(jnp.float32) * (
                    sw if sa_static is not None else sa * sw
                )
            outs.append(acc)
    acc = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return acc.astype(out_dt)


def _rdb_stage(
    x, w5, b5, top, *, h, w, wf, nf, gc, dt, acc_dt, col_ok, nomask=None,
    rc=None, sw5=None, sas=None,
):
    """One full RDB on a window x (e, Wf, nf): 5 chained prefix-form convs
    + the 0.2 residual, masked to the frame (exact SAME padding; zeros
    outside). Window row 0 sits at frame row ``top`` (may be negative in a
    fused chain). Returns (e-10, Wf, nf) in ``dt``; output row r is frame
    row top + 5 + r.

    nomask=True skips the frame masks (correct ONLY when the window
    never touches a frame edge). None reads the VRT_NOMASK perf probe —
    incorrect at edges, used to measure the masks at ~2.2% of flagship
    frame time. Branching edge/interior per program to skip them for
    interior blocks VMEM-OOMed: Mosaic allocates both pl.when branch
    bodies' scoped buffers concurrently (166MB > 128MB at production
    geometry) — the split edge/interior pallas_call launches in
    rdb_stripe2d_split are the working form of that idea.

    ``rc`` row-chunks the whole 5-conv chain (round 4): the fp32 prefix
    accumulator, the ak lane-concats, and the growth tensors exist only
    for ~rc rows at a time, carried across chunks by 1 accumulator row +
    2 growth rows per stage (ZERO recompute — per-element math identical
    to the monolithic form, it is pure re-association of row ranges).
    The monolithic form's fp32 footprint scales with the window height
    (the 221MB VMEM-OOM that blocked bh>135 at production geometry in
    round 3); chunked, the live set is O(rc) and bh can grow until the
    bf16 window/output buffers bound VMEM instead. rc=None keeps one
    chunk (the proven monolithic trace).
    """
    if nomask is None:
        import os

        nomask = os.environ.get("VRT_NOMASK") == "1"
    w0, w1, w2, w3, w4 = w5
    ws_ = (w0, w1, w2, w3, w4)
    b1, b2, b3, b4, b5_ = b5
    bs_ = (b1, b2, b3, b4, b5_)
    # sw5: per-conv fp32 (1, 1, cout) weight scales (W8A8 path) or None;
    # sas: per-conv STATIC activation scales (python floats, pre-folded
    # into sw5 by the caller) selecting the static-A8 quant form
    sws_ = (None,) * 5 if sw5 is None else tuple(s[0] for s in sw5)
    sas_ = (None,) * 5 if sas is None else tuple(sas)
    g = gc
    e = x.shape[0]
    n1 = e - 2  # acc1 rows; stage-k acc has n1 - 2(k-1) rows

    def mask_rows(t, row0, k):
        """Mask a stage-k tensor whose row r is frame row top+k+row0+r."""
        if nomask:
            return t
        rows = lax.broadcasted_iota(jnp.int32, (t.shape[0], 1, 1), 0)
        rowf = rows + (top + k + row0)
        ok = (rowf >= 0) & (rowf < h) & col_ok
        return jnp.where(ok, t, 0.0)

    # chunk boundaries in acc1-row space; the LAST chunk absorbs the
    # remainder (size rc..2rc-1) so no stage's slice ever goes empty
    if rc is None or rc >= n1:
        bounds = [0, n1]
    else:
        if rc < 16:
            raise ValueError(f"stripe row chunk rc must be >= 16 (got {rc})")
        m = max(1, n1 // rc)
        bounds = [j * rc for j in range(m)] + [n1]

    out_chunks = []
    carry_c = [None] * 4  # last 2 rows of c_k (masked, dt) per stage
    carry_acc = [None] * 4  # last 1 row of acc_k (acc_dt) per stage
    for j in range(len(bounds) - 1):
        lo_b, hi_b = bounds[j], bounds[j + 1]
        # stage 1: conv1 over x rows [lo_b, hi_b+2) -> acc1 rows [lo_b, hi_b)
        acc = _conv_prefix(
            x[lo_b : hi_b + 2], w0[:], acc_dt, sw=sws_[0], sa_static=sas_[0]
        )
        for k in range(1, 5):
            # this chunk's acc_k covers rows [max(0, lo_b-2(k-1)), hi_b-2(k-1))
            sk = max(0, lo_b - 2 * (k - 1))
            slot = nf + (4 - k) * g
            ck = jax.nn.leaky_relu(acc[:, :, slot : slot + g] + bs_[k - 1][0], 0.2)
            ck = mask_rows(ck, sk, k).astype(dt)
            if j > 0:
                conv_in = jnp.concatenate([carry_c[k - 1], ck], axis=0)
                acc_src = jnp.concatenate(
                    [carry_acc[k - 1], acc[:-1]], axis=0
                )
            else:
                conv_in = ck
                acc_src = acc[1:-1]
            if j + 1 < len(bounds) - 1:
                carry_c[k - 1] = ck[-2:]
                carry_acc[k - 1] = acc[-1:]
            if k < 4:
                conv_out = _conv_prefix(
                    conv_in, ws_[k][:], acc_dt, sw=sws_[k],
                    sa_static=sas_[k],
                )
                cout = conv_out.shape[-1]
                acc = jnp.concatenate(
                    [acc_src[:, :, :cout] + conv_out, acc_src[:, :, cout:]],
                    axis=2,
                )
            else:
                # stage 5 epilogue: fp32 conv + residual on the nf prefix
                c5 = (
                    acc_src[:, :, :nf].astype(jnp.float32)
                    + _conv_prefix(
                        conv_in, ws_[4][:], sw=sws_[4], sa_static=sas_[4]
                    )
                    + b5_[0]
                )
        s5 = max(0, lo_b - 2 * 4)
        center = x[s5 + _HALO : (hi_b - 8) + _HALO].astype(jnp.float32)
        out_chunks.append(
            mask_rows(center + 0.2 * c5, s5, _HALO).astype(dt)
        )
    if len(out_chunks) == 1:
        return out_chunks[0]
    return jnp.concatenate(out_chunks, axis=0)


def _rdb_stripe_kernel(
    xp_ref,  # (B, Hp, Wf, nf) in ANY/HBM — padded input
    *refs,  # 5 weight refs, 5 bias refs, [5 scale refs], out_ref, xblk, sem
    quant: bool = False,
    bh: int,
    h: int,
    w: int,
    wf: int,
    nf: int,
    gc: int,
    nstripes: int,
    nb: int,
    acc_bf16: bool,
    padded_out: bool = False,
    cpad: int = 0,
):
    # weights: prefix-form (3, 3cin, cout) VMEM (int8 when quant);
    # biases: (1, 1, g|nf) fp32 VMEM; scales (quant only): (1, 1, cout)
    # fp32 VMEM; then out_ref (1, bh, W|Wf, nf|nfp) VMEM block, the
    # (2, bh + 2*_HALO, Wf, nf) double-buffer scratch, and DMA semaphores
    nw = 15 if quant else 10
    wref = refs[0:5]
    bref = refs[5:10]
    sref = refs[10:15] if quant else None
    out_ref, xblk, sem = refs[nw], refs[nw + 1], refs[nw + 2]
    bi = pl.program_id(0)
    if padded_out:
        # grid walks nstripes+2 row-blocks: blocks 0 and nstripes+1 are the
        # bh-row zero halos (written through the same output pipeline — an
        # XLA jnp.pad here measured 0.63ms/call, a full rewrite of the
        # array; the zero block costs one pipelined block write).
        gi = pl.program_id(1)
        si = gi - 1
        is_halo = (gi == 0) | (gi == nstripes + 1)
        # body-program counter (zero blocks don't consume input windows)
        m = bi * nstripes + jnp.clip(si, 0, nstripes - 1)
        row_off = bh - _HALO  # window start: frame row si*bh - _HALO
    else:
        si = pl.program_id(1)
        is_halo = None
        m = bi * nstripes + si
        row_off = 0
    he = bh + 2 * _HALO

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh + row_off, he)],
            xblk.at[slot],
            sem.at[slot],
        )

    if padded_out:
        # bootstrap on the very first (halo) program; body program m
        # prefetches window m+1, halo programs issue nothing
        @pl.when((bi == 0) & (gi == 0))
        def _():
            dma(0, 0).start()

    else:
        @pl.when(m == 0)
        def _():
            dma(0, 0).start()

    def compute():
        @pl.when(m + 1 < nb * nstripes)
        def _():
            dma((m + 1) % 2, m + 1).start()

        dma(m % 2, m).wait()
        x = xblk[m % 2][:, :, :nf]  # strip the 128-lane DMA padding
        dt = out_ref.dtype
        acc_dt = jnp.bfloat16 if acc_bf16 else jnp.float32

        cols = lax.broadcasted_iota(jnp.int32, (1, wf, 1), 1)
        col_ok = (cols >= _PADL) & (cols < _PADL + w)
        out = _rdb_stage(
            x, wref, bref,
            si * bh - _HALO,
            h=h, w=w, wf=wf, nf=nf, gc=gc, dt=dt, acc_dt=acc_dt,
            col_ok=col_ok, sw5=sref,
        )
        if padded_out:
            # full-width output, zeroed outside the frame (by the stage's
            # mask): the next RDB (or the RRDB residual) consumes this
            # buffer directly as its padded input, so the W-pad columns
            # and the H-alignment rows must be exact zeros (they feed the
            # next conv's SAME padding). Channel pad lanes are zeroed too:
            # the padded form flows through the block residual.
            if cpad:
                out = jnp.concatenate(
                    [out, jnp.zeros((bh, wf, cpad), dt)], axis=2
                )
            out_ref[0] = out
        else:
            out_ref[0] = out[:, _PADL : _PADL + w, :]

    if padded_out:
        @pl.when(is_halo)
        def _():
            out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

        pl.when(~is_halo)(compute)
    else:
        compute()


# Measured VMEM anchor (v5e, 128MB): bh=64 at wf=520 compiles (~115MB with
# double-buffered in/out windows + fp32 accumulator); bh=96 at wf=520 needs
# 163MB. Clamp the stripe so (rows-in-flight) * wf stays under the anchor.
# The fused 3-RDB kernel's first stage holds bh + 28 accumulator rows, so
# its anchor counts the full telescoped halo.
_VMEM_ROWS_WF = 74 * 520
_VMEM_ROWS_WF3 = 78 * 520


def _pick_bh(
    h: int,
    wf: int,
    prefer: Tuple[int, ...] = (64, 48, 32, 16),
    halo: int = 5,
    anchor: int = _VMEM_ROWS_WF,
) -> int:
    fits = [c for c in prefer if (c + 2 * halo) * wf <= anchor]
    if not fits:
        return prefer[-1]
    for cand in fits:  # prefer a divisor (no padded rows)
        if h % cand == 0:
            return cand
    return fits[0]  # pad to a multiple


def _geometry(
    h: int, w: int, nf: int, block_h: int | None, fused: bool = False
):
    """Shared padded-form geometry: (wf, cpad, bh, hp)."""
    wf = _PADL + w + _PADL
    wf += (8 - wf % 8) % 8
    cpad = (128 - nf % 128) % 128
    if block_h is not None:
        bh = block_h
    elif fused:
        bh = _pick_bh(
            h, wf, prefer=(48, 32, 16), halo=_HALO3, anchor=_VMEM_ROWS_WF3
        )
    else:
        bh = _pick_bh(h, wf)
    hp = h + (bh - h % bh) % bh
    return wf, cpad, bh, hp


@functools.partial(jax.jit, static_argnames=("block_h", "fused"))
def pad_stripe_entry(
    x: jax.Array, block_h: int | None = None, fused: bool = False
) -> jax.Array:
    """(B, h, w, nf) -> padded stripe form (B, hp + 2*bh, Wf, nf+cpad).

    One-time entry pad for a chain of ``rdb_stripe_padded`` calls: all pad
    regions are exact zeros (SAME-conv semantics for the first RDB), and
    every padded-mode kernel re-establishes that invariant on its output,
    so the whole 23-block body runs pad-free (XLA pads before each of the
    69 RDB calls measured ~129ms/frame on v5e — 9% of the flagship step).
    The H halo is a full bh-row block (not _HALO rows) so the kernel can
    write it through the block-aligned output pipeline.
    """
    b, h, w, nf = x.shape
    wf, cpad, bh, hp = _geometry(h, w, nf, block_h, fused=fused)
    return jnp.pad(
        x,
        (
            (0, 0),
            (bh, bh + hp - h),
            (_PADL, wf - w - _PADL),
            (0, cpad),
        ),
    )


def unpad_stripe_exit(
    xp: jax.Array,
    h: int,
    w: int,
    nf: int,
    block_h: int | None = None,
    fused: bool = False,
) -> jax.Array:
    """Inverse of pad_stripe_entry (any hp)."""
    wf, _, bh, _ = _geometry(h, w, nf, block_h, fused=fused)
    return xp[:, bh : bh + h, _PADL : _PADL + w, :nf]


@functools.partial(
    jax.jit,
    static_argnames=("frame_h", "frame_w", "block_h", "interpret"),
)
def rdb_stripe_padded(
    xp: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    *,
    frame_h: int,
    frame_w: int,
    block_h: int | None = None,
    sws: Sequence[jax.Array] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused RDB forward in padded stripe form: (B, hp+2*bh, Wf, nfp) ->
    same shape, chainable (output pad regions are exact zeros; channel pad
    lanes zeroed so the padded form flows through the RRDB residual).

    No XLA ops touch the array between chained calls: the bh-row H halos
    are written as zero blocks by two extra grid steps through the same
    block-aligned output pipeline (a jnp.pad here — even H-only — rewrites
    the whole array at ~0.63ms/call on v5e).
    """
    b, hp2, wf_in, nfp = xp.shape
    nf = _wgeom(ws[0])[0]
    gc = _wgeom(ws[1])[0]
    wf, cpad, bh, hp = _geometry(frame_h, frame_w, nf, block_h)
    if (wf_in, hp2, nfp) != (wf, hp + 2 * bh, nf + cpad):
        raise ValueError(
            f"padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wf, nf + cpad)})"
        )
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = _wcast(ws, xp.dtype)
    scale3 = _scale3(sws)
    nstripes = hp // bh

    kernel = functools.partial(
        _rdb_stripe_kernel,
        quant=sws is not None,
        bh=bh, h=frame_h, w=frame_w, wf=wf, nf=nf, gc=gc,
        nstripes=nstripes, nb=b, acc_bf16=False,
        padded_out=True, cpad=cpad,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nstripes + 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (10 + len(scale3)),
        out_specs=pl.BlockSpec(
            (1, bh, wf, nf + cpad), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hp + 2 * bh, wf, nf + cpad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2 * _HALO, wf, nf + cpad), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *wlist, *bias3, *scale3)


def _wcast(ws, dt):
    """Cast weights to the activation dtype — except int8 quantized
    weights (W8A8 path), which stay int8 for the MXU."""
    return [
        wi if wi.dtype == jnp.int8 else wi.astype(dt) for wi in ws
    ]


def fold_static_act_scales(sws, sas):
    """Pre-fold static activation scales into the per-channel weight
    scales (host-side, once per model): the static-A8 kernel epilogue
    then dequantizes with ONE `* sw` multiply and carries no per-chunk
    scalar. ``sas`` is a 5-tuple of python floats (calibrate_rdb_act_
    scales); returns the folded sws in the same layouts."""
    if sws is None or sas is None:
        raise ValueError("fold_static_act_scales needs both sws and sas")
    return tuple(
        s * jnp.float32(float(a)) for s, a in zip(sws, sas)
    )


def _scale3(sws):
    """(.., cout) fp32 weight scales -> (1, 1, cout) kernel operands
    (empty list when the call is not quantized)."""
    if sws is None:
        return []
    return [s.reshape(1, 1, -1).astype(jnp.float32) for s in sws]


_HALO3 = 3 * _HALO  # telescoped halo of the 3-RDB fused chain


def _rrdb_stripe_kernel(
    xp_ref,  # (B, hp + 2*bh, Wf, nfp) in ANY/HBM — padded stripe form
    *refs,  # 15 weight refs, 15 bias refs, out_ref, xblk, sem
    bh: int,
    h: int,
    w: int,
    wf: int,
    nf: int,
    gc: int,
    nstripes: int,
    nb: int,
    cpad: int,
):
    """Whole-RRDB fused stripe kernel: 3 chained RDB stages + the RRDB
    0.2-residual in one program. The halos telescope (the stage for RDB k
    computes bh + 2*(3-k)*_HALO rows), so total compute equals three
    separate stripe kernels at the same bh — but the two intermediate
    HBM round-trips vanish and the block residual is free (the input
    stripe is already in VMEM). Replaces the separate XLA residual
    multiply-add, which measured 0.59ms/block on the padded 68MB arrays
    (82ms/frame on the flagship shape)."""
    ws = refs[0:15]  # rdb-major: ws[5*r + k]
    bs = refs[15:30]
    out_ref = refs[30]
    xblk = refs[31]
    sem = refs[32]
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    si = gi - 1
    is_halo = (gi == 0) | (gi == nstripes + 1)
    m = bi * nstripes + jnp.clip(si, 0, nstripes - 1)
    he = bh + 2 * _HALO3
    row_off = bh - _HALO3  # window start: frame row si*bh - _HALO3

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh + row_off, he)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when((bi == 0) & (gi == 0))
    def _():
        dma(0, 0).start()

    def compute():
        @pl.when(m + 1 < nb * nstripes)
        def _():
            dma((m + 1) % 2, m + 1).start()

        dma(m % 2, m).wait()
        x = xblk[m % 2][:, :, :nf]
        dt = out_ref.dtype
        cols = lax.broadcasted_iota(jnp.int32, (1, wf, 1), 1)
        col_ok = (cols >= _PADL) & (cols < _PADL + w)

        t = x
        top = si * bh - _HALO3
        for r in range(3):
            t = _rdb_stage(
                t, ws[5 * r : 5 * r + 5], bs[5 * r : 5 * r + 5], top,
                h=h, w=w, wf=wf, nf=nf, gc=gc, dt=dt,
                acc_dt=jnp.float32, col_ok=col_ok,
            )
            top += _HALO
        # RRDB residual; both terms are exact zeros outside the frame, so
        # the padded-form invariant holds without further masking
        x0c = x[_HALO3 : _HALO3 + bh, :, :].astype(jnp.float32)
        out = (x0c + 0.2 * t.astype(jnp.float32)).astype(dt)
        if cpad:
            out = jnp.concatenate(
                [out, jnp.zeros((bh, wf, cpad), dt)], axis=2
            )
        out_ref[0] = out

    @pl.when(is_halo)
    def _():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    pl.when(~is_halo)(compute)


@functools.partial(
    jax.jit,
    static_argnames=("frame_h", "frame_w", "block_h", "interpret"),
)
def rrdb_stripe_padded(
    xp: jax.Array,
    ws: Sequence[jax.Array],  # 15 prefix-form weights, rdb-major
    bs: Sequence[jax.Array],  # 15 biases, rdb-major
    *,
    frame_h: int,
    frame_w: int,
    block_h: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Whole RRDB (3 fused RDBs + residual) in padded stripe form:
    (B, hp+2*bh, Wf, nfp) -> same shape, chainable across the 23-block
    body with zero XLA ops in between."""
    b, hp2, wf_in, nfp = xp.shape
    nf = _wgeom(ws[0])[0]
    gc = _wgeom(ws[1])[0]
    wf, cpad, bh, hp = _geometry(frame_h, frame_w, nf, block_h, fused=True)
    if (wf_in, hp2, nfp) != (wf, hp + 2 * bh, nf + cpad):
        raise ValueError(
            f"padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wf, nf + cpad)})"
        )
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = [wi.astype(xp.dtype) for wi in ws]
    nstripes = hp // bh

    kernel = functools.partial(
        _rrdb_stripe_kernel,
        bh=bh, h=frame_h, w=frame_w, wf=wf, nf=nf, gc=gc,
        nstripes=nstripes, nb=b, cpad=cpad,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nstripes + 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 30,
        out_specs=pl.BlockSpec(
            (1, bh, wf, nf + cpad), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hp + 2 * bh, wf, nf + cpad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2 * _HALO3, wf, nf + cpad), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *wlist, *bias3)


def _rdb_res_stripe_kernel(
    xp_ref,  # (B, hp + 2*bh, Wf, nfp) ANY — rdb2 output, padded form
    x0_ref,  # (B, hp + 2*bh, Wf, nfp) ANY — block input, ALIASED to out
    *refs,  # 5 weights, 5 biases, [5 scales], out, xblk, x0blk, sem, sem0
    quant: bool = False,
    bh: int,
    h: int,
    w: int,
    wf: int,
    nf: int,
    gc: int,
    nstripes: int,
    nb: int,
    cpad: int,
):
    """rdb3 + the RRDB 0.2-residual in one kernel. The output buffer is
    the block-input buffer (input_output_aliases): only body row-blocks
    are written, so the pad-zero invariant is inherited rather than
    re-written — no halo grid steps. Replaces the separate XLA residual
    multiply-add (0.59ms/block on the 68MB padded arrays, 82ms/frame).
    The x0 stripe DMA is issued at program start and waited only in the
    epilogue, hidden under ~1ms of conv compute."""
    nw = 15 if quant else 10
    wref = refs[0:5]
    bref = refs[5:10]
    sref = refs[10:15] if quant else None
    out_ref, xblk, x0blk, sem, sem0 = refs[nw : nw + 5]
    bi = pl.program_id(0)
    si = pl.program_id(1)
    m = bi * nstripes + si
    he = bh + 2 * _HALO
    row_off = bh - _HALO

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh + row_off, he)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()

    dma0 = pltpu.make_async_copy(
        x0_ref.at[bi, pl.ds(bh + si * bh, bh)], x0blk, sem0.at[0]
    )
    dma0.start()

    @pl.when(m + 1 < nb * nstripes)
    def _():
        dma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()
    x = xblk[m % 2][:, :, :nf]
    dt = out_ref.dtype
    cols = lax.broadcasted_iota(jnp.int32, (1, wf, 1), 1)
    col_ok = (cols >= _PADL) & (cols < _PADL + w)
    t = _rdb_stage(
        x, wref, bref,
        si * bh - _HALO,
        h=h, w=w, wf=wf, nf=nf, gc=gc, dt=dt, acc_dt=jnp.float32,
        col_ok=col_ok, sw5=sref,
    )
    dma0.wait()
    x0c = x0blk[:, :, :nf].astype(jnp.float32)
    out = (x0c + 0.2 * t.astype(jnp.float32)).astype(dt)
    if cpad:
        out = jnp.concatenate([out, jnp.zeros((bh, wf, cpad), dt)], axis=2)
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("frame_h", "frame_w", "block_h", "interpret"),
)
def rdb_res_stripe_padded(
    xp: jax.Array,
    x0: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    *,
    frame_h: int,
    frame_w: int,
    block_h: int | None = None,
    sws: Sequence[jax.Array] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """rdb3 + RRDB residual in padded stripe form: returns
    x0 + 0.2 * rdb(xp), same padded shape, chainable. ``x0`` (the block
    input) is donated — its buffer becomes the output."""
    b, hp2, wf_in, nfp = xp.shape
    nf = _wgeom(ws[0])[0]
    gc = _wgeom(ws[1])[0]
    wf, cpad, bh, hp = _geometry(frame_h, frame_w, nf, block_h)
    if (wf_in, hp2, nfp) != (wf, hp + 2 * bh, nf + cpad):
        raise ValueError(
            f"padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wf, nf + cpad)})"
        )
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = _wcast(ws, xp.dtype)
    scale3 = _scale3(sws)
    nstripes = hp // bh

    kernel = functools.partial(
        _rdb_res_stripe_kernel,
        quant=sws is not None,
        bh=bh, h=frame_h, w=frame_w, wf=wf, nf=nf, gc=gc,
        nstripes=nstripes, nb=b, cpad=cpad,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (10 + len(scale3)),
        out_specs=pl.BlockSpec(
            (1, bh, wf, nf + cpad), lambda bb, i: (bb, i + 1, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hp + 2 * bh, wf, nf + cpad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2 * _HALO, wf, nf + cpad), xp.dtype),
            pltpu.VMEM((bh, wf, nf + cpad), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, x0, *wlist, *bias3, *scale3)


# ---------------------------------------------------------------------------
# 2D-blocked padded stripe form (round 3): H stripes x W blocks.
#
# The full-width stripe form caps bh by VMEM (rows-in-flight * Wf <= anchor),
# which forces small tiles: at the flagship frame width (1920) a full-width
# stripe fits only bh<=16 ((bh+10)/bh = 1.63x halo overhead), so production
# ran 12 overlapping 384x504 tiles instead (12% overlap MACs + 19% stripe
# halo = 1.34x the ideal MAC count). Splitting W into bw-col blocks with an
# 8-col margin each side bounds VMEM at (bh+10)*(bw+16) for ANY frame width:
# the whole 1080p frame runs as one padded array at e.g. bh=135, bw=240
# (1.074 x 1.067 = 1.15x overhead) — no tile overlap, no per-tile XLA glue.
# Matches the workload the reference runs per tile via cuDNN
# (/root/reference/video_upscaler.py:313-315,501).
#
# W-margin mechanics (no extension columns in the array): each program DMAs
# a clamped (he, bw + 16) window; the two frame-edge W blocks shift their
# window by the 8-col margin with a static concat (zeros enter at the
# virtual out-of-frame columns), so the padded array is exactly
# (B, hp + 2*bh, nwb*bw, nfp). Roll-wrap garbage telescopes inside the
# margin exactly as it does inside _PADL in the full-width form. H keeps
# the proven bh-row zero-halo-block scheme.
# ---------------------------------------------------------------------------

_MW = 8  # W-block margin columns (sublane-aligned; >= _HALO + 1 spare)


def _stripe_rc_default(bh: int) -> int | None:
    """Default row chunk for the 2D-blocked kernels: None (monolithic)
    for short blocks where the fp32 accumulator already fits, 64 rows for
    tall blocks (the round-4 chunked-accumulator form that lifts the
    bh<=135 VMEM ceiling). VRT_STRIPE_RC overrides (0 = monolithic)."""
    import os

    v = os.environ.get("VRT_STRIPE_RC")
    if v is not None and v.isdigit():
        return int(v) or None
    return None if bh <= 160 else 64


def _pick_bh_bw(
    h: int,
    w: int,
    anchor: int = _VMEM_ROWS_WF,
    chunked: bool = False,
) -> Tuple[int, int]:
    """Choose (bh, bw) minimizing total MAC overhead
    ((bh+10)/bh * (bw+16)/bw * hp*wp/(h*w)) subject to a VMEM constraint
    and nwb >= 2.

    ``chunked=False``: the round-3 monolithic-accumulator model — the
    fp32 prefix accumulator spans the window height, so rows-in-flight *
    window width is bounded by ``anchor`` (empirical: bh=135 at bw=240).

    ``chunked=True`` (round 4): the row-chunked stage bounds the fp32
    live set at O(rc), so VMEM is set by the bf16 window/output buffers:
    double-buffered (bh+10)x(bw+16)x128 windows + pipelined bh x bw x 128
    output blocks + ~35MB of chunked temporaries. Constraint:
    (bh+10)*(bw+16) + bh*bw <= 180_000 half-pixel units (512B each,
    ~92MB + slack under the 127MB limit)."""
    best = None
    for bw in range(64, 513, 8):
        nwb = -(-w // bw)
        if nwb < 2:
            continue
        bwf = bw + 2 * _MW
        if chunked:
            bh_max = 16
            for bh in range(16, 513):
                # second bound: the measured Mosaic compile cliff —
                # windows beyond ~58k px hang the server-side compile
                # (BENCH_NOTES round 4)
                if (
                    (bh + 2 * _HALO) * bwf + bh * bw > 180_000
                    or (bh + 2 * _HALO) * bwf > 58_000
                ):
                    break
                bh_max = bh
        else:
            bh_max = anchor // bwf - 2 * _HALO
        if bh_max < 16:
            continue
        cands = [min(bh_max, 512)]
        for bh in range(min(bh_max, 512), 15, -1):  # largest exact divisor
            if h % bh == 0 and bh not in cands:
                cands.append(bh)
                break
        for bh in cands:
            hp = -(-h // bh) * bh
            wp = nwb * bw
            cost = (
                (bh + 2 * _HALO) / bh * bwf / bw * (hp * wp) / (h * w)
            )
            if best is None or cost < best[0]:
                best = (cost, bh, bw)
    if best is None:  # frame too narrow for 2 W blocks
        raise ValueError(f"no 2D stripe geometry for {h}x{w}")
    return best[1], best[2]


def stripe2d_supported(h: int, w: int) -> bool:
    try:
        _pick_bh_bw(h, w)
        return True
    except ValueError:
        return False


def stripe2d_selection(h: int, w: int) -> Tuple[int, int] | None:
    """Production 2D-block selection for a (h, w) body grid: None keeps
    the full-width stripe form.

    Measured on v5e (tools/bench_rdb.py, padded chains, same harness):
    at tile widths the full-width form wins (71.3 vs 64.4 TF/s useful at
    384x504 — narrow W blocks pay margin/edge costs for no bh gain), but
    at full-frame widths full-width would need bh<=16 (1.63x halo), while
    2D at bh=135/bw=240 reaches 72.8 TF/s on frame MACs vs the tiled
    body's 63.6 effective (tile overlap included) — +14.5%. So "auto" =
    full-width whenever a bh>=64 stripe fits the width, 2D otherwise.
    VRT_STRIPE2D: auto (default), 0 (always full-width), BHxBW (forced).
    """
    import os

    v = os.environ.get("VRT_STRIPE2D", "auto")
    if v in ("0", ""):
        return None
    if v not in ("auto", "1"):
        try:
            bh_s, bw_s = v.lower().split("x")
            return int(bh_s), int(bw_s)
        except ValueError:
            pass
    if v != "1":
        wf = _PADL + w + _PADL
        wf += (8 - wf % 8) % 8
        if (64 + 2 * _HALO) * wf <= _VMEM_ROWS_WF:
            return None  # full-width bh=64 fits: tiles stay full-width
    try:
        return _pick_bh_bw(h, w)
    except ValueError:
        return None


def _geometry2d(
    h: int,
    w: int,
    nf: int,
    block_h: int | None,
    block_w: int | None,
):
    """(bh, bw, ns, nwb, hp, wp, cpad) for the 2D-blocked padded form."""
    cpad = (128 - nf % 128) % 128
    if block_h is not None and block_w is not None:
        bh, bw = block_h, block_w
    else:
        bh, bw = _pick_bh_bw(h, w)
    if bw % 8:
        raise ValueError(f"block_w must be a multiple of 8 (got {bw})")
    ns = -(-h // bh)
    nwb = -(-w // bw)
    if nwb < 2:
        raise ValueError(
            f"2D stripe form needs >= 2 W blocks (w={w}, bw={bw})"
        )
    return bh, bw, ns, nwb, ns * bh, nwb * bw, cpad


@functools.partial(jax.jit, static_argnames=("block_h", "block_w"))
def pad_stripe2d_entry(
    x: jax.Array,
    block_h: int | None = None,
    block_w: int | None = None,
) -> jax.Array:
    """(B, h, w, nf) -> 2D padded stripe form (B, hp + 2*bh, wp, nf+cpad).

    All pad regions are exact zeros (SAME-conv semantics for the first
    RDB); every chained kernel re-establishes the invariant via its
    frame-masked output blocks."""
    b, h, w, nf = x.shape
    bh, bw, ns, nwb, hp, wp, cpad = _geometry2d(h, w, nf, block_h, block_w)
    return jnp.pad(
        x, ((0, 0), (bh, bh + hp - h), (0, wp - w), (0, cpad))
    )


def unpad_stripe2d_exit(
    xp: jax.Array,
    h: int,
    w: int,
    nf: int,
    block_h: int | None = None,
    block_w: int | None = None,
) -> jax.Array:
    """Inverse of pad_stripe2d_entry."""
    bh = _geometry2d(h, w, nf, block_h, block_w)[0]
    return xp[:, bh : bh + h, :w, :nf]


def _stripe2d_window(xblk, slot, wi, nwb, he, bwf, dt, mw: int = _MW):
    """Post-DMA margin fixup for the frame-edge W blocks: shift the
    clamped window onto the virtual [c0, c0+bwf) column range, zeros in
    the out-of-frame margin (static concats only — Mosaic rotates 32-bit
    data only, and these windows are bf16)."""

    @pl.when(wi == 0)
    def _():
        win = xblk[slot]
        z = jnp.zeros((he, mw, win.shape[-1]), dt)
        xblk[slot] = jnp.concatenate([z, win[:, :-mw]], axis=1)

    @pl.when(wi == nwb - 1)
    def _():
        win = xblk[slot]
        z = jnp.zeros((he, mw, win.shape[-1]), dt)
        xblk[slot] = jnp.concatenate([win[:, mw:], z], axis=1)


def _rdb_stripe2d_kernel(
    xp_ref,  # (B, hp + 2*bh, wp, nfp) ANY/HBM — 2D padded input
    *refs,  # 5 weights, 5 biases, [5 scales], out_ref, xblk, sem
    quant: bool = False,
    sas: tuple | None = None,
    bh: int,
    bw: int,
    h: int,
    w: int,
    wp: int,
    nf: int,
    gc: int,
    ns: int,
    nwb: int,
    nb: int,
    cpad: int,
    rc: int | None = None,
):
    # out_ref: (1, bh, bw, nfp) VMEM block at (batch, row-block, W-block);
    # xblk: (2, he, bwf, nfp) double-buffer scratch; sem: DMA semaphores
    nw = 15 if quant else 10
    wref = refs[0:5]
    bref = refs[5:10]
    sref = refs[10:15] if quant else None
    out_ref, xblk, sem = refs[nw], refs[nw + 1], refs[nw + 2]
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    wi = pl.program_id(2)
    si = gi - 1
    is_halo = (gi == 0) | (gi == ns + 1)
    m = (bi * ns + jnp.clip(si, 0, ns - 1)) * nwb + wi
    he = bh + 2 * _HALO
    bwf = bw + 2 * _MW
    row_off = bh - _HALO  # window start: frame row si*bh - _HALO

    def dma(slot, idx):
        bb = idx // (ns * nwb)
        rem = idx % (ns * nwb)
        ii = rem // nwb
        jj = rem % nwb
        c0c = pl.multiple_of(
            jnp.clip(jj * bw - _MW, 0, wp - bwf), 8
        )  # bw, _MW, wp, bwf are all multiples of 8
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh + row_off, he), pl.ds(c0c, bwf)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when((bi == 0) & (gi == 0) & (wi == 0))
    def _():
        dma(0, 0).start()

    # NOTE (measured dead-end): branching edge vs interior programs to
    # skip the frame masks for interior blocks (masks = ~2.2% of frame
    # time, VRT_NOMASK probe) VMEM-OOMs — Mosaic allocates both pl.when
    # branch bodies' scoped buffers concurrently (166MB > 128MB), so the
    # dual-body kernel cannot fit at production geometry.
    def compute():
        @pl.when(m + 1 < nb * ns * nwb)
        def _():
            dma((m + 1) % 2, m + 1).start()

        dma(m % 2, m).wait()
        dt = out_ref.dtype
        _stripe2d_window(xblk, m % 2, wi, nwb, he, bwf, dt)
        x = xblk[m % 2][:, :, :nf]

        cols = lax.broadcasted_iota(jnp.int32, (1, bwf, 1), 1)
        gcol = cols + (wi * bw - _MW)
        col_ok = (gcol >= 0) & (gcol < w)
        out = _rdb_stage(
            x, wref, bref,
            si * bh - _HALO,
            h=h, w=w, wf=bwf, nf=nf, gc=gc, dt=dt,
            acc_dt=jnp.float32, col_ok=col_ok, rc=rc, sw5=sref, sas=sas,
        )
        out = out[:, _MW : _MW + bw, :]
        if cpad:
            out = jnp.concatenate(
                [out, jnp.zeros((bh, bw, cpad), dt)], axis=2
            )
        out_ref[0] = out

    @pl.when(is_halo)
    def _():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    pl.when(~is_halo)(compute)


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_h", "frame_w", "block_h", "block_w", "row_chunk",
        "sas", "interpret",
    ),
)
def rdb_stripe2d_padded(
    xp: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    *,
    frame_h: int,
    frame_w: int,
    block_h: int | None = None,
    block_w: int | None = None,
    row_chunk: int | None = None,
    sws: Sequence[jax.Array] | None = None,
    sas: tuple | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused RDB forward in 2D padded stripe form: (B, hp+2*bh, wp, nfp)
    -> same shape, chainable (pad regions exact zeros). ``row_chunk``
    selects the chunked-accumulator stage form (None = auto by bh)."""
    b, hp2, wp_in, nfp = xp.shape
    nf = _wgeom(ws[0])[0]
    gc = _wgeom(ws[1])[0]
    bh, bw, ns, nwb, hp, wp, cpad = _geometry2d(
        frame_h, frame_w, nf, block_h, block_w
    )
    if (hp2, wp_in, nfp) != (hp + 2 * bh, wp, nf + cpad):
        raise ValueError(
            f"2D padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wp, nf + cpad)})"
        )
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = _wcast(ws, xp.dtype)
    if sas is not None:
        sws = fold_static_act_scales(sws, sas)
    scale3 = _scale3(sws)

    kernel = functools.partial(
        _rdb_stripe2d_kernel,
        quant=sws is not None,
        sas=sas,
        bh=bh, bw=bw, h=frame_h, w=frame_w, wp=wp, nf=nf, gc=gc,
        ns=ns, nwb=nwb, nb=b, cpad=cpad,
        rc=_stripe_rc_default(bh) if row_chunk is None else (row_chunk or None),
    )
    return pl.pallas_call(
        kernel,
        grid=(b, ns + 2, nwb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (10 + len(scale3)),
        out_specs=pl.BlockSpec(
            (1, bh, bw, nf + cpad),
            lambda bb, i, j: (bb, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hp + 2 * bh, wp, nf + cpad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, bh + 2 * _HALO, bw + 2 * _MW, nf + cpad), xp.dtype
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *wlist, *bias3, *scale3)


def _rdb_res_stripe2d_kernel(
    xp_ref,  # (B, hp + 2*bh, wp, nfp) ANY — rdb2 output, 2D padded form
    x0_ref,  # (B, hp + 2*bh, wp, nfp) ANY — block input, ALIASED to out
    *refs,  # 5 weights, 5 biases, [5 scales], out, xblk, x0blk, sem, sem0
    quant: bool = False,
    bh: int,
    bw: int,
    h: int,
    w: int,
    wp: int,
    nf: int,
    gc: int,
    ns: int,
    nwb: int,
    nb: int,
    cpad: int,
    rc: int | None = None,
):
    """rdb3 + RRDB 0.2-residual, 2D-blocked. Output aliases the block
    input's buffer: only body blocks are written, the pad-zero invariant
    is inherited — no halo grid steps."""
    nw = 15 if quant else 10
    wref = refs[0:5]
    bref = refs[5:10]
    sref = refs[10:15] if quant else None
    out_ref, xblk, x0blk, sem, sem0 = refs[nw : nw + 5]
    bi = pl.program_id(0)
    si = pl.program_id(1)
    wi = pl.program_id(2)
    m = (bi * ns + si) * nwb + wi
    he = bh + 2 * _HALO
    bwf = bw + 2 * _MW
    row_off = bh - _HALO

    def dma(slot, idx):
        bb = idx // (ns * nwb)
        rem = idx % (ns * nwb)
        ii = rem // nwb
        jj = rem % nwb
        c0c = pl.multiple_of(
            jnp.clip(jj * bw - _MW, 0, wp - bwf), 8
        )  # bw, _MW, wp, bwf are all multiples of 8
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh + row_off, he), pl.ds(c0c, bwf)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()

    dma0 = pltpu.make_async_copy(
        x0_ref.at[
            bi,
            pl.ds(bh + si * bh, bh),
            pl.ds(pl.multiple_of(wi * bw, 8), bw),
        ],
        x0blk,
        sem0.at[0],
    )
    dma0.start()

    @pl.when(m + 1 < nb * ns * nwb)
    def _():
        dma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()
    dt = out_ref.dtype
    _stripe2d_window(xblk, m % 2, wi, nwb, he, bwf, dt)
    x = xblk[m % 2][:, :, :nf]
    cols = lax.broadcasted_iota(jnp.int32, (1, bwf, 1), 1)
    gcol = cols + (wi * bw - _MW)
    col_ok = (gcol >= 0) & (gcol < w)
    t = _rdb_stage(
        x, wref, bref,
        si * bh - _HALO,
        h=h, w=w, wf=bwf, nf=nf, gc=gc, dt=dt,
        acc_dt=jnp.float32, col_ok=col_ok, rc=rc, sw5=sref,
    )
    t = t[:, _MW : _MW + bw, :]
    dma0.wait()
    x0c = x0blk[:, :, :nf].astype(jnp.float32)
    out = (x0c + 0.2 * t.astype(jnp.float32)).astype(dt)
    if cpad:
        out = jnp.concatenate([out, jnp.zeros((bh, bw, cpad), dt)], axis=2)
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_h", "frame_w", "block_h", "block_w", "row_chunk", "interpret",
    ),
)
def rdb_res_stripe2d_padded(
    xp: jax.Array,
    x0: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    *,
    frame_h: int,
    frame_w: int,
    block_h: int | None = None,
    block_w: int | None = None,
    row_chunk: int | None = None,
    sws: Sequence[jax.Array] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """rdb3 + RRDB residual in 2D padded stripe form: returns
    x0 + 0.2 * rdb(xp), same padded shape, chainable. ``x0`` is donated —
    its buffer becomes the output."""
    b, hp2, wp_in, nfp = xp.shape
    nf = _wgeom(ws[0])[0]
    gc = _wgeom(ws[1])[0]
    bh, bw, ns, nwb, hp, wp, cpad = _geometry2d(
        frame_h, frame_w, nf, block_h, block_w
    )
    if (hp2, wp_in, nfp) != (hp + 2 * bh, wp, nf + cpad):
        raise ValueError(
            f"2D padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wp, nf + cpad)})"
        )
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = _wcast(ws, xp.dtype)
    scale3 = _scale3(sws)

    kernel = functools.partial(
        _rdb_res_stripe2d_kernel,
        quant=sws is not None,
        bh=bh, bw=bw, h=frame_h, w=frame_w, wp=wp, nf=nf, gc=gc,
        ns=ns, nwb=nwb, nb=b, cpad=cpad,
        rc=_stripe_rc_default(bh) if row_chunk is None else (row_chunk or None),
    )
    return pl.pallas_call(
        kernel,
        grid=(b, ns, nwb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (10 + len(scale3)),
        out_specs=pl.BlockSpec(
            (1, bh, bw, nf + cpad),
            lambda bb, i, j: (bb, i + 1, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hp + 2 * bh, wp, nf + cpad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, bh + 2 * _HALO, bw + 2 * _MW, nf + cpad), xp.dtype
            ),
            pltpu.VMEM((bh, bw, nf + cpad), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, x0, *wlist, *bias3, *scale3)


# ---------------------------------------------------------------------------
# Split edge/interior launches (round 4): the frame masks measured ~2.2%
# of flagship frame time (VRT_NOMASK probe), but skipping them needs
# per-block knowledge of whether the window touches a frame edge.
# Branching inside one kernel is a measured dead-end (pl.when allocates
# both branch bodies' scratch concurrently -> VMEM OOM), so instead the
# RDB runs as up to THREE pallas_calls over disjoint block sets, chained
# by mandatory aliasing (input_output_aliases — no copies):
#
#   rows: the si=0 / si=ns-1 row-blocks (+ the zero-halo blocks for the
#         non-res form), full masks;
#   cols: the wi=0 / wi=nwb-1 column-blocks of interior rows, full masks;
#   int:  fully-interior blocks — NO masks (their windows never touch a
#         frame edge; roll-wrap garbage telescopes inside the _MW margin
#         exactly as in the masked form).
#
# Interior safety requires the adjacent-to-edge blocks' windows to stay
# in-frame: (ns-1)*bh + _HALO <= h and (nwb-1)*bw + _MW <= w (always true
# for exact-divisor grids); otherwise the caller falls back to the
# single-call kernel.
# ---------------------------------------------------------------------------


def _rdb_stripe2d_part_kernel(
    *refs,
    part: str,  # "rows" | "cols" | "int"
    res: bool,  # apply the RRDB residual (x0 read from prev_ref)
    has_prev: bool,  # a prev/alias input follows xp_ref
    nomask: bool,
    quant: bool = False,
    sas: tuple | None = None,
    bh: int,
    bw: int,
    h: int,
    w: int,
    wp: int,
    nf: int,
    gc: int,
    ns: int,
    nwb: int,
    nb: int,
    cpad: int,
    rc: int | None,
):
    xp_ref = refs[0]
    prev_ref = refs[1] if has_prev else None
    base = 1 + int(has_prev)
    nw = 15 if quant else 10
    wref = refs[base : base + 5]
    bref = refs[base + 5 : base + 10]
    sref = refs[base + 10 : base + 15] if quant else None
    out_ref = refs[base + nw]
    scratch = refs[base + nw + 1 :]
    xblk, sem = scratch[0], scratch[1]
    if res:
        x0blk, sem0 = scratch[2], scratch[3]
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    ji = pl.program_id(2)
    he = bh + 2 * _HALO
    bwf = bw + 2 * _MW
    row_off = bh - _HALO

    # part-specific decode: (si, wi) of THIS program, body-program count
    # per batch (nbp), flat->(si, wi) for the prefetch, and halo handling
    if part == "rows":
        if res:
            si = gi * (ns - 1)
            is_halo = None
        else:
            si = (jnp.clip(gi, 1, 2) - 1) * (ns - 1)
            is_halo = (gi == 0) | (gi == 3)
        wi = ji
        nbp = 2 * nwb

        def decode(r):
            return (r // nwb) * (ns - 1), r % nwb

    elif part == "cols":
        si = gi + 1
        wi = ji * (nwb - 1)
        is_halo = None
        nbp = (ns - 2) * 2

        def decode(r):
            return r // 2 + 1, (r % 2) * (nwb - 1)

    elif part == "int":
        si = gi + 1
        wi = ji + 1
        is_halo = None
        nbp = (ns - 2) * (nwb - 2)

        def decode(r):
            return r // (nwb - 2) + 1, r % (nwb - 2) + 1

    else:  # pragma: no cover
        raise ValueError(part)

    # flat body-program counter (halo programs alias a neighbour's m but
    # never touch the DMA machinery)
    if part == "rows":
        gb = gi if res else jnp.clip(gi, 1, 2) - 1
        m = (bi * 2 + gb) * nwb + ji
    elif part == "cols":
        m = bi * nbp + gi * 2 + ji
    else:
        m = bi * nbp + gi * (nwb - 2) + ji

    def dma(slot, idx):
        bb = idx // nbp
        r = idx % nbp
        si_d, wi_d = decode(r)
        c0c = pl.multiple_of(
            jnp.clip(wi_d * bw - _MW, 0, wp - bwf), 8
        )  # bw, _MW, wp, bwf are all multiples of 8
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(si_d * bh + row_off, he), pl.ds(c0c, bwf)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when((bi == 0) & (gi == 0) & (ji == 0))
    def _():
        dma(0, 0).start()

    def compute():
        if res:
            dma0 = pltpu.make_async_copy(
                prev_ref.at[
                    bi,
                    pl.ds(bh + si * bh, bh),
                    pl.ds(pl.multiple_of(wi * bw, 8), bw),
                ],
                x0blk,
                sem0.at[0],
            )
            dma0.start()

        @pl.when(m + 1 < nb * nbp)
        def _():
            dma((m + 1) % 2, m + 1).start()

        dma(m % 2, m).wait()
        dt = out_ref.dtype
        _stripe2d_window(xblk, m % 2, wi, nwb, he, bwf, dt)
        x = xblk[m % 2][:, :, :nf]
        if nomask:
            col_ok = None
        else:
            cols = lax.broadcasted_iota(jnp.int32, (1, bwf, 1), 1)
            gcol = cols + (wi * bw - _MW)
            col_ok = (gcol >= 0) & (gcol < w)
        t = _rdb_stage(
            x, wref, bref,
            si * bh - _HALO,
            h=h, w=w, wf=bwf, nf=nf, gc=gc, dt=dt,
            acc_dt=jnp.float32, col_ok=col_ok, rc=rc, nomask=nomask,
            sw5=sref, sas=sas,
        )
        t = t[:, _MW : _MW + bw, :]
        if res:
            dma0.wait()
            x0c = x0blk[:, :, :nf].astype(jnp.float32)
            t = (x0c + 0.2 * t.astype(jnp.float32)).astype(dt)
        if cpad:
            t = jnp.concatenate([t, jnp.zeros((bh, bw, cpad), dt)], axis=2)
        out_ref[0] = t

    if is_halo is None:
        compute()
    else:
        @pl.when(is_halo)
        def _():
            out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

        pl.when(~is_halo)(compute)


def stripe2d_split_ok(
    frame_h: int, frame_w: int, bh: int, bw: int
) -> bool:
    """Split launches need an interior and in-frame edge-adjacent
    windows; VRT_SPLIT=0 disables."""
    import os

    if os.environ.get("VRT_SPLIT", "1") == "0":
        return False
    ns = -(-frame_h // bh)
    nwb = -(-frame_w // bw)
    return (
        ns >= 3
        and nwb >= 3
        and (ns - 1) * bh + _HALO <= frame_h
        and (nwb - 1) * bw + _MW <= frame_w
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_h", "frame_w", "block_h", "block_w", "row_chunk",
        "res", "sas", "interpret",
    ),
)
def rdb_stripe2d_split(
    xp: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    *,
    frame_h: int,
    frame_w: int,
    block_h: int,
    block_w: int,
    x0: jax.Array | None = None,
    row_chunk: int | None = None,
    res: bool = False,
    sws: Sequence[jax.Array] | None = None,
    sas: tuple | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused RDB (optionally + RRDB residual when ``res``/``x0``) in 2D
    padded stripe form, as split edge/interior pallas_call launches: the
    masked ring runs in two calls (rows, cols) and the mask-free interior
    in a third, chained by mandatory aliasing. Caller must check
    stripe2d_split_ok first."""
    b, hp2, wp_in, nfp = xp.shape
    nf = _wgeom(ws[0])[0]
    gc = _wgeom(ws[1])[0]
    bh, bw, ns, nwb, hp, wp, cpad = _geometry2d(
        frame_h, frame_w, nf, block_h, block_w
    )
    if (hp2, wp_in, nfp) != (hp + 2 * bh, wp, nf + cpad):
        raise ValueError(
            f"2D padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wp, nf + cpad)})"
        )
    if res != (x0 is not None):
        raise ValueError("res=True requires x0 (and vice versa)")
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = _wcast(ws, xp.dtype)
    if sas is not None:
        sws = fold_static_act_scales(sws, sas)
    scale3 = _scale3(sws)
    rc = _stripe_rc_default(bh) if row_chunk is None else (row_chunk or None)

    kw = dict(
        res=res, bh=bh, bw=bw, h=frame_h, w=frame_w, wp=wp, nf=nf, gc=gc,
        ns=ns, nwb=nwb, nb=b, cpad=cpad, rc=rc,
    )
    out_shape = jax.ShapeDtypeStruct(
        (b, hp + 2 * bh, wp, nf + cpad), xp.dtype
    )
    base_scratch = [
        pltpu.VMEM((2, bh + 2 * _HALO, bw + 2 * _MW, nf + cpad), xp.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    res_scratch = [
        pltpu.VMEM((bh, bw, nf + cpad), xp.dtype),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        vmem_limit_bytes=127 * 1024 * 1024,
    )
    obs = lambda im: pl.BlockSpec(  # noqa: E731
        (1, bh, bw, nf + cpad), im, memory_space=pltpu.VMEM
    )

    def call(part, nomask, grid, index_map, prev):
        kernel = functools.partial(
            _rdb_stripe2d_part_kernel,
            part=part, nomask=nomask, has_prev=prev is not None,
            quant=sws is not None, sas=sas, **kw
        )
        ins = (
            [xp] + ([prev] if prev is not None else [])
            + wlist + bias3 + scale3
        )
        nconst = 10 + len(scale3)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            * (len(ins) - nconst)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nconst,
            out_specs=obs(index_map),
            out_shape=out_shape,
            scratch_shapes=base_scratch + (res_scratch if res else []),
            input_output_aliases=(
                {1: 0} if prev is not None else {}
            ),
            compiler_params=params,
            interpret=interpret,
        )(*ins)

    if res:
        # x0 is both the residual source and the alias chain seed; halo
        # blocks inherit x0's pad zeros (never rewritten)
        o = call(
            "rows", False, (b, 2, nwb),
            lambda bb, i, j: (bb, i * (ns - 1) + 1, j, 0), x0,
        )
    else:
        o = call(
            "rows", False, (b, 4, nwb),
            lambda bb, i, j: (bb, i + (i // 2) * (ns - 2), j, 0), None,
        )
    o = call(
        "cols", False, (b, ns - 2, 2),
        lambda bb, i, j: (bb, i + 2, j * (nwb - 1), 0), o,
    )
    return call(
        "int", True, (b, ns - 2, nwb - 2),
        lambda bb, i, j: (bb, i + 2, j + 1, 0), o,
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_h", "acc_bf16")
)
def rdb_stripe(
    x: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    block_h: int | None = None,
    interpret: bool = False,
    acc_bf16: bool = False,
) -> jax.Array:
    """Fused RDB forward, stripe grid: x (B, H, W, nf) -> (B, H, W, nf).

    ws/bs: prefix-form weights/biases (see prefix_rdb_weights). Exact SAME
    semantics (matches models.rrdbnet._rdb_apply bit-for-bit up to fp
    summation order).
    """
    b, h, w, nf = x.shape
    gc = _wgeom(ws[1])[0]  # c1-source conv growth width
    # W padded to a sublane multiple; mask handles the extra columns.
    # Channels padded to the 128-lane granule: Mosaic requires HBM DMA
    # windows lane-aligned (and a 64-minor array is physically laid out
    # 128-wide anyway, so the pad costs no extra HBM).
    wf = _PADL + w + _PADL
    wf += (8 - wf % 8) % 8
    cpad = (128 - nf % 128) % 128
    bh = block_h if block_h is not None else _pick_bh(h, wf)
    ph = (bh - h % bh) % bh
    hp = h + ph
    xp = jnp.pad(
        x,
        ((0, 0), (_HALO, _HALO + ph), (_PADL, wf - w - _PADL), (0, cpad)),
    )
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = [wi.astype(x.dtype) for wi in ws]
    nstripes = hp // bh

    kernel = functools.partial(
        _rdb_stripe_kernel,
        bh=bh, h=h, w=w, wf=wf, nf=nf, gc=gc, nstripes=nstripes, nb=b,
        acc_bf16=acc_bf16,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(
            (1, bh, w, nf), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2 * _HALO, wf, nf + cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *wlist, *bias3)
    return out[:, :h, :, :]
