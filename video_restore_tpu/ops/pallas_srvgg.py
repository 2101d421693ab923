"""Pallas TPU kernel: fused conv+PReLU chain for SRVGGNetCompact.

The SRVGG body is ``num_conv`` (32) sequential 3x3 conv + PReLU layers at
LR resolution, 64 channels (/root/reference/video_upscaler.py:316-318
configures it via realesrgan). Through XLA each conv is a separate HBM
round-trip and the 64-lane N dimension halves MXU occupancy; measured
~18 TF/s effective on v5e (bench_suite config 4).

This kernel fuses ``group`` consecutive convs per invocation using the
stripe machinery from ops/pallas_stripe (padded form, telescoping halos,
dy-packed K=192 contractions, fp32 partial rolls, exact SAME-padding
masks). With group=8, one kernel call does 8 convs' work per HBM
round-trip at a (bh + group+1)/bh ~ 1.14x halo-compute overhead.

The activations flow in the same padded stripe form as the RRDB body
(pad_stripe_entry / unpad_stripe_exit), pad regions exact zeros.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_restore_tpu.ops.pallas_stripe import (
    _PADL,
    _conv_prefix,
    _geometry,
    _geometry2d,
    _stripe2d_window,
)


def fold_dy(w: jax.Array) -> jax.Array:
    """(..., 3, 3, cin, cout) -> (..., 3, 3*cin, cout): dx-major, dy
    folded into K (same transform as prefix_rdb_weights' x-source)."""
    w = jnp.swapaxes(w, -4, -3)  # (..., kw, kh, cin, cout)
    return w.reshape(w.shape[:-3] + (3 * w.shape[-2], w.shape[-1]))


def _srvgg_stripe_kernel(
    xp_ref,  # (B, hp + 2*bh, Wf, nfp) ANY — padded input
    *refs,  # w, b, alpha, [scales], out_ref, xblk, sem
    quant: bool = False,
    bh: int,
    h: int,
    w: int,
    wf: int,
    nf: int,
    group: int,
    nstripes: int,
    nb: int,
    cpad: int,
):
    # w_ref: (G, 3, 3nf, nf) per-dx / (G, 9nf, nf) im2col weights (int8
    # when quant); b_ref/a_ref: (G, 1, nf) fp32 biases / PReLU alphas;
    # s_ref (quant only): (G, 1, nf) fp32 per-out-channel weight scales
    nw = 4 if quant else 3
    w_ref, b_ref, a_ref = refs[0:3]
    s_ref = refs[3] if quant else None
    out_ref, xblk, sem = refs[nw], refs[nw + 1], refs[nw + 2]
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    si = gi - 1
    is_halo = (gi == 0) | (gi == nstripes + 1)
    m = bi * nstripes + jnp.clip(si, 0, nstripes - 1)
    he = bh + 2 * group
    row_off = bh - group

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
        top = si * bh - group
        for g in range(group):
            acc = _conv_prefix(
                t, w_ref[g], sw=None if s_ref is None else s_ref[g]
            ) + b_ref[g]  # (e-2, wf, nf) f32
            acc = jnp.where(acc >= 0, acc, acc * a_ref[g])  # PReLU
            e = acc.shape[0]
            rows = lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
            rowf = rows + (top + 1)
            ok = (rowf >= 0) & (rowf < h) & col_ok
            t = jnp.where(ok, acc, 0.0).astype(dt)
            top += 1

        out = t
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
    static_argnames=("frame_h", "frame_w", "group", "block_h", "interpret"),
)
def srvgg_stripe_padded(
    xp: jax.Array,
    ws: jax.Array,  # (G, 3, 3*nf, nf) dy-folded or (G, 9*nf, nf) im2col
    bs: jax.Array,  # (G, nf)
    alphas: jax.Array,  # (G, nf)
    *,
    frame_h: int,
    frame_w: int,
    group: int,
    block_h: int | None = None,
    sws: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``group`` chained conv3x3+PReLU layers in padded stripe form:
    (B, hp+2*bh, Wf, nfp) -> same shape, chainable. ``sws`` (G, nf)
    selects the W8A8 int8 path (ws int8, quantize_prefix_weights)."""
    b, hp2, wf_in, nfp = xp.shape
    nf = ws.shape[-1]
    wf, cpad, bh, hp = _geometry(frame_h, frame_w, nf, block_h)
    if (wf_in, hp2, nfp) != (wf, hp + 2 * bh, nf + cpad):
        raise ValueError(
            f"padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wf, nf + cpad)})"
        )
    if group > bh:
        raise ValueError(f"group {group} exceeds block_h {bh}")
    nstripes = hp // bh

    kernel = functools.partial(
        _srvgg_stripe_kernel,
        quant=sws is not None,
        bh=bh, h=frame_h, w=frame_w, wf=wf, nf=nf, group=group,
        nstripes=nstripes, nb=b, cpad=cpad,
    )
    scale_in = (
        [] if sws is None
        else [sws.reshape(group, 1, nf).astype(jnp.float32)]
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nstripes + 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(scale_in)),
        out_specs=pl.BlockSpec(
            (1, bh, wf, nf + cpad), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, hp + 2 * bh, wf, nf + cpad), xp.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2 * group, wf, nf + cpad), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp,
        ws if ws.dtype == jnp.int8 else ws.astype(xp.dtype),
        bs.reshape(group, 1, nf).astype(jnp.float32),
        alphas.reshape(group, 1, nf).astype(jnp.float32),
        *scale_in,
    )


# ---------------------------------------------------------------------------
# 2D-blocked body form (round 4): H stripes x W blocks with margin-DMA,
# ported from ops/pallas_stripe's rdb_stripe2d_padded. The full-width form
# at 1920-wide frames forces bh<=16 under the VMEM row anchor, i.e. a
# (16+2*8)/16 = 2x halo-compute tax at group=8 — config 4 therefore ran
# TILED (12% overlap MACs + per-tile glue). The W-block margin bounds VMEM
# at (bh+2G)x(bw+2*mw) for ANY frame width, so the 32-conv body runs
# FULL-FRAME. Margin mw=16 >= group+1: roll-wrap garbage telescopes one
# column per conv, staying inside the margin for group<=15.
# ---------------------------------------------------------------------------

_MWG = 16  # W-block margin columns for the grouped-conv kernel


def _pick_bh_bw_srvgg(
    h: int, w: int, group: int, mw: int = _MWG
) -> "tuple[int, int]":
    """(bh, bw) minimizing the halo/margin MAC overhead
    (bh+2G)/bh * (bw+2mw)/bw * padded/frame under two constraints:
    VMEM (window + output block rows-in-flight; 128-lane bf16
    double-buffered windows + pipelined output blocks + ~30MB chunked
    temporaries) and the measured Mosaic compile cliff — windows beyond
    ~58k px hang the toolchain's server-side compile >40 min
    (BENCH_NOTES round 4: SRVGG 232x416 and RDB 280x256 both timed out;
    226x256-class windows compile in ~10-20 min)."""
    best = None
    for bw in range(64, 521, 8):
        nwb = -(-w // bw)
        if nwb < 2:
            continue
        bwf = bw + 2 * mw
        for bh in range(16, 513, 8):
            if (bh + 2 * group) * bwf + bh * bw > 190_000:
                break
            if (bh + 2 * group) * bwf > 48_000:
                # 48k: ~17% under the measured hang threshold — a
                # config-4 production compile must not gamble an hour
                break
            hp = -(-h // bh) * bh
            cost = (
                (bh + 2 * group) / bh * bwf / bw * (hp * nwb * bw) / (h * w)
            )
            if best is None or cost < best[0]:
                best = (cost, bh, bw)
    if best is None:
        raise ValueError(f"no SRVGG 2D geometry for {h}x{w}")
    return best[1], best[2]


def srvgg_stripe2d_selection(
    h: int, w: int, group: int
) -> "tuple[int, int] | None":
    """None keeps the full-width stripe form (tile-width inputs, where a
    bh>=48 full-width stripe fits); otherwise the (bh, bw) 2D blocks.
    VRT_SRVGG_2D: auto (default), 0 (always full-width), BHxBW forced."""
    import os

    v = os.environ.get("VRT_SRVGG_2D", "auto")
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
        if (48 + 2 * group) * wf <= 38480:  # full-width bh>=48 fits
            return None
    try:
        return _pick_bh_bw_srvgg(h, w, group)
    except ValueError:
        return None


def _srvgg_stripe2d_kernel(
    xp_ref,  # (B, hp + 2*bh, wp, nfp) ANY/HBM — 2D padded input
    *refs,  # w, b, alpha, [scales], out_ref, xblk, sem
    quant: bool = False,
    bh: int,
    bw: int,
    h: int,
    w: int,
    wp: int,
    nf: int,
    group: int,
    ns: int,
    nwb: int,
    nb: int,
    cpad: int,
):
    # w_ref: (G, 3, 3nf, nf) per-dx / (G, 3nf, 3nf) N-packed / im2col
    # (int8 when quant); b_ref/a_ref: (G, 1, nf) fp32 biases / alphas;
    # s_ref (quant only): (G, 1, nf) fp32 weight scales
    nw = 4 if quant else 3
    w_ref, b_ref, a_ref = refs[0:3]
    s_ref = refs[3] if quant else None
    out_ref, xblk, sem = refs[nw], refs[nw + 1], refs[nw + 2]
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    wi = pl.program_id(2)
    si = gi - 1
    is_halo = (gi == 0) | (gi == ns + 1)
    m = (bi * ns + jnp.clip(si, 0, ns - 1)) * nwb + wi
    he = bh + 2 * group
    bwf = bw + 2 * _MWG
    row_off = bh - group

    def dma(slot, idx):
        bb = idx // (ns * nwb)
        rem = idx % (ns * nwb)
        ii = rem // nwb
        jj = rem % nwb
        c0c = pl.multiple_of(jnp.clip(jj * bw - _MWG, 0, wp - bwf), 8)
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh + row_off, he), pl.ds(c0c, bwf)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when((bi == 0) & (gi == 0) & (wi == 0))
    def _():
        dma(0, 0).start()

    def compute():
        @pl.when(m + 1 < nb * ns * nwb)
        def _():
            dma((m + 1) % 2, m + 1).start()

        dma(m % 2, m).wait()
        dt = out_ref.dtype
        _stripe2d_window(xblk, m % 2, wi, nwb, he, bwf, dt, mw=_MWG)
        t = xblk[m % 2][:, :, :nf]
        cols = lax.broadcasted_iota(jnp.int32, (1, bwf, 1), 1)
        gcol = cols + (wi * bw - _MWG)
        col_ok = (gcol >= 0) & (gcol < w)
        top = si * bh - group
        for g in range(group):
            acc = _conv_prefix(
                t, w_ref[g], sw=None if s_ref is None else s_ref[g]
            ) + b_ref[g]
            acc = jnp.where(acc >= 0, acc, acc * a_ref[g])  # PReLU
            e = acc.shape[0]
            rows = lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
            rowf = rows + (top + 1)
            ok = (rowf >= 0) & (rowf < h) & col_ok
            t = jnp.where(ok, acc, 0.0).astype(dt)
            top += 1

        out = t[:, _MWG : _MWG + bw, :]
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
        "frame_h", "frame_w", "group", "block_h", "block_w", "interpret",
    ),
)
def srvgg_stripe2d_padded(
    xp: jax.Array,
    ws: jax.Array,  # (G, 3, 3nf, nf) dy-folded / (G, 3nf, 3nf) / im2col
    bs: jax.Array,  # (G, nf)
    alphas: jax.Array,  # (G, nf)
    *,
    frame_h: int,
    frame_w: int,
    group: int,
    block_h: int,
    block_w: int,
    sws: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``group`` chained conv3x3+PReLU layers in 2D padded stripe form:
    (B, hp+2*bh, wp, nfp) -> same shape, chainable (pad zeros exact).
    ``sws`` (G, nf) selects the W8A8 int8 path (ws int8)."""
    b, hp2, wp_in, nfp = xp.shape
    # per-dx (G,3,3nf,nf) and im2col (G,9nf,nf) end in nf; the N-packed
    # square (G,3nf,3nf) ends in 3nf
    nf = (
        ws.shape[-1] // 3
        if ws.ndim == 3 and ws.shape[-2] == ws.shape[-1]
        else ws.shape[-1]
    )
    bh, bw, ns, nwb, hp, wp, cpad = _geometry2d(
        frame_h, frame_w, nf, block_h, block_w
    )
    if (hp2, wp_in, nfp) != (hp + 2 * bh, wp, nf + cpad):
        raise ValueError(
            f"2D padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wp, nf + cpad)})"
        )
    if group > bh:
        raise ValueError(f"group {group} exceeds block_h {bh}")
    if group >= _MWG:
        raise ValueError(f"group {group} overruns the W margin {_MWG}")
    if bw + 2 * _MWG > wp:
        raise ValueError(
            f"window {bw + 2 * _MWG} wider than padded frame {wp}: "
            f"need (nwb-1)*bw >= {2 * _MWG}"
        )

    kernel = functools.partial(
        _srvgg_stripe2d_kernel,
        quant=sws is not None,
        bh=bh, bw=bw, h=frame_h, w=frame_w, wp=wp, nf=nf, group=group,
        ns=ns, nwb=nwb, nb=b, cpad=cpad,
    )
    scale_in = (
        [] if sws is None
        else [sws.reshape(group, 1, nf).astype(jnp.float32)]
    )
    return pl.pallas_call(
        kernel,
        grid=(b, ns + 2, nwb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(scale_in)),
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
                (2, bh + 2 * group, bw + 2 * _MWG, nf + cpad), xp.dtype
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp,
        ws if ws.dtype == jnp.int8 else ws.astype(xp.dtype),
        bs.reshape(group, 1, nf).astype(jnp.float32),
        alphas.reshape(group, 1, nf).astype(jnp.float32),
        *scale_in,
    )


# ---------------------------------------------------------------------------
# Split edge/interior launches for the 2D SRVGG body (the
# rdb_stripe2d_split pattern from ops/pallas_stripe, +2.2% there): the
# frame-boundary masks (per-conv row iota/compare/where + the column
# mask) run over every element of every conv in every window, but only
# windows touching a frame edge need them. The masked ring runs in two
# launches (rows, cols) and the mask-free interior in a third, chained
# by mandatory aliasing (input_output_aliases — no copies).
#
# The nf=64 body has HALF the per-element MAC weight of the RDB's
# nf=128/gc=32 stage, so the relative VPU mask cost is larger here.
#
# Interior exactness: a nomask window's out rows/cols are all in-frame
# by construction (si in 1..ns-2, wi in 1..nwb-2), and its input margins
# are either genuine neighbour data or the padded array's exact zeros —
# UNLESS an out-of-frame intermediate row (conv(0)+bias -> PReLU(bias)
# != 0, which the masked form re-zeroes every conv) can telescope back
# into an interior window's output. That contamination reaches rows
# >= h - (group-1), so interior windows are safe iff the edge-adjacent
# stripes stay clear of it: (ns-1)*bh + group <= frame_h, and the
# column analogue (nwb-1)*bw + _MWG <= frame_w (the margin columns of
# wi=nwb-2 must be in-frame). srvgg_split_ok checks both; callers fall
# back to the single-call kernel otherwise.
# ---------------------------------------------------------------------------


def _srvgg_stripe2d_part_kernel(
    xp_ref,  # (B, hp + 2*bh, wp, nfp) ANY/HBM — 2D padded input
    *refs,  # [prev], w, b, alpha, [scales], out_ref, xblk, sem
    part: str,  # "rows" | "cols" | "int"
    has_prev: bool,  # an alias-chain input follows xp_ref
    nomask: bool,
    quant: bool = False,
    bh: int,
    bw: int,
    h: int,
    w: int,
    wp: int,
    nf: int,
    group: int,
    ns: int,
    nwb: int,
    nb: int,
    cpad: int,
):
    base = 1 if has_prev else 0
    nw = 4 if quant else 3
    w_ref, b_ref, a_ref = refs[base : base + 3]
    s_ref = refs[base + 3] if quant else None
    out_ref, xblk, sem = refs[base + nw], refs[base + nw + 1], refs[base + nw + 2]
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    ji = pl.program_id(2)
    he = bh + 2 * group
    bwf = bw + 2 * _MWG
    row_off = bh - group

    # part-specific decode: (si, wi) of THIS program, body-program count
    # per batch (nbp), flat->(si, wi) for the prefetch, halo handling
    if part == "rows":
        si = (jnp.clip(gi, 1, 2) - 1) * (ns - 1)
        wi = ji
        is_halo = (gi == 0) | (gi == 3)
        nbp = 2 * nwb

        def decode(r):
            return (r // nwb) * (ns - 1), r % nwb

        m = (bi * 2 + (jnp.clip(gi, 1, 2) - 1)) * nwb + ji
    elif part == "cols":
        si = gi + 1
        wi = ji * (nwb - 1)
        is_halo = None
        nbp = (ns - 2) * 2

        def decode(r):
            return r // 2 + 1, (r % 2) * (nwb - 1)

        m = bi * nbp + gi * 2 + ji
    elif part == "int":
        si = gi + 1
        wi = ji + 1
        is_halo = None
        nbp = (ns - 2) * (nwb - 2)

        def decode(r):
            return r // (nwb - 2) + 1, r % (nwb - 2) + 1

        m = bi * nbp + gi * (nwb - 2) + ji
    else:  # pragma: no cover
        raise ValueError(part)

    def dma(slot, idx):
        bb = idx // nbp
        r = idx % nbp
        si_d, wi_d = decode(r)
        c0c = pl.multiple_of(jnp.clip(wi_d * bw - _MWG, 0, wp - bwf), 8)
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(si_d * bh + row_off, he), pl.ds(c0c, bwf)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when((bi == 0) & (gi == 0) & (ji == 0))
    def _():
        dma(0, 0).start()

    def compute():
        @pl.when(m + 1 < nb * nbp)
        def _():
            dma((m + 1) % 2, m + 1).start()

        dma(m % 2, m).wait()
        dt = out_ref.dtype
        _stripe2d_window(xblk, m % 2, wi, nwb, he, bwf, dt, mw=_MWG)
        t = xblk[m % 2][:, :, :nf]
        if not nomask:
            cols = lax.broadcasted_iota(jnp.int32, (1, bwf, 1), 1)
            gcol = cols + (wi * bw - _MWG)
            col_ok = (gcol >= 0) & (gcol < w)
        top = si * bh - group
        for g in range(group):
            acc = _conv_prefix(
                t, w_ref[g], sw=None if s_ref is None else s_ref[g]
            ) + b_ref[g]
            acc = jnp.where(acc >= 0, acc, acc * a_ref[g])  # PReLU
            if nomask:
                t = acc.astype(dt)
            else:
                e = acc.shape[0]
                rows = lax.broadcasted_iota(jnp.int32, (e, 1, 1), 0)
                rowf = rows + (top + 1)
                ok = (rowf >= 0) & (rowf < h) & col_ok
                t = jnp.where(ok, acc, 0.0).astype(dt)
            top += 1

        out = t[:, _MWG : _MWG + bw, :]
        if cpad:
            out = jnp.concatenate(
                [out, jnp.zeros((bh, bw, cpad), dt)], axis=2
            )
        out_ref[0] = out

    if is_halo is None:
        compute()
    else:
        @pl.when(is_halo)
        def _():
            out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

        pl.when(~is_halo)(compute)


def srvgg_split_ok(
    frame_h: int, frame_w: int, group: int, bh: int, bw: int
) -> bool:
    """Split launches need an interior and edge-adjacent windows whose
    unmasked intermediates cannot contaminate it (docstring above);
    VRT_SRVGG_SPLIT=0 disables."""
    import os

    if os.environ.get("VRT_SRVGG_SPLIT", "1") == "0":
        return False
    ns = -(-frame_h // bh)
    nwb = -(-frame_w // bw)
    return (
        ns >= 3
        and nwb >= 3
        and (ns - 1) * bh + group <= frame_h
        and (nwb - 1) * bw + _MWG <= frame_w
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "frame_h", "frame_w", "group", "block_h", "block_w", "interpret",
    ),
)
def srvgg_stripe2d_split(
    xp: jax.Array,
    ws: jax.Array,
    bs: jax.Array,
    alphas: jax.Array,
    *,
    frame_h: int,
    frame_w: int,
    group: int,
    block_h: int,
    block_w: int,
    sws: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """srvgg_stripe2d_padded as split edge/interior pallas_call
    launches: the masked ring in two calls (rows incl. halos, cols) and
    the mask-free interior in a third, chained by mandatory aliasing.
    Callers must check srvgg_split_ok first. Same contract: (B,
    hp+2*bh, wp, nfp) -> same shape, chainable (pad zeros exact)."""
    b, hp2, wp_in, nfp = xp.shape
    nf = (
        ws.shape[-1] // 3
        if ws.ndim == 3 and ws.shape[-2] == ws.shape[-1]
        else ws.shape[-1]
    )
    bh, bw, ns, nwb, hp, wp, cpad = _geometry2d(
        frame_h, frame_w, nf, block_h, block_w
    )
    if (hp2, wp_in, nfp) != (hp + 2 * bh, wp, nf + cpad):
        raise ValueError(
            f"2D padded input {xp.shape} does not match geometry "
            f"(expected {(b, hp + 2 * bh, wp, nf + cpad)})"
        )
    if group > bh:
        raise ValueError(f"group {group} exceeds block_h {bh}")
    if group >= _MWG:
        raise ValueError(f"group {group} overruns the W margin {_MWG}")
    if not srvgg_split_ok(frame_h, frame_w, group, bh, bw):
        raise ValueError(
            f"split geometry invalid for {frame_h}x{frame_w} @ {bh}x{bw}"
        )

    wk = ws if ws.dtype == jnp.int8 else ws.astype(xp.dtype)
    b3 = bs.reshape(group, 1, nf).astype(jnp.float32)
    a3 = alphas.reshape(group, 1, nf).astype(jnp.float32)
    scale_in = (
        [] if sws is None
        else [sws.reshape(group, 1, nf).astype(jnp.float32)]
    )
    kw = dict(
        quant=sws is not None,
        bh=bh, bw=bw, h=frame_h, w=frame_w, wp=wp, nf=nf, group=group,
        ns=ns, nwb=nwb, nb=b, cpad=cpad,
    )
    out_shape = jax.ShapeDtypeStruct(
        (b, hp + 2 * bh, wp, nf + cpad), xp.dtype
    )
    scratch = [
        pltpu.VMEM(
            (2, bh + 2 * group, bw + 2 * _MWG, nf + cpad), xp.dtype
        ),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        vmem_limit_bytes=127 * 1024 * 1024,
    )

    def call(part, nomask, grid, index_map, prev):
        kernel = functools.partial(
            _srvgg_stripe2d_part_kernel,
            part=part, nomask=nomask, has_prev=prev is not None, **kw
        )
        ins = (
            [xp] + ([prev] if prev is not None else [])
            + [wk, b3, a3] + scale_in
        )
        nconst = 3 + len(scale_in)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            * (len(ins) - nconst)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nconst,
            out_specs=pl.BlockSpec(
                (1, bh, bw, nf + cpad), index_map,
                memory_space=pltpu.VMEM,
            ),
            out_shape=out_shape,
            scratch_shapes=scratch,
            input_output_aliases=(
                {1: 0} if prev is not None else {}
            ),
            compiler_params=params,
            interpret=interpret,
        )(*ins)

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


# ---------------------------------------------------------------------------
# Fused upsampler: conv_out + r-x pixel_shuffle + nearest-upsample skip add
# in one stripe kernel. The XLA form cost ~27 ms/frame at 1080p (config 4
# trace): the pixel_shuffle transposes (reshape + 6-D copy, ~19 ms) plus a
# 12 TF/s conv_last (N=48 lane occupancy). Phase-form layout trick (same as
# ops/pallas_tail.up1_fused, generalized to r phases): the conv emits
# lanes (a, b, o_pad) with o padded to 64//r, so the r row phases
# interleave through 64-lane slices + the free leading dim, and the r
# column phases materialize with ONE free reshape (lane blocks (b, o_pad)
# ARE adjacent fine columns). The nearest-4x skip rides along as a
# b-replicated 64-lane addend in the fp32 chunks.
# ---------------------------------------------------------------------------


def _up_phase_weights(w: jax.Array, bias: jax.Array, r: int):
    """torch-pixel_shuffle-ordered conv_out weights (3,3,cin, cout*r*r,
    channel index o*r*r + a*r + b) -> phase-lane kernel (3,3,cin, r*64)
    with lane index a*64 + b*opad + o (opad = 64//r), plus the matching
    bias (r*64,)."""
    kh, kw, cin, crr = w.shape
    cout = crr // (r * r)
    opad = 64 // r
    w6 = w.reshape(kh, kw, cin, cout, r, r)  # (..., o, a, b)
    w6 = jnp.transpose(w6, (0, 1, 2, 4, 5, 3))  # (..., a, b, o)
    w6 = jnp.pad(
        w6, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 0), (0, opad - cout))
    )
    wk = w6.reshape(kh, kw, cin, r * 64)
    b6 = bias.reshape(cout, r, r)
    b6 = jnp.transpose(b6, (1, 2, 0))  # (a, b, o)
    b6 = jnp.pad(b6, ((0, 0), (0, 0), (0, opad - cout)))
    return wk, b6.reshape(r * 64)


def _srvgg_up_kernel(
    xp_ref,  # (B, hp + 2, Wf, lanes) ANY/HBM — body output, padded
    sp_ref,  # (B, hp, Wf, 128) ANY/HBM — phase-replicated skip input
    ku,  # (3*cin_k, 3*r*64) dx-packed phase kernel, VMEM
    bu,  # (1, 1, r*64) fp32
    out_ref,  # (1, r*bh, Wf, 64) VMEM block
    xblk,  # (2, bh + 2, Wf, lanes)
    sblk,  # (2, bh, Wf, 128)
    sem,
    ssem,
    *,
    bh: int,
    cin: int,
    r: int,
    nstripes: int,
    nb: int,
    rc: int,
):
    from video_restore_tpu.ops.pallas_tail import _conv_chunked

    bi = pl.program_id(0)
    si = pl.program_id(1)
    m = bi * nstripes + si
    he = bh + 2

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh, he)], xblk.at[slot], sem.at[slot]
        )

    def sdma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            sp_ref.at[bb, pl.ds(ii * bh, bh)], sblk.at[slot], ssem.at[slot]
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()
        sdma(0, 0).start()

    @pl.when(m + 1 < nb * nstripes)
    def _():
        dma((m + 1) % 2, m + 1).start()
        sdma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()
    sdma(m % 2, m).wait()
    x = xblk[m % 2][:, :, :cin]
    skip = sblk[m % 2][:, :, :64]
    dt = x.dtype

    # terminal kernel (output sliced to the frame in XLA): zero-padded
    # input gives exact SAME-conv borders, roll wrap stays in _PADL
    def post(q, r0):
        q = q + bu[0]
        s = skip[r0 : r0 + q.shape[0]].astype(jnp.float32)
        if r > 1:
            s = jnp.concatenate([s] * r, axis=2)  # per-a-phase addend
        return (q + s).astype(dt)

    y = _conv_chunked(x, ku[:], (-1, 0, 1), post, rc)  # (bh, wf, r*64)
    # r-way row interleave through the free leading dim (64-lane slices)
    parts = [y[:, :, i * 64 : (i + 1) * 64] for i in range(r)]
    t = jnp.stack(parts, axis=1)  # (bh, r, wf, 64)
    out_ref[0] = t.reshape(bh * r, y.shape[1], 64)


@functools.partial(
    jax.jit, static_argnames=("r", "block_h", "interpret", "row_chunk")
)
def srvgg_up_fused(
    feat: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    x_in: jax.Array,
    *,
    r: int = 4,
    block_h: int | None = None,
    row_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """``pixel_shuffle(conv2d(feat, w_out, b_out), r) +
    upsample_nearest(x_in, r)`` as one stripe kernel.

    feat (B, H, W, nf), x_in (B, H, W, cout) -> (B, r*H, r*W, cout).
    """
    b, h, w, nf = feat.shape
    if 64 % r:
        raise ValueError(
            f"srvgg_up_fused supports r dividing 64 (got r={r}); "
            "use the XLA pixel_shuffle path for other scales"
        )
    cout = w_out.shape[-1] // (r * r)
    opad = 64 // r
    wf = _PADL + w + _PADL
    wf += (8 - wf % 8) % 8
    # width-scaled stripe height: the same VMEM ladder as tail_geom —
    # a fixed bh at full-frame 4K widths would exceed the 127MB limit
    bh = block_h or (16 if wf <= 2100 else 8)
    rc = max(2, min(row_chunk, (row_chunk * 1024) // wf))
    hp = h + (bh - h % bh) % bh
    nstripes = hp // bh
    lanes = nf + (128 - nf % 128) % 128
    xp = jnp.pad(
        feat,
        ((0, 0), (1, 1 + hp - h), (_PADL, wf - w - _PADL), (0, lanes - nf)),
    )
    # phase-replicated skip: lanes (b, o_pad) so adding it to each
    # 64-lane a-block IS the nearest-r upsample
    sk = jnp.pad(x_in, ((0, 0), (0, 0), (0, 0), (0, opad - cout)))
    sk = jnp.tile(sk, (1, 1, 1, r))  # (B, h, w, 64)
    sp = jnp.pad(
        sk, ((0, 0), (0, hp - h), (_PADL, wf - w - _PADL), (0, 64))
    )
    wk, bk = _up_phase_weights(w_out, b_out, r)
    from video_restore_tpu.ops.pallas_tail import (
        pack_prefix_weights_generic,
    )

    ku = pack_prefix_weights_generic(wk).astype(feat.dtype)
    bu = bk.reshape(1, 1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _srvgg_up_kernel,
        bh=bh, cin=nf, r=r, nstripes=nstripes, nb=b, rc=rc,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(
            (1, r * bh, wf, 64), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r * hp, wf, 64), feat.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, wf, lanes), feat.dtype),
            pltpu.VMEM((2, bh, wf, 128), feat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, sp, ku, bu)
    # (B, r*hp, Wf, (b, o_pad)) -> (B, r*hp, r*Wf, o_pad): adjacent lane
    # blocks ARE adjacent fine columns (free reshape), then crop
    out = out.reshape(b, r * hp, r * wf, opad)
    return out[:, : r * h, r * _PADL : r * _PADL + r * w, :cout]


# ---------------------------------------------------------------------------
# Raw-input fused upsampler (round 5): consume the BODY'S 2D PADDED array
# directly — no unpad_stripe2d_exit slice, no re-pad, no _PADL margin.
# The config-4 trace at 8.078 showed ~8 ms/frame of up-kernel boundary
# copies and ~5 ms of pads; the exit-slice + entry-pad pair rewrites the
# ~265MB body output twice for pure layout reasons. Same trick as
# ops/pallas_tail.tail_fused_raw: automatic BlockSpec pipelining of the
# producer's layout (main stripe blocks + two 1-row halo strips of the
# same array — the idiom that compiles where every manual in-VMEM unpack
# failed to lower, BENCH_NOTES round 4), with the roll-wrap columns
# explicitly zeroed (the frame starts at column 0 here, so there is no
# pad margin for the wrap garbage to die in; zeroing the two edge
# columns of the +-1 tap partials reproduces SAME semantics exactly).
# ---------------------------------------------------------------------------


def _conv_chunked_edge(a, w, post, rc: int):
    """_conv_chunked (ops/pallas_tail) with explicit frame-edge column
    semantics: the dx=-1 partial's wrapped column 0 and the dx=+1
    partial's wrapped last column are zeroed (SAME conv at the frame's
    W edges, no pad margin)."""
    e, wp, cin = a.shape
    oh = e - 2
    n = w.shape[1] // 3
    outs = []
    for r0 in range(0, oh, rc):
        r1 = min(r0 + rc, oh)
        ak = jnp.concatenate(
            [a[r0:r1], a[r0 + 1 : r1 + 1], a[r0 + 2 : r1 + 2]], axis=2
        )
        p = lax.dot_general(
            ak, w,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        q = None
        for i, d in enumerate((-1, 0, 1)):
            part = pltpu.roll(p[:, :, i * n : (i + 1) * n], (wp - d) % wp, 1) if d else p[:, :, i * n : (i + 1) * n]
            z = jnp.zeros((r1 - r0, 1, n), jnp.float32)
            if d == -1:
                part = jnp.concatenate([z, part[:, 1:]], axis=1)
            elif d == 1:
                part = jnp.concatenate([part[:, :-1], z], axis=1)
            q = part if q is None else q + part
        outs.append(post(q, r0))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _srvgg_up_raw_kernel(
    top_ref,  # (1, 1, wp, lanes) — row above the stripe (body array)
    mid_ref,  # (1, bh, wp, lanes) — the stripe
    bot_ref,  # (1, 1, wp, lanes) — row below
    sp_ref,  # (1, bh, wp, 64) — phase-replicated skip block
    ku,  # (3*cin, 3*r*64) dx-packed phase kernel, VMEM
    bu,  # (1, 1, r*64) fp32
    out_ref,  # (1, r*bh, wp, 64) VMEM block
    *,
    bh: int,
    cin: int,
    r: int,
    rc: int,
):
    x = jnp.concatenate([top_ref[0], mid_ref[0], bot_ref[0]], axis=0)
    x = x[:, :, :cin]
    skip = sp_ref[0]
    dt = x.dtype

    def post(q, r0):
        q = q + bu[0]
        s = skip[r0 : r0 + q.shape[0]].astype(jnp.float32)
        if r > 1:
            s = jnp.concatenate([s] * r, axis=2)  # per-a-phase addend
        return (q + s).astype(dt)

    y = _conv_chunked_edge(x, ku[:], post, rc)  # (bh, wp, r*64)
    parts = [y[:, :, i * 64 : (i + 1) * 64] for i in range(r)]
    t = jnp.stack(parts, axis=1)  # (bh, r, wp, 64)
    out_ref[0] = t.reshape(bh * r, y.shape[1], 64)


@functools.partial(
    jax.jit,
    static_argnames=(
        "r", "frame_h", "frame_w", "block_h2", "block_w2", "row_chunk",
        "interpret",
    ),
)
def srvgg_up_fused_raw(
    xp: jax.Array,  # the BODY's 2D padded output (B, hp2+2*bh2, wp, nfp)
    w_out: jax.Array,
    b_out: jax.Array,
    x_in: jax.Array,  # (B, h, w, cout) LR input (nearest-skip source)
    *,
    r: int = 4,
    frame_h: int,
    frame_w: int,
    block_h2: int,
    block_w2: int,
    row_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """``pixel_shuffle(conv2d(body_out, w_out, b_out), r) +
    upsample_nearest(x_in, r)`` consuming the 2D padded body array
    in place: (B, hp2+2*bh2, wp, nfp) + (B, h, w, cout) ->
    (B, r*h, r*w, cout). The body's pad regions are exact zeros, which
    IS the conv's SAME padding at every frame edge (rows from the halo
    blocks, columns from the explicit edge-zeroed taps)."""
    b, hp22, wp, nfp = xp.shape
    h, w = frame_h, frame_w
    if 64 % r:
        raise ValueError(f"srvgg_up_fused_raw supports r dividing 64 (got {r})")
    bh2, bw2 = block_h2, block_w2
    if bh2 % 8:
        raise ValueError(f"body block_h {bh2} must be a multiple of 8")
    nf = w_out.shape[-2]
    cout = w_out.shape[-1] // (r * r)
    opad = 64 // r
    bh = 8  # 8 | bh2 always (body geometry steps by 8), so the main
    # BlockSpec's row offset bh2//bh is exact
    hp = h + (bh - h % bh) % bh
    nstripes = hp // bh
    # every window row must exist: stripe si reads rows
    # [bh2 + si*bh - 1, bh2 + si*bh + bh + 1) of the body array
    if bh2 + hp + 1 > hp22:
        raise ValueError(
            f"body padded array too short for the raw up kernel "
            f"({hp22} rows, need {bh2 + hp + 1})"
        )
    # phase-replicated skip: lanes (b, o_pad) so adding it to each
    # 64-lane a-block IS the nearest-r upsample; 64-minor (the proven
    # BlockSpec-pipelined layout — no 128-lane pad rewrite)
    sk = jnp.pad(x_in, ((0, 0), (0, 0), (0, 0), (0, opad - cout)))
    sk = jnp.tile(sk, (1, 1, 1, r))  # (B, h, w, 64)
    sp = jnp.pad(sk, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    wk, bk = _up_phase_weights(w_out, b_out, r)
    from video_restore_tpu.ops.pallas_tail import (
        pack_prefix_weights_generic,
    )

    ku = pack_prefix_weights_generic(wk).astype(xp.dtype)
    bu = bk.reshape(1, 1, -1).astype(jnp.float32)
    rc = max(2, min(row_chunk, (row_chunk * 1024) // wp))

    kernel = functools.partial(
        _srvgg_up_raw_kernel, bh=bh, cin=nf, r=r, rc=rc,
    )
    row0 = bh2 // bh  # frame row 0 in bh-block units
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[
            pl.BlockSpec(  # top halo row (1-row blocks: any offset)
                (1, 1, wp, nfp),
                lambda bb, i: (bb, bh2 + i * bh - 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # main stripe
                (1, bh, wp, nfp),
                lambda bb, i: (bb, row0 + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # bottom halo row
                (1, 1, wp, nfp),
                lambda bb, i: (bb, bh2 + i * bh + bh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(  # skip block (64-minor)
                (1, bh, wp, 64),
                lambda bb, i: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, r * bh, wp, 64), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r * hp, wp, 64), xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp, sp, ku, bu)
    # (B, r*hp, wp, (b, o_pad)) -> (B, r*hp, r*wp, o_pad): free reshape
    out = out.reshape(b, r * hp, r * wp, opad)
    return out[:, : r * h, : r * w, :cout]
