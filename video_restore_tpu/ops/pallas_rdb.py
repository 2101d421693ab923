"""Pallas TPU kernel: fully-fused Residual Dense Block.

The RDB is the hot loop of RRDBNet (69 instances in the 23-block model —
SURVEY.md §3.4). Device traces of the XLA path show ~half the body's time
in inter-conv elementwise assemblies and relayout copies that XLA cannot
fuse into the convolutions; this kernel keeps the entire dense-block chain
resident in VMEM and eliminates them:

- the grid tiles the frame into (bh x bw) spatial blocks; each program
  DMAs one input window with an 8-pixel halo (5 chained 3x3 convs need 5;
  8 satisfies the sublane alignment of the DMA),
- each 3x3 conv is 9 MXU matmuls over *full-width* rows: the column taps
  come from 3 hardware sublane rolls of the input (pltpu.roll) and the row
  taps from free leading-dim slices — no Mosaic relayout copies anywhere
  in the chain (unaligned sublane slicing forces a copy per tap, which is
  what made earlier versions lose to XLA),
- alignment bookkeeping: a roll-form valid conv leaves output column j
  centered on input column j+1, so later consumers re-align older tensors
  with one roll per chain step instead of slicing,
- only the final (bh x bw x nf) residual output is written back.

Needs vmem_limit_bytes well above the 16MB compiler default (v5e has
128MB VMEM). Weights must be in the source-major regrouped layout
(models/rrdbnet._regroup_rdb_weights).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 5  # five chained 3x3 valid convs
# DMA window extents must be aligned to the 8-sublane tiling
_PAD = 8


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _roll_w(x, dx: int):
    """Align column j to source column j+dx (hardware sublane roll)."""
    if dx == 0:
        return x
    wf = x.shape[1]
    return pltpu.roll(x, (wf - dx) % wf, 1)


def _conv_roll(a, w):
    """Roll-form 3x3 valid conv: (ah, wf, cin) x (3,3,cin,cout) ->
    (ah-2, wf, cout) fp32, output row/col j centered on input j+1 (the
    last two columns are garbage and are re-aligned/cropped downstream).

    Column taps are realized by rolling the fp32 *products* (Mosaic only
    rotates 32-bit data; rolling the bf16 input is unsupported)."""
    ah, wf, cin = a.shape
    oh = ah - 2
    acc = None
    for dx in range(3):  # accumulate per column tap, roll once per dx
        part = None
        for dy in range(3):
            p = lax.dot_general(
                a[dy : dy + oh], w[dy, dx],  # leading-dim slice: free
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            part = p if part is None else part + p
        part = _roll_w(part, dx)
        acc = part if acc is None else acc + part
    return acc


def _rdb_body(x, ws, bs, gc: int):
    """One RDB on a full-width block: (ah, wf, nf) bf16 -> (ah-10, wf, nf)
    bf16, output aligned +5 rows/cols relative to the input (roll-form)."""
    w0, w1, w2, w3, w4 = ws
    b1, b2, b3, b4, b5 = bs
    g = gc
    dt = x.dtype
    t0 = _conv_roll(x, w0)
    c1 = _lrelu(t0[:, :, :g] + b1).astype(dt)
    t1 = _conv_roll(c1, w1)
    c2 = _lrelu(
        _roll_w(t0[1:-1, :, g : 2 * g], 1) + t1[:, :, :g] + b2
    ).astype(dt)
    t2 = _conv_roll(c2, w2)
    c3 = _lrelu(
        _roll_w(t0[2:-2, :, 2 * g : 3 * g], 2)
        + _roll_w(t1[1:-1, :, g : 2 * g], 1)
        + t2[:, :, :g]
        + b3
    ).astype(dt)
    t3 = _conv_roll(c3, w3)
    c4 = _lrelu(
        _roll_w(t0[3:-3, :, 3 * g : 4 * g], 3)
        + _roll_w(t1[2:-2, :, 2 * g : 3 * g], 2)
        + _roll_w(t2[1:-1, :, g : 2 * g], 1)
        + t3[:, :, :g]
        + b4
    ).astype(dt)
    t4 = _conv_roll(c4, w4)
    c5 = (
        _roll_w(t0[4:-4, :, 4 * g :], 4)
        + _roll_w(t1[3:-3, :, 3 * g :], 3)
        + _roll_w(t2[2:-2, :, 2 * g :], 2)
        + _roll_w(t3[1:-1, :, g:], 1)
        + t4
        + b5
    )
    ah = x.shape[0]
    base = _roll_w(x[5 : ah - 5].astype(jnp.float32), 5)
    return (base + 0.2 * c5).astype(dt)


def _rrdb_kernel(
    xp_ref,  # (B, Hp, Wp, nf+cpad) in ANY/HBM
    *refs,  # 15 weights + 15 biases (3 RDBs), then out_ref, xblk, sem
    bh: int,
    bw: int,
    nf: int,
    gc: int,
    pad: int,
):
    ws = refs[:15]
    bs = refs[15:30]
    out_ref = refs[30]
    xblk = refs[31]
    sem = refs[32]
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        xp_ref.at[
            b,
            pl.ds(pl.multiple_of(i * bh, 8), bh + 2 * pad),
            pl.ds(pl.multiple_of(j * bw, 8), bw + 2 * pad),
            :,
        ],
        xblk,
        sem,
    )
    cp.start()
    cp.wait()

    x = xblk[:, :, :nf]
    dt = out_ref.dtype

    def rdb(n, a):
        w = tuple(ws[5 * n + k][:] for k in range(5))
        bias = tuple(bs[5 * n + k][0] for k in range(5))
        return _rdb_body(a, w, bias, gc)

    a1 = rdb(0, x)  # aligned +5,  extent X-10
    a2 = rdb(1, a1)  # aligned +10, extent X-20
    a3 = rdb(2, a2)  # aligned +15, extent X-30
    ah = x.shape[0]
    base = _roll_w(
        x[3 * _HALO : ah - 3 * _HALO].astype(jnp.float32), 3 * _HALO
    )
    out_full = (base + 0.2 * a3.astype(jnp.float32)).astype(dt)
    e = pad - 3 * _HALO
    out_ref[0] = out_full[e : e + bh, e : e + bw, :]


def _rdb_kernel(
    xp_ref,  # (B, Hp, Wp, nf+cpad) in ANY/HBM — padded input
    w0, w1, w2, w3, w4,  # regrouped weights, VMEM
    b1, b2, b3, b4, b5,  # biases (1, 1, cout_k), VMEM
    out_ref,  # (1, bh, bw, nf) VMEM block
    xblk,  # scratch (bh+2*_PAD, bw+2*_PAD, nf+cpad)
    sem,
    *,
    bh: int,
    bw: int,
    nf: int,
    gc: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        xp_ref.at[
            b,
            pl.ds(pl.multiple_of(i * bh, 8), bh + 2 * _PAD),
            pl.ds(pl.multiple_of(j * bw, 8), bw + 2 * _PAD),
            :,
        ],
        xblk,
        sem,
    )
    cp.start()
    cp.wait()

    g = gc
    dt = out_ref.dtype
    x = xblk[:, :, :nf]  # (X, WF, nf); X = bh+16, WF = bw+16

    t0 = _conv_roll(x, w0[:])  # depth 1, h extent X-2
    c1 = _lrelu(t0[:, :, :g] + b1[0]).astype(dt)
    t1 = _conv_roll(c1, w1[:])  # depth 2, h extent X-4
    c2 = _lrelu(
        _roll_w(t0[1:-1, :, g : 2 * g], 1) + t1[:, :, :g] + b2[0]
    ).astype(dt)
    t2 = _conv_roll(c2, w2[:])  # depth 3, h extent X-6
    c3 = _lrelu(
        _roll_w(t0[2:-2, :, 2 * g : 3 * g], 2)
        + _roll_w(t1[1:-1, :, g : 2 * g], 1)
        + t2[:, :, :g]
        + b3[0]
    ).astype(dt)
    t3 = _conv_roll(c3, w3[:])  # depth 4, h extent X-8
    c4 = _lrelu(
        _roll_w(t0[3:-3, :, 3 * g : 4 * g], 3)
        + _roll_w(t1[2:-2, :, 2 * g : 3 * g], 2)
        + _roll_w(t2[1:-1, :, g : 2 * g], 1)
        + t3[:, :, :g]
        + b4[0]
    ).astype(dt)
    t4 = _conv_roll(c4, w4[:])  # depth 5, h extent X-10
    c5 = (
        _roll_w(t0[4:-4, :, 4 * g :], 4)
        + _roll_w(t1[3:-3, :, 3 * g :], 3)
        + _roll_w(t2[2:-2, :, 2 * g :], 2)
        + _roll_w(t3[1:-1, :, g:], 1)
        + t4
        + b5[0]
    )
    # c5 row r / col j are centered on input (r+5, j+5); the output block
    # is input rows/cols [_PAD, _PAD+bh) -> c5 indices [_PAD-5, ...).
    e = _PAD - _HALO
    center = x[_PAD : _PAD + bh, _PAD : _PAD + bw, :].astype(jnp.float32)
    out = center + 0.2 * c5[e : e + bh, e : e + bw, :]
    out_ref[0] = out.astype(dt)


def _pick_block(h: int, w: int, prefer: Tuple[int, ...] = (64, 48, 32)) -> Tuple[int, int]:
    """Block size under a raised VMEM limit (v5e has 128MB; the 16MB
    scoped-VMEM figure is only the compiler default); prefer a divisor of
    the extent. Bigger blocks amortize the conv halo (the dominant
    overhead: useful/computed pixel ratio is (b/(b+2*halo))^2)."""
    def pick(n):
        for cand in prefer:
            if n % cand == 0:
                return cand
        return prefer[0]  # pad to a multiple

    return pick(h), pick(w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rrdb_fused(x: jax.Array, tp, interpret: bool = False) -> jax.Array:
    """Fully-fused RRDB (3 chained RDBs + outer residual) per block:
    ONE input read and ONE output write per spatial block — removes the
    two intermediate HBM round trips of per-RDB kernels.

    tp: {"rdb1": {"w": (w0..w4), "b": (b1..b5)}, "rdb2": ..., "rdb3": ...}
    in the source-major regrouped layout.
    """
    b, h, w, nf = x.shape
    gc = tp["rdb1"]["w"][1].shape[-2]
    # 64 is the largest block the Mosaic compile-helper handles for the
    # 3-RDB chain (128 blows up compile memory); halo overhead then makes
    # this kernel ~0.88x of the XLA path — hence opt-in.
    bh, bw = _pick_block(h, w, prefer=(64, 48, 32))
    pad = 16  # >= 3*_HALO, 8-aligned
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    hp, wp = h + ph, w + pw
    cpad = (128 - nf % 128) % 128
    xp = jnp.pad(
        x, ((0, 0), (pad, pad + ph), (pad, pad + pw), (0, cpad))
    )
    ws = []
    bs = []
    for r in ("rdb1", "rdb2", "rdb3"):
        ws += [wi.astype(x.dtype) for wi in tp[r]["w"]]
        bs += [
            bb.reshape(1, 1, -1).astype(jnp.float32) for bb in tp[r]["b"]
        ]

    kernel = functools.partial(
        _rrdb_kernel, bh=bh, bw=bw, nf=nf, gc=gc, pad=pad
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hp // bh, wp // bw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 30,
        out_specs=pl.BlockSpec(
            (1, bh, bw, nf), lambda bb, i, j: (bb, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * pad, bw + 2 * pad, nf + cpad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, *ws, *bs)
    return out[:, :h, :w, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def rdb_fused(
    x: jax.Array,
    ws: Sequence[jax.Array],
    bs: Sequence[jax.Array],
    interpret: bool = False,
) -> jax.Array:
    """Fused RDB forward: x (B, H, W, nf) -> (B, H, W, nf).

    ws/bs: source-major regrouped weights/biases (see rrdbnet).
    """
    b, h, w, nf = x.shape
    gc = ws[1].shape[-2]
    bh, bw = _pick_block(h, w)
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    hp, wp = h + ph, w + pw
    # channel padding to the 128-lane granule: HBM DMA slices must be
    # lane-aligned. The zero channels are stripped in-kernel.
    cpad = (128 - nf % 128) % 128
    xp = jnp.pad(
        x,
        ((0, 0), (_PAD, _PAD + ph), (_PAD, _PAD + pw), (0, cpad)),
    )
    bias3 = [bb.reshape(1, 1, -1).astype(jnp.float32) for bb in bs]
    wlist = [wi.astype(x.dtype) for wi in ws]

    kernel = functools.partial(_rdb_kernel, bh=bh, bw=bw, nf=nf, gc=gc)
    out = pl.pallas_call(
        kernel,
        grid=(b, hp // bh, wp // bw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(
            (1, bh, bw, nf), lambda bb, i, j: (bb, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, nf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * _PAD, bw + 2 * _PAD, nf + cpad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, *wlist, *bias3)
    return out[:, :h, :w, :]
