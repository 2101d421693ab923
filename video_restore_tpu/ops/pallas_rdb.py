"""Pallas TPU kernel: fully-fused Residual Dense Block.

The RDB is the hot loop of RRDBNet (69 instances in the 23-block model —
SURVEY.md §3.4). In the XLA path, every one of its five convs streams its
input and output through HBM; with the source-major regrouping the
per-RDB HBM traffic is still ~10x the input size. This kernel keeps the
entire dense-block chain resident in VMEM:

- the grid tiles the frame into (bh x bw) spatial blocks; each program
  DMAs one input window with a 5-pixel halo (5 chained 3x3 valid convs),
- all five regrouped convs (t0..t4) and the growth activations (c1..c4)
  live in VMEM scratch refs; each 3x3 conv is a fori_loop of 9 shifted MXU
  matmuls accumulated in fp32 (looped, not unrolled — Mosaic
  stack-allocates temporaries per op, and an unrolled 45-matmul body blows
  the 16MB scoped-VMEM budget),
- only the final (bh x bw x nf) residual output is written back.

HBM traffic per RDB drops from ~10x to ~2x the feature map size, moving
the body from bandwidth-bound toward MXU-bound.

Weights must be in the source-major regrouped layout
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
# DMA window extents must be aligned to the 8-sublane tiling, so the
# transferred halo is 8 (the 3 extra pixels are cropped in-kernel)
_PAD = 8


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _conv3x3_valid(a: jax.Array, w: jax.Array) -> jax.Array:
    """(ah, aw, cin) x (3, 3, cin, cout) -> (ah-2, aw-2, cout) fp32.

    Fully unrolled 9 shifted MXU matmuls on values. This needs
    vmem_limit_bytes well above the 16MB default (Mosaic stack-allocates
    the relayout copies of the unaligned slices); v5e has 128MB VMEM."""
    ah, aw, cin = a.shape
    oh, ow = ah - 2, aw - 2
    cout = w.shape[-1]
    acc = jnp.zeros((oh, ow, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = a[dy : dy + oh, dx : dx + ow, :]
            acc = acc + lax.dot_general(
                sl, w[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _conv_ref(src_ref, w_ref, dst_ref, *, oh: int, ow: int, cin: int, base: int):
    """3x3 valid conv reading a window of ``src_ref`` starting at ``base``,
    accumulated into ``dst_ref`` (fp32)."""
    dst_ref[...] = _conv3x3_valid(
        src_ref[base : base + oh + 2, base : base + ow + 2, :cin], w_ref[:]
    )


def _rdb_kernel(
    xp_ref,  # (B, Hp, Wp, nf+cpad) in ANY/HBM — padded input
    w0, w1, w2, w3, w4,  # regrouped weights, VMEM
    b1, b2, b3, b4, b5,  # biases (1, 1, cout_k), VMEM
    out_ref,  # (1, bh, bw, nf) VMEM block
    xblk,  # scratch (bh+2*_PAD, bw+2*_PAD, nf+cpad) bf16
    t0, t1, t2, t3, t4,  # fp32 conv accumulators
    c1, c2, c3, c4,  # growth activations (model dtype)
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
    e = _PAD - _HALO  # alignment surplus inside the DMA'd window
    dt = out_ref.dtype

    # t0 spans (bh+8, bw+8): conv window starts at e within xblk
    _conv_ref(xblk, w0, t0, oh=bh + 8, ow=bw + 8, cin=nf, base=e)
    c1[...] = _lrelu(t0[:, :, :g] + b1[0]).astype(dt)
    _conv_ref(c1, w1, t1, oh=bh + 6, ow=bw + 6, cin=g, base=0)
    c2[...] = _lrelu(
        t0[1:-1, 1:-1, g : 2 * g] + t1[:, :, :g] + b2[0]
    ).astype(dt)
    _conv_ref(c2, w2, t2, oh=bh + 4, ow=bw + 4, cin=g, base=0)
    c3[...] = _lrelu(
        t0[2:-2, 2:-2, 2 * g : 3 * g]
        + t1[1:-1, 1:-1, g : 2 * g]
        + t2[:, :, :g]
        + b3[0]
    ).astype(dt)
    _conv_ref(c3, w3, t3, oh=bh + 2, ow=bw + 2, cin=g, base=0)
    c4[...] = _lrelu(
        t0[3:-3, 3:-3, 3 * g : 4 * g]
        + t1[2:-2, 2:-2, 2 * g : 3 * g]
        + t2[1:-1, 1:-1, g : 2 * g]
        + t3[:, :, :g]
        + b4[0]
    ).astype(dt)
    _conv_ref(c4, w4, t4, oh=bh, ow=bw, cin=g, base=0)
    c5 = (
        t0[4:-4, 4:-4, 4 * g :]
        + t1[3:-3, 3:-3, 3 * g :]
        + t2[2:-2, 2:-2, 2 * g :]
        + t3[1:-1, 1:-1, g:]
        + t4[...]
        + b5[0]
    )
    center = xblk[
        _PAD : _PAD + bh, _PAD : _PAD + bw, :nf
    ].astype(jnp.float32)
    out_ref[0] = (center + 0.2 * c5).astype(dt)


def _pick_block(h: int, w: int) -> Tuple[int, int]:
    """Block size: 64 with a raised VMEM limit (v5e has 128MB; the 16MB
    scoped-VMEM figure is only the compiler default); prefer a divisor of
    the extent."""
    def pick(n):
        for cand in (64, 48, 32):
            if n % cand == 0:
                return cand
        return 64  # pad to a multiple

    return pick(h), pick(w)


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
    f32 = jnp.float32
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
            pltpu.VMEM((bh + 8, bw + 8, 4 * gc + nf), f32),  # t0
            pltpu.VMEM((bh + 6, bw + 6, 3 * gc + nf), f32),  # t1
            pltpu.VMEM((bh + 4, bw + 4, 2 * gc + nf), f32),  # t2
            pltpu.VMEM((bh + 2, bw + 2, gc + nf), f32),  # t3
            pltpu.VMEM((bh, bw, nf), f32),  # t4
            pltpu.VMEM((bh + 8, bw + 8, gc), x.dtype),  # c1
            pltpu.VMEM((bh + 6, bw + 6, gc), x.dtype),  # c2
            pltpu.VMEM((bh + 4, bw + 4, gc), x.dtype),  # c3
            pltpu.VMEM((bh + 2, bw + 2, gc), x.dtype),  # c4
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, *wlist, *bias3)
    return out[:, :h, :w, :]
