"""Pallas TPU kernel: fully-fused Residual Dense Block.

The RDB is the hot loop of RRDBNet (69 instances in the 23-block model —
SURVEY.md §3.4). In the XLA path, every one of its five convs streams its
input and output through HBM; with the source-major regrouping the
per-RDB HBM traffic is still ~10x the input size. This kernel keeps the
entire dense-block chain resident in VMEM:

- the grid tiles the frame into (bh x bw) spatial blocks; each program
  DMAs one input window with a 5-pixel halo (5 chained 3x3 valid convs),
- all five regrouped convs (t0..t4) and the growth activations (c1..c4)
  live in VMEM; each 3x3 conv is 9 shifted MXU matmuls with fp32
  accumulation,
- only the final (bh x bw x nf) residual output is written back.

HBM traffic per RDB drops from ~10x to 2x the feature map size, which
moves the body from bandwidth-bound to MXU-bound.

Weights must be in the source-major regrouped layout
(models/rrdbnet._regroup_rdb_weights).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 5  # five chained 3x3 valid convs
# DMA window extents must be aligned to the 8-sublane tiling, so the
# transferred halo is 8 (the 3 extra pixels are cropped after the chain)
_PAD = 8


def _conv3x3_valid(a: jax.Array, w: jax.Array) -> jax.Array:
    """(ah, aw, cin) x (3, 3, cin, cout) -> (ah-2, aw-2, cout) fp32.

    Nine shifted matmuls on the MXU; the row dimension is the spatial
    window (kept 3-D — Mosaic collapses the leading dims itself, avoiding
    explicit relayout reshapes).
    """
    ah, aw, cin = a.shape
    oh, ow = ah - 2, aw - 2
    cout = w.shape[-1]
    acc = jnp.zeros((oh, ow, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = a[dy : dy + oh, dx : dx + ow, :]
            acc = acc + jax.lax.dot_general(
                sl, w[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb_kernel(
    xp_ref,  # (B, Hp, Wp, nf) in ANY/HBM — padded input
    w0, w1, w2, w3, w4,  # regrouped weights, VMEM
    b1, b2, b3, b4, b5,  # biases (1, 1, cout_k), VMEM
    out_ref,  # (1, bh, bw, nf) VMEM block
    xblk,  # scratch (bh+10, bw+10, nf)
    sem,
    *,
    bh: int,
    bw: int,
    gc: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    cp = pltpu.make_async_copy(
        xp_ref.at[
            b,
            pl.ds(i * bh, bh + 2 * _PAD),
            pl.ds(j * bw, bw + 2 * _PAD),
            :,
        ],
        xblk,
        sem,
    )
    cp.start()
    cp.wait()

    # drop the alignment surplus so the chain sees exactly the 5-px halo,
    # and the lane-alignment channel padding (HBM DMA needs 128 lanes)
    e = _PAD - _HALO
    nf = out_ref.shape[-1]
    x = xblk[e : e + bh + 2 * _HALO, e : e + bw + 2 * _HALO, :nf]
    dt = x.dtype
    g = gc

    t0 = _conv3x3_valid(x, w0[:])  # (bh+8, bw+8, 4g+nf) fp32
    c1 = _lrelu(t0[..., :g] + b1[0]).astype(dt)
    t0 = t0.astype(dt)
    t1 = _conv3x3_valid(c1, w1[:])  # (bh+6, bw+6, 3g+nf)
    c2 = _lrelu(
        t0[1:-1, 1:-1, g : 2 * g].astype(jnp.float32)
        + t1[..., :g] + b2[0]
    ).astype(dt)
    t1 = t1.astype(dt)
    t2 = _conv3x3_valid(c2, w2[:])  # (bh+4, bw+4, 2g+nf)
    c3 = _lrelu(
        t0[2:-2, 2:-2, 2 * g : 3 * g].astype(jnp.float32)
        + t1[1:-1, 1:-1, :g].astype(jnp.float32)
        + t2[..., :g] + b3[0]
    ).astype(dt)
    t2 = t2.astype(dt)
    t3 = _conv3x3_valid(c3, w3[:])  # (bh+2, bw+2, g+nf)
    c4 = _lrelu(
        t0[3:-3, 3:-3, 3 * g : 4 * g].astype(jnp.float32)
        + t1[2:-2, 2:-2, g : 2 * g].astype(jnp.float32)
        + t2[1:-1, 1:-1, :g].astype(jnp.float32)
        + t3[..., :g] + b4[0]
    ).astype(dt)
    t3 = t3.astype(dt)
    t4 = _conv3x3_valid(c4, w4[:])  # (bh, bw, nf) fp32
    c5 = (
        t0[4:-4, 4:-4, 4 * g :].astype(jnp.float32)
        + t1[3:-3, 3:-3, 3 * g :].astype(jnp.float32)
        + t2[2:-2, 2:-2, 2 * g :].astype(jnp.float32)
        + t3[1:-1, 1:-1, g:].astype(jnp.float32)
        + t4 + b5[0]
    )
    center = x[_HALO:-_HALO, _HALO:-_HALO, :].astype(jnp.float32)
    out_ref[0] = (center + 0.2 * c5).astype(dt)


def _pick_block(h: int, w: int) -> Tuple[int, int]:
    """Largest block <=64 that divides the (padded) extent; VMEM budget is
    sized for 64x64 at nf=64, gc=32."""
    def pick(n):
        for cand in (64, 48, 32):
            if n % cand == 0:
                return cand
        return 64  # caller pads to a multiple of the block

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

    kernel = functools.partial(_rdb_kernel, bh=bh, bw=bw, gc=gc)
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
        interpret=interpret,
    )(xp, *wlist, *bias3)
    return out[:, :h, :w, :]
