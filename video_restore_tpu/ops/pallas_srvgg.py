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
)


def fold_dy(w: jax.Array) -> jax.Array:
    """(..., 3, 3, cin, cout) -> (..., 3, 3*cin, cout): dx-major, dy
    folded into K (same transform as prefix_rdb_weights' x-source)."""
    w = jnp.swapaxes(w, -4, -3)  # (..., kw, kh, cin, cout)
    return w.reshape(w.shape[:-3] + (3 * w.shape[-2], w.shape[-1]))


def _srvgg_stripe_kernel(
    xp_ref,  # (B, hp + 2*bh, Wf, nfp) ANY — padded input
    w_ref,  # (G, 3, 3*nf, nf) per-dx or (G, 9*nf, nf) im2col, VMEM
    b_ref,  # (G, 1, nf) VMEM fp32 biases
    a_ref,  # (G, 1, nf) VMEM fp32 PReLU alphas
    out_ref,  # (1, bh, Wf, nfp) VMEM block
    xblk,  # (2, bh + 2*G, Wf, nfp) input double-buffer
    sem,
    *,
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
            acc = _conv_prefix(t, w_ref[g]) + b_ref[g]  # (e-2, wf, nf) f32
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
    interpret: bool = False,
) -> jax.Array:
    """``group`` chained conv3x3+PReLU layers in padded stripe form:
    (B, hp+2*bh, Wf, nfp) -> same shape, chainable."""
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
        bh=bh, h=frame_h, w=frame_w, wf=wf, nf=nf, group=group,
        nstripes=nstripes, nb=b, cpad=cpad,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nstripes + 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
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
        ws.astype(xp.dtype),
        bs.reshape(group, 1, nf).astype(jnp.float32),
        alphas.reshape(group, 1, nf).astype(jnp.float32),
    )
