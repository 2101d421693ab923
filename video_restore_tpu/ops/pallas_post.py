"""Pallas TPU kernel: single-pass fused unsharp mask.

The XLA unsharp (ops/post.py) traced ~11 ms per 8K frame in the round-3
flagship: the separable blur is already shifted-slice form, but XLA
materializes the padded intermediates in HBM — two `mode="edge"` pads of
a ~400MB fp32 frame plus the vertical-pass output round-trip. Here one
stripe kernel does the whole thing per window: DMA a (bh + 2*radius,
W*C) row window once, apply both separable passes and the highpass
blend in VMEM, write the (bh, W*C) output once — HBM traffic drops to
exactly one read + one write of the frame.

Layout notes (same trick as ops/post.gaussian_blur): the (H, W, C) frame
is viewed as (H, W*C), so vertical taps are leading-dim slices and
horizontal taps are slices at multiples of C. Edge handling reproduces
`mode="edge"` replicate padding exactly: W edges by an in-window
replicate concat, H edges by clamped DMA + in-window row replication on
the first/last stripes (matching jnp.pad(..., mode="edge"))."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_restore_tpu.ops.post import _gaussian_kernel1d


def _unsharp_kernel(
    x_ref,  # (B, H, WC) ANY/HBM — (H, W, C) viewed as rows x (W*C)
    out_ref,  # (1, bh, WC) VMEM block
    xblk,  # scratch (2, bh + 2*radius, WC)
    sem,
    *,
    bh: int,
    h: int,
    wc: int,
    c: int,
    nstripes: int,
    nb: int,
    radius: int,
    taps: tuple,
    amount: float,
    threshold: float,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    m = bi * nstripes + si
    # 8-row margins (not `radius`): Mosaic requires dynamic sublane-dim
    # DMA offsets provably divisible by the (8, 128) tiling, so windows
    # start at si*bh - 8 (8 | bh) and output row 0 sits at window row 8
    he = bh + 16

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        a = pl.multiple_of(jnp.clip(ii * bh - 8, 0, h - he), 8)
        return pltpu.make_async_copy(
            x_ref.at[bb, pl.ds(a, he)], xblk.at[slot], sem.at[slot]
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()

    @pl.when(m + 1 < nb * nstripes)
    def _():
        dma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()

    # H-edge replicate fixups: a clamped DMA lands the frame edge
    # mid-window; shift and replicate the edge row, reproducing
    # jnp.pad(mode="edge") exactly. Only the first/last stripes clamp
    # (8 | h and 8 | bh make every interior window start in-range).
    @pl.when(si == 0)
    def _():
        win = xblk[m % 2]
        top = jnp.broadcast_to(win[:1], (8,) + win.shape[1:])
        xblk[m % 2] = jnp.concatenate([top, win[: he - 8]], axis=0)

    shift_last = (nstripes - 1) * bh - 8 - (h - he)  # = hp - h + 8 >= 8
    if nstripes > 1 and shift_last > 0:
        @pl.when(si == nstripes - 1)
        def _():
            win = xblk[m % 2]
            bot = jnp.broadcast_to(
                win[-1:], (shift_last,) + win.shape[1:]
            )
            xblk[m % 2] = jnp.concatenate(
                [win[shift_last:], bot], axis=0
            )

    x = xblk[m % 2]
    dt = x.dtype
    xf = x.astype(jnp.float32)

    # vertical pass (leading-dim slices): output rows sit at window rows
    # [8, 8 + bh); tap i reads rows [8 - radius + i, ...)
    v = None
    for i, ki in enumerate(taps):
        t = xf[8 - radius + i : 8 - radius + i + bh] * ki
        v = t if v is None else v + t

    # horizontal pass with W-edge replicate: pad the row vector by
    # radius pixels (=radius*c lanes) of the edge pixel on each side
    left = jnp.concatenate([v[:, :c]] * radius, axis=1)
    right = jnp.concatenate([v[:, wc - c :]] * radius, axis=1)
    vp = jnp.concatenate([left, v, right], axis=1)
    blur = None
    for i, ki in enumerate(taps):
        t = vp[:, i * c : i * c + wc] * ki
        blur = t if blur is None else blur + t

    center = xf[8 : 8 + bh]
    hp = center - blur
    if threshold > 0:
        hp = jnp.where(jnp.abs(hp) >= threshold, hp, 0.0)
    out_ref[0] = jnp.clip(center + amount * hp, 0.0, 1.0).astype(dt)


@functools.partial(
    jax.jit,
    static_argnames=(
        "amount", "sigma", "radius", "threshold", "block_h", "interpret",
    ),
)
def unsharp_fused(
    x: jax.Array,
    amount: float = 0.5,
    sigma: float = 1.0,
    radius: int = 3,
    threshold: float = 0.0,
    *,
    block_h: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Single-pass fused unsharp mask: same math and edge semantics as
    ops.post.unsharp_mask (fp32 internally, clipped to [0, 1]), one HBM
    read + one write. x: (B, H, W, C) float."""
    b, h, w, c = x.shape
    wc = w * c
    bh = block_h or max(8, min(128, (4 << 20) // (wc * 4) // 8 * 8))
    hp_ = h + (bh - h % bh) % bh
    nstripes = hp_ // bh
    he = bh + 16
    if h < he or h % 8 or radius > 8:
        # tiny frames / unaligned heights / huge radii: the XLA form
        # (8-row DMA margins need 8 | h; video heights always qualify)
        from video_restore_tpu.ops.post import unsharp_mask

        return unsharp_mask(
            x, amount=amount, sigma=sigma, radius=radius,
            threshold=threshold,
        )
    taps = tuple(float(k) for k in np.asarray(_gaussian_kernel1d(sigma, radius)))
    xv = x.reshape(b, h, wc)

    kernel = functools.partial(
        _unsharp_kernel,
        bh=bh, h=h, wc=wc, c=c, nstripes=nstripes, nb=b,
        radius=radius, taps=taps, amount=amount, threshold=threshold,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, bh, wc), lambda bb, i: (bb, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp_, wc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, he, wc), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xv)
    return out[:, :h].reshape(b, h, w, c)
