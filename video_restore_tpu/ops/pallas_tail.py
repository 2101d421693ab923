"""Pallas TPU kernels for everything around the RRDBNet body: the fused
tail (upconv2 + conv_hr + conv_last), the fused phase-form upconv1
(up1_fused), and the glue convs (conv3x3_fused: stem conv_first,
conv_body + residual). Together with the stripe body kernels
(ops/pallas_stripe.py) the full-frame production forward runs every conv
in Pallas; XLA keeps only pads/slices and the post stack.

== The fused tail ==

The round-3 flagship trace put the tail at ~98 ms/frame: upconv2's
conv_transpose at 42 TF/s (25.8 ms), conv_hr at 65 TF/s in XLA's 5-D conv
layout (37.6 ms), conv_last at 4 TF/s (28.7 ms — cout=3 is 2.3% MXU lane
occupancy), plus ~6 ms of layout copies. The XLA-level sd-tail rewrite
(models/rrdbnet.py _tail_sdt) measured a net LOSS (0.983 -> 0.907
fps/chip): XLA re-layouts the intermediates anyway. This kernel fuses the
three stages in VMEM with explicit layouts instead:

1. **upconv2 as a phase-form stripe conv.** The nearest-2x-up + 3x3 conv
   is one coarse-grid 3x3 conv to 4*cout phase-major channels
   (ops/conv.py up_phase_kernel_pm), run in stripe form (dy folded into
   K=192, three dx matmuls at N=256 = 100% lane occupancy, hardware
   rolls for column alignment).

2. **W-sd fine representation.** Mosaic cannot split the 256-lane dim
   into (2, 2, 64) (unsupported shape cast), so the fine grid is only
   HALF-unpacked: the two row phases are interleaved through the free
   leading dimension (128-aligned lane slices + a leading-dims reshape),
   while the two column phases stay lane-packed as (b, o) channel pairs
   — each W-sd pixel j holds fine columns 2j and 2j+1.

3. **W-sd fine convs.** A fine 3x3 conv in this layout contracts
   K = 3(dy) x 128((b'', o'')) = 384 and writes both column phases at
   once. Output tap offsets collapse to coarse column shifts
   dv in {-1, 0, +1}; packing dv into N gives one (M, 384) x (384, 3N)
   matmul per conv whose per-dv output blocks are 128-lane ALIGNED
   (conv_hr: N = 3x128; conv_last: N = 3x6), then slice + hardware-roll
   + add. The dv=+-1 blocks are half-sparse (structural zeros), so the
   conv_hr matmul pays a 2.0x MAC tax at 100%/100% occupancy =
   50% effective useful throughput — still ~1.5x XLA's 33%, with the
   conv_last and all layout copies riding along for free.

4. Output is fine-rows x W-sd RGB (6 channels); one cheap 6-channel
   reshape in XLA restores (B, 4H, 4W, 3).

Everything is masked to the frame exactly as ops/pallas_stripe.py does,
so SAME-conv edge semantics match basicsr's tail bit-for-reassociation
(/root/reference/video_upscaler.py:313-321 via basicsr RRDBNet).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_restore_tpu.ops.pallas_stripe import _PADL, _roll_w

_HALO2 = 2  # coarse-row halo: 1 (upconv 3x3) + 1 (two fine 3x3s = 2 fine rows)


def fold_dy(w: jax.Array) -> jax.Array:
    """(3, 3, cin, cout) -> (3, 3*cin, cout): dx-major, dy folded into K
    (dy-major within K), matching ops/pallas_stripe._conv_prefix."""
    w = jnp.swapaxes(w, 0, 1)  # (kw, kh, cin, cout)
    return w.reshape(3, w.shape[1] * w.shape[2], w.shape[3])


def wsd_kernel(w: np.ndarray | jax.Array) -> jax.Array:
    """(3, 3, cin, cout) fine conv kernel -> W-sd packed (3*2*cin,
    3*(2*cout)) matrix: :func:`wsd_kernel_r` at r=2.

    K index = dy*(2*cin) + b''*cin + o''; N index = (dv+1)*(2*cout)
    + b'*cout + o'. Derivation: fine output col 2j+b' tap dx reads fine
    col 2j + b' + dx - 1 = 2(j+dv) + b'' with b'' = (b'+dx-1) mod 2,
    dv = floor((b'+dx-1)/2).
    """
    return wsd_kernel_r(jnp.asarray(w), 2)


def _conv_chunked(a, w, taps, post, rc: int):
    """Chained stripe conv with per-row-chunk postprocessing.

    a: (e, Wf, cin); w: dx/dv-packed (3*cin, 3*n) matrix; ``taps`` are
    the column shifts of the three N blocks (conv form: (-1, 0, 1) after
    dx alignment; W-sd form: (-1, 0, 1) coarse dv). ``post(f32_chunk,
    row0) -> chunk`` runs while only one fp32 chunk is live, so the
    full-stripe fp32 accumulator never exists. Returns (e-2, Wf, n).
    """
    e, wf, cin = a.shape
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
        for i, d in enumerate(taps):
            part = _roll_w(p[:, :, i * n : (i + 1) * n], d)
            q = part if q is None else q + part
        outs.append(post(q, r0))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _interleave_rows(y: jax.Array) -> jax.Array:
    """(r, j, 2*c) with (a, ...) lane blocks -> (2r, j, c): row phases
    move to the free leading dim (128-aligned lane slices only)."""
    rows, wf, c2 = y.shape
    c = c2 // 2
    a0 = y[:, :, :c]
    a1 = y[:, :, c:]
    t = jnp.stack([a0, a1], axis=1)  # (r, 2, j, c) — leading dims
    return t.reshape(2 * rows, wf, c)


def _tail_kernel(
    xh_ref,  # (B, H2 + pads, Wf2, nf) ANY/HBM — 2x-grid activations
    ku2,  # (192, 768) dx-packed phase-form upconv2 kernel, VMEM
    khr,  # (384, 384) W-sd conv_hr kernel
    klast,  # (384, 18) W-sd conv_last kernel
    bu2, bhr, blast,  # biases (1, 1, 256|128|6) fp32
    out_ref,  # (1, 2*bh2, W2, 6) VMEM block — fine rows x W-sd RGB
    xblk,  # scratch (2, bh2 + 2*_HALO2, Wf2, 128) double-buffer
    sem,  # DMA semaphores (2,)
    *,
    bh2: int,
    h2: int,
    w2: int,
    wf2: int,
    nf: int,
    nstripes: int,
    nb: int,
    rc: int,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    m = bi * nstripes + si
    he = bh2 + 2 * _HALO2

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xh_ref.at[bb, pl.ds(ii * bh2, he)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()

    @pl.when(m + 1 < nb * nstripes)
    def _():
        dma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()
    x = xblk[m % 2][:, :, :nf]
    out_ref[0] = _tail_core(
        x, si, ku2, khr, klast, bu2, bhr, blast,
        bh2=bh2, h2=h2, w2=w2, wf2=wf2, rc=rc,
    )


def _tail_core(
    x, si, ku2, khr, klast, bu2, bhr, blast, *, bh2, h2, w2, wf2, rc
):
    """The tail's three fused convs on one stripe window x
    (bh2 + 2*_HALO2, wf2, nf); window row 0 is coarse frame row
    si*bh2 - 1. Returns the (2*bh2, w2, 6) W-sd RGB block."""
    dt = x.dtype
    c0 = si * bh2 - 1  # coarse frame row of y2 row 0

    cols2 = lax.broadcasted_iota(jnp.int32, (1, wf2, 1), 1)
    col2_ok = (cols2 >= _PADL) & (cols2 < _PADL + w2)

    def post_u2(q, r0):
        rows = lax.broadcasted_iota(jnp.int32, (q.shape[0], 1, 1), 0)
        ok = ((rows + c0 + r0 >= 0) & (rows + c0 + r0 < h2)) & col2_ok
        q = jax.nn.leaky_relu(q + bu2[0], 0.2)
        return jnp.where(ok, q, 0.0).astype(dt)

    # upconv2 (phase-major (a, b, o)): dx-packed like the body kernels
    y2 = _conv_chunked(x, ku2[:], (-1, 0, 1), post_u2, rc)
    # fine-rows x W-sd: (2*(bh2+2), wf2, 128), channels (b, o);
    # row g <-> fine frame row 2*c0 + g
    f = _interleave_rows(y2)

    def post_hr(q, r0):
        rows = lax.broadcasted_iota(jnp.int32, (q.shape[0], 1, 1), 0)
        rf = rows + 2 * c0 + 1 + r0
        ok = ((rf >= 0) & (rf < 2 * h2)) & col2_ok
        q = jax.nn.leaky_relu(q + bhr[0], 0.2)
        return jnp.where(ok, q, 0.0).astype(dt)

    hr = _conv_chunked(f, khr[:], (-1, 0, 1), post_hr, rc)

    def post_last(q, r0):
        return (q + blast[0]).astype(dt)

    rgb = _conv_chunked(hr, klast[:], (-1, 0, 1), post_last, rc)
    return rgb[:, _PADL : _PADL + w2, :]


def _tail_raw_kernel(
    xc_ref,  # (1, bh2, 2*Wf1u, nf) VMEM block — stripe body rows
    xt_ref,  # (1, _HALO2, 2*Wf1u, nf) VMEM block — 2 rows above
    xb_ref,  # (1, _HALO2, 2*Wf1u, nf) VMEM block — 2 rows below
    ku2, khr, klast, bu2, bhr, blast,
    out_ref,  # (1, 2*bh2, W2, 6) VMEM block
    *,
    bh2: int,
    h2: int,
    w2: int,
    wf2: int,
    nf: int,
    nstripes: int,
    rc: int,
):
    """tail_fused reading up1_fused's RAW output directly (round 4): no
    pre-padded 128-lane tail input exists in HBM at all — the lax.pad
    that built it rewrote a (B, hp2+4, wf2, 128) array (~2.1GB bf16 at
    8K) every frame.

    Layout route (all three in-VMEM unpack idioms are Mosaic dead-ends
    on this toolchain — reshape/stack/flattened-lead minor splits all
    fail infer-vector-layout with 'unsupported shape cast', and a manual
    make_async_copy from a 64-lane-minor HBM view fails memref_slice;
    both probed on v5e, BENCH_NOTES round 4): the lane-pair ->
    fine-column unpack is a FREE row-major reshape done in XLA (bitcast,
    no data movement), and the kernel takes AUTOMATIC BlockSpec
    pipelining over the 64-lane fine array — measured legal where the
    manual DMA is not. Row halos come from two extra 2-row strip specs
    of the same array (index-map clamped at the edges; the halo content
    outside the frame is exact zeros by up1's mask, and the first/last
    stripes substitute explicit zeros where the clamp would alias
    interior rows). The raw frame's column origin (fine col f = tail
    col f + _PADL, from up1's doubled _PADL margin) is absorbed by a
    static column slice."""
    si = pl.program_id(1)
    top = jnp.where(si == 0, 0, xt_ref[0]).astype(xc_ref.dtype)
    bot = jnp.where(si == nstripes - 1, 0, xb_ref[0]).astype(xc_ref.dtype)
    win = jnp.concatenate([top, xc_ref[0], bot], axis=0)
    x = win[:, _PADL : _PADL + wf2, :]
    out_ref[0] = _tail_core(
        x, si, ku2, khr, klast, bu2, bhr, blast,
        bh2=bh2, h2=h2, w2=w2, wf2=wf2, rc=rc,
    )


@functools.partial(
    jax.jit,
    static_argnames=("h2", "w2", "block_h", "row_chunk", "interpret"),
)
def tail_fused_raw(
    xq: jax.Array,
    w_up2: jax.Array,
    b_up2: jax.Array,
    w_hr: jax.Array,
    b_hr: jax.Array,
    w_last: jax.Array,
    b_last: jax.Array,
    *,
    h2: int,
    w2: int,
    block_h: int | None = None,
    row_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """tail_fused consuming up1_fused(masked=True)'s raw output directly
    (no up1_raw_to_tail_input pad): xq (B, hq, Wf1u, 2*nf) -> RGB
    (B, 2*h2, 2*w2, 3). Exact same math as the pre-padded chain."""
    from video_restore_tpu.ops.conv import up_phase_kernel_pm
    from video_restore_tpu.ops.pallas_stripe import pack_prefix_weights

    b, hq, wf1u, lanes = xq.shape
    nf = lanes // 2
    bh2, wf2, rc, hp2, _ = tail_geom(h2, w2, nf, block_h, row_chunk)
    if _PADL + wf2 > 2 * wf1u:
        raise ValueError(
            f"raw width {wf1u} too narrow for tail width {wf2}"
        )
    if hp2 > hq or bh2 % 2 or hq % 2:
        # the block-pipelined form needs stripe-aligned raw rows; callers
        # fall back to up1_raw_to_tail_input + tail_fused otherwise
        raise ValueError(
            f"raw rows {hq} do not cover the {hp2}-row stripe grid "
            f"(bh2={bh2})"
        )
    nstripes = hp2 // bh2

    ku2 = pack_prefix_weights(
        [fold_dy(up_phase_kernel_pm(w_up2))], pack=(0,)
    )[0].astype(xq.dtype)
    khr = wsd_kernel(w_hr).astype(xq.dtype)
    klast = wsd_kernel(w_last).astype(xq.dtype)
    bu2 = jnp.tile(b_up2, 4).reshape(1, 1, -1).astype(jnp.float32)
    bhr = jnp.tile(b_hr, 2).reshape(1, 1, -1).astype(jnp.float32)
    blast = jnp.tile(b_last, 2).reshape(1, 1, -1).astype(jnp.float32)

    # the lane-pair -> fine-column unpack, FREE in XLA (row-major bitcast)
    fine = xq.reshape(b, hq, 2 * wf1u, nf)
    hb = bh2 // 2  # strip index stride, in 2-row block units
    lastrow = hq // _HALO2 - 1

    kernel = functools.partial(
        _tail_raw_kernel,
        bh2=bh2, h2=h2, w2=w2, wf2=wf2, nf=nf,
        nstripes=nstripes, rc=rc,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[
            pl.BlockSpec(
                (1, bh2, 2 * wf1u, nf), lambda bb, i: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _HALO2, 2 * wf1u, nf),
                lambda bb, i: (bb, jnp.maximum(i * hb - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _HALO2, 2 * wf1u, nf),
                lambda bb, i: (
                    bb, jnp.minimum(i * hb + hb, lastrow), 0, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, 2 * bh2, w2, 6), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * hp2, w2, 6), xq.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fine, fine, fine, ku2, khr, klast, bu2, bhr, blast)
    out = out[:, : 2 * h2]
    return out.reshape(b, 2 * h2, 2 * w2, 3)


def tail_geom(
    h2: int, w2: int, nf: int,
    block_h: int | None = None, row_chunk: int = 8,
):
    """Shared tail geometry: (bh2, wf2, rc, hp2, cpad). Callers building
    a pre-padded input (tail_fused(pre_padded=True)) MUST use this."""
    import os as _os

    bh_env = _os.environ.get("VRT_TAIL_BH")
    if bh_env:
        bh2 = int(bh_env)
    elif block_h:
        bh2 = block_h
    elif w2 <= 1100:
        bh2 = 32
    elif w2 <= 2100:
        bh2 = 16
    else:
        bh2 = 8
    wf2 = _PADL + w2 + _PADL
    wf2 += (8 - wf2 % 8) % 8
    rc_env = _os.environ.get("VRT_TAIL_RC")
    if rc_env:
        rc = int(rc_env)
    else:
        rc = max(2, min(row_chunk, (row_chunk * 1024) // wf2))
    cpad = (128 - nf % 128) % 128
    hp2 = h2 + (bh2 - h2 % bh2) % bh2
    return bh2, wf2, rc, hp2, cpad


def up1_raw_to_tail_input(
    xq: jax.Array, h2: int, w2: int
) -> jax.Array:
    """Build tail_fused's pre-padded input from up1_fused's masked RAW
    output with ONE fused crop+pad (lax.pad with negative lows/highs).

    Keeps the layout invariant (the free lane-pair -> fine-column
    reshape, _PADL margins, _HALO2 rows, the 128-lane cpad) in this
    module next to tail_geom; callers pass the result to
    ``tail_fused(..., pre_padded=True, h2=h2, w2=w2)``. Requires xq's
    non-frame rows/cols to be exact zeros (up1_fused(masked=True)).
    """
    bq, hq, wf1u, lanes2 = xq.shape
    nf = lanes2 // 2
    fine = xq.reshape(bq, hq, 2 * wf1u, nf)
    _, wf2, _, hp2, cpad = tail_geom(h2, w2, nf)
    cols_in = 2 * wf1u
    return lax.pad(
        fine,
        jnp.zeros((), fine.dtype),
        (
            (0, 0, 0),
            (_HALO2, hp2 + _HALO2 - hq, 0),
            (-_PADL, wf2 - cols_in + _PADL, 0),
            (0, cpad, 0),
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_h", "interpret", "row_chunk", "pre_padded", "h2", "w2",
    ),
)
def tail_fused(
    xh: jax.Array,
    w_up2: jax.Array,
    b_up2: jax.Array,
    w_hr: jax.Array,
    b_hr: jax.Array,
    w_last: jax.Array,
    b_last: jax.Array,
    *,
    block_h: int | None = None,
    row_chunk: int = 8,
    pre_padded: bool = False,
    h2: int | None = None,
    w2: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused tail: xh (B, H2, W2, nf) — the 2x grid after
    lrelu(upconv1) — -> (B, 2*H2, 2*W2, 3) RGB.

    Equivalent to::

        f = leaky_relu(upconv2x(xh, w_up2, b_up2))
        f = leaky_relu(conv2d(f, w_hr, b_hr))
        return conv2d(f, w_last, b_last)
    """
    from video_restore_tpu.ops.conv import up_phase_kernel_pm
    from video_restore_tpu.ops.pallas_stripe import pack_prefix_weights

    # measured on v5e at wf2=1024 (flagship tile): bh2 8/16/32 ->
    # 83/43/41 ms per 4-tile call; VMEM scales ~linearly with bh2*wf2,
    # anchor: bh2=32 at wf2=1024 compiles (~130MB peak). The live fp32
    # chunk is (rc, wf2, 768)x4B — at full-frame widths rc scales down
    # else the kernel VMEM-OOMs (95MB scoped alloc seen at rc=8). Lane
    # cpad to 128: Mosaic requires HBM DMA operands' minor dims aligned
    # to the 128-lane tile; the VMEM-side :nf slice is fine.
    if pre_padded:
        # xh is already (B, hp2 + 2*_HALO2, wf2, 128) built against
        # tail_geom (one fused crop+pad from up1_fused's masked output)
        b = xh.shape[0]
        nf = w_up2.shape[2]
        bh2, wf2, rc, hp2, cpad = tail_geom(
            h2, w2, nf, block_h, row_chunk
        )
        if xh.shape[1:] != (hp2 + 2 * _HALO2, wf2, nf + cpad):
            raise ValueError(
                f"pre-padded tail input {xh.shape} does not match "
                f"geometry {(b, hp2 + 2 * _HALO2, wf2, nf + cpad)}"
            )
        xp = xh
        row_chunk = rc
    else:
        b, h2, w2, nf = xh.shape
        bh2, wf2, rc, hp2, cpad = tail_geom(
            h2, w2, nf, block_h, row_chunk
        )
        row_chunk = rc
        xp = jnp.pad(
            xh,
            (
                (0, 0),
                (_HALO2, _HALO2 + hp2 - h2),
                (_PADL, wf2 - w2 - _PADL),
                (0, cpad),
            ),
        )
    nstripes = hp2 // bh2

    ku2 = pack_prefix_weights(
        [fold_dy(up_phase_kernel_pm(w_up2))], pack=(0,)
    )[0].astype(xh.dtype)  # (192, 768)
    khr = wsd_kernel(w_hr).astype(xh.dtype)  # (384, 384)
    klast = wsd_kernel(w_last).astype(xh.dtype)  # (384, 18)
    bu2 = jnp.tile(b_up2, 4).reshape(1, 1, -1).astype(jnp.float32)
    bhr = jnp.tile(b_hr, 2).reshape(1, 1, -1).astype(jnp.float32)
    blast = jnp.tile(b_last, 2).reshape(1, 1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _tail_kernel,
        bh2=bh2, h2=h2, w2=w2, wf2=wf2, nf=nf,
        nstripes=nstripes, nb=b, rc=row_chunk,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, 2 * bh2, w2, 6), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * hp2, w2, 6), xh.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh2 + 2 * _HALO2, wf2, nf + cpad), xh.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, ku2, khr, klast, bu2, bhr, blast)
    # (B, 2*H2, W2, (b, rgb)) -> (B, 2*H2, 2*W2, 3): adjacent W-sd
    # channel pairs ARE adjacent fine columns
    out = out[:, : 2 * h2]
    return out.reshape(b, 2 * h2, 2 * w2, 3)


def _up1_kernel(
    xp_ref,  # (B, hp1 + 2, Wf1, 128) ANY/HBM — coarse-grid activations
    ku,  # (192, 768) dx-packed phase-form upconv1 kernel, VMEM
    bu,  # bias (1, 1, 256) fp32
    out_ref,  # (1, 2*bh1, Wf1, 2*nf) VMEM block — fine rows x (b, o)
    xblk,  # scratch (2, bh1 + 2, Wf1, 128) double-buffer
    sem,  # DMA semaphores (2,)
    *,
    bh1: int,
    h1: int,
    w1: int,
    wf1: int,
    nf: int,
    nstripes: int,
    nb: int,
    rc: int,
    masked: bool,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    m = bi * nstripes + si
    he = bh1 + 2

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * bh1, he)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()

    @pl.when(m + 1 < nb * nstripes)
    def _():
        dma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()
    x = xblk[m % 2][:, :, :nf]
    dt = x.dtype

    if masked:
        # chained form (tail_fused_q consumes the raw output): zero
        # everything outside the frame, including the _PADL margins
        # where roll wrap-around lands
        cols = lax.broadcasted_iota(jnp.int32, (1, wf1, 1), 1)
        col_ok = (cols >= _PADL) & (cols < _PADL + w1)

        def post(q, r0):
            rows = lax.broadcasted_iota(jnp.int32, (q.shape[0], 1, 1), 0)
            ok = ((rows + si * bh1 + r0) < h1) & col_ok
            q = jax.nn.leaky_relu(q + bu[0], 0.2)
            return jnp.where(ok, q, 0.0).astype(dt)

    else:
        # terminal form: output is sliced to the frame in XLA, and the
        # zero-padded input already gives exact SAME-conv borders
        def post(q, r0):
            return jax.nn.leaky_relu(q + bu[0], 0.2).astype(dt)

    y = _conv_chunked(x, ku[:], (-1, 0, 1), post, rc)  # (bh1, wf1, 256)
    out_ref[0] = _interleave_rows(y)  # (2*bh1, wf1, (b, o))


@functools.partial(
    jax.jit,
    static_argnames=("block_h", "interpret", "row_chunk", "masked"),
)
def up1_fused(
    x1: jax.Array,
    w_up1: jax.Array,
    b_up1: jax.Array,
    *,
    block_h: int | None = None,
    row_chunk: int = 4,
    masked: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused phase-form upconv1: ``leaky_relu(upconv2x(x1, w, b))`` as a
    stripe Pallas kernel. x1 (B, H1, W1, nf) -> (B, 2*H1, 2*W1, nf).

    The XLA conv_transpose form runs ~6 TF/s in a T(1,128) layout at
    full-frame widths (44 ms/frame traced at 1080p); here the phase conv
    is the same dx-packed (M,192)x(192,768) matmul as tail_fused's
    upconv2, the two row phases interleave through the free leading dim,
    and the two column phases land as adjacent (b, o) lane pairs so the
    final fine-grid layout is ONE free reshape — no pixel_shuffle
    transposes (the failure mode that sank the XLA phase form,
    BENCH_NOTES round 2).
    """
    from video_restore_tpu.ops.conv import up_phase_kernel_pm
    from video_restore_tpu.ops.pallas_stripe import pack_prefix_weights

    b, h1, w1, nf = x1.shape
    bh1 = block_h or 16
    wf1 = _PADL + w1 + _PADL
    wf1 += (8 - wf1 % 8) % 8
    row_chunk = max(2, min(row_chunk, (row_chunk * 1024) // wf1))
    cpad = (128 - nf % 128) % 128
    hp1 = h1 + (bh1 - h1 % bh1) % bh1
    nstripes = hp1 // bh1
    xp = jnp.pad(
        x1,
        (
            (0, 0),
            (1, 1 + hp1 - h1),
            (_PADL, wf1 - w1 - _PADL),
            (0, cpad),
        ),
    )
    ku = pack_prefix_weights(
        [fold_dy(up_phase_kernel_pm(w_up1))], pack=(0,)
    )[0].astype(x1.dtype)  # (192, 768)
    bu = jnp.tile(b_up1, 4).reshape(1, 1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _up1_kernel,
        bh1=bh1, h1=h1, w1=w1, wf1=wf1, nf=nf,
        nstripes=nstripes, nb=b, rc=row_chunk, masked=masked,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(
            (1, 2 * bh1, wf1, 2 * nf), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * hp1, wf1, 2 * nf), x1.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh1 + 2, wf1, nf + cpad), x1.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, ku, bu)
    if masked:
        # raw padded form for tail_fused_q: (B, 2*hp1, Wf1, (b, o)),
        # exact zeros outside the frame
        return out
    # (B, 2*hp1, Wf1, (b, o)) -> (B, 2*hp1, 2*Wf1, nf): adjacent lane
    # pairs ARE adjacent fine columns (free reshape), then crop
    out = out.reshape(b, 2 * hp1, 2 * wf1, nf)
    return out[:, : 2 * h1, 2 * _PADL : 2 * _PADL + 2 * w1]


def _conv3x3_kernel(
    xp_ref,  # (B, hp + 2, Wf, cin) ANY/HBM
    *rest,
    bh: int,
    cin: int,
    nstripes: int,
    nb: int,
    rc: int,
    act: str,
    has_res: bool,
):
    if has_res:
        rp_ref, ku, bb, *aa_t, out_ref, xblk, rblk, sem, rsem = rest
    else:
        ku, bb, *aa_t, out_ref, xblk, sem = rest
    aa = aa_t[0] if aa_t else None
    bi = pl.program_id(0)
    si = pl.program_id(1)
    m = bi * nstripes + si
    he = bh + 2

    def dma(slot, idx):
        bbt = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xp_ref.at[bbt, pl.ds(ii * bh, he)],
            xblk.at[slot],
            sem.at[slot],
        )

    def rdma(slot, idx):
        bbt = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            rp_ref.at[bbt, pl.ds(ii * bh, bh)],
            rblk.at[slot],
            rsem.at[slot],
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()
        if has_res:
            rdma(0, 0).start()

    @pl.when(m + 1 < nb * nstripes)
    def _():
        dma((m + 1) % 2, m + 1).start()
        if has_res:
            rdma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()
    if has_res:
        rdma(m % 2, m).wait()
        resblk = rblk[m % 2]
    # cin here is the zero-padded K width (>= 64): Mosaic supports
    # 64-granular VMEM lane slices but not sub-64
    x = xblk[m % 2][:, :, :cin]
    dt = x.dtype

    # terminal kernel: zero-padded input gives exact SAME-conv borders,
    # roll wrap-around stays inside the _PADL margins (sliced off in XLA)
    def post(q, r0):
        q = q + bb[0]
        if act == "lrelu":
            q = jax.nn.leaky_relu(q, 0.2)
        elif act == "prelu":
            # per-channel PReLU (SRVGG stem); alpha rides in VMEM as a
            # (1, 1, cout) f32 row like the bias
            q = jnp.where(q > 0, q, q * aa[0])
        if has_res:
            r = resblk[r0 : r0 + q.shape[0], :, : q.shape[2]]
            q = q + r.astype(jnp.float32)
        return q.astype(dt)

    out_ref[0] = _conv_chunked(x, ku[:], (-1, 0, 1), post, rc)


@functools.partial(
    jax.jit,
    static_argnames=("act", "block_h", "interpret", "row_chunk"),
)
def conv3x3_fused(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    res: jax.Array | None = None,
    alpha: jax.Array | None = None,
    *,
    act: str = "none",
    block_h: int | None = None,
    row_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Plain SAME 3x3 conv as a stripe Pallas kernel, with optional
    leaky-relu / per-channel PReLU (``act="prelu"`` with ``alpha``
    (cout,) — the SRVGG stem) and optional residual add fused into the
    output chunks: ``act(conv2d(x, w, bias)) + res``.

    Replaces two slow XLA glue ops in the flagship trace (full-frame
    1080p): conv_first ran 0.8 TF/s (cin=3 starves the MXU in XLA's
    chosen T(1,128) f32 layout; 8.9 ms/frame) and conv_body + residual
    ran ~16 TF/s (18 ms/frame). Same dx-packed contraction as the other
    stripe kernels: (M, 3*cin) x (3*cin, 3*cout), slice + hardware-roll
    + add, fp32 row chunks.
    """
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    bh = block_h or 32
    wf = _PADL + wdt + _PADL
    wf += (8 - wf % 8) % 8
    rc = max(2, min(row_chunk, (row_chunk * 1024) // wf))
    hp = h + (bh - h % bh) % bh
    nstripes = hp // bh
    # Mosaic DMA alignment: HBM operands' minor dim must be a multiple
    # of the 128-lane tile; VMEM lane slices are 64-granular. So the
    # input is zero-padded to 128 lanes for the DMA and K is zero-padded
    # to the 64-granular slice width (cin=3 stem -> K rows 3..63 are
    # zeros and contribute nothing).
    cin_k = 64 if cin <= 64 else _round_up128(cin)
    lanes = _round_up128(cin_k)
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (1, 1 + hp - h),
            (_PADL, wf - wdt - _PADL),
            (0, lanes - cin),
        ),
    )
    wk = jnp.pad(w, ((0, 0), (0, 0), (0, cin_k - cin), (0, 0)))
    ku = pack_prefix_weights_generic(wk).astype(x.dtype)  # (3cin_k, 3cout)
    bb = bias.reshape(1, 1, -1).astype(jnp.float32)

    operands = [xp]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [
        pltpu.VMEM((2, bh + 2, wf, lanes), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    has_res = res is not None
    if has_res:
        rlanes = _round_up128(cout)
        rp = jnp.pad(
            res,
            (
                (0, 0),
                (0, hp - h),
                (_PADL, wf - wdt - _PADL),
                (0, rlanes - cout),
            ),
        )
        operands.append(rp)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch = [
            pltpu.VMEM((2, bh + 2, wf, lanes), x.dtype),
            pltpu.VMEM((2, bh, wf, rlanes), res.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    operands += [ku, bb]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    if act == "prelu":
        if alpha is None:
            raise ValueError("act='prelu' needs alpha (cout,)")
        operands.append(alpha.reshape(1, 1, -1).astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _conv3x3_kernel,
        bh=bh, cin=cin_k, nstripes=nstripes, nb=b, rc=rc,
        act=act, has_res=has_res,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bh, wf, cout), lambda bb_, i: (bb_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wf, cout), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :h, _PADL : _PADL + wdt]


def _round_up128(n: int) -> int:
    return ((n + 127) // 128) * 128


def pack_prefix_weights_generic(w: jax.Array) -> jax.Array:
    """(3, 3, cin, cout) -> dx-packed (3*cin, 3*cout), lane blocks
    [dx=0 | dx=1 | dx=2], dy folded into K (dy-major)."""
    k = fold_dy(w)  # (3, 3*cin, cout)
    k = jnp.swapaxes(k, 0, 1)  # (3*cin, 3, cout)
    return k.reshape(k.shape[0], 3 * k.shape[-1])


# ---------------------------------------------------------------------------
# Quad-W-sd tail: consume up1_fused's RAW output. The two-kernel tail
# (up1_fused -> XLA reshape/slice/pad -> tail_fused) paid ~20 ms/frame of
# pure relayout glue at full frame (trace: copy.266 + slice + copy.316 +
# pad.26). Here the tail's three convs run directly in up1's native
# layout — rows = 2x grid, columns = coarse W, lanes = (b, o) column
# pairs — so the only XLA op between the two kernels is a cheap
# rows-halo pad. Composition rule: a 3x3 conv on an r-way column-packed
# grid is K = 3(dy) x (r*cin) against N = 3(dv) x (r*cout) with
# structural zeros, exactly wsd_kernel generalized to r phases; upconv2
# is its phase-form kernel pushed through the SAME transform one level
# down (r=2 in, 4-phase out), and conv_hr/conv_last run at r=4 (quad)
# where the final (q, o_pad) lane blocks bitcast straight to RGB columns.
# Bonus: at the coarse width (wf1 ~ half of wf2) the fp32 row chunks
# fit rc=4, recovering the tile-width chunking the 3856-wide form lost.
# ---------------------------------------------------------------------------


def wsd_kernel_r(w: jax.Array, r: int) -> jax.Array:
    """(3, 3, cin, cout) fine conv kernel -> r-way column-packed
    (3*r*cin, 3*(r*cout)) matrix.

    K index = dy*(r*cin) + q''*cin + o''; N index = (dv+1)*(r*cout)
    + q*cout + o, with q'' = (q+dx-1) mod r, dv = floor((q+dx-1)/r).
    """
    _, _, cin, cout = w.shape
    w = w.astype(jnp.float32)
    m = jnp.zeros((3 * r * cin, 3 * r * cout), jnp.float32)
    for q in range(r):
        for dx in (0, 1, 2):
            t = q + dx - 1
            qq, dv = t % r, t // r
            for dy in (0, 1, 2):
                krow = dy * r * cin + qq * cin
                ncol = (dv + 1) * r * cout + q * cout
                m = m.at[
                    krow : krow + cin, ncol : ncol + cout
                ].add(w[dy, dx])
    return m


def _tail_q_kernel(
    xq_ref,  # (B, 2*hp1 + 2*_HALO2 + pad, Wf1, 2*nf) ANY — up1 raw out
    ku2, khr, klast,  # quad-form kernels, VMEM
    bu2, bhr, blast,  # biases (1, 1, 8nf|4nf|64) fp32
    out_ref,  # (1, 2*bh2, Wf1, 64) VMEM block — G4 rows x (q, o16)
    xblk,  # scratch (2, bh2 + 2*_HALO2, Wf1, 2*nf)
    sem,
    *,
    bh2: int,
    h2: int,
    w1: int,
    wf1: int,
    nf: int,
    nstripes: int,
    nb: int,
    rc: int,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    m = bi * nstripes + si
    he = bh2 + 2 * _HALO2

    def dma(slot, idx):
        bb = idx // nstripes
        ii = idx % nstripes
        return pltpu.make_async_copy(
            xq_ref.at[bb, pl.ds(ii * bh2, he)],
            xblk.at[slot],
            sem.at[slot],
        )

    @pl.when(m == 0)
    def _():
        dma(0, 0).start()

    @pl.when(m + 1 < nb * nstripes)
    def _():
        dma((m + 1) % 2, m + 1).start()

    dma(m % 2, m).wait()
    x = xblk[m % 2]
    dt = x.dtype
    c0 = si * bh2 - 1  # G2 frame row of y2q row 0

    cols = lax.broadcasted_iota(jnp.int32, (1, wf1, 1), 1)
    col_ok = (cols >= _PADL) & (cols < _PADL + w1)

    def post_u2(q, r0):
        rows = lax.broadcasted_iota(jnp.int32, (q.shape[0], 1, 1), 0)
        ok = ((rows + c0 + r0 >= 0) & (rows + c0 + r0 < h2)) & col_ok
        q = jax.nn.leaky_relu(q + bu2[0], 0.2)
        return jnp.where(ok, q, 0.0).astype(dt)

    # upconv2 on the (b, o)-packed 2x grid: lanes (b, a', b', o)
    y2 = _conv_chunked(x, ku2[:], (-1, 0, 1), post_u2, rc)

    # interleave a' into rows: per b-half, a' slices (2*nf = 128-lane
    # aligned at production nf=64)
    rows_n, wfn, _ = y2.shape
    L = nf
    a0 = jnp.concatenate(
        [y2[:, :, 0 : 2 * L], y2[:, :, 4 * L : 6 * L]], axis=2
    )
    a1 = jnp.concatenate(
        [y2[:, :, 2 * L : 4 * L], y2[:, :, 6 * L : 8 * L]], axis=2
    )
    f = jnp.stack([a0, a1], axis=1).reshape(2 * rows_n, wfn, 4 * L)

    def post_hr(q, r0):
        rows = lax.broadcasted_iota(jnp.int32, (q.shape[0], 1, 1), 0)
        rf = rows + 2 * c0 + 1 + r0
        ok = ((rf >= 0) & (rf < 2 * h2)) & col_ok
        q = jax.nn.leaky_relu(q + bhr[0], 0.2)
        return jnp.where(ok, q, 0.0).astype(dt)

    hr = _conv_chunked(f, khr[:], (-1, 0, 1), post_hr, rc)

    def post_last(q, r0):
        return (q + blast[0]).astype(dt)

    rgb = _conv_chunked(hr, klast[:], (-1, 0, 1), post_last, rc)
    out_ref[0] = rgb


@functools.partial(
    jax.jit,
    static_argnames=("h2", "w1", "block_h", "interpret", "row_chunk"),
)
def tail_fused_q(
    xq: jax.Array,
    w_up2: jax.Array,
    b_up2: jax.Array,
    w_hr: jax.Array,
    b_hr: jax.Array,
    w_last: jax.Array,
    b_last: jax.Array,
    *,
    h2: int,
    w1: int,
    block_h: int | None = None,
    row_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Quad tail on up1_fused's raw output.

    xq: (B, 2*hp1, Wf1, 128) — up1_fused's padded-form output (lanes are
    (b, o) column pairs; 2*hp1 >= h2 rows of the 2x grid, frame columns
    at [_PADL, _PADL + w1)). h2 = 2*H1, w1 = W1 (coarse frame width).
    Returns (B, 4*H1, 4*W1, 3) RGB.
    """
    b, hq, wf1, _ = xq.shape
    nf = w_up2.shape[2]
    # the live fp32 'p' chunk is (rc, wf1, 3*512) for the up2 stage —
    # the same bytes-per-rc as the plain tail at double width, so the
    # same rc=2 ceiling applies at frame widths
    bh2 = block_h or (16 if wf1 <= 1100 else 8)
    rc = max(2, min(row_chunk, (row_chunk * 512) // wf1))
    hp2 = h2 + (bh2 - h2 % bh2) % bh2
    nstripes = hp2 // bh2
    # rows-only halo pad — the ONLY XLA op between up1_fused and this
    # kernel (requires xq's non-frame rows/cols to be exact zeros:
    # up1_fused(masked=True))
    if hq < hp2:
        xq = jnp.pad(xq, ((0, 0), (0, hp2 - hq), (0, 0), (0, 0)))
    xp = jnp.pad(
        xq[:, :hp2], ((0, 0), (_HALO2, _HALO2), (0, 0), (0, 0))
    )

    from video_restore_tpu.ops.conv import up_phase_kernel_pm

    ku2 = wsd_kernel_r(
        up_phase_kernel_pm(w_up2), r=2
    ).astype(xq.dtype)  # (384, 1536)
    khr = wsd_kernel_r(w_hr, r=4).astype(xq.dtype)  # (768, 768)
    wl16 = jnp.pad(w_last, ((0, 0), (0, 0), (0, 0), (0, 13)))
    klast = wsd_kernel_r(wl16, r=4).astype(xq.dtype)  # (768, 192)
    bu2 = jnp.tile(b_up2, 8).reshape(1, 1, -1).astype(jnp.float32)
    bhr = jnp.tile(b_hr, 4).reshape(1, 1, -1).astype(jnp.float32)
    bl16 = jnp.pad(b_last, (0, 13))
    blast = jnp.tile(bl16, 4).reshape(1, 1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _tail_q_kernel,
        bh2=bh2, h2=h2, w1=w1, wf1=wf1, nf=nf, nstripes=nstripes,
        nb=b, rc=rc,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nstripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, 2 * bh2, wf1, 64), lambda bb, i: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * hp2, wf1, 64), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh2 + 2 * _HALO2, wf1, 2 * nf), xq.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, ku2, khr, klast, bu2, bhr, blast)
    # (B, 2*hp2, Wf1, (q, o16)) -> (B, 2*hp2, 4*Wf1, 16): adjacent lane
    # blocks ARE adjacent fine columns (free reshape), then crop
    out = out.reshape(b, 2 * hp2, 4 * wf1, 16)
    return out[:, : 2 * h2, 4 * _PADL : 4 * _PADL + 4 * w1, :3]
