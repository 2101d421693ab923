"""Convolution and layout primitives in NHWC (TPU-native layout).

The reference delegates all of this to cuDNN via torch (SURVEY.md §2.3); here
every op is a pure function lowered by XLA onto the MXU. Conventions:

- Activations: NHWC (batch, height, width, channel) — the layout XLA:TPU
  tiles best (channels on the 128-lane minor dimension).
- Weights: HWIO (kh, kw, in_ch, out_ch).
- Mixed precision: inputs/weights may be bf16; convs accumulate in fp32 on
  the MXU (``preferred_element_type``) and cast back to the activation dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: str | int = "SAME",
) -> jax.Array:
    """2D convolution, NHWC x HWIO -> NHWC, fp32 MXU accumulation."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def conv2d_small_cout(
    x: jax.Array, w: jax.Array, b: jax.Array | None = None
) -> jax.Array:
    """3x3 SAME conv for tiny cout (e.g. the RGB output conv, cout=3).

    A direct conv puts cout on the MXU's 128-lane N dimension: cout=3 is
    2.3% occupancy — measured 4.6 TF/s on v5e for RRDBNet's conv_last at
    4K (28.7ms/frame). Packing the 9 taps into N (a 1x1 conv to
    9*cout partial channels, then 9 static shifted-slice adds over a
    zero ring) lifts occupancy 9x; same math, summation reordered (the
    partials round to the activation dtype before the final add).
    """
    kh, kw, cin, cout = w.shape
    # (1,1,cin, kh*kw*cout): partial channel (dy*kw+dx)*cout + o
    w1 = w.transpose(0, 1, 3, 2).reshape(1, 1, kh * kw * cout, cin)
    w1 = w1.transpose(0, 1, 3, 2)
    p = lax.conv_general_dilated(
        x,
        w1.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    hh, ww = x.shape[1], x.shape[2]
    ry, rx = kh // 2, kw // 2
    pp = jnp.pad(p, ((0, 0), (ry, ry), (rx, rx), (0, 0)))
    out = None
    for dy in range(kh):
        for dx in range(kw):
            c0 = (dy * kw + dx) * cout
            # out[i,j] += p[i + dy - ry, j + dx - rx, tap]; zero ring
            # supplies SAME-padding zeros
            t = pp[
                :, dy : dy + hh, dx : dx + ww, c0 : c0 + cout
            ].astype(jnp.float32)
            out = t if out is None else out + t
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """LeakyReLU with the ESRGAN slope of 0.2 (basicsr RRDB default)."""
    return jnp.where(x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Channel-wise PReLU (SRVGGNetCompact act_type='prelu',
    video_upscaler.py:316-318). ``alpha`` has shape (C,)."""
    return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Depth-to-space, NHWC. Channel ordering matches torch.nn.PixelShuffle
    (C_out-major, then r*r block row-major) so converted torch weights
    reproduce identical outputs."""
    n, h, w, c = x.shape
    c_out = c // (r * r)
    # torch layout: channels ordered as (c_out, r, r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c_out
    return x.reshape(n, h * r, w * r, c_out)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """Space-to-depth, NHWC; inverse of :func:`pixel_shuffle`. Used by
    RRDBNet for scale=2 (input becomes 12-channel; basicsr rrdbnet_arch)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h/r, w/r, c, r, r
    return x.reshape(n, h // r, w // r, c * r * r)


def upconv2x(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """Fused nearest-2x-upsample + 3x3 conv, computed at LR resolution.

    Exactly equivalent to ``conv2d(upsample_nearest(x, 2), w, b)`` (the
    RRDBNet conv_up stages): each of the 4 output phases (a, b) sees a 2x2
    window of LR pixels whose effective kernel is a row/column-combined
    version of the 3x3 kernel. 4 phase convs of 2x2 cost 16*Cin*Cout MACs
    per LR pixel vs 36 for the naive form (2.25x fewer), and no upsampled
    intermediate is ever materialized (the naive form's HR broadcast was
    the largest allocation in the XLA memory profile, padded 2.7x).
    """
    wf = w.astype(x.dtype)
    # Expressed as ONE stride-2 transposed conv with a 4x4 kernel
    # K = A @ w @ A^T over the kernel dims, A = [[1,0,0],[1,1,0],[0,1,1],
    # [0,0,1]]: output phase (a, b) then sees exactly the row/col-combined
    # taps of the nearest-upsampled conv. Single op -> XLA's native strided
    # lowering, no phase stack/interleave intermediate.
    a_mat = jnp.asarray(
        [[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], wf.dtype
    )
    k4 = jnp.einsum("ur,vc,rcio->uvio", a_mat, a_mat, wf)
    out = lax.conv_transpose(
        x, k4,
        strides=(2, 2),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def up_phase_kernel(w: jax.Array) -> jax.Array:
    """(3,3,cin,cout) fine upconv kernel -> (3,3,cin,4*cout) phase-form
    kernel at the INPUT grid (output channel order (o, a, b) matching
    pixel_shuffle).

    Derivation (nearest-2x-up + SAME 3x3 on the fine grid): fine output
    phase a=0 reads coarse rows {i-1: w0, i: w1+w2}; a=1 reads
    {i: w0+w1, i+1: w2}; columns likewise. So each phase is a 3x3 coarse
    conv with row/col-combined taps.
    """
    m = np.zeros((2, 3, 3), np.float32)  # (phase, row-offset u, tap ky)
    m[0, 0, 0] = 1.0
    m[0, 1, 1] = m[0, 1, 2] = 1.0
    m[1, 1, 0] = m[1, 1, 1] = 1.0
    m[1, 2, 2] = 1.0
    mj = jnp.asarray(m)
    k = jnp.einsum("auy,bvx,yxco->uvcoab", mj, mj, w.astype(jnp.float32))
    kh, kw, cin, cout = w.shape
    return k.reshape(3, 3, cin, cout * 4).astype(w.dtype)


def up_phase_kernel_pm(w: jax.Array) -> jax.Array:
    """Phase-MAJOR variant of :func:`up_phase_kernel`: output channel
    order (a, b, o) = ph * cout + o, i.e. the fine 2x-grid encoded as a
    channel-packed space-to-depth (sd) tensor at the input grid. This is
    the layout ops/sdconv.py's kernels contract over, so an sd-domain
    tail can chain without any intermediate pixel shuffles."""
    m = np.zeros((2, 3, 3), np.float32)
    m[0, 0, 0] = 1.0
    m[0, 1, 1] = m[0, 1, 2] = 1.0
    m[1, 1, 0] = m[1, 1, 1] = 1.0
    m[1, 2, 2] = 1.0
    mj = jnp.asarray(m)
    k = jnp.einsum("auy,bvx,yxco->uvcabo", mj, mj, w.astype(jnp.float32))
    kh, kw, cin, cout = w.shape
    return k.reshape(3, 3, cin, 4 * cout).astype(w.dtype)


def pixel_shuffle_pm(x: jax.Array, r: int = 2) -> jax.Array:
    """Depth-to-space for PHASE-MAJOR channels (ph * c_out + o, phases
    row-major) — the sd channel packing, as opposed to torch's
    c_out-major order in :func:`pixel_shuffle`."""
    n, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, h, w, r, r, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # n, h, r, w, r, c_out
    return x.reshape(n, h * r, w * r, c_out)


def upconv2x_phase(
    x: jax.Array, w: jax.Array, b: jax.Array | None = None
) -> jax.Array:
    """Fused nearest-2x-upsample + 3x3 conv, phase form: one coarse-grid
    conv to 4*cout phase channels + pixel_shuffle.

    Bit-identical to :func:`upconv2x` (measured maxdiff 0.0). In an
    ISOLATED tail micro-bench this form wins 1.67x (59.3 -> 35.5
    ms/call on v5e — tools/bench_tail.py). Inside the full flagship
    program it LOSES (0.820 -> 0.692 fps/chip): XLA's layout assignment
    still rewrites conv_hr/conv_last into their 5-D tiled layouts, so
    the pixel_shuffle transposes (~120ms/frame of copies) are pure
    overhead. Kept as a measured alternative; production now runs
    upconv1 as the Pallas stripe kernel (ops/pallas_tail.up1_fused),
    which gets the phase-form win without the shuffle transposes.
    """
    # bias replicated per phase (channel order o*4 + a*2 + b) so the
    # f32 bias-add happens before the dtype cast, same as upconv2x
    b4 = jnp.repeat(b, 4) if b is not None else None
    y = conv2d(x, up_phase_kernel(w), b4)
    return pixel_shuffle(y, 2)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour upsample, NHWC (torch F.interpolate mode='nearest',
    the upsampling used between RRDBNet conv_up stages)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
    )
    return x.reshape(n, h * factor, w * factor, c)
