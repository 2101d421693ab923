"""Enhanced post-processing stack, vectorized for TPU.

Replaces the reference's OpenCV calls and implements the README-advertised
features its code lacks (SURVEY.md §2.5):

- bilateral_filter: the pre-filter the reference runs on CPU via
  ``cv2.bilateralFilter(frame, 5, 25, 25)`` (video_upscaler.py:495-496),
  re-expressed as a fixed-window vectorized stencil (all 13 taps of cv2's
  radius-2 circular window evaluated as shifted adds — no gathers).
- clahe: CLAHE color correction (reference README.md:11, absent from code):
  per-tile clipped histograms + CDF LUTs, bilinear LUT interpolation,
  applied to BT.601 luma.
- unsharp_mask: Gaussian-difference sharpening (README.md:12, absent).
- temporal_blend: motion-adaptive EMA between consecutive frames
  (README.md:9 "temporal consistency", absent) — a lax.scan carry over the
  frame axis.

All functions take float arrays in [0, 1], NHWC or HWC.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from video_restore_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb


# ---------------------------------------------------------------------------
# Bilateral filter
# ---------------------------------------------------------------------------


def _bilateral_offsets(d: int) -> Tuple[Tuple[int, int, float], ...]:
    """cv2-compatible circular window: taps with r <= radius, Gaussian
    spatial weights with sigma_space."""
    radius = d // 2
    taps = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            r2 = dy * dy + dx * dx
            if r2 <= radius * radius:
                taps.append((dy, dx, float(r2)))
    return tuple(taps)


@partial(jax.jit, static_argnames=("d",))
def bilateral_filter(
    x: jax.Array,
    d: int = 5,
    sigma_color: float = 25.0,
    sigma_space: float = 25.0,
) -> jax.Array:
    """Edge-preserving bilateral denoise, cv2.bilateralFilter semantics
    (video_upscaler.py:496: d=5, sigma_color=25, sigma_space=25).

    x: (..., H, W, C) float in [0, 1]. Color distances are computed on the
    0..255 scale (cv2 operates on uint8), as the L1 sum over channels.
    """
    # TPU layout: planar (..., C, H, W) puts W on the 128-lane minor dim
    # (NHWC would vectorize the 13 taps over only C=3 lanes) and lets the
    # per-pixel (H, W) weights broadcast over channel planes for free.
    xf = jnp.moveaxis(x.astype(jnp.float32), -1, -3)
    gauss_color = -0.5 / (sigma_color * sigma_color)
    gauss_space = -0.5 / (sigma_space * sigma_space)
    radius = d // 2
    # edge replicate, like cv2 BORDER_DEFAULT-ish behaviour at frame borders
    pads = [(0, 0)] * (xf.ndim - 2) + [(radius, radius), (radius, radius)]
    xp = jnp.pad(xf, pads, mode="edge")

    h, w = x.shape[-3], x.shape[-2]
    num = jnp.zeros_like(xf)
    den = jnp.zeros(xf.shape[:-3] + (1, h, w), jnp.float32)
    for dy, dx, r2 in _bilateral_offsets(d):
        sl = xp[
            ...,
            radius + dy : radius + dy + h,
            radius + dx : radius + dx + w,
        ]
        cdist = jnp.sum(jnp.abs(sl - xf), axis=-3, keepdims=True) * 255.0
        wgt = jnp.exp(cdist * cdist * gauss_color + r2 * gauss_space)
        num = num + wgt * sl
        den = den + wgt
    return jnp.moveaxis(num / den, -3, -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("grid", "bins"))
def _clahe_luma(
    y: jax.Array, clip_limit: float, grid: Tuple[int, int] = (8, 8), bins: int = 256
) -> jax.Array:
    """CLAHE on a single-channel image (H, W) in [0, 1].

    cv2-compatible pipeline: tile histograms -> clip at
    ``clip_limit * tile_area / bins`` -> equal redistribution -> CDF LUT
    scaled to [0, bins-1] -> bilinear interpolation of the 4 surrounding
    tile LUTs per pixel.
    """
    h, w = y.shape
    gy, gx = grid
    th, tw = -(-h // gy), -(-w // gx)  # ceil tile size
    ph, pw = th * gy - h, tw * gx - w
    yp = jnp.pad(y, ((0, ph), (0, pw)), mode="reflect")

    q = jnp.clip(jnp.round(yp * (bins - 1)), 0, bins - 1).astype(jnp.int32)
    binsv = jnp.arange(bins, dtype=jnp.int32)

    # --- tile histograms: fused one-hot compare + reduce. A scatter-add
    # (`.at[idx].add(1)`) over the 2M pixels measured 18ms/frame on v5e
    # (serial scatter path); the compare-reduce fuses on the VPU. Counts
    # are exact (0/1 sums in fp32).
    tile_area = th * tw
    qt = (
        q.reshape(gy, th, gx, tw)
        .transpose(0, 2, 1, 3)
        .reshape(gy * gx, tile_area)
    )
    hist = jnp.sum(
        (qt[:, :, None] == binsv[None, None, :]).astype(jnp.float32), axis=1
    )  # (T, bins)

    # clip + redistribute (cv2: limit = max(clipLimit*area/bins, 1))
    limit = jnp.maximum(clip_limit * tile_area / bins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / bins

    cdf = jnp.cumsum(hist, axis=1)
    # cv2 LUT: scale = (bins-1)/tileArea; lut = round(cdf * scale)
    lut = jnp.round(cdf * ((bins - 1) / tile_area))  # (T, bins)

    # --- LUT application: band-aligned one-hot matmul. cv2 bilinearly
    # blends the 4 surrounding tile LUTs per pixel (tile centres at
    # (t+0.5)*size, clamped at borders); 4 full-frame `jnp.take` gathers
    # measured 59ms/frame on v5e. y0 changes only at tile centres, so
    # padding the frame to the centre grid makes (y0, y1, x0, x1)
    # CONSTANT within each (band_y, band_x) block, and the per-block
    # apply becomes onehot(q) @ lut4 — exact (one nonzero per row; LUT
    # values are integers < 2^8, bf16-exact).
    pt, pleft = (th + 1) // 2, (tw + 1) // 2  # centre-grid offsets
    by = -(-(pt + yp.shape[0]) // th)
    bx = -(-(pleft + yp.shape[1]) // tw)
    qb = jnp.pad(
        q,
        ((pt, by * th - yp.shape[0] - pt), (pleft, bx * tw - yp.shape[1] - pleft)),
        mode="edge",
    )
    qblk = (
        qb.reshape(by, th, bx, tw)
        .transpose(0, 2, 1, 3)
        .reshape(by * bx, tile_area)
    )
    bandy = jnp.arange(by)
    bandx = jnp.arange(bx)
    y0b = jnp.clip(bandy - 1, 0, gy - 1)
    y1b = jnp.clip(bandy, 0, gy - 1)
    x0b = jnp.clip(bandx - 1, 0, gx - 1)
    x1b = jnp.clip(bandx, 0, gx - 1)
    lutg = lut.reshape(gy, gx, bins)
    lut4 = jnp.stack(
        [
            lutg[y0b[:, None], x0b[None, :]],
            lutg[y0b[:, None], x1b[None, :]],
            lutg[y1b[:, None], x0b[None, :]],
            lutg[y1b[:, None], x1b[None, :]],
        ],
        axis=-1,
    ).reshape(by * bx, bins, 4)
    onehot = (qblk[:, :, None] == binsv[None, None, :]).astype(jnp.bfloat16)
    v4 = jax.lax.dot_general(
        onehot,
        lut4.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, P, 4)
    v4 = (
        v4.reshape(by, bx, th, tw, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(by * th, bx * tw, 4)[pt : pt + h, pleft : pleft + w]
    )

    fy = (jnp.arange(h) + 0.5) / th - 0.5
    fx = (jnp.arange(w) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, gy - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(fx), 0, gx - 1).astype(jnp.int32)
    wy = jnp.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(fx - x0, 0.0, 1.0)[None, :]
    out = (
        v4[..., 0] * (1 - wy) * (1 - wx)
        + v4[..., 1] * (1 - wy) * wx
        + v4[..., 2] * wy * (1 - wx)
        + v4[..., 3] * wy * wx
    )
    return (out / (bins - 1)).astype(y.dtype)


def clahe(
    rgb: jax.Array, clip_limit: float = 2.0, grid: Tuple[int, int] = (8, 8)
) -> jax.Array:
    """CLAHE color correction on luma; chroma preserved (README.md:11).

    rgb: (..., H, W, 3) in [0, 1]. Leading axes are vmapped.
    """
    if rgb.ndim == 3:
        ycc = rgb_to_ycbcr(rgb.astype(jnp.float32))
        y_eq = _clahe_luma(ycc[..., 0], clip_limit, grid)
        out = ycbcr_to_rgb(jnp.stack([y_eq, ycc[..., 1], ycc[..., 2]], -1))
        return jnp.clip(out, 0.0, 1.0).astype(rgb.dtype)
    return jax.vmap(lambda f: clahe(f, clip_limit, grid))(rgb)


# ---------------------------------------------------------------------------
# Unsharp mask
# ---------------------------------------------------------------------------


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(x: jax.Array, sigma: float = 1.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur, NHWC or HWC, edge padding.

    TPU note: a depthwise conv with C=3 puts 3 channels on the 128-lane
    minor dim (~2% VPU occupancy — measured 94ms for one 8K frame on
    v5e). Instead the image is viewed as (H, W*C) so every row is fully
    vectorized, and the separable kernel becomes shifted-slice adds:
    H taps are leading-dim slices, W taps are slices at multiples of C.
    Same math, same edge padding; ~4x faster at 8K (23ms)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    k = _gaussian_kernel1d(sigma, radius)
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)

    # vertical pass on the (H, W*C) view
    xp = jnp.pad(xf, ((0, 0), (radius, radius), (0, 0), (0, 0)), mode="edge")
    xp = xp.reshape(b, h + 2 * radius, w * c)
    out = None
    for i, ki in enumerate(k):
        t = xp[:, i : i + h] * ki
        out = t if out is None else out + t

    # horizontal pass: pixel-edge padding, then W shifts = slices at
    # multiples of C in the flattened minor dim
    outp = jnp.pad(
        out.reshape(b, h, w, c),
        ((0, 0), (0, 0), (radius, radius), (0, 0)),
        mode="edge",
    ).reshape(b, h, (w + 2 * radius) * c)
    res = None
    for i, ki in enumerate(k):
        t = outp[:, :, i * c : i * c + w * c] * ki
        res = t if res is None else res + t

    out = res.reshape(b, h, w, c).astype(x.dtype)
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=("sigma", "radius"))
def unsharp_mask(
    x: jax.Array,
    amount: float = 0.5,
    sigma: float = 1.0,
    radius: int = 3,
    threshold: float = 0.0,
) -> jax.Array:
    """Unsharp-mask detail enhancement (reference README.md:12, absent from
    its code). out = x + amount * highpass, with an optional soft threshold
    to avoid amplifying noise."""
    import os

    # VRT_POST_DT=bf16: stay in the input dtype end-to-end (halves the
    # HBM traffic of every pass at 8K; the highpass is small-magnitude so
    # bf16's relative error is absolute-tiny, and the final add's ~1 LSB
    # wobble is ~66dB PSNR — far above the 45dB golden bar).
    if os.environ.get("VRT_POST_DT") == "bf16" and x.dtype == jnp.bfloat16:
        blur = gaussian_blur(x, sigma, radius)
        hp = x - blur
        if threshold > 0:
            hp = jnp.where(jnp.abs(hp) >= threshold, hp, 0.0)
        return jnp.clip(x + amount * hp, 0.0, 1.0)
    xf = x.astype(jnp.float32)
    # VRT_POST_BF16=1: run the blur (the HBM-heaviest post op at 8K) in
    # bf16. The highpass difference and the final add stay fp32; the
    # blur's ~0.4% relative error enters scaled by `amount` (<=1), well
    # under half an 8-bit LSB on the final frame.
    if os.environ.get("VRT_POST_BF16") == "1":
        blur = gaussian_blur(
            xf.astype(jnp.bfloat16), sigma, radius
        ).astype(jnp.float32)
    else:
        blur = gaussian_blur(xf, sigma, radius).astype(jnp.float32)
    hp = xf - blur
    if threshold > 0:
        mask = jnp.abs(hp) >= threshold
        hp = jnp.where(mask, hp, 0.0)
    return jnp.clip(xf + amount * hp, 0.0, 1.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Temporal consistency
# ---------------------------------------------------------------------------


@jax.jit
def temporal_blend(
    frames: jax.Array,
    strength: float = 0.3,
    motion_sigma: float = 0.05,
    prev: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Motion-adaptive temporal EMA over a chunk of consecutive frames.

    The reference advertises temporal consistency (README.md:9,237) but
    processes frames independently. Here:

        out_t = (1 - w_t) * x_t + w_t * out_{t-1}
        w_t   = strength * exp(-|x_t - out_{t-1}| / motion_sigma)   (per pixel)

    so static regions are stabilized while motion is untouched (no
    ghosting). Implemented as a lax.scan carry so each device can process
    its contiguous frame chunk with a 1-frame halo (SURVEY.md §5
    long-context analogue).

    frames: (T, H, W, C) in [0, 1]; ``prev`` is the carry from the previous
    chunk (or None at stream start). Returns (out_frames, last_frame).
    """
    xf = frames.astype(jnp.float32)
    p = xf[0] if prev is None else prev.astype(jnp.float32)

    def step(carry, x):
        diff = jnp.abs(x - carry).mean(axis=-1, keepdims=True)
        w = strength * jnp.exp(-diff / motion_sigma)
        out = (1.0 - w) * x + w * carry
        return out, out

    _, outs = lax.scan(step, p, xf)
    return outs.astype(frames.dtype), outs[-1].astype(frames.dtype)
