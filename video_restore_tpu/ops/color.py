"""Colorspace conversions (pure JAX, NHWC, float in [0, 1]).

BT.601 full-range YCbCr is used for internal luma processing (CLAHE);
host-side studio-range YUV for Y4M I/O lives in video/y4m.py (numpy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_ycbcr(rgb: jax.Array) -> jax.Array:
    """Full-range BT.601 RGB -> YCbCr, channels-last. Cb/Cr centred on 0.5."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 0.5 + (b - y) * (0.5 / (1.0 - 0.114))
    cr = 0.5 + (r - y) * (0.5 / (1.0 - 0.299))
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: jax.Array) -> jax.Array:
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    r = y + (cr - 0.5) * (1.0 - 0.299) / 0.5
    b = y + (cb - 0.5) * (1.0 - 0.114) / 0.5
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return jnp.stack([r, g, b], axis=-1)


def luma(rgb: jax.Array) -> jax.Array:
    """BT.601 luma channel."""
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def rgb_to_yuv420_planar(rgb: jax.Array) -> jax.Array:
    """(B, H, W, 3) float RGB in [0, 1] -> (B, H*3//2, W) uint8 planar I420
    (studio-range BT.601, 2x2-averaged chroma) — the exact byte layout y4m
    frames and ffmpeg ``-pix_fmt yuv420p`` rawvideo input expect.

    Doing this on-device halves host<->device traffic for the restored
    frames (1.5 B/px instead of 3) and removes the host-side colorspace
    conversion entirely. Matches video/y4m.py:rgb_to_yuv_planes (numpy /
    native framecodec) within 1 LSB. Requires H % 4 == 0 and W % 2 == 0
    (H/2 chroma rows are packed pairwise into full-width rows).
    """
    b_, h, w, _ = rgb.shape
    if h % 4 or w % 2:
        raise ValueError(f"yuv420 packing needs H%4==0, W%2==0 (got {h}x{w})")
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) * (1.0 / (2.0 * (1.0 - 0.114)))
    v = (r - y) * (1.0 / (2.0 * (1.0 - 0.299)))
    yq = jnp.clip(jnp.round(16.0 + 219.0 * y), 16, 235).astype(jnp.uint8)
    # 2x2 chroma average in float, then quantize (matches the host path)
    uq = u.reshape(b_, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    vq = v.reshape(b_, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    uq = jnp.clip(jnp.round(128.0 + 224.0 * uq), 16, 240).astype(jnp.uint8)
    vq = jnp.clip(jnp.round(128.0 + 224.0 * vq), 16, 240).astype(jnp.uint8)
    # planar packing: Y rows, then U ((H/2, W/2) -> (H/4, W)), then V
    up = uq.reshape(b_, h // 4, w)
    vp = vq.reshape(b_, h // 4, w)
    return jnp.concatenate([yq, up, vp], axis=1)
