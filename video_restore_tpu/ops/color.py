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
