"""Pixel losses and image-quality metrics (PSNR/SSIM).

PSNR/SSIM are also the parity bar for inference (BASELINE.md: "PSNR/SSIM
parity vs the CUDA reference").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def charbonnier_loss(
    pred: jax.Array, target: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Smooth L1 used by most SR training recipes."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(d * d + eps * eps))


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    )
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _ssim_filter(x: jax.Array, kernel: jax.Array) -> jax.Array:
    c = x.shape[-1]
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    return lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def ssim(
    pred: jax.Array,
    target: jax.Array,
    max_val: float = 1.0,
    sigma: float = 1.5,
    radius: int = 5,
) -> jax.Array:
    """Mean SSIM over an 11x11 Gaussian window (standard Wang et al. SSIM).

    pred/target: (N, H, W, C) float.
    """
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    coords = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (coords / sigma) ** 2)
    g = g / g.sum()
    kernel = g[:, None] * g[None, :]

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _ssim_filter(x, kernel)
    mu_y = _ssim_filter(y, kernel)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _ssim_filter(x * x, kernel) - mu_x2
    sig_y = _ssim_filter(y * y, kernel) - mu_y2
    sig_xy = _ssim_filter(x * y, kernel) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)
