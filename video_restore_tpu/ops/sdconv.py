"""Space-to-depth convolution transform (exact).

A 3x3 SAME conv on the fine grid is algebraically identical to a function
of the space-to-depth representation (2x coarser grid, 4x channels):

    sd(conv3x3(x, W)) == conv3x3_sd(sd(x), K(W))

where ``sd`` is pixel_unshuffle(2) (torch c-major channel order) and K(W)
is a (2, 2, 4*Cin, 4*Cout) kernel assembled from W's taps. Derivation: a
fine output at phase (a, b) and coarse position (i, j) reads fine inputs
at rows 2i+a+dy-1 = 2(i+du)+p with dy = 2*du' + p - (1-a); entries with
dy outside [0, 2] are zero.

Why: RRDBNet's 64/32-channel convs under-fill the 128-lane MXU and the
(8,128) memory tiling; in the sd domain the same math runs with 256/128
channels and K >= 1024 contraction — near-ideal MXU shapes — at the cost
of 16/9 = 1.78x nominal MACs (the structural zeros). Net ~2-3x on TPU.

The whole conv is ONE wide VALID conv on a once-padded input; the four
output phases are shifted slices re-interleaved to c-major order, so XLA
sees a single large matmul-like op per layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def make_sd_kernel(w: jax.Array) -> jax.Array:
    """(..., 3, 3, Cin, Cout) -> (..., 2, 2, 4*Cin, 4*Cout).

    Input channels c-major (c*4 + p*2 + q, matching pixel_unshuffle);
    output channels phase-major (phase*Cout + o) — consumed by
    :func:`conv3x3_sd`, which re-interleaves to c-major.
    Supports leading stacked-block axes (lax.scan layouts).
    """
    *lead, _, _, cin, cout = w.shape
    k = jnp.zeros(tuple(lead) + (2, 2, 4 * cin, 4 * cout), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            ph = a * 2 + b
            for du in (0, 1):
                for dv in (0, 1):
                    for p in (0, 1):
                        for q in (0, 1):
                            dy = 2 * du + p - (1 - a)
                            dx = 2 * dv + q - (1 - b)
                            if not (0 <= dy <= 2 and 0 <= dx <= 2):
                                continue
                            k = k.at[
                                ...,
                                du,
                                dv,
                                (p * 2 + q) :: 4,
                                ph * cout : (ph + 1) * cout,
                            ].set(w[..., dy, dx, :, :])
    return k


def conv3x3_sd(
    xc: jax.Array, k_sd: jax.Array, b: Optional[jax.Array] = None
) -> jax.Array:
    """Apply a transformed 3x3 conv in the space-to-depth domain.

    xc: (N, H2, W2, 4*Cin) coarse input (c-major phases).
    k_sd: (2, 2, 4*Cin, 4*Cout) from :func:`make_sd_kernel`.
    b: optional fine-domain bias (Cout,).
    Returns (N, H2, W2, 4*Cout) coarse output (c-major phases).
    """
    n, h2, w2, _ = xc.shape
    cout4 = k_sd.shape[-1]
    cout = cout4 // 4
    xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, k_sd.astype(xc.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # (N, H2+1, W2+1, 4*Cout)
    phases = []
    for a in (0, 1):
        for bb in (0, 1):
            ph = a * 2 + bb
            phases.append(
                y[
                    :,
                    a : a + h2,
                    bb : bb + w2,
                    ph * cout : (ph + 1) * cout,
                ]
            )
    out = jnp.stack(phases, axis=-1)  # (N, H2, W2, Cout, 4)
    out = out.reshape(n, h2, w2, cout4)  # c-major: c*4 + phase
    if b is not None:
        out = out + jnp.repeat(b.astype(jnp.float32), 4)
    return out.astype(xc.dtype)
