"""Space-to-depth convolution transform (exact).

A 3x3 SAME conv on the fine grid is algebraically identical to a set of
2x2 convs on the space-to-depth representation (2x coarser grid, 4x
channels). RRDBNet's 64/32-channel convs under-fill the 128-lane MXU and
the (8,128) memory tiling; in the sd domain the same math runs with
K = 16*Cin contraction and large output widths — near-ideal MXU shapes —
at the cost of 16/9 = 1.78x nominal MACs (structural zeros).

Representation: a coarse image is a **tuple of 4 phase tensors**
(x[:, p::2, q::2, :] for (p, q) in row-major order), each with the
original fine channel count. This avoids any channel interleaving:

- `conv3x3_sd`: concatenates the 4 input phases channel-wise (cheap block
  concat) and runs one 2x2 conv **per output phase** with phase-specific
  SAME-style padding ((1-a, a), (1-b, b)) — derivation: the fine output at
  phase (a, b) reads fine rows 2i+a+dy-1 = 2(i+du)+p with
  dy = 2*du + p - (1 - a); taps with dy outside [0, 2] are zero.
- element-wise ops (LeakyReLU, residual adds, fine-channel slicing) apply
  per phase unchanged, because each phase tensor carries exactly the fine
  channels.
- `sd_split` / `sd_merge` convert at the body boundary only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Phases = Tuple[jax.Array, jax.Array, jax.Array, jax.Array]

_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def sd_split(x: jax.Array) -> Phases:
    """(N, H, W, C) -> 4 x (N, H/2, W/2, C), phases row-major."""
    return tuple(x[:, p::2, q::2, :] for p, q in _PHASES)


def sd_merge(phases: Phases) -> jax.Array:
    """Inverse of :func:`sd_split`."""
    n, h2, w2, c = phases[0].shape
    # stack to (N, H2, 2, W2, 2, C) with [p, q] at the right positions
    rows0 = jnp.stack([phases[0], phases[1]], axis=3)  # p=0: (N,H2,W2,2,C)
    rows1 = jnp.stack([phases[2], phases[3]], axis=3)  # p=1
    x = jnp.stack([rows0, rows1], axis=2)  # (N, H2, 2, W2, 2, C)
    return x.reshape(n, h2 * 2, w2 * 2, c)


def make_sd_kernels(w: jax.Array) -> jax.Array:
    """(..., 3, 3, Cin, Cout) -> (..., 4, 2, 2, 4*Cin, Cout): one 2x2
    kernel per output phase; input channels phase-major (ph*Cin + c),
    matching the concat order in :func:`conv3x3_sd`."""
    *lead, _, _, cin, cout = w.shape
    k = jnp.zeros(tuple(lead) + (4, 2, 2, 4 * cin, cout), w.dtype)
    for oph, (a, b) in enumerate(_PHASES):
        for du in (0, 1):
            for dv in (0, 1):
                for iph, (p, q) in enumerate(_PHASES):
                    dy = 2 * du + p - (1 - a)
                    dx = 2 * dv + q - (1 - b)
                    if not (0 <= dy <= 2 and 0 <= dx <= 2):
                        continue
                    k = k.at[
                        ..., oph, du, dv,
                        iph * cin : (iph + 1) * cin, :,
                    ].set(w[..., dy, dx, :, :])
    return k


def conv3x3_sd(
    phases: Phases, k4: jax.Array, b: Optional[jax.Array] = None
) -> Phases:
    """Transformed 3x3 conv on phase tensors.

    phases: 4 x (N, H2, W2, Cin); k4: (4, 2, 2, 4*Cin, Cout);
    b: optional (Cout,). Returns 4 x (N, H2, W2, Cout).
    """
    xin = jnp.concatenate(phases, axis=-1)  # phase-major channels
    outs = []
    for oph, (a, bb) in enumerate(_PHASES):
        y = lax.conv_general_dilated(
            xin, k4[oph].astype(xin.dtype), (1, 1),
            ((1 - a, a), (1 - bb, bb)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            y = y + b.astype(jnp.float32)
        outs.append(y.astype(xin.dtype))
    return tuple(outs)


def phase_map(f, *phase_tuples) -> Phases:
    """Apply an element-wise function across matching phase tensors."""
    return tuple(f(*xs) for xs in zip(*phase_tuples))


def conv3x3_sd_packed(
    x: jax.Array, k4: jax.Array, b: Optional[jax.Array] = None
) -> jax.Array:
    """Channel-packed variant of :func:`conv3x3_sd`: the 4 phases live as
    phase-major channel blocks of ONE tensor (the layout produced by
    ops/conv.py's ``up_phase_kernel_pm``), so an sd-domain tail chains
    with plain NHWC convs and no tuple plumbing.

    x: (N, H2, W2, 4*Cin); k4: (4, 2, 2, 4*Cin, Cout);
    b: optional (Cout,). Returns (N, H2, W2, 4*Cout), phase-major.
    """
    outs = []
    for oph, (a, bb) in enumerate(_PHASES):
        y = lax.conv_general_dilated(
            x, k4[oph].astype(x.dtype), (1, 1),
            ((1 - a, a), (1 - bb, bb)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            y = y + b.astype(jnp.float32)
        outs.append(y.astype(x.dtype))
    return jnp.concatenate(outs, axis=-1)
