"""RRDBNet (ESRGAN generator) as a pure-functional JAX model.

Independent re-implementation of the architecture the reference configures
through basicsr (/root/reference/video_upscaler.py:313-321):

- ``RealESRGAN_x4plus``:        num_feat=64, num_block=23, num_grow_ch=32, scale=4
- ``RealESRGAN_x4plus_anime_6B``: num_block=6, otherwise as above
- ``RealESRGAN_x2plus``:        scale=2 (README.md:27; unimplemented in the
  reference code — implemented for real here)

Architecture (from the published ESRGAN/Real-ESRGAN papers and checkpoint
shapes): conv stem -> ``num_block`` RRDB blocks (each 3 residual-dense blocks
of five 3x3 convs with growth ``num_grow_ch``, LeakyReLU(0.2), residual
scaling 0.2) -> body conv + global skip -> two nearest-2x upsample+conv
stages -> HR conv -> output conv. For scale=2 the input is pixel-unshuffled
by 2 first (12 input channels).

TPU-first design choices:

- NHWC activations / HWIO weights; bf16 compute with fp32 MXU accumulation.
- The ``num_block`` identical RRDB blocks are *stacked* along a leading axis
  and executed with ``lax.scan``, so XLA compiles one block body instead of
  unrolling 345 convolutions (fast compiles, identical math).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from video_restore_tpu.ops.conv import (
    conv2d,
    leaky_relu,
    pixel_unshuffle,
    upsample_nearest,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RRDBNetSpec:
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4

    @property
    def stem_in_ch(self) -> int:
        """Input channels after the scale<4 pixel-unshuffle."""
        if self.scale == 2:
            return self.num_in_ch * 4
        if self.scale == 1:
            return self.num_in_ch * 16
        return self.num_in_ch


def _conv_init(key, kh, kw, cin, cout, gain=1.0, dtype=jnp.float32):
    """Kaiming-normal (fan_in, leaky_relu a=0) init scaled by ``gain`` —
    matches basicsr's default_init_weights(scale=0.1) behaviour for the
    residual-dense convs."""
    fan_in = kh * kw * cin
    std = (2.0 / fan_in) ** 0.5 * gain
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * std
    b = jnp.zeros((cout,), dtype)
    return {"w": w, "b": b}


def _rdb_init(key, nf, gc, dtype):
    ks = jax.random.split(key, 5)
    return {
        "conv1": _conv_init(ks[0], 3, 3, nf, gc, 0.1, dtype),
        "conv2": _conv_init(ks[1], 3, 3, nf + gc, gc, 0.1, dtype),
        "conv3": _conv_init(ks[2], 3, 3, nf + 2 * gc, gc, 0.1, dtype),
        "conv4": _conv_init(ks[3], 3, 3, nf + 3 * gc, gc, 0.1, dtype),
        "conv5": _conv_init(ks[4], 3, 3, nf + 4 * gc, nf, 0.1, dtype),
    }


def init_rrdbnet(key: jax.Array, spec: RRDBNetSpec, dtype=jnp.float32) -> Params:
    """Random init. Body blocks are stacked along axis 0 for lax.scan."""
    nf, gc = spec.num_feat, spec.num_grow_ch
    keys = jax.random.split(key, 7 + spec.num_block * 3)
    body_keys = keys[7:].reshape((spec.num_block, 3) + keys.shape[1:])

    def one_block(bkeys):
        return {
            "rdb1": _rdb_init(bkeys[0], nf, gc, dtype),
            "rdb2": _rdb_init(bkeys[1], nf, gc, dtype),
            "rdb3": _rdb_init(bkeys[2], nf, gc, dtype),
        }

    blocks = [one_block(body_keys[i]) for i in range(spec.num_block)]
    body = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "conv_first": _conv_init(keys[0], 3, 3, spec.stem_in_ch, nf, 1.0, dtype),
        "body": body,
        "conv_body": _conv_init(keys[1], 3, 3, nf, nf, 1.0, dtype),
        "conv_up1": _conv_init(keys[2], 3, 3, nf, nf, 1.0, dtype),
        "conv_up2": _conv_init(keys[3], 3, 3, nf, nf, 1.0, dtype),
        "conv_hr": _conv_init(keys[4], 3, 3, nf, nf, 1.0, dtype),
        "conv_last": _conv_init(keys[5], 3, 3, nf, spec.num_out_ch, 1.0, dtype),
    }


def _rdb_apply(p: Params, x: jax.Array) -> jax.Array:
    """Residual dense block: 5 growing convs, LeakyReLU(0.2), 0.2 residual."""
    c1 = leaky_relu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"]))
    c2 = leaky_relu(conv2d(jnp.concatenate([x, c1], -1), p["conv2"]["w"], p["conv2"]["b"]))
    c3 = leaky_relu(
        conv2d(jnp.concatenate([x, c1, c2], -1), p["conv3"]["w"], p["conv3"]["b"])
    )
    c4 = leaky_relu(
        conv2d(jnp.concatenate([x, c1, c2, c3], -1), p["conv4"]["w"], p["conv4"]["b"])
    )
    c5 = conv2d(
        jnp.concatenate([x, c1, c2, c3, c4], -1), p["conv5"]["w"], p["conv5"]["b"]
    )
    return c5 * jnp.asarray(0.2, x.dtype) + x


def _rrdb_apply(p: Params, x: jax.Array) -> jax.Array:
    out = _rdb_apply(p["rdb1"], x)
    out = _rdb_apply(p["rdb2"], out)
    out = _rdb_apply(p["rdb3"], out)
    return out * jnp.asarray(0.2, x.dtype) + x


@partial(jax.jit, static_argnames=("scale",))
def _apply(params: Params, x: jax.Array, scale: int) -> jax.Array:
    if scale == 2:
        x = pixel_unshuffle(x, 2)
    elif scale == 1:
        x = pixel_unshuffle(x, 4)
    feat = conv2d(x, params["conv_first"]["w"], params["conv_first"]["b"])

    def block_step(h, bp):
        return _rrdb_apply(bp, h), None

    body_out, _ = lax.scan(block_step, feat, params["body"])
    body_out = conv2d(body_out, params["conv_body"]["w"], params["conv_body"]["b"])
    feat = feat + body_out

    feat = leaky_relu(
        conv2d(upsample_nearest(feat, 2), params["conv_up1"]["w"], params["conv_up1"]["b"])
    )
    feat = leaky_relu(
        conv2d(upsample_nearest(feat, 2), params["conv_up2"]["w"], params["conv_up2"]["b"])
    )
    feat = leaky_relu(conv2d(feat, params["conv_hr"]["w"], params["conv_hr"]["b"]))
    return conv2d(feat, params["conv_last"]["w"], params["conv_last"]["b"])


def apply_rrdbnet(params: Params, x: jax.Array, spec: RRDBNetSpec) -> jax.Array:
    """Forward pass. x: (N, H, W, 3) float in [0, 1]. Returns (N, H*s, W*s, 3)."""
    return _apply(params, x, spec.scale)
