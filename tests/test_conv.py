"""Unit tests for the conv/layout primitives vs independent references."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal

from video_restore_tpu.ops.conv import (
    conv2d,
    leaky_relu,
    pixel_shuffle,
    pixel_unshuffle,
    prelu,
    upsample_nearest,
)


def test_conv2d_matches_scipy(rng):
    x = rng.standard_normal((1, 9, 11, 2)).astype(np.float32)
    w = rng.standard_normal((3, 3, 2, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    out = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    assert out.shape == (1, 9, 11, 4)
    ref = np.zeros_like(out)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for o in range(4):
        acc = np.zeros((9, 11))
        for i in range(2):
            acc += signal.correlate2d(xp[0, :, :, i], w[:, :, i, o], mode="valid")
        ref[0, :, :, o] = acc + b[o]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_leaky_relu_and_prelu():
    x = jnp.asarray([-2.0, -0.5, 0.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(leaky_relu(x)), [-0.4, -0.1, 0.0, 1.0], atol=1e-6
    )
    x2 = jnp.asarray([[[[-1.0, 2.0]]]])
    alpha = jnp.asarray([0.5, 0.25])
    np.testing.assert_allclose(
        np.asarray(prelu(x2, alpha)), [[[[-0.5, 2.0]]]], atol=1e-6
    )


def test_pixel_shuffle_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 3, 4, 8)).astype(np.float32)  # NHWC, C=8=2*2*2
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = (
        torch.nn.functional.pixel_shuffle(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pixel_unshuffle_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    ref = (
        torch.nn.functional.pixel_unshuffle(
            torch.from_numpy(x).permute(0, 3, 1, 2), 2
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_shuffle_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 12)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pixel_unshuffle(pixel_shuffle(x, 2), 2)),
        np.asarray(x),
        atol=1e-6,
    )


def test_upsample_nearest(rng):
    x = rng.standard_normal((1, 2, 3, 2)).astype(np.float32)
    out = np.asarray(upsample_nearest(jnp.asarray(x), 2))
    assert out.shape == (1, 4, 6, 2)
    np.testing.assert_allclose(out[0, ::2, ::2], x[0])
    np.testing.assert_allclose(out[0, 1::2, 1::2], x[0])
