"""Post-processing stack vs OpenCV references and property tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_restore_tpu.ops.post import (
    bilateral_filter,
    clahe,
    gaussian_blur,
    temporal_blend,
    unsharp_mask,
)


def test_bilateral_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    img = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
    ref = cv2.bilateralFilter(img, 5, 25, 25).astype(np.float32)
    ours = (
        np.asarray(
            bilateral_filter(jnp.asarray(img, jnp.float32) / 255.0, 5, 25.0, 25.0)
        )
        * 255.0
    )
    # interior only (border handling differs slightly)
    diff = np.abs(ours - ref)[2:-2, 2:-2]
    assert diff.mean() < 1.5, diff.mean()
    assert diff.max() < 12, diff.max()


def test_bilateral_preserves_edges(rng):
    """Bilateral must smooth flat noise but keep a strong edge."""
    img = np.zeros((20, 20, 3), np.float32)
    img[:, 10:] = 0.8
    noisy = img + rng.normal(0, 0.02, img.shape).astype(np.float32)
    out = np.asarray(bilateral_filter(jnp.asarray(noisy), 5, 25.0, 25.0))
    # edge magnitude preserved
    assert abs(out[:, 12:].mean() - out[:, :8].mean()) > 0.7
    # noise reduced on the flat region
    assert out[:, :8].std() < noisy[:, :8].std()


def test_clahe_improves_contrast_like_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    # low-contrast image
    base = (rng.random((64, 64)) * 60 + 100).astype(np.uint8)
    rgb = np.stack([base] * 3, axis=-1)
    ours = np.asarray(clahe(jnp.asarray(rgb, jnp.float32) / 255.0)) * 255.0

    ref_clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    ref = ref_clahe.apply(base).astype(np.float32)

    # Contrast must increase comparably to cv2's result.
    ours_y = ours.mean(axis=-1)
    assert ours_y.std() > base.std() * 1.2
    ratio = ours_y.std() / max(ref.std(), 1e-6)
    assert 0.6 < ratio < 1.7, ratio
    # And the mapping should correlate strongly with cv2's
    cc = np.corrcoef(ours_y.ravel(), ref.ravel())[0, 1]
    assert cc > 0.95, cc


def test_clahe_identity_on_uniform():
    """CLAHE on a uniform image must not introduce structure."""
    rgb = np.full((32, 32, 3), 0.42, np.float32)
    out = np.asarray(clahe(jnp.asarray(rgb)))
    assert out.std() < 0.02


def test_unsharp_increases_edge_contrast():
    img = np.zeros((16, 24, 3), np.float32)
    img[:, 12:] = 0.6
    soft = np.asarray(gaussian_blur(jnp.asarray(img), 1.5, 4))
    sharp = np.asarray(unsharp_mask(jnp.asarray(soft), amount=1.0, sigma=1.5, radius=4))
    grad_soft = np.abs(np.diff(soft[8, :, 0])).max()
    grad_sharp = np.abs(np.diff(sharp[8, :, 0])).max()
    assert grad_sharp > grad_soft * 1.2


def test_unsharp_fused_matches_xla(rng):
    """The single-pass Pallas unsharp (ops/pallas_post.py, interpret
    mode) == ops.post.unsharp_mask including the replicate-pad edges,
    across stripe boundaries, a threshold, and a non-divisible height."""
    from video_restore_tpu.ops.pallas_post import unsharp_fused

    # unjitted reference: the jitted wrapper treats `threshold` as traced
    # (its `if threshold > 0` only works for the Python default)
    ref_fn = unsharp_mask.__wrapped__
    # heights multiple of 8 (the kernel's DMA alignment gate); 48/16
    # exercises the last-stripe bottom-replicate shift (hp == h, shift 8)
    for h, w, bh, thr in ((40, 18, 8, 0.0), (48, 12, 16, 0.02)):
        x = jnp.asarray(rng.random((2, h, w, 3)).astype(np.float32))
        ref = np.asarray(
            ref_fn(x, amount=0.7, sigma=1.5, radius=4, threshold=thr)
        )
        got = np.asarray(
            unsharp_fused(
                x, amount=0.7, sigma=1.5, radius=4, threshold=thr,
                block_h=bh, interpret=True,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_unsharp_zero_amount_is_identity(rng):
    x = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    out = np.asarray(unsharp_mask(x, amount=0.0))
    np.testing.assert_allclose(out, np.asarray(x), atol=1e-6)


def test_temporal_blend_stabilizes_static_noise(rng):
    base = rng.random((12, 16, 3)).astype(np.float32) * 0.5 + 0.25
    frames = np.stack(
        [base + rng.normal(0, 0.02, base.shape).astype(np.float32) for _ in range(6)]
    )
    out, last = temporal_blend(jnp.asarray(frames), strength=0.5)
    out = np.asarray(out)
    # later frames should be closer to the clean base than their raw inputs
    raw_err = np.abs(frames[-1] - base).mean()
    out_err = np.abs(out[-1] - base).mean()
    assert out_err < raw_err
    np.testing.assert_allclose(np.asarray(last), out[-1], atol=1e-6)


def test_temporal_blend_passes_motion():
    """A large scene change must NOT be blended (no ghosting)."""
    a = np.zeros((4, 8, 8, 3), np.float32)
    a[2:] = 1.0  # hard cut at frame 2
    out, _ = temporal_blend(jnp.asarray(a), strength=0.5, motion_sigma=0.05)
    out = np.asarray(out)
    assert out[2].mean() > 0.99  # new scene comes through ~unchanged


def test_temporal_carry_chains_chunks(rng):
    frames = rng.random((8, 6, 6, 3)).astype(np.float32)
    full, _ = temporal_blend(jnp.asarray(frames), strength=0.4)
    o1, c = temporal_blend(jnp.asarray(frames[:4]), strength=0.4)
    o2, _ = temporal_blend(jnp.asarray(frames[4:]), strength=0.4, prev=c)
    chunked = np.concatenate([np.asarray(o1), np.asarray(o2)])
    np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-5)
