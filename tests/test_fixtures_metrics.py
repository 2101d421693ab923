"""Degradation fixture generator + metrics harness tests."""

import numpy as np
import pytest

from video_restore_tpu.metrics import compare_videos, frame_psnr, frame_ssim
from video_restore_tpu.video.fixtures import (
    PRESETS,
    create_test_videos,
    degrade_frames,
    synth_source_clip,
)


def test_all_presets_run():
    src = synth_source_clip(n_frames=6, height=144, width=256)
    for name in PRESETS:
        out = degrade_frames(src, name, seed=1)
        assert out, name
        assert out[0].dtype == np.uint8 and out[0].ndim == 3, name


def test_degradations_actually_degrade():
    """Each lossy preset must measurably reduce PSNR vs a same-size clean
    resize of the source."""
    import cv2

    src = synth_source_clip(n_frames=2, height=288, width=512)
    for name in ("heavy_compression", "vhs_style", "blurry_noisy",
                 "damaged_film", "extreme_low_quality"):
        deg = degrade_frames(src, name, seed=3)[0]
        h, w = deg.shape[:2]
        clean = cv2.resize(src[0], (w, h), interpolation=cv2.INTER_AREA)
        p = frame_psnr(clean, deg)
        assert p < 35, (name, p)


def test_fps_reduction_presets():
    src = synth_source_clip(n_frames=12, height=144, width=256)
    out = degrade_frames(src, "old_webcam", seed=0)
    assert len(out) == 6  # frame_step=2


def test_create_test_videos_writes_clips(tmp_path):
    paths = create_test_videos(
        None, tmp_path, presets=["clean_144p", "vhs_style"], clip_frames=4
    )
    assert len(paths) == 2
    for p in paths:
        assert p.exists() and p.stat().st_size > 0


def test_metrics_harness(tmp_path, tiny_frames):
    from video_restore_tpu.video import open_writer

    a = tmp_path / "a.npz"
    b = tmp_path / "b.npz"
    noisy = np.clip(
        tiny_frames.astype(int)
        + np.random.default_rng(0).integers(-10, 10, tiny_frames.shape),
        0, 255,
    ).astype(np.uint8)
    for path, frames in ((a, tiny_frames), (b, noisy)):
        with open_writer(path, 64, 48, 25) as w:
            for f in frames:
                w.write(f)
    same = compare_videos(str(a), str(a))
    assert same["psnr_mean"] == float("inf") or same["psnr_mean"] > 60
    assert same["ssim_mean"] > 0.999
    diff = compare_videos(str(a), str(b))
    assert 20 < diff["psnr_mean"] < 45
    assert diff["frames"] == len(tiny_frames)


def test_metrics_shape_mismatch(tmp_path, tiny_frames):
    from video_restore_tpu.video import open_writer

    a = tmp_path / "a.npz"
    b = tmp_path / "b.npz"
    with open_writer(a, 64, 48, 25) as w:
        w.write(tiny_frames[0])
    with open_writer(b, 32, 24, 25) as w:
        w.write(tiny_frames[0][:24, :32])
    with pytest.raises(ValueError):
        compare_videos(str(a), str(b))


def test_codec_roundtrip_plumbing(fake_ffmpeg_bin, tiny_frames):
    """The ffmpeg-rendered preset path drives the real subprocess plumbing
    (encode pipe + decode) — exercised against the fake binary."""
    from video_restore_tpu.video.fixtures import degrade_frames

    out = degrade_frames(
        list(tiny_frames), "blocky_mpeg", use_ffmpeg=True, fps=25.0
    )
    base = degrade_frames(list(tiny_frames), "blocky_mpeg", fps=25.0)
    assert len(out) == len(base)
    assert out[0].shape == base[0].shape
    assert out[0].dtype == np.uint8


def test_codec_roundtrip_requires_ffmpeg(monkeypatch, tiny_frames):
    """use_ffmpeg=True without a binary fails loudly, not silently."""
    import pytest

    from video_restore_tpu.video import fixtures

    monkeypatch.setenv("PATH", "/nonexistent")
    with pytest.raises(RuntimeError, match="ffmpeg binary required"):
        fixtures.degrade_frames(
            list(tiny_frames[:2]), "heavy_compression",
            use_ffmpeg=True, fps=25.0,
        )


def test_presets_without_ffmpeg_unchanged(tiny_frames):
    """Default path never touches ffmpeg (use_ffmpeg defaults off)."""
    from video_restore_tpu.video.fixtures import degrade_frames

    a = degrade_frames(list(tiny_frames), "heavy_compression", seed=1)
    b = degrade_frames(
        list(tiny_frames), "heavy_compression", seed=1, use_ffmpeg=False
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_msssim_properties(rng):
    from video_restore_tpu.metrics import frame_msssim

    base = (rng.random((192, 256, 3)) * 255).astype(np.uint8)
    assert frame_msssim(base, base) == pytest.approx(1.0, abs=1e-9)

    light = np.clip(
        base.astype(np.int16) + rng.integers(-8, 8, base.shape), 0, 255
    ).astype(np.uint8)
    heavy = np.clip(
        base.astype(np.int16) + rng.integers(-80, 80, base.shape), 0, 255
    ).astype(np.uint8)
    ms_light = frame_msssim(base, light)
    ms_heavy = frame_msssim(base, heavy)
    assert 0.0 < ms_heavy < ms_light < 1.0


def test_msssim_small_image_fallback(rng):
    """Images too small for all 5 dyadic scales renormalize the
    exponents instead of crashing."""
    from video_restore_tpu.metrics import frame_msssim

    a = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    b = np.clip(
        a.astype(np.int16) + rng.integers(-20, 20, a.shape), 0, 255
    ).astype(np.uint8)
    v = frame_msssim(a, b)
    assert 0.0 < v <= 1.0
    assert frame_msssim(a, a) == pytest.approx(1.0, abs=1e-9)


def test_compare_videos_msssim(tmp_path, rng):
    import numpy as np

    from video_restore_tpu.metrics import compare_videos
    from video_restore_tpu.video.y4m import Y4MWriter

    a, b = tmp_path / "a.y4m", tmp_path / "b.y4m"
    frames = (rng.random((3, 64, 96, 3)) * 255).astype(np.uint8)
    for path, jitter in ((a, 0), (b, 6)):
        with Y4MWriter(str(path), 96, 64, 25) as wr:
            for f in frames:
                g = np.clip(
                    f.astype(np.int16)
                    + rng.integers(-jitter, jitter + 1, f.shape),
                    0, 255,
                ).astype(np.uint8)
                wr.write(g)
    res = compare_videos(str(a), str(b), msssim=True)
    assert "msssim_mean" in res and 0.0 < res["msssim_mean"] <= 1.0


def test_gmsd_properties(rng):
    """GMSD (lower = better): 0 on identical frames, monotone in
    degradation severity, insensitive to a global luma shift (it is a
    gradient-domain metric)."""
    from video_restore_tpu.metrics import frame_gmsd

    base = (rng.random((192, 256, 3)) * 255).astype(np.uint8)
    assert frame_gmsd(base, base) == pytest.approx(0.0, abs=1e-12)

    light = np.clip(
        base.astype(np.int16) + rng.integers(-8, 8, base.shape), 0, 255
    ).astype(np.uint8)
    heavy = np.clip(
        base.astype(np.int16) + rng.integers(-80, 80, base.shape), 0, 255
    ).astype(np.uint8)
    g_light = frame_gmsd(base, light)
    g_heavy = frame_gmsd(base, heavy)
    assert 0.0 < g_light < g_heavy

    shifted = np.clip(base.astype(np.int16) + 20, 0, 255).astype(np.uint8)
    assert frame_gmsd(base, shifted) < g_light


def test_compare_videos_gmsd(tmp_path, rng):
    import numpy as np

    from video_restore_tpu.metrics import compare_videos
    from video_restore_tpu.video.y4m import Y4MWriter

    a, b = tmp_path / "a.y4m", tmp_path / "b.y4m"
    frames = (rng.random((3, 64, 96, 3)) * 255).astype(np.uint8)
    for path, jitter in ((a, 0), (b, 6)):
        with Y4MWriter(str(path), 96, 64, 25) as wr:
            for f in frames:
                g = np.clip(
                    f.astype(np.int16)
                    + rng.integers(-jitter, jitter + 1, f.shape),
                    0, 255,
                ).astype(np.uint8)
                wr.write(g)
    res = compare_videos(str(a), str(b), gmsd=True)
    assert "gmsd_mean" in res and 0.0 < res["gmsd_mean"] < 1.0
    assert res["gmsd_max"] >= res["gmsd_mean"]
