"""On-device RGB -> planar I420 output (halves D2H, no host colorspace).

The device conversion must match the host path (video/y4m.py) within
quantization, the pipeline must auto-enable it only when the sink takes
planar yuv directly, and outputs must round-trip through the y4m reader.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
from video_restore_tpu.models.zoo import ModelHandle
from video_restore_tpu.ops.color import rgb_to_yuv420_planar
from video_restore_tpu.pipeline.runner import VideoRestorer
from video_restore_tpu.video import open_reader, open_writer
from video_restore_tpu.video.y4m import rgb_to_yuv_planes


def _tiny_model(scale=2):
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=scale)
    return ModelHandle("tiny", spec, init_srvgg(jax.random.PRNGKey(0), spec))


def _cfg(**kw):
    defaults = dict(
        model_name="RealESRGAN_x4_v3", tile_size=16, tile_overlap=4,
        precision="fp32", audio_copy=False,
    )
    defaults.update(kw)
    return RestoreConfig(**defaults)


def test_device_yuv_matches_host(rng):
    frames = rng.integers(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    dev = np.asarray(
        rgb_to_yuv420_planar(jnp.asarray(frames, jnp.float32) / 255.0)
    )
    for i, f in enumerate(frames):
        y, u, v = rgb_to_yuv_planes(f, "420")
        h, w = f.shape[:2]
        host = np.concatenate(
            [y, u.reshape(h // 4, w), v.reshape(h // 4, w)], axis=0
        )
        diff = np.abs(dev[i].astype(int) - host.astype(int))
        assert diff.max() <= 2  # native fixed-point path tolerance


def test_device_yuv_rejects_bad_geometry():
    with pytest.raises(ValueError, match="yuv420"):
        rgb_to_yuv420_planar(jnp.zeros((1, 30, 40, 3), jnp.float32))


def test_pipeline_y4m_uses_device_yuv(tmp_path, tiny_frames):
    """y4m output auto-enables the device path and the result stays close
    to the RGB-path output (same content within chroma quantization)."""
    src = tmp_path / "in.y4m"
    with open_writer(src, 64, 48, 25.0) as w:
        for f in tiny_frames:
            w.write(f)

    r_yuv = VideoRestorer(_cfg(), model=_tiny_model())
    out_yuv = tmp_path / "yuv.y4m"
    assert r_yuv.process_video(src, out_yuv, show_progress=False)

    r_rgb = VideoRestorer(_cfg(device_yuv="off"), model=_tiny_model())
    out_rgb = tmp_path / "rgb.y4m"
    assert r_rgb.process_video(src, out_rgb, show_progress=False)

    with open_reader(out_yuv) as a, open_reader(out_rgb) as b:
        fa, fb = np.stack(list(a)), np.stack(list(b))
    assert fa.shape == fb.shape == (8, 96, 128, 3)
    # both went through 4:2:0; difference is conversion rounding only
    assert np.abs(fa.astype(int) - fb.astype(int)).max() <= 4


def test_yuv_ineligible_paths(tmp_path, tiny_frames):
    """npz sinks, host resize, and face enhancement must force RGB."""
    r = VideoRestorer(_cfg(), model=_tiny_model())

    class Info:
        width, height = 64, 48

    assert not r._yuv_eligible(tmp_path / "o.npz", Info, 128, 96)
    assert r._yuv_eligible(tmp_path / "o.y4m", Info, 128, 96)
    # outscale mismatch (host Lanczos) -> RGB
    assert not r._yuv_eligible(tmp_path / "o.y4m", Info, 100, 96)
    r2 = VideoRestorer(_cfg(face_enhance=True), model=_tiny_model())
    assert not r2._yuv_eligible(tmp_path / "o.y4m", Info, 128, 96)
    r3 = VideoRestorer(_cfg(device_yuv="off"), model=_tiny_model())
    assert not r3._yuv_eligible(tmp_path / "o.y4m", Info, 128, 96)


def test_pipeline_mp4_device_yuv(tmp_path, tiny_frames, fake_ffmpeg_bin):
    """ffmpeg sinks take the planar frames straight onto the encoder pipe."""
    src = tmp_path / "in.mp4"
    with open(src, "wb") as fh:
        np.savez(fh, frames=tiny_frames, fps=25.0)
    r = VideoRestorer(_cfg(), model=_tiny_model())
    dst = tmp_path / "out.mp4"
    assert r.process_video(src, dst, show_progress=False)
    with open_reader(dst) as rd:
        out = np.stack(list(rd))
    assert out.shape == (8, 96, 128, 3)


# ---------------------------------------------------------------------------
# ordered-dithered quantization (--dither)


def test_dither_offsets_properties():
    from video_restore_tpu.ops.color import _bayer8, dither_offsets

    b = np.asarray(_bayer8())
    assert b.shape == (8, 8)
    # a Bayer matrix sweeps all 64 thresholds uniformly in [0, 1)
    assert len(np.unique(b)) == 64
    assert 0.0 < b.min() < 1.0 / 64 + 1e-6 and b.max() < 1.0
    d = np.asarray(dither_offsets(20, 30))
    assert d.shape == (20, 30)
    np.testing.assert_array_equal(d[:8, :8], b)
    np.testing.assert_array_equal(d[8:16, 8:16], b)  # 8x8 tiling


def test_quantize_u8_dither_error_bounds(rng):
    from video_restore_tpu.ops.color import quantize_u8

    x = jnp.asarray(rng.random((2, 40, 48, 3)).astype(np.float32))
    q_round = np.asarray(quantize_u8(x, dither=False)).astype(np.float64)
    q_dith = np.asarray(quantize_u8(x, dither=True)).astype(np.float64)
    ref = np.asarray(x, np.float64) * 255.0
    # per-pixel error stays within 1 LSB; the mean error stays unbiased
    assert np.abs(q_dith - ref).max() < 1.0 + 1e-6
    assert abs((q_dith - ref).mean()) < 0.05
    # dither only ever moves a value across one code boundary
    assert np.abs(q_dith - q_round).max() <= 1


def test_dither_breaks_banding():
    """A shallow gradient spanning <1 LSB/px quantizes to visible bands
    with round(); dithering spreads the transition."""
    from video_restore_tpu.ops.color import quantize_u8

    # 0.5 LSB across 64 columns: round() makes one hard step
    x = jnp.linspace(100.2 / 255, 100.8 / 255, 64)[None, None, :, None]
    x = jnp.tile(x, (1, 16, 1, 1))
    q_round = np.asarray(quantize_u8(x, dither=False))[0, :, :, 0]
    q_dith = np.asarray(quantize_u8(x, dither=True))[0, :, :, 0]
    assert len(np.unique(q_round)) == 2  # a hard band edge
    # dithered: both codes appear mixed through the middle columns
    mid = q_dith[:, 24:40]
    assert set(np.unique(mid)) == {100, 101}
    assert 0.2 < (mid == 101).mean() < 0.8


def test_yuv420_dither_stays_in_studio_range(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    out = np.asarray(rgb_to_yuv420_planar(x, dither=True))
    y = out[:, :16]
    assert y.min() >= 16 and y.max() <= 235
