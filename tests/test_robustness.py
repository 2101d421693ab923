"""Edge cases: corrupt/empty/tiny inputs must fail cleanly, never hang."""

import numpy as np
import jax
import pytest

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
from video_restore_tpu.models.zoo import ModelHandle
from video_restore_tpu.pipeline.runner import VideoRestorer
from video_restore_tpu.video import open_reader, open_writer, probe


def _tiny_model(scale=2):
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=scale)
    return ModelHandle("tiny", spec, init_srvgg(jax.random.PRNGKey(0), spec))


def _cfg(**kw):
    d = dict(model_name="RealESRGAN_x4_v3", tile_size=16, tile_overlap=4,
             precision="fp32", audio_copy=False)
    d.update(kw)
    return RestoreConfig(**d)


def test_corrupt_y4m_fails_cleanly(tmp_path):
    bad = tmp_path / "bad.y4m"
    bad.write_bytes(b"YUV4MPEG2 W64 H48 F25:1\nGARBAGE-NOT-A-FRAME" + b"x" * 100)
    r = VideoRestorer(_cfg(), model=_tiny_model())
    # decode error must surface as a failed (False) run, not a hang
    assert not r.process_video(bad, tmp_path / "out.y4m", show_progress=False)


def test_not_a_video_fails_cleanly(tmp_path):
    bad = tmp_path / "bad.y4m"
    bad.write_bytes(b"this is not a video at all")
    r = VideoRestorer(_cfg(), model=_tiny_model())
    assert not r.process_video(bad, tmp_path / "o.y4m", show_progress=False)


def test_single_frame_video(tmp_path, tiny_frames):
    src = tmp_path / "one.npz"
    with open_writer(src, 64, 48, 25) as w:
        w.write(tiny_frames[0])
    r = VideoRestorer(_cfg(), model=_tiny_model())
    dst = tmp_path / "o.npz"
    assert r.process_video(src, dst, show_progress=False)
    assert probe(dst).frames == 1


def test_tiny_8x8_video(tmp_path):
    src = tmp_path / "tiny.npz"
    rng = np.random.default_rng(0)
    with open_writer(src, 8, 8, 25) as w:
        for _ in range(2):
            w.write(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
    r = VideoRestorer(_cfg(tile_size=16), model=_tiny_model())
    dst = tmp_path / "o.npz"
    assert r.process_video(src, dst, show_progress=False)
    info = probe(dst)
    assert (info.width, info.height, info.frames) == (16, 16, 2)


def test_odd_dimensions_video(tmp_path):
    """Odd frame sizes must flow through tiling (mod-2 extract snapping)."""
    src = tmp_path / "odd.npz"
    rng = np.random.default_rng(0)
    with open_writer(src, 37, 23, 25) as w:
        for _ in range(2):
            w.write(rng.integers(0, 255, (23, 37, 3), dtype=np.uint8))
    r = VideoRestorer(_cfg(), model=_tiny_model())
    dst = tmp_path / "o.npz"
    assert r.process_video(src, dst, show_progress=False)
    info = probe(dst)
    assert (info.width, info.height) == (74, 46)


def test_empty_video(tmp_path):
    src = tmp_path / "empty.npz"
    with open_writer(src, 16, 16, 25) as w:
        pass
    r = VideoRestorer(_cfg(), model=_tiny_model())
    # zero frames: nothing to do; run completes with 0 == 0 accounting
    assert r.process_video(src, tmp_path / "o.npz", show_progress=False)


def test_y4m_reader_rejects_garbage_header(tmp_path):
    from video_restore_tpu.video.y4m import Y4MReader

    p = tmp_path / "x.y4m"
    p.write_bytes(b"NOT-A-Y4M\n")
    with pytest.raises(ValueError):
        Y4MReader(p)
