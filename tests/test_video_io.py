"""Video I/O backends: y4m, npz, opencv; probe; concat/trim."""

import numpy as np
import pytest

from video_restore_tpu.video import open_reader, open_writer, probe
from video_restore_tpu.video.y4m import (
    Y4MReader,
    Y4MWriter,
    concat_y4m,
    rgb_to_yuv_planes,
    yuv_planes_to_rgb,
)


def test_yuv_roundtrip_close(tiny_frames):
    f = tiny_frames[0]
    y, u, v = rgb_to_yuv_planes(f, "444")
    back = yuv_planes_to_rgb(y, u, v)
    assert np.abs(back.astype(int) - f.astype(int)).max() <= 4


def test_y4m_roundtrip(tmp_path, tiny_frames):
    p = tmp_path / "clip.y4m"
    with Y4MWriter(p, 64, 48, 30000 / 1001) as w:
        for f in tiny_frames:
            w.write(f)
    info = probe(p)
    assert (info.width, info.height, info.frames) == (64, 48, len(tiny_frames))
    assert abs(info.fps - 29.97) < 0.01
    with Y4MReader(p) as r:
        out = list(r)
    assert len(out) == len(tiny_frames)
    # 4:2:0 chroma subsampling: luma-dominated content should round-trip
    err = np.abs(out[0].astype(int) - tiny_frames[0].astype(int)).mean()
    assert err < 6, err


def test_y4m_444_nearly_lossless(tmp_path, tiny_frames):
    p = tmp_path / "c.y4m"
    with Y4MWriter(p, 64, 48, 25, colorspace="444") as w:
        w.write(tiny_frames[0])
    with Y4MReader(p) as r:
        out = next(iter(r))
    assert np.abs(out.astype(int) - tiny_frames[0].astype(int)).max() <= 4


def test_npz_roundtrip_exact(tmp_path, tiny_frames):
    p = tmp_path / "clip.npz"
    with open_writer(p, 64, 48, 24.0) as w:
        for f in tiny_frames:
            w.write(f)
    info = probe(p)
    assert info.frames == len(tiny_frames) and info.fps == 24.0
    with open_reader(p) as r:
        out = np.stack(list(r))
    np.testing.assert_array_equal(out, tiny_frames)


def test_opencv_backend_roundtrip(tmp_path, tiny_frames):
    pytest.importorskip("cv2")
    p = tmp_path / "clip.mp4"
    with open_writer(p, 64, 48, 25.0, backend="opencv") as w:
        for f in tiny_frames:
            w.write(f)
    info = probe(p, backend="opencv")
    assert (info.width, info.height) == (64, 48)
    assert info.frames == len(tiny_frames)
    with open_reader(p, backend="opencv") as r:
        out = list(r)
    assert len(out) == len(tiny_frames)
    assert out[0].shape == (48, 64, 3)
    # lossy codec: just require rough similarity
    err = np.abs(out[0].astype(int) - tiny_frames[0].astype(int)).mean()
    assert err < 25, err


def test_concat_y4m(tmp_path, tiny_frames):
    segs = []
    for i in range(2):
        p = tmp_path / f"seg{i}.y4m"
        with Y4MWriter(p, 64, 48, 25) as w:
            for f in tiny_frames[i * 4 : (i + 1) * 4]:
                w.write(f)
        segs.append(p)
    dest = tmp_path / "all.y4m"
    total = concat_y4m(segs, dest)
    assert total == 8
    with Y4MReader(dest) as r:
        assert len(list(r)) == 8


def test_y4m_append_mode(tmp_path, tiny_frames):
    p = tmp_path / "a.y4m"
    with Y4MWriter(p, 64, 48, 25) as w:
        w.write(tiny_frames[0])
    with Y4MWriter(p, 64, 48, 25, append=True) as w:
        w.write(tiny_frames[1])
    assert probe(p).frames == 2
