"""Streaming mode: y4m over stdin/stdout (``video-restore - -``), the
ffmpeg-pipeline integration path. The reference has no streaming story at
all (video_upscaler.py only takes file paths)."""

import io

import numpy as np
import pytest

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.pipeline.runner import VideoRestorer
from video_restore_tpu.video.y4m import Y4MReader, Y4MWriter, is_pipe

from tests.test_pipeline import _cfg, _tiny_model


def test_is_pipe():
    assert is_pipe("-") and is_pipe("pipe:")
    assert not is_pipe("out.y4m") and not is_pipe("./-")


def _y4m_bytes(frames, fps=25.0):
    import tempfile, os

    fd, path = tempfile.mkstemp(suffix=".y4m")
    os.close(fd)
    with Y4MWriter(path, frames.shape[2], frames.shape[1], fps) as w:
        for f in frames:
            w.write(f)
    with open(path, "rb") as f:
        data = f.read()
    os.unlink(path)
    return data


class _FakeStdin:
    def __init__(self, data):
        self.buffer = io.BytesIO(data)


class _FakeStdout:
    def __init__(self):
        self.buffer = io.BytesIO()


def test_streaming_stdin_stdout(tiny_frames, monkeypatch, tmp_path):
    """Full pipeline with '-' input and output: reads the y4m stream from
    stdin (single pass, no probe seek), writes the upscaled y4m stream to
    stdout, keeps frame count, and never touches resume machinery."""
    import sys

    src_bytes = _y4m_bytes(tiny_frames)
    fake_in = _FakeStdin(src_bytes)
    fake_out = _FakeStdout()
    monkeypatch.setattr(sys, "stdin", fake_in)
    monkeypatch.setattr(sys, "stdout", fake_out)

    r = VideoRestorer(_cfg(), model=_tiny_model())
    ok = r.process_video("-", "-", show_progress=False)
    assert ok

    out_bytes = fake_out.buffer.getvalue()
    # parse the emitted stream back via a temp file
    out_path = tmp_path / "roundtrip.y4m"
    out_path.write_bytes(out_bytes)
    with Y4MReader(out_path) as rd:
        outs = list(rd)
    n, h, w, _ = tiny_frames.shape
    assert rd.info.width == w * 2 and rd.info.height == h * 2
    assert len(outs) == n


def test_streaming_in_file_out(tiny_frames, monkeypatch, tmp_path):
    """'-' input with a regular file output (mixed mode)."""
    import sys

    monkeypatch.setattr(sys, "stdin", _FakeStdin(_y4m_bytes(tiny_frames)))
    dst = tmp_path / "out.y4m"
    r = VideoRestorer(_cfg(), model=_tiny_model())
    assert r.process_video("-", dst, show_progress=False)
    with Y4MReader(dst) as rd:
        assert len(list(rd)) == tiny_frames.shape[0]
