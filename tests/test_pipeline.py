"""End-to-end pipeline tests on synthetic clips (npz + y4m backends)."""

import json
import numpy as np
import jax
import pytest

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
from video_restore_tpu.models.zoo import ModelHandle
from video_restore_tpu.pipeline.runner import VideoRestorer
from video_restore_tpu.video import open_reader, probe


def _tiny_model(scale=2):
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=scale)
    params = init_srvgg(jax.random.PRNGKey(0), spec)
    return ModelHandle("tiny", spec, params)


def _write_clip(path, frames, fps=25.0):
    from video_restore_tpu.video import open_writer

    with open_writer(path, frames.shape[2], frames.shape[1], fps) as w:
        for f in frames:
            w.write(f)


def _cfg(**kw):
    defaults = dict(
        model_name="RealESRGAN_x4_v3", tile_size=16, tile_overlap=4,
        precision="fp32", audio_copy=False,
    )
    defaults.update(kw)
    return RestoreConfig(**defaults)


def test_end_to_end_npz(tmp_path, tiny_frames):
    src = tmp_path / "in.npz"
    dst = tmp_path / "out.npz"
    _write_clip(src, tiny_frames)
    r = VideoRestorer(_cfg(), model=_tiny_model())
    assert r.process_video(src, dst, show_progress=False)
    info = probe(dst)
    assert info.frames == len(tiny_frames)
    assert (info.width, info.height) == (128, 96)  # 2x upscale
    with open_reader(dst) as rd:
        out = np.stack(list(rd))
    assert out.dtype == np.uint8
    # output order preserved: frame brightness trend (blue channel ramps
    # with t in the fixture) must be monotonic like the input
    trend = out[..., 2].mean(axis=(1, 2))
    assert (np.diff(trend) > 0).all()


def test_end_to_end_y4m(tmp_path, tiny_frames):
    src = tmp_path / "in.y4m"
    dst = tmp_path / "out.y4m"
    _write_clip(src, tiny_frames)
    r = VideoRestorer(_cfg(), model=_tiny_model())
    assert r.process_video(src, dst, show_progress=False)
    assert probe(dst).frames == len(tiny_frames)


def test_end_to_end_enhanced(tmp_path, tiny_frames):
    src = tmp_path / "in.npz"
    dst = tmp_path / "out.npz"
    _write_clip(src, tiny_frames)
    cfg = _cfg(enhanced_mode=True, denoise=0.5, sharpen=0.2, temporal=True)
    r = VideoRestorer(cfg, model=_tiny_model())
    assert r.process_video(src, dst, show_progress=False)
    assert probe(dst).frames == len(tiny_frames)


def test_batch_dir(tmp_path, tiny_frames):
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    for name in ("a.npz", "b.npz"):
        _write_clip(indir / name, tiny_frames[:4])
    r = VideoRestorer(_cfg(), model=_tiny_model())
    ok, total = r.process_batch_dir(indir, outdir, show_progress=False)
    assert (ok, total) == (2, 2)
    assert (outdir / "a_upscaled.npz").exists()
    assert (outdir / "b_upscaled.npz").exists()


def test_resume_y4m(tmp_path, tiny_frames):
    """Kill-and-resume: truncate a partial output, resume, and the result
    must equal a clean full run."""
    src = tmp_path / "in.y4m"
    _write_clip(src, tiny_frames)

    full = tmp_path / "full.y4m"
    r = VideoRestorer(_cfg(segment_frames=2), model=_tiny_model())
    assert r.process_video(src, full, show_progress=False)

    partial = tmp_path / "part.y4m"
    assert r.process_video(src, partial, show_progress=False)
    # simulate a crash: keep only 3 complete frames + garbage tail
    import os
    from video_restore_tpu.video.y4m import Y4MReader, _plane_shapes

    with Y4MReader(partial) as rd:
        info = rd.info
    ys = info.width * info.height
    cs = (info.width // 2) * (info.height // 2)
    fb = 6 + ys + 2 * cs
    with open(partial, "rb") as f:
        header = len(f.readline())
    with open(partial, "ab") as f:
        f.truncate(header + 3 * fb + 17)  # 3 frames + partial garbage

    r2 = VideoRestorer(
        _cfg(segment_frames=2, resume=True), model=_tiny_model()
    )
    assert r2.process_video(src, partial, show_progress=False)

    with open_reader(full) as a, open_reader(partial) as b:
        fa, fb_ = list(a), list(b)
    assert len(fa) == len(fb_) == len(tiny_frames)
    for x, y in zip(fa, fb_):
        np.testing.assert_array_equal(x, y)


def test_frame_accounting_detects_mismatch(tmp_path, tiny_frames, monkeypatch):
    """A writer that drops frames must be caught by the accounting check."""
    src = tmp_path / "in.npz"
    dst = tmp_path / "out.npz"
    _write_clip(src, tiny_frames)
    r = VideoRestorer(_cfg(), model=_tiny_model())

    import video_restore_tpu.pipeline.runner as runner_mod

    class DropStats(runner_mod.PipelineStats):
        pass

    orig_run = r._run

    def lossy_run(*a, **k):
        stats = orig_run(*a, **k)
        stats.encoded -= 1  # simulate a silent drop
        return stats

    monkeypatch.setattr(r, "_run", lossy_run)
    assert not r.process_video(src, dst, show_progress=False)
