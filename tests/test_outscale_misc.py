"""Coverage for outscale resizing, metrics CLI, progress fallback, and the
console-script batch path."""

import json
import numpy as np
import jax
import pytest

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.srvgg import SRVGGSpec, init_srvgg
from video_restore_tpu.models.zoo import ModelHandle
from video_restore_tpu.pipeline.runner import VideoRestorer
from video_restore_tpu.video import open_writer, probe


def _tiny_model(scale=2):
    spec = SRVGGSpec(num_feat=8, num_conv=2, scale=scale)
    return ModelHandle("tiny", spec, init_srvgg(jax.random.PRNGKey(0), spec))


def _write_clip(path, frames, fps=25.0):
    with open_writer(path, frames.shape[2], frames.shape[1], fps) as w:
        for f in frames:
            w.write(f)


def test_outscale_resizes_output(tmp_path, tiny_frames):
    pytest.importorskip("cv2")
    src = tmp_path / "in.npz"
    dst = tmp_path / "out.npz"
    _write_clip(src, tiny_frames[:2])
    cfg = RestoreConfig(
        model_name="RealESRGAN_x4_v3", tile_size=16, tile_overlap=4,
        precision="fp32", audio_copy=False, outscale=3.0,
    )
    r = VideoRestorer(cfg, model=_tiny_model(scale=2))
    assert r.process_video(src, dst, show_progress=False)
    info = probe(dst)
    # model scale 2, outscale 3 -> Lanczos resize to 3x
    assert (info.width, info.height) == (64 * 3, 48 * 3)


def test_metrics_cli_main(tmp_path, tiny_frames, capsys):
    from video_restore_tpu.metrics import main as metrics_main

    a = tmp_path / "a.npz"
    _write_clip(a, tiny_frames[:3])
    rc = metrics_main([str(a), str(a)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["frames"] == 3 and out["ssim_mean"] > 0.999


def test_progress_plain_fallback(capsys, monkeypatch):
    import sys

    from video_restore_tpu.pipeline import progress as pmod

    monkeypatch.setitem(sys.modules, "tqdm", None)  # force ImportError path

    class NoTqdm(pmod.Progress):
        pass

    p = pmod.Progress(10, enabled=True)
    p._bar = None  # simulate missing tqdm
    p._last_print = -10
    p.update(3)
    # plain fallback prints to stderr: stdout may carry the y4m stream
    assert "3/10 frames" in capsys.readouterr().err
    p.close()


def test_console_batch_mode(tmp_path, tiny_frames, monkeypatch):
    """cli.main --batch end-to-end through the console entry point."""
    from video_restore_tpu import cli as climod
    from video_restore_tpu.pipeline import runner as runner_mod

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    for name in ("a.npz", "b.npz"):
        _write_clip(indir / name, tiny_frames[:2])

    # patch model loading to the tiny model (no weights available in CI)
    monkeypatch.setattr(
        runner_mod, "get_model",
        lambda *a, **k: _tiny_model(scale=2),
    )
    rc = climod.main([
        str(indir), str(outdir), "--batch", "--tile-size", "16",
        "--tile-overlap", "4", "--precision", "fp32", "--no-audio",
    ])
    assert rc == 0
    assert (outdir / "a_upscaled.npz").exists()
    assert probe(outdir / "a_upscaled.npz").width == 128
