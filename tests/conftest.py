"""Test configuration: 8 virtual CPU devices (multi-chip sharding is tested
without TPU hardware — SURVEY.md §4 'fake backend' analogue).

NOTE: must run before any jax-importing module creates a backend. The
JAX_PLATFORMS env var is ignored in this environment (the axon TPU plugin
overrides it), so jax.config is used instead.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def fake_ffmpeg_bin(tmp_path, monkeypatch):
    """Install the fake ffmpeg/ffprobe (tests/fake_ffmpeg.py) on PATH."""
    import os
    import stat
    import sys
    from pathlib import Path

    bindir = tmp_path / "bin"
    bindir.mkdir()
    fake = Path(__file__).parent / "fake_ffmpeg.py"
    for name in ("ffmpeg", "ffprobe"):
        p = bindir / name
        p.write_text(
            f"#!{sys.executable}\n" + fake.read_text().split("\n", 1)[1]
        )
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


@pytest.fixture(scope="session")
def tiny_frames():
    """Deterministic 8-frame 48x64 synthetic clip (uint8 RGB): moving
    gradient + box, enough structure for PSNR-style comparisons."""
    rng = np.random.default_rng(42)
    frames = []
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(8):
        base = np.stack(
            [
                (xx * 255 / w).astype(np.uint8),
                (yy * 255 / h).astype(np.uint8),
                np.full((h, w), 30 + 20 * t, np.uint8),
            ],
            axis=-1,
        ).astype(np.int32)
        x0 = 6 + 4 * t
        base[10:30, x0 : x0 + 12] = [250, 60, 60]
        noise = rng.integers(-8, 8, (h, w, 3))
        frames.append(np.clip(base + noise, 0, 255).astype(np.uint8))
    return np.stack(frames)
