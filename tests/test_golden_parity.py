"""The golden-parity instrument itself (tools/golden_parity.py) stays
functional: one model end-to-end through synthetic-checkpoint self-check
mode, including the committed-golden drift tripwire."""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import golden_parity  # noqa: E402


def test_self_check_one_model(capsys):
    rc = golden_parity.run(["--models", "RealESRGAN_x4_v3", "--skip-gfpgan"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out and "FAIL" not in out


def test_drift_detection(tmp_path, monkeypatch, capsys):
    """A corrupted committed golden must flip the check to FAIL."""
    monkeypatch.setattr(golden_parity, "GOLDEN_DIR", tmp_path)
    rc = golden_parity.run(["--models", "RealESRGAN_x4_v3", "--skip-gfpgan"])
    assert rc == 0  # writes the golden
    g = tmp_path / "RealESRGAN_x4_v3.npz"
    out = np.load(g)["out"]
    bad = out + 0.05 * (out.max() - out.min())  # 5%-of-range offset
    np.savez_compressed(g, out=bad)
    rc = golden_parity.run(["--models", "RealESRGAN_x4_v3", "--skip-gfpgan"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "drift" in out
