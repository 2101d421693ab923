"""Knob-registry enforcement (VERDICT r4 item 5): every ``VRT_*`` env
knob any shipped code reads must be listed in the canonical registry
(utils/knobs.py::KNOWN_KNOBS) and documented in docs/KNOBS.md, and the
runtime must warn about set-but-unread VRT_* names (typo protection)."""

import logging
import re
from pathlib import Path

from video_restore_tpu.utils.knobs import KNOWN_KNOBS, warn_unknown_knobs

REPO = Path(__file__).resolve().parent.parent
KNOB_RE = re.compile(r"VRT_[A-Z0-9_]+")


def _source_knobs() -> set:
    """Every VRT_* name in shipped (non-test, non-tool) code paths."""
    files = list((REPO / "video_restore_tpu").rglob("*.py"))
    files += [
        REPO / p
        for p in (
            "bench.py",
            "bench_suite.py",
            "bench_e2e.py",
            "__graft_entry__.py",
            "quick_start.py",
        )
        if (REPO / p).exists()
    ]
    names = set()
    for f in files:
        if f.name == "knobs.py":  # the registry itself
            continue
        names |= set(KNOB_RE.findall(f.read_text()))
    return names


def test_every_source_knob_is_registered():
    missing = _source_knobs() - KNOWN_KNOBS
    assert not missing, (
        f"VRT_* knobs read in code but absent from KNOWN_KNOBS: "
        f"{sorted(missing)} — register them in utils/knobs.py and "
        f"document them in docs/KNOBS.md"
    )


def test_every_source_knob_is_documented():
    doc = (REPO / "docs" / "KNOBS.md").read_text()
    documented = set(KNOB_RE.findall(doc))
    missing = _source_knobs() - documented
    assert not missing, (
        f"VRT_* knobs read in code but undocumented in docs/KNOBS.md: "
        f"{sorted(missing)}"
    )


def test_registry_has_no_stale_entries():
    """Names in KNOWN_KNOBS that no code reads anymore should be pruned
    (the registry must not claim dead knobs exist)."""
    stale = KNOWN_KNOBS - _source_knobs()
    assert not stale, (
        f"KNOWN_KNOBS entries nothing reads: {sorted(stale)} — prune "
        f"them from utils/knobs.py and docs/KNOBS.md"
    )


def test_warn_unknown_knobs(caplog):
    env = {"VRT_STRIPE": "1", "VRT_TYPO_NOT_A_KNOB": "1", "PATH": "/"}
    with caplog.at_level(logging.WARNING, logger="video_restore_tpu"):
        unknown = warn_unknown_knobs(env)
    assert unknown == ["VRT_TYPO_NOT_A_KNOB"]
    assert any("VRT_TYPO_NOT_A_KNOB" in r.message for r in caplog.records)


def test_warn_unknown_knobs_clean_env():
    assert warn_unknown_knobs({"VRT_NPACK": "014"}) == []
