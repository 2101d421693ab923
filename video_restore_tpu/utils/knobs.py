"""Canonical registry of every ``VRT_*`` environment knob.

The measured-dead-end discipline (BENCH_NOTES.md) keeps losing forms
wired behind opt-in env knobs instead of deleting them; this module is
the index that keeps that surface from rotting:

- ``KNOWN_KNOBS`` is the single source of truth for knob names.
- ``docs/KNOBS.md`` is the human table (name, default, what it gates,
  measured verdict); ``tests/test_knobs.py`` greps the package for
  ``VRT_[A-Z0-9_]+`` and asserts every hit appears both here and there.
- ``warn_unknown_knobs()`` runs at CLI startup and warns about any
  ``VRT_*`` in the environment that no code reads — a typo'd knob name
  otherwise silently no-ops (the failure mode this registry exists to
  catch).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("video_restore_tpu")

# Every VRT_* name any shipped code path reads (package, bench harnesses,
# graft entry). Keep sorted; tests/test_knobs.py enforces completeness
# against a source grep in both directions.
KNOWN_KNOBS = frozenset(
    {
        "VRT_ACCUM",
        "VRT_ALLOW_RANDOM_WEIGHTS",
        "VRT_BENCH_TILE",
        "VRT_BODY_UNROLL",
        "VRT_DISABLE_NATIVE",
        "VRT_GFPGAN_RANDOM",
        "VRT_GLUE_KERNEL",
        "VRT_HBM_BYTES",
        "VRT_IM2COL",
        "VRT_NATIVE_CACHE",
        "VRT_NODYCAT_MIN",
        "VRT_NOMASK",
        "VRT_NPACK",
        "VRT_NPACK_CHUNK_MB",
        "VRT_PACKED_LAST",
        "VRT_PALLAS",
        "VRT_POST_BF16",
        "VRT_POST_DT",
        "VRT_PRECISION",
        "VRT_SD",
        "VRT_SD_TAIL",
        "VRT_SPLIT",
        "VRT_SPLIT_RES",
        "VRT_SRVGG_2D",
        "VRT_SRVGG_GROUP",
        "VRT_SRVGG_KFORM",
        "VRT_SRVGG_SPLIT",
        "VRT_SRVGG_STRIPE",
        "VRT_SRVGG_UNROLL",
        "VRT_SRVGG_UP",
        "VRT_SRVGG_UP_RAW",
        "VRT_STRIPE",
        "VRT_STRIPE2D",
        "VRT_STRIPE_RC",
        "VRT_TAIL_BH",
        "VRT_TAIL_KERNEL",
        "VRT_TAIL_Q",
        "VRT_TAIL_RAW",
        "VRT_TAIL_RC",
        "VRT_UNSAFE_PICKLE",
        "VRT_UNSHARP_KERNEL",
        "VRT_UP1_KERNEL",
        "VRT_UP1_PHASE",
        "VRT_UP1_RAW",
        "VRT_X2_TAIL",
        "VRT_XLA_CACHE",
        "VRT_YUNET_MODEL",
    }
)


def warn_unknown_knobs(environ=None) -> list[str]:
    """Warn (once per name) about VRT_* environment variables no code
    reads; returns the offending names (sorted) for tests/callers."""
    env = os.environ if environ is None else environ
    unknown = sorted(
        k for k in env if k.startswith("VRT_") and k not in KNOWN_KNOBS
    )
    for name in unknown:
        logger.warning(
            "unknown knob %s is set but nothing reads it "
            "(typo? see docs/KNOBS.md for the registry)",
            name,
        )
    return unknown
