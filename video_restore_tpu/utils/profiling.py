"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY.md §5: only a wall-clock FPS
readout). Here: ``jax.profiler`` trace capture (viewable in
TensorBoard/Perfetto) around the sharded forward, plus a lightweight
per-stage wall-clock aggregator surfaced in logs.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

from video_restore_tpu.utils.logging import get_logger

log = get_logger()


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA device trace to ``trace_dir`` (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir, create_perfetto_link=False):
        yield
    log.info("device trace written to %s (open in TensorBoard/Perfetto)", trace_dir)


class StageTimer:
    """Accumulates wall-clock per pipeline stage (decode/feed/infer/encode).

    The per-stage timing struct SURVEY.md §5 calls for; cheap enough to be
    always on."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        parts = [
            f"{k}={v:.2f}s/{self.counts[k]}x"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return " ".join(parts)

    def log_summary(self) -> None:
        if self.totals:
            log.info("stage timings: %s", self.summary())
