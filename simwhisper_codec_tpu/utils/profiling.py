"""Tracing and per-stage timing (first-class; the reference has none — SURVEY §5.1).

Two layers:
 - ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
   TensorBoard-loadable XPlane trace of device execution.
 - ``StageTimer``: wall-clock stage accounting with device synchronization,
   for RTF breakdowns (mel/encoder/fsq/decoder/vocos) in benchmarks and the
   corpus evaluator.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device profile under ``logdir`` (view with TensorBoard)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


@contextlib.contextmanager
def annotate(name: str):
    """Name a region so it shows up in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulating wall-clock timer with optional device sync per stage."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        start = time.perf_counter()
        yield
        if self.sync and block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - start
        self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values())
        lines = [f"{'stage':<16}{'total_s':>10}{'calls':>8}{'share':>8}"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t = self.totals[name]
            lines.append(
                f"{name:<16}{t:>10.3f}{self.counts[name]:>8}{100*t/max(total,1e-9):>7.1f}%"
            )
        lines.append(f"{'(sum)':<16}{total:>10.3f}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
