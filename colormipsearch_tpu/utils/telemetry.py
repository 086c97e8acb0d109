"""Timing / memory telemetry and logging context.

Counterpart of the reference's ad-hoc observability (SURVEY.md §5):
wall-clock + memory logging at stage boundaries
(ColorDepthSearchCmd.java:312-315, CalculateGradientScoresCmd.java:216-229),
the low-memory check (AbstractCmd.checkMemoryUsage, AbstractCmd.java:52-62),
and the MDC mask/target context carried through worker threads
(CalculateGradientScoresCmd.java:547-548).
"""

from __future__ import annotations

import contextlib
import contextvars
import logging
import resource
import time
from typing import Iterator, Optional

LOG = logging.getLogger("colormipsearch_tpu.telemetry")

_context: contextvars.ContextVar[dict] = contextvars.ContextVar(
    "cms_processing_context", default={})


@contextlib.contextmanager
def processing_context(**kwargs) -> Iterator[None]:
    """MDC-style structured log context (maskId/targetId/...)."""
    current = dict(_context.get())
    current.update(kwargs)
    token = _context.set(current)
    try:
        yield
    finally:
        _context.reset(token)


def current_context() -> dict:
    return dict(_context.get())


def log_memory_usage(label: str = "") -> float:
    """Log and return the peak RSS in MiB."""
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    mib = peak_kb / 1024.0
    LOG.debug("%s peak RSS %.0f MiB %s", label, mib, current_context() or "")
    return mib


class StageTimer:
    """Wall-clock stage timing with throughput reporting."""

    def __init__(self, stage: str, total_items: Optional[int] = None,
                 log: logging.Logger = LOG):
        self.stage = stage
        self.total_items = total_items
        self.log = log
        self.start = time.perf_counter()
        self.items = 0

    def add_items(self, n: int) -> None:
        self.items += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.start

    def finish(self) -> float:
        dt = self.elapsed
        if self.items:
            self.log.info("%s: %d items in %.1fs (%.1f/s) %s", self.stage,
                          self.items, dt, self.items / max(dt, 1e-9),
                          current_context() or "")
        else:
            self.log.info("%s: %.1fs %s", self.stage, dt,
                          current_context() or "")
        return dt

    def __enter__(self) -> "StageTimer":
        return self

    def __exit__(self, *exc) -> None:
        self.finish()
