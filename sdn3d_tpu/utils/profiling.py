"""Profiling / observability utilities.

The reference has no tracing (SURVEY.md §5 — only AverageMeter wall-clock
timers); here jax.profiler traces and step timers are first-class.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class AverageMeter:
    """Running average (semantic/utils.py AverageMeter semantics)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        self.sum += value * n
        self.count += n

    @property
    def average(self) -> float:
        return self.sum / max(self.count, 1)


class StepTimer:
    """Per-stage step timing with running averages."""

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.meters.setdefault(name, AverageMeter()).update(
                time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {k: m.average for k, m in self.meters.items()}


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None.

    View with tensorboard or xprof (the trace includes XLA/TPU timelines)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
