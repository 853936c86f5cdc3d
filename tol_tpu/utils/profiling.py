"""Tracing / profiling hooks.

The reference's entire observability is one commented-out ``std::chrono``
around ``computeG`` (src/problem.cpp:783-805) and wall-clock prints in the
mission loop.  Here profiling is first-class: ``trace`` wraps
``jax.profiler`` (view with TensorBoard/XProf), ``stage_timer`` gives
cheap wall-clock stage accounting that blocks on device work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class stage_timer:
    """Accumulating wall-clock stage timer.

        timer = stage_timer()
        with timer("solve"):
            out = run(...)           # blocks on device completion
        timer.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{k}: {v:.3f}s over {self.counts[k]} calls"
                 for k, v in sorted(self.totals.items())]
        return "\n".join(lines)
