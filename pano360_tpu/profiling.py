"""Stage timing and device profiling hooks.

Replaces the reference's cProfile wrapper (profiler.py:8-19) and ad-hoc
``time.time()`` stage logs with: a context-manager stage timer keeping the
reference's stage boundaries (keypoints / matching / registration / mosaic),
an optional ``jax.profiler`` trace for device timelines, and a cProfile
wrapper with the same top-10%-cumulative report for host code.
"""
from __future__ import annotations

import contextlib
import cProfile
import io
import logging
import pstats
import time
from typing import Dict, Optional

LOG = logging.getLogger(__name__)


class StageTimer:
    """Accumulates wall-clock per pipeline stage."""

    def __init__(self):
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.time()
        try:
            yield
        finally:
            dt = time.time() - start
            self.stages[name] = self.stages.get(name, 0.0) + dt
            LOG.info("%s, time: %s", name, dt)

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / total:.0f}%)"
                 for k, v in self.stages.items()]
        lines.append(f"total: {total:.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace (TensorBoard format) when a logdir is given."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile(fun, *args, **kwargs):
    """cProfile wrapper printing the top 10% by cumulative time
    (profiler.py:8-19 equivalent)."""
    prof = cProfile.Profile()
    prof.enable()
    res = fun(*args, **kwargs)
    prof.disable()

    sio = io.StringIO()
    stats = pstats.Stats(prof, stream=sio).sort_stats("cumulative")
    stats.print_stats(0.1)
    print(sio.getvalue())
    return res


__all__ = ["StageTimer", "device_trace", "profile"]
