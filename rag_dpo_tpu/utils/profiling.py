"""Profiling: per-phase wall-clock timers + jax.profiler traces.

The reference only has ad-hoc `time.time()` deltas scattered through the
pipeline (SURVEY.md §5). Here the same per-phase timing surface exists as a
reusable context manager, plus `profile_trace` wrapping `jax.profiler` for
real device traces (viewable in TensorBoard / Perfetto) — the TPU-native
upgrade the survey calls for.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Accumulates named phase durations; nested phases allowed."""

    def __init__(self):
        self.durations: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.durations[name] = (
                self.durations.get(name, 0.0) + time.time() - t0
            )

    def as_dict(self) -> dict[str, float]:
        return {k: round(v, 4) for k, v in self.durations.items()}


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/ragdpo_trace", enabled: bool = True):
    """Device-level trace via jax.profiler (no-op when disabled)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
