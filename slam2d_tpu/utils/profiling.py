"""Tracing / profiling utilities (SURVEY.md §7 "Tracing / profiling").

- `PhaseTimer`: named host-side phase accumulators (scan-match / update /
  resample / optimize) with a report string.
- `Throughput`: scans/s counter (the BASELINE driver metric).
- `trace`: context manager around `jax.profiler` for TensorBoard traces of
  the device timeline (viewable with tensorboard-plugin-profile).

Note on async dispatch: phase timers only mean something if the timed code
block ends at a sync point (block_until_ready / host transfer); callers are
responsible for that — `Throughput.mark_synced` documents the convention.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t:8.3f}s  ({n}x, {t / n * 1e3:7.2f} ms avg)")
        return "\n".join(lines)


class Throughput:
    """scans/s counter; call mark_synced(n) after a hard device sync."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.n = 0

    def mark_synced(self, n_scans: int):
        self.n += n_scans

    @property
    def scans_per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.n / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (TensorBoard 'profile' plugin format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
