"""Tracing and per-stage timing — an auxiliary subsystem the reference lacks entirely
(SURVEY.md §5: only wall-clock steps/sec with explicit cuda synchronize,
/root/reference/DiT/train.py:217-226).

* :func:`trace` wraps ``jax.profiler`` (TensorBoard-viewable XLA traces).
* :class:`StageTimer` accumulates wall time per named stage with optional device sync, and
  prints a one-line breakdown — the profiling primitive the benchmark runner and trainer use.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating per-stage timer. ``sync=True`` blocks on device work so a stage's time
    is attributable (the TPU analogue of the reference's torch.cuda.synchronize)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        parts = [
            f"{name}: {self.totals[name]:.2f}s ({self.totals[name] / total * 100:.0f}%, n={self.counts[name]})"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return " | ".join(parts)

    def report(self, print_fn=print):
        print_fn(f"[profile] {self.summary()}")
