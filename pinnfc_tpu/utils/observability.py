"""Metrics logging, step timing, and profiling.

The reference's only observability is ``print()`` epoch tables (01:943-961
etc.).  SURVEY §5 upgrades this to structured metrics with preserved metric
*names* for parity, a step-timing meter, and ``jax.profiler`` trace capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class MetricsLogger:
    """Append-only structured metrics (list of dict rows), JSONL-dumpable."""

    def __init__(self):
        self.rows: List[Dict] = []

    def log(self, step: int, **metrics) -> None:
        self.rows.append({"step": step, "time": time.time(), **metrics})

    def to_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for row in self.rows:
                # numpy/jnp scalars (the natural payload off a scan) are not
                # json-serializable; coerce rather than lose the run's log
                f.write(json.dumps(row, default=float) + "\n")

    def latest(self) -> Optional[Dict]:
        return self.rows[-1] if self.rows else None


class StepTimer:
    """Wall-clock meter: mean/min steps-per-second over recorded windows."""

    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        self._t0 = None

    def steps_per_sec(self, steps_per_window: int = 1) -> float:
        if not self.durations:
            return 0.0
        return steps_per_window * len(self.durations) / sum(self.durations)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/pinnfc_trace", enabled: bool = True):
    """Capture a ``jax.profiler`` trace (viewable in TensorBoard/Perfetto)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
