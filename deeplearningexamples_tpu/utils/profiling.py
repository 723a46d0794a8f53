"""Profiling / tracing utilities (SURVEY.md §5.1).

The reference instruments throughput in-loop (``training.py:222-243``,
DLRM ``StepTimer``) and exposes ``--prof N`` truncation; CUDA Graphs capture
is its replay mechanism. TPU-native equivalents:

- ``StepTimer``: wall-clock per-step timer with quantiles, sync-free (reads
  are timestamps only — the jitted step's async dispatch is unaffected; call
  ``mark_sync`` with a fetched scalar for exact device timing)
- ``trace``: context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace directory (the DLProf/NVTX role)
- CUDA-Graph capture/replay needs no equivalent: every jitted step IS a
  captured graph under XLA.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np

__all__ = ["StepTimer", "trace"]


@dataclass
class StepTimer:
    warmup: int = 5
    _times: list = field(default_factory=list)
    _t0: float | None = None
    _count: int = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            return
        self._count += 1
        if self._count > self.warmup:
            self._times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def mark_sync(self, scalar) -> float:
        """Force-fetch a device scalar (hard sync) and stop the timer."""
        v = float(scalar)
        self.stop()
        return v

    def summary(self, batch_size: int | None = None) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        out = {
            "mean_ms": 1000 * float(t.mean()),
            "p50_ms": 1000 * float(np.quantile(t, 0.5)),
            "p90_ms": 1000 * float(np.quantile(t, 0.9)),
            "p99_ms": 1000 * float(np.quantile(t, 0.99)),
        }
        if batch_size:
            out["ips"] = batch_size / float(t.mean())
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"):`` — dumps a profiler trace viewable in
    TensorBoard / xprof (the reference's DLProf role)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
