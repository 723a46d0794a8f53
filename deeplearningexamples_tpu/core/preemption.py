"""Graceful-preemption support (SIGTERM → checkpoint-and-exit).

Reference: ConvNets ``TimeoutHandler`` (``image_classification/utils.py:
131-176``) catches SIGTERM on rank 0 and *broadcasts* the flag to all ranks
every 20 iterations so the DDP world exits in lockstep; BERT uses a
module-level ``timeout_sent`` flag (``run_pretraining.py:62-72``).

Under SPMD there is no per-rank divergence to reconcile inside the step —
the flag only gates the *host-side* loop between jitted steps, so a plain
process-local signal handler suffices. On multi-host, cluster schedulers
deliver SIGTERM to every host; each host's loop observes its own flag and
all hosts reach the same checkpoint step because the loop checks at fixed
step boundaries.
"""

from __future__ import annotations

import signal
from types import TracebackType

__all__ = ["TimeoutHandler"]


class TimeoutHandler:
    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.signals = signals
        self.interrupted = False
        self._orig: dict = {}

    def __enter__(self) -> "TimeoutHandler":
        self.interrupted = False
        for sig in self.signals:
            self._orig[sig] = signal.getsignal(sig)
            signal.signal(sig, self._handler)
        return self

    def _handler(self, signum, frame):
        self.interrupted = True

    def __exit__(
        self,
        exc_type: type[BaseException] | None,
        exc: BaseException | None,
        tb: TracebackType | None,
    ) -> None:
        for sig, orig in self._orig.items():
            signal.signal(sig, orig)
        self._orig.clear()
