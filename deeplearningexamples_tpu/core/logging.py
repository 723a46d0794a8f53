"""dllogger-compatible structured logging + meter framework.

Re-implements the reference's universal observability layer (SURVEY.md §1 L7):
NVIDIA's ``dllogger`` JSON-lines "raport" format (stdout + JSON-stream
backends, per-step ``log(step=..., data=...)``, metric metadata with units —
reference ``PyTorch/Classification/ConvNets/main.py:543-565``) and the
meter/aggregation framework of ``image_classification/logger.py`` (``Meter``
:64, ``QuantileMeter`` :101, ``Logger`` :213-337).

The JSON schema is kept drop-in compatible: each line is
``DLLL {"timestamp": ..., "type": "LOG", "step": ..., "data": {...}}`` so the
reference's downstream tooling can parse our raports unchanged.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Callable, IO, Mapping, Sequence

import numpy as np

__all__ = [
    "Meter",
    "AverageMeter",
    "QuantileMeter",
    "LastMeter",
    "Logger",
    "MetricMeta",
    "StdOutBackend",
    "JSONStreamBackend",
]

PREFIX = "DLLL"


# ---------------------------------------------------------------------------
# Meters — per-iteration aggregation (reference logger.py:64-211)
# ---------------------------------------------------------------------------


class Meter:
    """Aggregates scalar observations over an interval (iteration/epoch/run)."""

    def record(self, value: float, n: int = 1) -> None:
        raise NotImplementedError

    def get(self) -> float | None:
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError


class AverageMeter(Meter):
    def __init__(self):
        self.reset()

    def reset(self):
        self._sum = 0.0
        self._n = 0

    def record(self, value: float, n: int = 1):
        self._sum += float(value) * n
        self._n += n

    def get(self):
        return self._sum / self._n if self._n else None


class LastMeter(Meter):
    def __init__(self):
        self.reset()

    def reset(self):
        self._last = None

    def record(self, value: float, n: int = 1):
        self._last = float(value)

    def get(self):
        return self._last


class QuantileMeter(Meter):
    """Latency-style quantiles (reference logger.py:101-126)."""

    def __init__(self, q: Sequence[float] = (0.5, 0.9, 0.95, 0.99, 1.0)):
        self.q = tuple(q)
        self.reset()

    def reset(self):
        self._vals: list[float] = []

    def record(self, value: float, n: int = 1):
        self._vals.extend([float(value)] * n)

    def get(self):
        if not self._vals:
            return None
        return {f"p{int(100 * q)}": float(np.quantile(self._vals, q)) for q in self.q}


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------


class StdOutBackend:
    def __init__(self, stream: IO[str] | None = None):
        self.stream = stream or sys.stdout

    def log(self, timestamp: float, step: Any, data: Mapping[str, Any]) -> None:
        fields = " ".join(f"{k}: {_fmt(v)}" for k, v in data.items())
        step_s = "" if step == () else f"{step} "
        self.stream.write(f"{PREFIX} {step_s}{fields}\n")
        self.stream.flush()

    def metadata(self, metric: str, meta: Mapping[str, Any]) -> None:
        pass

    def flush(self) -> None:
        self.stream.flush()


class JSONStreamBackend:
    """JSON-lines raport file — the machine-readable experiment record."""

    def __init__(self, path: str, append: bool = False):
        self.path = path
        self._f = open(path, "a" if append else "w")

    def log(self, timestamp: float, step: Any, data: Mapping[str, Any]) -> None:
        self._f.write(
            PREFIX
            + " "
            + json.dumps(
                {
                    "timestamp": timestamp,
                    "type": "LOG",
                    "step": step if not isinstance(step, tuple) else list(step),
                    "data": {k: _jsonable(v) for k, v in data.items()},
                }
            )
            + "\n"
        )
        self._f.flush()

    def metadata(self, metric: str, meta: Mapping[str, Any]) -> None:
        self._f.write(
            PREFIX
            + " "
            + json.dumps(
                {
                    "timestamp": time.time(),
                    "type": "METADATA",
                    "metric": metric,
                    "metadata": dict(meta),
                }
            )
            + "\n"
        )

    def flush(self) -> None:
        self._f.flush()


def _jsonable(v):
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:  # jax scalar
        return float(v)
    return v


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.5f}"
    return str(v)


# ---------------------------------------------------------------------------
# Logger
# ---------------------------------------------------------------------------


@dataclass
class MetricMeta:
    unit: str = ""
    format: str = ":.3f"
    goal: str = "maximize"


METER_FACTORIES: dict[str, Callable[[], Meter]] = {
    "average": AverageMeter,
    "last": LastMeter,
    "quantile": QuantileMeter,
}


class Logger:
    """Rank-0 structured logger with interval meters.

    Mirrors reference ``Logger`` (logger.py:213-337): register metrics with a
    meter kind + metadata, ``record`` values during iterations, and
    ``end_iteration``/``end_epoch``/``end`` emit aggregated lines to all
    backends. Construct with ``enabled=False`` on non-zero processes.
    """

    def __init__(self, backends: Sequence[Any] | None = None, enabled: bool = True):
        self.backends = list(backends or [])
        self.enabled = enabled
        self._meters: dict[str, dict[str, Meter]] = {}  # scope -> name -> meter
        self._meta: dict[str, MetricMeta] = {}
        self.start_time = time.time()

    # -- registration ------------------------------------------------------
    def register_metric(
        self,
        name: str,
        meter: str = "average",
        scope: str = "iteration",
        meta: MetricMeta | None = None,
    ) -> None:
        self._meters.setdefault(scope, {})[name] = METER_FACTORIES[meter]()
        if meta:
            self._meta[name] = meta
            if self.enabled:
                for b in self.backends:
                    b.metadata(name, {"unit": meta.unit, "GOAL": meta.goal})

    # -- recording ---------------------------------------------------------
    def record(self, name: str, value: float, n: int = 1, scope: str = "iteration"):
        meters = self._meters.get(scope, {})
        if name not in meters:
            self.register_metric(name, "average", scope)
            meters = self._meters[scope]
        meters[name].record(value, n)

    def log(self, step: Any, data: Mapping[str, Any]) -> None:
        """Direct dllogger-style log of a dict at a step."""
        if not self.enabled:
            return
        ts = time.time()
        for b in self.backends:
            b.log(ts, step, data)

    def parameters(self, params: Mapping[str, Any]) -> None:
        """Config dump — reference convention ``step="PARAMETER"``."""
        self.log("PARAMETER", dict(params))

    # -- interval ends -----------------------------------------------------
    def _flush_scope(self, scope: str, step: Any) -> dict:
        data = {}
        for name, meter in self._meters.get(scope, {}).items():
            v = meter.get()
            if v is not None:
                if isinstance(v, dict):
                    for qk, qv in v.items():
                        data[f"{name}_{qk}"] = qv
                else:
                    data[name] = v
            meter.reset()
        if data:
            self.log(step, data)
        return data

    def end_iteration(self, step: Any) -> dict:
        return self._flush_scope("iteration", step)

    def end_epoch(self, epoch: int) -> dict:
        return self._flush_scope("epoch", (epoch,))

    def end(self) -> dict:
        data = self._flush_scope("run", ())
        if self.enabled:
            self.log((), {"summary": "run complete", "total_time": time.time() - self.start_time})
            for b in self.backends:
                b.flush()
        return data


def calc_ips(batch_size: int, seconds: float) -> float:
    """items/sec (reference ``utils.py:178-182`` — world-size scaling is the
    caller's job since under SPMD the global batch is already known)."""
    return batch_size / max(seconds, 1e-12)
