"""Continuous batcher — dynamic request batching for jitted inference.

TPU-native replacement for Triton's dynamic batcher (the reference deploys
every model behind Triton with ``dynamic_batching`` in the generated
``config.pbtxt`` — ``triton/deployer_lib.py:26-60``; perf is measured by
``run_offline_performance_test_on_triton.py`` / ``..._online_...``):

- requests enqueue on any thread; a dispatcher thread drains the queue,
  pads to the nearest configured batch bucket (static shapes for XLA — the
  analogue of Triton's ``preferred_batch_size``), runs the jitted function,
  and resolves per-request futures
- ``max_delay_s`` bounds added latency when traffic is sparse
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import numpy as np

__all__ = ["ContinuousBatcher"]


@dataclass
class _Request:
    inputs: Any  # pytree of np arrays WITHOUT batch dim
    future: Future
    t_enqueue: float = 0.0


class ContinuousBatcher:
    def __init__(
        self,
        infer_fn: Callable[[Any], Any],  # batched pytree -> batched pytree
        batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32),
        max_delay_s: float = 0.002,
        pad_value: float = 0.0,
    ):
        self.infer_fn = infer_fn
        self.buckets = sorted(batch_buckets)
        self.max_delay_s = max_delay_s
        self.pad_value = pad_value
        self._q: queue.Queue[_Request | None] = queue.Queue()
        # latency decomposition (the in-process split the tunnel can't
        # pollute): batcher wait = enqueue -> dispatch start; device time =
        # jitted call + fetch. Rolling per-dispatch records.
        self._stats_lock = threading.Lock()
        self._records: list[tuple[int, float, float]] = []  # (n, wait, device)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._running = True
        self._thread.start()

    def warmup(self, example_inputs: Any) -> None:
        """Run one inference per batch bucket from the calling thread so all
        XLA compilations happen before serving starts (first-request latency;
        also required on backends where compilation must not happen on the
        dispatcher thread)."""
        for b in self.buckets:
            stacked = jax.tree_util.tree_map(
                lambda x: np.stack([np.asarray(x)] * b), example_inputs
            )
            jax.tree_util.tree_map(np.asarray, self.infer_fn(stacked))

    # -- client side -------------------------------------------------------
    def submit(self, inputs: Any) -> Future:
        fut: Future = Future()
        self._q.put(_Request(inputs, fut, time.perf_counter()))
        return fut

    def stats(self, reset: bool = False) -> dict:
        """Per-dispatch latency split: mean/p50/p95 of batcher wait (queueing
        + bucket fill) and device time (jitted call + result fetch), plus the
        mean dispatched batch size. Times in milliseconds."""
        with self._stats_lock:
            recs = list(self._records)
            if reset:
                self._records.clear()
        if not recs:
            return {"dispatches": 0}
        waits = np.asarray([r[1] for r in recs]) * 1e3
        devs = np.asarray([r[2] for r in recs]) * 1e3
        return {
            "dispatches": len(recs),
            "mean_batch": float(np.mean([r[0] for r in recs])),
            "wait_ms_mean": float(waits.mean()),
            "wait_ms_p50": float(np.percentile(waits, 50)),
            "wait_ms_p95": float(np.percentile(waits, 95)),
            "device_ms_mean": float(devs.mean()),
            "device_ms_p50": float(np.percentile(devs, 50)),
            "device_ms_p95": float(np.percentile(devs, 95)),
        }

    def infer(self, inputs: Any, timeout: float | None = None) -> Any:
        return self.submit(inputs).result(timeout)

    def close(self) -> None:
        self._running = False
        self._q.put(None)
        self._thread.join(timeout=5)

    # -- dispatcher --------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _loop(self) -> None:
        while self._running:
            req = self._q.get()
            if req is None:
                break
            batch = [req]
            deadline = time.perf_counter() + self.max_delay_s
            max_b = self.buckets[-1]
            while len(batch) < max_b:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._running = False
                    break
                batch.append(nxt)
            self._dispatch(batch)

    def _dispatch(self, batch: list[_Request]) -> None:
        n = len(batch)
        b = self._bucket(n)
        t_start = time.perf_counter()
        wait = float(np.mean([t_start - r.t_enqueue for r in batch]))
        try:
            stacked = jax.tree_util.tree_map(
                lambda *xs: self._pad_stack(xs, b), *[r.inputs for r in batch]
            )
            out = self.infer_fn(stacked)
            out_np = jax.tree_util.tree_map(np.asarray, out)
            with self._stats_lock:
                self._records.append((n, wait, time.perf_counter() - t_start))
                if len(self._records) > 10000:
                    del self._records[:5000]
            for i, r in enumerate(batch):
                r.future.set_result(
                    jax.tree_util.tree_map(lambda x: x[i], out_np)
                )
        except Exception as e:  # resolve all futures with the error
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)

    def _pad_stack(self, xs: Sequence[np.ndarray], bucket: int) -> np.ndarray:
        arr = np.stack([np.asarray(x) for x in xs])
        if arr.shape[0] < bucket:
            pad = np.full(
                (bucket - arr.shape[0],) + arr.shape[1:],
                self.pad_value,
                arr.dtype,
            )
            arr = np.concatenate([arr, pad])
        return arr
