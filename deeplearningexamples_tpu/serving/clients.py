"""Serving perf clients: offline throughput + online latency tests.

Mirrors the reference's Triton measurement tooling
(``run_offline_performance_test_on_triton.py`` — batch-sweep throughput;
``run_online_performance_test_on_triton.py`` — concurrent-client latency
percentiles) against the in-process or HTTP server.
"""

from __future__ import annotations

import json
import statistics
import threading
import time
import urllib.request
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["http_infer", "offline_performance_test", "online_performance_test"]


def http_infer(addr: tuple[str, int], model: str, inputs: dict,
               binary: bool = False) -> dict:
    from .binary import CONTENT_TYPE as BINARY_CT, decode_tensors, encode_tensors

    if binary:
        body = encode_tensors({k: np.asarray(v) for k, v in inputs.items()})
        ctype = BINARY_CT
    else:
        body = json.dumps(
            {"inputs": {k: np.asarray(v).tolist() for k, v in inputs.items()}}
        ).encode()
        ctype = "application/json"
    req = urllib.request.Request(
        f"http://{addr[0]}:{addr[1]}/v2/models/{model}/infer",
        data=body,
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        if resp.headers.get("Content-Type") == BINARY_CT:
            return {"outputs": decode_tensors(resp.read())}
        return json.loads(resp.read())


def offline_performance_test(
    infer: Callable[[dict], Any],
    make_input: Callable[[], dict],
    batch_sizes: Sequence[int] = (1, 2, 4, 8),
    iters: int = 16,
) -> list[dict]:
    """Sequential request sweep: per-concurrency throughput + mean latency."""
    results = []
    for bs in batch_sizes:
        # warmup
        for _ in range(2):
            infer(make_input())
        t0 = time.perf_counter()
        for _ in range(iters):
            infer(make_input())
        dt = time.perf_counter() - t0
        results.append(
            {
                "batch_size": bs,
                "throughput": iters * bs / dt,
                "avg_latency_ms": 1000 * dt / iters,
            }
        )
    return results


def online_performance_test(
    infer: Callable[[dict], Any],
    make_input: Callable[[], dict],
    concurrency: int = 8,
    requests_per_client: int = 16,
) -> dict:
    """Concurrent clients; reports latency percentiles + aggregate qps."""
    latencies: list[float] = []
    lock = threading.Lock()

    def client():
        for _ in range(requests_per_client):
            t0 = time.perf_counter()
            infer(make_input())
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    latencies.sort()

    def pct(p):
        return 1000 * latencies[min(int(p * len(latencies)), len(latencies) - 1)]

    return {
        "concurrency": concurrency,
        "qps": len(latencies) / wall,
        "p50_ms": pct(0.50),
        "p90_ms": pct(0.90),
        "p99_ms": pct(0.99),
        "avg_ms": 1000 * statistics.mean(latencies),
    }
