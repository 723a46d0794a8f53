"""HTTP inference server over the continuous batcher.

The TPU serving path that replaces the reference's per-model Triton
repositories (SURVEY.md §1 L8). Endpoints mirror the KServe-style surface
Triton exposes so the reference's client workflow maps over:

- ``GET  /v2/health/ready``            -> 200 when serving
- ``GET  /v2/models/<name>``           -> model metadata (inputs/outputs)
- ``POST /v2/models/<name>/infer``     -> JSON {"inputs": {name: nested list}}

Payloads are JSON for zero-dependency clients (a binary tensor extension is
a straight addition); the model-repository layout (config + orbax weights)
is produced by ``serving/export.py``.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Mapping

import numpy as np

from .batcher import ContinuousBatcher
from .binary import CONTENT_TYPE as BINARY_CT, decode_tensors, encode_tensors

__all__ = ["ModelEndpoint", "InferenceServer"]


@dataclass
class ModelEndpoint:
    name: str
    batcher: ContinuousBatcher
    input_spec: Mapping[str, tuple]  # name -> (shape-without-batch, dtype str)
    output_names: tuple = ()
    preprocess: Callable[[Mapping[str, np.ndarray]], Any] | None = None
    postprocess: Callable[[Any], Mapping[str, Any]] | None = None


class InferenceServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 8800):
        self.models: dict[str, ModelEndpoint] = {}
        self.addr = (host, port)
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def register(self, endpoint: ModelEndpoint) -> None:
        self.models[endpoint.name] = endpoint

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> None:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/v2/health/ready":
                    self._send(200, {"ready": True})
                    return
                if self.path.startswith("/v2/models/"):
                    name = self.path.split("/")[3]
                    ep = server.models.get(name)
                    if ep is None:
                        self._send(404, {"error": f"unknown model {name}"})
                        return
                    if self.path.endswith("/stats"):
                        # chip-side latency split (batcher wait vs device
                        # time) — measured in-process, tunnel-independent
                        self._send(200, ep.batcher.stats())
                        return
                    self._send(200, {
                        "name": name,
                        "inputs": {
                            k: {"shape": list(s), "dtype": d}
                            for k, (s, d) in ep.input_spec.items()
                        },
                        "outputs": list(ep.output_names),
                    })
                    return
                self._send(404, {"error": "not found"})

            def _send_binary(self, tensors) -> None:
                body = encode_tensors(tensors)
                self.send_response(200)
                self.send_header("Content-Type", BINARY_CT)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                parts = self.path.split("/")
                if len(parts) < 5 or parts[4] != "infer":
                    self._send(404, {"error": "not found"})
                    return
                name = parts[3]
                ep = server.models.get(name)
                if ep is None:
                    self._send(404, {"error": f"unknown model {name}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length)
                    is_binary = self.headers.get("Content-Type") == BINARY_CT
                    raw = (
                        decode_tensors(body) if is_binary
                        else json.loads(body or b"{}").get("inputs", {})
                    )
                    inputs = {}
                    for k, (shape, dtype) in ep.input_spec.items():
                        if k not in raw:
                            raise ValueError(f"missing input {k!r}")
                        arr = np.asarray(raw[k], dtype)
                        if tuple(arr.shape) != tuple(shape):
                            raise ValueError(
                                f"input {k!r}: expected shape {tuple(shape)}, "
                                f"got {tuple(arr.shape)}"
                            )
                        inputs[k] = arr
                    payload = ep.preprocess(inputs) if ep.preprocess else inputs
                    out = ep.batcher.infer(payload, timeout=60)
                    out = ep.postprocess(out) if ep.postprocess else out
                    out = {k: np.asarray(v) for k, v in dict(out).items()}
                    if is_binary:
                        self._send_binary(out)
                    else:
                        self._send(
                            200, {"outputs": {k: v.tolist() for k, v in out.items()}}
                        )
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer(self.addr, Handler)
        self.addr = self._httpd.server_address
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        for ep in self.models.values():
            ep.batcher.close()
