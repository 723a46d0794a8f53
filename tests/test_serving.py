"""Serving stack tests: batcher semantics, HTTP server, export roundtrip,
perf clients."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.serving import (
    ContinuousBatcher,
    InferenceServer,
    ModelEndpoint,
    http_infer,
    load_model_repository,
    offline_performance_test,
    online_performance_test,
    save_model_repository,
)


def _double_fn(batch):
    return {"y": jnp.asarray(batch["x"]) * 2.0}


def test_batcher_single_and_concurrent():
    calls = []

    def fn(batch):
        calls.append(batch["x"].shape[0])
        return _double_fn(batch)

    b = ContinuousBatcher(fn, batch_buckets=(1, 2, 4), max_delay_s=0.05)
    try:
        out = b.infer({"x": np.ones((3,), np.float32)})
        np.testing.assert_allclose(out["y"], 2.0)

        futs = [b.submit({"x": np.full((3,), i, np.float32)}) for i in range(4)]
        results = [f.result(10) for f in futs]
        for i, r in enumerate(results):
            np.testing.assert_allclose(r["y"], 2.0 * i)
        # batching actually happened: fewer dispatches than requests
        assert any(c > 1 for c in calls[1:]) or len(calls) < 5
        # all dispatches padded to bucket sizes
        assert all(c in (1, 2, 4) for c in calls)
    finally:
        b.close()


def test_batcher_error_propagates():
    def fn(batch):
        raise RuntimeError("kaboom")

    b = ContinuousBatcher(fn, batch_buckets=(1, 2))
    try:
        with pytest.raises(RuntimeError, match="kaboom"):
            b.infer({"x": np.ones(2, np.float32)})
    finally:
        b.close()


@pytest.fixture()
def server():
    batcher = ContinuousBatcher(_double_fn, batch_buckets=(1, 2, 4))
    srv = InferenceServer(port=0)
    srv.register(
        ModelEndpoint(
            name="doubler",
            batcher=batcher,
            input_spec={"x": ((3,), "float32")},
            output_names=("y",),
        )
    )
    srv.start()
    yield srv
    srv.stop()


def test_http_server_infer_and_metadata(server):
    import json
    import urllib.request

    addr = server.addr
    with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}/v2/health/ready") as r:
        assert json.loads(r.read())["ready"]
    with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}/v2/models/doubler") as r:
        meta = json.loads(r.read())
    assert meta["inputs"]["x"]["shape"] == [3]

    out = http_infer(addr, "doubler", {"x": [1.0, 2.0, 3.0]})
    np.testing.assert_allclose(out["outputs"]["y"], [2.0, 4.0, 6.0])


def test_http_server_rejects_bad_input(server):
    import urllib.error

    addr = server.addr
    with pytest.raises(urllib.error.HTTPError) as exc:
        http_infer(addr, "doubler", {"x": [1.0, 2.0]})  # wrong shape
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        http_infer(addr, "nosuch", {"x": [1.0, 2.0, 3.0]})
    assert exc.value.code == 404


def test_perf_clients(server):
    addr = server.addr

    def infer(inputs):
        return http_infer(addr, "doubler", inputs)

    def make_input():
        return {"x": [1.0, 2.0, 3.0]}

    offline = offline_performance_test(infer, make_input, batch_sizes=(1,), iters=4)
    assert offline[0]["throughput"] > 0
    online = online_performance_test(infer, make_input, concurrency=3,
                                     requests_per_client=3)
    assert online["qps"] > 0 and online["p99_ms"] >= online["p50_ms"]


def test_model_repository_roundtrip(tmp_path):
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    save_model_repository(
        str(tmp_path), "toy", params,
        input_spec={"x": ((3,), "float32")}, output_names=("y",),
        metadata={"arch": "toy"},
    )
    restored, config = load_model_repository(str(tmp_path), "toy")
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(params["w"]))
    assert config["metadata"]["arch"] == "toy"
    assert config["inputs"]["x"]["dtype"] == "float32"


def test_binary_tensor_roundtrip():
    from deeplearningexamples_tpu.serving import decode_tensors, encode_tensors

    t = {"x": np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32),
         "ids": np.arange(5, dtype=np.int32)}
    back = decode_tensors(encode_tensors(t))
    for k in t:
        np.testing.assert_array_equal(back[k], t[k])
    with pytest.raises(ValueError, match="truncated"):
        decode_tensors(encode_tensors(t)[:10])


def test_http_binary_infer(server):
    out = http_infer(server.addr, "doubler", {"x": np.asarray([1.0, 2.0, 3.0], np.float32)},
                     binary=True)
    np.testing.assert_allclose(out["outputs"]["y"], [2.0, 4.0, 6.0])
