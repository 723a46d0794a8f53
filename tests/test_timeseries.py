"""Time-series platform: windowing, splits, metrics, CLI e2e."""

import numpy as np

from deeplearningexamples_tpu.data.timeseries import (
    TimeSeriesSpec,
    WindowedTimeSeriesDataset,
    forecast_metrics,
    make_synthetic_series,
)

SPEC = TimeSeriesSpec(observed=(0, 1), known=(2, 3), target=0,
                      encoder_length=24, horizon=8)


def test_window_shapes_and_split_disjoint():
    panel = make_synthetic_series(n_series=2, n_steps=300)
    train = WindowedTimeSeriesDataset(panel, SPEC, 4, split="train")
    b = next(iter(train))
    assert b["observed"].shape == (4, 24, 2)
    assert b["known"].shape == (4, 32, 2)
    assert b["target"].shape == (4, 8)
    # train windows end before the valid region starts (no target leakage)
    t_end = int(300 * 0.7)
    assert all(start + 32 <= t_end for _, start in train.windows)
    test = WindowedTimeSeriesDataset(panel, SPEC, 4, split="test")
    v_end = int(300 * 0.85)
    # test targets all come from the test region
    assert all(start + 24 >= v_end for _, start in test.windows)


def test_standardization_from_train_only():
    panel = make_synthetic_series(n_series=1, n_steps=300)
    panel[:, int(300 * 0.7):, 0] += 100.0  # shift only the future
    ds = WindowedTimeSeriesDataset(panel, SPEC, 2, split="train")
    # train-range target is standardized ~N(0,1); the +100 never leaks in
    tr = panel[:, :int(300 * 0.7), 0]
    np.testing.assert_allclose(ds.mean[0], tr.mean(), rtol=1e-5)
    y = ds.unscale_target((tr - ds.mean[0]) / ds.std[0])
    np.testing.assert_allclose(y, tr, rtol=1e-4)


def test_forecast_metrics_reference_semantics():
    rng = np.random.default_rng(0)
    target = rng.normal(size=(16, 8))
    perfect = np.repeat(target[..., None], 3, axis=-1)
    m = forecast_metrics(perfect, target)
    assert m["MAE"] == 0.0 and m["RMSE"] == 0.0 and m["ND"] == 0.0
    assert m["P50"] == 0.0 and m["P90"] == 0.0
    off = perfect + 0.5
    m2 = forecast_metrics(off, target)
    np.testing.assert_allclose(m2["MAE"], 0.5, atol=1e-9)
    # P50 normalized quantile loss: 2 * sum(0.5*|e|) / sum|y| = ND
    np.testing.assert_allclose(m2["P50"], m2["ND"], rtol=1e-9)
    # P90: pinball at q=0.9 with e = y - pred = -0.5 -> 0.1*|e| per elem
    expect = 2 * 0.1 * 0.5 * target.size / np.abs(target).sum()
    np.testing.assert_allclose(m2["P90"], expect, rtol=1e-9)


def test_tft_cli_end_to_end(tmp_path):
    from deeplearningexamples_tpu.cli.main import cli

    ws = tmp_path / "ws"
    cli([
        "tft", "--batch-size", "32", "--epochs", "1", "--lr", "1e-3",
        "--workspace", str(ws), "--rng-impl", "threefry",
    ])
    report = (ws / "tft_raport.json").read_text()
    assert "test.P50" in report and "test.MAE" in report
