"""Per-key recurrence folds (operators/timeseries.py)."""

from __future__ import annotations

import pytest

from tensei_agent_spark.operators.timeseries import holt_forecast


def _model(xs, a=0.5, b=0.5):
    l, t = xs[0], 0.0
    for x in xs[1:]:
        l_new = a * x + (1 - a) * (l + t)
        t = b * (l_new - l) + (1 - b) * t
        l = l_new
    return l, t


def test_holt_matches_python_model(spark):
    xs = [10.0, 12.0, 11.0, 15.0, 18.0, 17.0, 22.0]
    rows = [("k", i + 1, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, s int, x double")
    got = holt_forecast(df, ["key"], "s", "x", horizon=3).collect()[0]
    l, t = _model(xs)
    assert got["level"] == pytest.approx(l, abs=0)  # identical fold order
    assert got["trend"] == pytest.approx(t, abs=0)
    assert got["forecast"] == l + 3.0 * t
    assert got["n_steps"] == 7


def test_holt_unsorted_input_and_single_point(spark):
    # out-of-order steps must not change the fold (array_sort) and a
    # single-point key forecasts its own value with zero trend
    rows = [("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)]
    df = spark.createDataFrame(rows, "key string, s int, x double")
    got = {r["key"]: r for r in holt_forecast(df, ["key"], "s", "x").collect()}
    l, t = _model([10.0, 20.0, 30.0])
    assert got["a"]["level"] == l and got["a"]["trend"] == t
    assert got["b"]["level"] == 5.0
    assert got["b"]["trend"] == 0.0
    assert got["b"]["forecast"] == 5.0


def test_holt_tracks_linear_series_exactly_in_the_limit(spark):
    # on a perfect line the trend converges toward the slope and the
    # forecast stays on the line's side
    xs = [float(2 * i) for i in range(1, 40)]
    df = spark.createDataFrame(
        [("k", i + 1, x) for i, x in enumerate(xs)], "key string, s int, x double"
    )
    got = holt_forecast(df, ["key"], "s", "x", horizon=5).collect()[0]
    assert got["trend"] == pytest.approx(2.0, abs=0.01)
    assert got["forecast"] == pytest.approx(xs[-1] + 5 * 2.0, rel=0.01)


def test_holt_empty_series(spark):
    from tensei_agent_spark.operators.timeseries import holt_forecast

    empty = spark.createDataFrame([], "key string, s int, x double")
    assert holt_forecast(empty, ["key"], "s", "x").count() == 0
