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


# --- acf ------------------------------------------------------------------


def _acf_python(xs, max_lag):
    n = len(xs)
    xbar = sum(xs) / n
    den = sum((x - xbar) ** 2 for x in xs)
    out = {}
    for l in range(1, max_lag + 1):
        pairs = [(xs[i], xs[i + l]) for i in range(n - l)]
        num = sum((a - xbar) * (b - xbar) for a, b in pairs)
        out[l] = (len(pairs), num / den)
    return out


def test_acf_matches_python_model(spark):
    from decimal import Decimal

    from tensei_agent_spark.operators.timeseries import acf

    xs = [10.0, 12.0, 11.0, 15.0, 18.0, 17.0, 22.0, 9.0, 14.0, 16.0]
    rows = [("k", i + 1, Decimal(f"{x:.2f}")) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, s int, x decimal(14,2)")
    got = {
        r["lag"]: (r["n_pairs"], r["r"])
        for r in acf(df, ["key"], "s", "x", max_lag=3).collect()
    }
    want = _acf_python(xs, 3)
    assert set(got) == {1, 2, 3}
    for l in want:
        assert got[l][0] == want[l][0]
        assert got[l][1] == pytest.approx(want[l][1], rel=1e-12)


def test_acf_gap_drops_pairs_not_alignment(spark):
    # a missing step contributes no pair at the lags it anchors: with
    # steps {1,2,4}, lag 1 pairs only (1,2); lag 2 only (2,4)
    from decimal import Decimal

    from tensei_agent_spark.operators.timeseries import acf

    rows = [
        ("k", 1, Decimal("1.00")),
        ("k", 2, Decimal("2.00")),
        ("k", 4, Decimal("4.00")),
    ]
    df = spark.createDataFrame(rows, "key string, s int, x decimal(14,2)")
    got = {
        r["lag"]: r["n_pairs"]
        for r in acf(df, ["key"], "s", "x", max_lag=2).collect()
    }
    assert got == {1: 1, 2: 1}


def test_acf_perfect_alternation_is_negative_at_lag1(spark):
    from decimal import Decimal

    from tensei_agent_spark.operators.timeseries import acf

    xs = [1.0, -1.0] * 10
    rows = [("k", i + 1, Decimal(f"{x:.2f}")) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, s int, x decimal(14,2)")
    got = {r["lag"]: r["r"] for r in acf(df, ["key"], "s", "x", 2).collect()}
    assert got[1] < -0.9 and got[2] > 0.85


def test_acf_and_ccf_constant_series_yield_null_r(spark):
    """Zero variance → r undefined → NULL by contract (never NaN/Inf);
    both engines' divide semantics are pinned via the NULLIF'd oracle,
    this test pins the Spark side on the degenerate input directly."""
    from decimal import Decimal

    from tensei_agent_spark.operators.timeseries import acf, ccf

    rows = [("k", i + 1, Decimal("5.00")) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, s int, x decimal(14,2)")
    out = acf(df, ["key"], "s", "x", max_lag=2).collect()
    assert len(out) == 2 and all(r["r"] is None for r in out)
    # ccf: constant A vs varying B — den_a = 0 alone must null r
    varied = spark.createDataFrame(
        [("k", i + 1, Decimal(f"{i}.00")) for i in range(10)],
        "key string, s int, x decimal(14,2)",
    )
    out2 = ccf(df, varied, ["key"], "s", "x", max_lag=1).collect()
    assert len(out2) == 3 and all(r["r"] is None for r in out2)


# --- ewma_control ---------------------------------------------------------


def _ewma_python(xs, a=0.5, k=3.0):
    s, d, n = xs[0], 0.0, 0
    for x in xs[1:]:
        err = abs(x - s)
        if d > 0.0 and err > k * d:
            n += 1
        s, d = a * x + (1 - a) * s, a * err + (1 - a) * d
    return s, d, n


def test_ewma_control_matches_python_model(spark):
    from tensei_agent_spark.operators.timeseries import ewma_control

    xs = [10.0, 11.0, 10.5, 10.8, 11.1, 50.0, 10.9, 11.0]
    rows = [("k", i + 1, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, s int, x double")
    got = ewma_control(df, ["key"], "s", "x").collect()[0]
    s, d, n = _ewma_python(xs)
    assert got["ewma"] == s  # identical fold order → exact
    assert got["ewdev"] == d
    assert got["n_anomalies"] == n >= 1
    assert got["n_steps"] == len(xs)


def test_ewma_control_single_point_and_unsorted(spark):
    from tensei_agent_spark.operators.timeseries import ewma_control

    rows = [("a", 2, 20.0), ("a", 1, 10.0), ("b", 1, 7.0)]
    df = spark.createDataFrame(rows, "key string, s int, x double")
    got = {r["key"]: r for r in ewma_control(df, ["key"], "s", "x").collect()}
    assert got["a"]["ewma"] == 15.0  # 0.5*20 + 0.5*10, sorted by step
    assert got["b"]["ewma"] == 7.0
    assert got["b"]["ewdev"] == 0.0
    assert got["b"]["n_anomalies"] == 0


# --- ccf ------------------------------------------------------------------


def test_ccf_detects_known_lead(spark):
    # b is exactly a shifted copy of a (b_t = a_{t-2}): r should peak
    # at lag +2 (a leads b by 2) with r == 1.0
    from decimal import Decimal

    from tensei_agent_spark.operators.timeseries import ccf

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    a = spark.createDataFrame(
        [("k", i + 1, Decimal(f"{x:.2f}")) for i, x in enumerate(xs)],
        "key string, s int, x decimal(14,2)",
    )
    b = spark.createDataFrame(
        [("k", i + 3, Decimal(f"{x:.2f}")) for i, x in enumerate(xs)],
        "key string, s int, x decimal(14,2)",
    )
    got = {r["lag"]: r["r"] for r in ccf(a, b, ["key"], "s", "x", 3).collect()}
    assert got[2] == pytest.approx(1.0, abs=1e-12)
    assert all(got[l] < 0.999 for l in got if l != 2)


def test_ccf_symmetry_against_python(spark):
    from decimal import Decimal

    from tensei_agent_spark.operators.timeseries import ccf

    av = [1.0, 2.0, 3.0, 2.0, 1.0, 2.0, 3.0]
    bv = [2.0, 1.0, 2.0, 3.0, 2.0, 1.0, 2.0]
    mk = lambda vs: spark.createDataFrame(
        [("k", i + 1, Decimal(f"{v:.2f}")) for i, v in enumerate(vs)],
        "key string, s int, x decimal(14,2)",
    )
    got = {r["lag"]: (r["n_pairs"], r["r"])
           for r in ccf(mk(av), mk(bv), ["key"], "s", "x", 2).collect()}

    import math

    def ref(l):
        pairs = [(av[t], bv[t + l]) for t in range(len(av))
                 if 0 <= t + l < len(bv)]
        am, bm = sum(av) / len(av), sum(bv) / len(bv)
        num = sum((x - am) * (y - bm) for x, y in pairs)
        da = sum((x - am) ** 2 for x in av)
        db = sum((y - bm) ** 2 for y in bv)
        return len(pairs), num / math.sqrt(da * db)

    for l in range(-2, 3):
        n, r = ref(l)
        assert got[l][0] == n
        assert got[l][1] == pytest.approx(r, rel=1e-12)


def test_cusum_detects_level_shift(spark):
    from tensei_agent_spark.operators.timeseries import cusum_control

    # Flat at 1.0 for 10 steps, then a +0.5 level shift: the positive
    # CUSUM accumulates (0.5 - k) per step and must alarm; the pure
    # flat key never does.
    rows = [("shift", t, 1.0 if t <= 10 else 1.5) for t in range(1, 21)]
    rows += [("flat", t, 1.0) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "k string, s int, x double")
    got = {r["k"]: r for r in cusum_control(df, ["k"], "s", "x", k=0.0625, h=0.5).collect()}
    assert got["flat"]["n_alarms"] == 0
    assert got["flat"]["cusum_pos"] == 0.0 and got["flat"]["cusum_neg"] == 0.0
    assert got["shift"]["n_alarms"] > 0
    # Python replay of the recurrence, exactly.
    mu, sp, sn, na = 1.0, 0.0, 0.0, 0
    for t in range(2, 21):
        x = 1.0 if t <= 10 else 1.5
        sp = max(0.0, sp + (x - mu - 0.0625))
        sn = max(0.0, sn + (mu - 0.0625 - x))
        na += 1 if (sp > 0.5 or sn > 0.5) else 0
    assert got["shift"]["cusum_pos"] == sp
    assert got["shift"]["n_alarms"] == na


def test_cusum_negative_shift_uses_lower_arm(spark):
    from tensei_agent_spark.operators.timeseries import cusum_control

    rows = [("down", t, 1.0 if t <= 5 else 0.25) for t in range(1, 16)]
    df = spark.createDataFrame(rows, "k string, s int, x double")
    r = cusum_control(df, ["k"], "s", "x", k=0.0625, h=0.5).collect()[0]
    assert r["cusum_neg"] > r["cusum_pos"]
    assert r["n_alarms"] > 0


def test_haar_decompose_matches_pywt_free_reference(spark):
    from tensei_agent_spark.operators.timeseries import haar_decompose

    vals = [3, 1, 4, 1, 5, 9, 2, 6]  # 2^3 dyadic
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, idx int, v long")
    got = {
        (r["level"], r["idx"]): (r["approx"], r["detail"])
        for r in haar_decompose(df, ["k"], "idx", "v", 3).collect()
    }

    # Pure-python unnormalized Haar pyramid.
    cur = vals
    for lvl in range(1, 4):
        nxt = []
        for i in range(0, len(cur), 2):
            a, d = cur[i] + cur[i + 1], cur[i] - cur[i + 1]
            assert got[(lvl, i // 2)] == (a, d), (lvl, i)
            nxt.append(a)
        cur = nxt
    # Top approximation is the total mass; reconstruction invariant.
    assert got[(3, 0)][0] == sum(vals)


def test_haar_detail_localizes_a_step_change(spark):
    from tensei_agent_spark.operators.timeseries import haar_decompose

    # Flat 10s, then a step to 20 at the exact midpoint: the ONLY
    # nonzero detail at the top level is the full-series left-right
    # imbalance; finer levels are zero everywhere except nowhere
    # (each pair is internally flat).
    vals = [10] * 16 + [20] * 16
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, idx int, v long"
    )
    got = {
        (r["level"], r["idx"]): r["detail"]
        for r in haar_decompose(df, ["k"], "idx", "v", 5).collect()
    }
    assert got[(5, 0)] == 16 * 10 - 16 * 20
    for (lvl, idx), d in got.items():
        if lvl < 5:
            assert d == 0, (lvl, idx)
