"""Oracle-independent third-party pins (VERDICT r10 #7).

The oracle gate compares Spark against DuckDB — but for formula-heavy
operators both sides are OUR transcription of the same math, so they
could be wrong together. `stats_quantiles_exact` broke this symmetry
by also agreeing with numpy's percentile to the ULP; this module
applies the same pattern to the other statistics whose Spark and SQL
twins share an author:

- Holt level/trend: pinned against a CLOSED-FORM numpy matrix-power
  state-space evaluation — a genuinely different algorithm (linear
  algebra over unrolled coefficients) from the sequential fold both
  the operator and its oracle SQL implement.
- ACF: the lag-covariance sums pinned against ``np.correlate``'s
  sliding-dot kernel — numpy's implementation of exactly the Σ
  xc_i·xc_{i+l} our expression tree builds from grouped moments.
- Welch t / Welch–Satterthwaite df: arm moments recomputed by
  numpy's independent reductions (float64 pairwise summation) rather
  than our conditional exact-DECIMAL sums.

Tolerances are fp-level (different summation orders), not ULP: the
point is catching a shared FORMULA bug, which shows up at 1e-3, not
1e-15.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from tensei_agent_spark.operators.stats import welch_t
from tensei_agent_spark.operators.timeseries import acf, holt_forecast


def test_holt_matches_numpy_state_space_closed_form(spark):
    """Holt's recursion is linear in the observations:
    s_n = (l_n, t_n) = A·s_{n-1} + B·x_n with
    A = [[1-a, 1-a], [-ab, b(1-a)+1-b]], B = (a, ab), s_1 = (x_1, 0).
    Unrolled: s_n = A^{n-1}·s_1 + Σ_{j=2..n} A^{n-j}·B·x_j — evaluated
    here entirely in numpy matrix algebra (np.linalg.matrix_power),
    no sequential fold anywhere."""
    a, b = 0.5, 0.5
    xs = [10.0, 12.0, 11.0, 15.0, 18.0, 17.0, 22.0, 13.5, 19.25]
    rows = [("k", i + 1, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, s int, x double")
    got = holt_forecast(df, ["key"], "s", "x", alpha=a, beta=b, horizon=4).collect()[0]

    A = np.array([[1 - a, 1 - a], [-a * b, b * (1 - a) + 1 - b]])
    B = np.array([a, a * b])
    n = len(xs)
    s = np.linalg.matrix_power(A, n - 1) @ np.array([xs[0], 0.0])
    for j in range(2, n + 1):
        s = s + np.linalg.matrix_power(A, n - j) @ (B * xs[j - 1])
    level, trend = float(s[0]), float(s[1])
    assert math.isclose(got["level"], level, rel_tol=1e-12), (got["level"], level)
    assert math.isclose(got["trend"], trend, rel_tol=1e-12), (got["trend"], trend)
    assert math.isclose(got["forecast"], level + 4.0 * trend, rel_tol=1e-12)


def test_acf_matches_numpy_correlate(spark):
    """The operator assembles r_l from grouped moments
    (S_ab − x̄(S_a+S_b) + n_l·x̄²) / (S_xx − 2x̄S_x + n·x̄²); algebraically
    that is dot(xc[:-l], xc[l:]) / dot(xc, xc) for the mean-centred
    series — computed here by numpy's correlate kernel instead."""
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
    rows = [("k", i + 1, x) for i, x in enumerate(xs)]
    # DECIMAL input column per the operator's exact-arithmetic contract
    df = spark.createDataFrame(rows, "key string, s int, x double").select(
        "key", "s", F.col("x").cast("decimal(18,2)").alias("x")
    )
    got = {r["lag"]: r["r"] for r in acf(df, ["key"], "s", "x", max_lag=4).collect()}

    x = np.array(xs, dtype=np.float64)
    xc = x - x.mean()
    full = np.correlate(xc, xc, mode="full")  # index n-1+l = Σ xc_i·xc_{i+l}
    den = float(full[len(xs) - 1])  # lag 0 = dot(xc, xc)
    for lag in range(1, 5):
        want = float(full[len(xs) - 1 + lag]) / den
        assert math.isclose(got[lag], want, rel_tol=1e-12, abs_tol=1e-12), (
            lag, got[lag], want,
        )


def test_welch_t_matches_numpy_moments(spark):
    """t and df recomputed from numpy's own mean/var(ddof=1) reductions
    over the raw arms — independent of the operator's conditional
    exact-DECIMAL moment folding. round(9) on the operator's output
    bounds agreement at 1e-9 + fp slack."""
    a = [10.25, 12.5, 11.0, 13.75, 9.0, 14.5, 10.0]
    b = [20.5, 22.0, 19.25, 21.75, 23.0]
    rows = [("g", "A", v) for v in a] + [("g", "B", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, arm string, v double")
    got = welch_t(
        df, ["grp"], F.col("arm") == "A", F.col("arm") == "B", "v"
    ).collect()[0]

    xa, xb = np.array(a), np.array(b)
    va, vb = float(xa.var(ddof=1)), float(xb.var(ddof=1))
    sea, seb = va / len(a), vb / len(b)
    se2 = sea + seb
    t = (float(xa.mean()) - float(xb.mean())) / math.sqrt(se2)
    dfw = se2 * se2 / (sea * sea / (len(a) - 1) + seb * seb / (len(b) - 1))
    assert math.isclose(got["t_stat"], t, rel_tol=0, abs_tol=5e-9), (got["t_stat"], t)
    assert math.isclose(got["df_welch"], dfw, rel_tol=0, abs_tol=5e-9), (
        got["df_welch"], dfw,
    )
    assert math.isclose(got["mean_a"], float(xa.mean()), abs_tol=5e-9)
    assert math.isclose(got["mean_b"], float(xb.mean()), abs_tol=5e-9)
