"""Per-key time-series smoothing/forecasting as codegen array folds.

Holt's linear-trend double exponential smoothing (level + trend
recurrence) is inherently sequential PER KEY — the wrong shape for a
window function (each step needs the previous smoothed state, not the
previous raw value). The distributed form used here:

1. aggregate the raw stream to one row per (key, step) — the only
   corpus-sized exchange;
2. ``collect_list`` each key's (step, value) pairs and ``array_sort``
   — per-key arrays are bounded by the HORIZON (days of history), not
   by data volume, so a 100 TB event stream still folds over ≤ a few
   thousand elements per key;
3. run the recurrence as one ``F.aggregate`` fold over the sorted
   array — sequential per key as the mathematics demands, but executed
   inside the JVM per row, embarrassingly parallel ACROSS keys.

The same shape serves any per-key recurrence (EWMA, Kalman-lite,
cumulative decay scores); Holt is registered as the oracle-checked
exemplar (`revenue_holt_forecast`) — the recurrence is reproduced in
DuckDB by a recursive CTE stepping in the identical IEEE double order,
so the comparison is bit-exact with no rounding guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

__all__ = ["holt_forecast", "acf", "ccf", "ewma_control"]


def holt_forecast(
    series: DataFrame,
    key_cols: list[str],
    step_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    horizon: int = 7,
) -> DataFrame:
    """Holt's linear-trend smoothing per key.

    ``series`` must already be one row per (key, step) — aggregate
    first. Initialization: level = first value, trend = 0 (step 1
    consumes no observation beyond the init; the fold starts at the
    second element). Returns one row per key: n_steps, final ``level``
    and ``trend``, and ``forecast`` = level + horizon·trend.

    alpha/beta should be exactly representable doubles (0.5, 0.25, …)
    when the result feeds the bit-exact oracle gate; arbitrary floats
    work but land within ULPs of any cross-engine reproduction.
    """
    pairs = series.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(step_col).alias("s"), F.col(value_col).alias("x")))
        ).alias("_pts")
    )
    a, b = float(alpha), float(beta)
    # state: (l, t) — fold over points 2..n; element_at(-1) handles the
    # n==1 key (trend stays 0, forecast = the single observation).
    fold = F.expr(
        f"""aggregate(
          slice(_pts, 2, greatest(size(_pts) - 1, 0)),
          named_struct('l', _pts[0].x, 't', cast(0.0 as double)),
          (st, p) -> named_struct(
            'l', {a}D * p.x + {1.0 - a}D * (st.l + st.t),
            't', {b}D * (({a}D * p.x + {1.0 - a}D * (st.l + st.t)) - st.l)
                 + {1.0 - b}D * st.t),
          st -> st)"""
    )
    return pairs.select(
        *key_cols,
        F.size("_pts").cast("bigint").alias("n_steps"),
        fold["l"].alias("level"),
        fold["t"].alias("trend"),
        (fold["l"] + F.lit(float(horizon)) * fold["t"]).alias("forecast"),
    )


def acf(
    series: DataFrame,
    key_cols: list[str],
    step_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation function per key, lags 1..max_lag, EXACT.

    ``series`` is one row per (key, integer step) with ``value_col``
    a DECIMAL column (exact arithmetic end-to-end; the caller rolls the
    raw stream up first). Gaps in the step sequence are honoured the
    calendar way: a missing step simply contributes no pair at the lags
    it would have anchored.

    r_l = [S_ab − x̄(S_a + S_b) + n_l·x̄²] / [S_xx − 2x̄·S_x + n·x̄²]
    (the standard mean-centred estimator with pairwise-complete lag
    windows), where every S_* is an exact DECIMAL sum and only the
    final combination runs in IEEE double — so a SQL oracle writing
    the identical expression tree reproduces the result bit-exactly,
    independent of either engine's partial-aggregation order.

    Scale shape (r12, guide §2.3 "aggregate before you shuffle" — the
    BM25 single-pass trick): ONE hash aggregate per key carries the
    sorted (step, value) spine array AND the full-series moments; the
    ×max_lag fan-out and the per-lag pair sums then run as a map-side
    array fold (map lookup of step+lag) over the ≤|keys| aggregate
    rows. No windows, no collects, no joins, no broadcasts — a 100 TB
    event stream reduces to its per-key day spine inside the one
    aggregation, exactly the horizon-bounded array shape
    :func:`ewma_control` and :func:`holt_forecast` already use. The
    r11 shape instead shuffle-joined a ×max_lag exploded probe stream
    against the spine and broadcast the moments — 3 consumers of a
    cached spine, 2 broadcast builds and a join tower that profiled as
    11 scheduling round-trips for a sub-second query; this shape runs
    the identical exact-DECIMAL sums (fold order is a deterministic
    permutation of an exact sum — associative, order-free) in 2
    exchanges end to end.
    """
    keys = [F.col(k) for k in key_cols]
    vt = series.schema[value_col].dataType
    if isinstance(vt, DecimalType):
        # Exact accumulators at max precision, scales per Spark's own
        # multiply/add rules so values match the hash-aggregate sums
        # the previous join shape produced (exact decimal arithmetic
        # is order-independent; only the container differs).
        sab_t = f"decimal(38,{min(2 * vt.scale, 38)})"
        sa_t = f"decimal(38,{vt.scale})"
    else:  # contract says DECIMAL; double fallback keeps the fold total
        sab_t = sa_t = "double"
    g = series.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(step_col).alias("s"), F.col(value_col).alias("x")
                )
            )
        ).alias("_pts"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col)).alias("_sx"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("_sxx"),
    )
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(int(max_lag)))
    ).alias("lag")
    # step → value lookup; steps are unique per key by contract (one
    # row per (key, step)). try_element_at: absent step (calendar gap)
    # reads NULL under ANSI instead of throwing — the pairwise-complete
    # convention (a missing step anchors no pair).
    fanned = g.select(
        *keys, "_pts", "_n", "_sx", "_sxx",
        F.map_from_entries("_pts").alias("_m"), lags,
    )
    fold = F.expr(
        f"""aggregate(
          _pts,
          named_struct(
            'np', 0L,
            'sab', cast(0 as {sab_t}),
            'sa',  cast(0 as {sa_t}),
            'sb',  cast(0 as {sa_t})),
          (a, p) -> CASE WHEN try_element_at(_m, p.s + lag) IS NULL
            THEN a
            ELSE named_struct(
              'np',  a.np + 1L,
              'sab', cast(a.sab + p.x * try_element_at(_m, p.s + lag)
                          as {sab_t}),
              'sa',  cast(a.sa + p.x as {sa_t}),
              'sb',  cast(a.sb + try_element_at(_m, p.s + lag)
                          as {sa_t})) END,
          a -> a)"""
    ).alias("_f")
    per_lag = fanned.select(
        *keys, F.col("lag"), "_n", "_sx", "_sxx", fold
    ).filter(F.col("_f.np") > 0)
    xbar = F.col("_sx").cast("double") / F.col("_n")
    num = (
        F.col("_f.sab").cast("double")
        - xbar * (F.col("_f.sa").cast("double") + F.col("_f.sb").cast("double"))
        + F.col("_f.np") * xbar * xbar
    )
    den = (
        F.col("_sxx").cast("double")
        - F.lit(2.0) * xbar * F.col("_sx").cast("double")
        + F.col("_n") * xbar * xbar
    )
    return per_lag.select(
        *keys,
        F.col("lag").cast("bigint").alias("lag"),
        F.col("_f.np").cast("bigint").alias("n_pairs"),
        # Constant series → zero central moment: r is undefined, and
        # an unguarded divide is engine-dependent (Spark NULL, IEEE
        # NaN/Inf elsewhere). Pin NULL explicitly; the oracle
        # mirrors with NULLIF.
        F.when(den != F.lit(0.0), num / den).alias("r"),
    )


def ewma_control(
    series: DataFrame,
    key_cols: list[str],
    step_col: str,
    value_col: str,
    alpha: float = 0.5,
    k: float = 3.0,
) -> DataFrame:
    """EWMA control chart per key (exponentially weighted moving
    average + mean-absolute-deviation band), as one codegen fold.

    Recurrence (the classic EWMA/EWMAD anomaly monitor):
        pred_t = s_{t-1};   err_t = |x_t − pred_t|
        flag_t = d_{t-1} > 0  AND  err_t > k·d_{t-1}
        s_t = α·x_t + (1−α)·s_{t-1}          (init s_1 = x_1)
        d_t = α·err_t + (1−α)·d_{t-1}        (init d_1 = 0)

    Returns one row per key: n_steps, final ewma, final ewdev, and
    n_anomalies (count of flagged steps). α and k should be exactly
    representable doubles (0.5, 3.0) when feeding the bit-exact
    oracle gate; the DuckDB twin replays the recursion in the same
    IEEE order via a recursive CTE.

    Same scale shape as :func:`holt_forecast`: per-key arrays are
    horizon-bounded, the fold is sequential per key (as the recursion
    demands) and parallel across keys.
    """
    pairs = series.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(step_col).alias("s"), F.col(value_col).alias("x"))
            )
        ).alias("_pts")
    )
    a = float(alpha)
    kk = float(k)
    fold = F.expr(
        f"""aggregate(
          slice(_pts, 2, greatest(size(_pts) - 1, 0)),
          named_struct('s', _pts[0].x, 'd', cast(0.0 as double), 'n', 0L),
          (st, p) -> named_struct(
            's', {a}D * p.x + {1.0 - a}D * st.s,
            'd', {a}D * abs(p.x - st.s) + {1.0 - a}D * st.d,
            'n', st.n + CASE WHEN st.d > 0.0D
                              AND abs(p.x - st.s) > {kk}D * st.d
                             THEN 1L ELSE 0L END),
          st -> st)"""
    )
    return pairs.select(
        *[F.col(c) for c in key_cols],
        F.size("_pts").cast("bigint").alias("n_steps"),
        fold["s"].alias("ewma"),
        fold["d"].alias("ewdev"),
        fold["n"].alias("n_anomalies"),
    )


def ccf(
    series_a: DataFrame,
    series_b: DataFrame,
    key_cols: list[str],
    step_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Cross-correlation function between two keyed series at lags
    −max_lag..max_lag (lead–lag detection: at which offset does series
    A best predict series B?). Same exactness contract as :func:`acf`:
    ``value_col`` must be DECIMAL in both inputs, every sum is exact,
    and the final combination — including the sqrt, which IEEE 754
    requires to be correctly rounded — runs in double identically to a
    SQL oracle writing the same expression tree.

        r_l = [S_ab − b̄·S_a − ā·S_b + n_l·ā·b̄]
              / sqrt(den_a · den_b)

    with ā, b̄ the FULL-series means and den_* the full-series central
    sum of squares (the standard CCF normalization; the numerator uses
    pairwise-complete windows). Positive lag l pairs a_t with b_{t+l}
    (A leading B).

    Scale shape: identical to acf — the series are already key×horizon
    bounded, the lag fan-out is map-side, one (key, step) equi-join,
    and the per-key moments broadcast.
    """
    keys = [F.col(k) for k in key_cols]

    def moments(s: DataFrame, tag: str) -> DataFrame:
        return s.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(f"_n{tag}"),
            F.sum(F.col(value_col)).alias(f"_s{tag}"),
            F.sum(F.col(value_col) * F.col(value_col)).alias(f"_ss{tag}"),
        )

    ma = moments(series_a, "a")
    mb = moments(series_b, "b")
    lag_spine = F.explode(
        F.sequence(F.lit(-int(max_lag)), F.lit(int(max_lag)))
    ).alias("lag")
    probe = series_a.select(
        *keys,
        F.col(step_col).alias("_s"),
        F.col(value_col).alias("_xa"),
        lag_spine,
    ).withColumn("_probe", F.col("_s") + F.col("lag"))
    base = series_b.select(
        *keys,
        F.col(step_col).alias("_probe"),
        F.col(value_col).alias("_xb"),
    )
    per_lag = (
        probe.join(base, [*key_cols, "_probe"])
        .groupBy(*keys, F.col("lag"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("_xa") * F.col("_xb")).alias("_sab"),
            F.sum("_xa").alias("_sa"),
            F.sum("_xb").alias("_sb"),
        )
    )
    abar = F.col("_sa_f").cast("double") / F.col("_na")
    bbar = F.col("_sb_f").cast("double") / F.col("_nb")
    num = (
        F.col("_sab").cast("double")
        - bbar * F.col("_sa").cast("double")
        - abar * F.col("_sb").cast("double")
        + F.col("n_pairs") * abar * bbar
    )
    den_a = (
        F.col("_ssa").cast("double")
        - F.lit(2.0) * abar * F.col("_sa_f").cast("double")
        + F.col("_na") * abar * abar
    )
    den_b = (
        F.col("_ssb").cast("double")
        - F.lit(2.0) * bbar * F.col("_sb_f").cast("double")
        + F.col("_nb") * bbar * bbar
    )
    full = ma.join(mb, key_cols).select(
        *keys,
        F.col("_na"),
        F.col("_sa").alias("_sa_f"),
        F.col("_ssa"),
        F.col("_nb"),
        F.col("_sb").alias("_sb_f"),
        F.col("_ssb"),
    )
    # Either series constant → zero variance: r undefined, NULL by
    # contract (see acf); sqrt(0) = 0 triggers the same guard.
    rden = F.sqrt(den_a * den_b)
    return per_lag.join(F.broadcast(full), key_cols).select(
        *keys,
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.when(rden != F.lit(0.0), num / rden).alias("r"),
    )


def cusum_control(
    series: DataFrame,
    key_cols: list[str],
    step_col: str,
    value_col: str,
    k: float = 0.0625,
    h: float = 0.5,
) -> DataFrame:
    """Two-sided CUSUM change detection per key (Page 1954): the
    classic drift monitor that catches small persistent shifts an
    EWMA band misses.

    Recurrence, with reference μ0 = x_1, allowance ``k``, threshold
    ``h`` (both must be exactly representable doubles for the oracle
    gate — defaults are powers of two):

        S⁺_t = max(0, S⁺_{t-1} + (x_t − μ0 − k))
        S⁻_t = max(0, S⁻_{t-1} + (μ0 − k − x_t))
        alarm_t = S⁺_t > h  OR  S⁻_t > h

    One codegen array fold per key, exactly the holt/ewma shape:
    arrays bounded by the step horizon, sequential within a key (the
    recursion demands it), parallel across keys; only +/−/max double
    ops, so the DuckDB recursive-CTE twin replays bit-identically.
    Returns key_cols + (n_steps, cusum_pos, cusum_neg, n_alarms).
    """
    pairs = series.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(step_col).alias("s"), F.col(value_col).alias("x")
                )
            )
        ).alias("_pts")
    )
    kd = f"{float(k)!r}D"
    hd = f"{float(h)!r}D"
    sp_next = f"greatest(cast(0.0 as double), st.sp + (p.x - st.mu - {kd}))"
    sn_next = f"greatest(cast(0.0 as double), st.sn + (st.mu - {kd} - p.x))"
    fold = F.expr(
        f"""aggregate(
          slice(_pts, 2, greatest(size(_pts) - 1, 0)),
          named_struct('mu', _pts[0].x, 'sp', cast(0.0 as double),
                       'sn', cast(0.0 as double), 'na', 0L),
          (st, p) -> named_struct(
            'mu', st.mu,
            'sp', {sp_next},
            'sn', {sn_next},
            'na', st.na + CASE WHEN {sp_next} > {hd}
                                OR {sn_next} > {hd}
                               THEN 1L ELSE 0L END),
          st -> st)"""
    )
    return pairs.select(
        *[F.col(c) for c in key_cols],
        F.size("_pts").cast("bigint").alias("n_steps"),
        fold["sp"].alias("cusum_pos"),
        fold["sn"].alias("cusum_neg"),
        fold["na"].alias("n_alarms"),
    )


def haar_decompose(
    series: DataFrame,
    key_cols: list[str],
    idx_col: str,
    value_col: str,
    levels: int,
) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of a dense dyadic
    series (idx 0..2^levels−1, integer values): per level ℓ the signal
    halves into pairwise SUMS (approximations) and DIFFERENCES
    (details) — the multi-resolution transform behind time-series
    compression, change localization and wavelet similarity search
    (Chan & Fu, ICDE'99). Unnormalized coefficients stay pure BIGINT
    arithmetic (the usual 1/√2 scaling would leave exactness), so the
    whole pyramid is engine-portable bit-for-bit; consumers rescale by
    2^(−ℓ/2) when they need the orthonormal basis.

    Shape: one partial-aggregated groupBy per level over a series
    whose length HALVES each round — total work ~2× the input rows,
    rounds = ``levels`` (bounded, like the graph walks). Returns
    (key_cols..., level, idx, approx, detail) for levels 1..levels;
    approx at level ℓ, index i summarizes input window
    [i·2^ℓ, (i+1)·2^ℓ) and detail is its left-half minus right-half
    mass.
    """
    cur = series.select(
        *key_cols,
        F.col(idx_col).cast("long").alias("_i"),
        F.col(value_col).cast("long").alias("_a"),
    )
    out: DataFrame | None = None
    for lvl in range(1, int(levels) + 1):
        stage = cur.groupBy(
            *key_cols, F.floor(F.col("_i") / 2).alias("_i2")
        ).agg(
            F.sum(
                F.when(F.col("_i") % 2 == 0, F.col("_a")).otherwise(0)
            ).alias("_l"),
            F.sum(
                F.when(F.col("_i") % 2 == 1, F.col("_a")).otherwise(0)
            ).alias("_r"),
        )
        lv = stage.select(
            *key_cols,
            F.lit(lvl).alias("level"),
            F.col("_i2").cast("long").alias("idx"),
            (F.col("_l") + F.col("_r")).alias("approx"),
            (F.col("_l") - F.col("_r")).alias("detail"),
        )
        out = lv if out is None else out.unionByName(lv)
        cur = lv.select(
            *key_cols, F.col("idx").alias("_i"), F.col("approx").alias("_a")
        )
    assert out is not None
    return out
