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

__all__ = ["holt_forecast"]


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
