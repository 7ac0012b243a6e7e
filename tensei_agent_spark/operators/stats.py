"""Column profiling — the reference's Stats subsystem re-expressed.

Reference: ``Stats.scala:94-128`` streams parsed cells into per-column
``NumericAnalyzer`` (count/min/max/mean + error counters,
``analyzer/NumericAnalyzer.scala:48-103``) and ``StringAnalyzer`` (the
same stats over string *length*, ``analyzer/StringAnalyzer.scala:44-100``),
optionally on a sampled fraction.

Spark: ALL columns profile in a single ``agg`` over ONE scan — partial
aggregation is map-side, and ``stack`` pivots the wide 1-row result to
the per-column long format afterwards (a per-column union of aggs would
re-scan the table once per column: harmless at sf0.1, N full scans at
100 TB). Sums are computed in exact DECIMAL then cast to DOUBLE so
results are bit-stable across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile(
    df: DataFrame, cols: Sequence[str], sample_fraction: float | None = None
) -> DataFrame:
    """count/min/max/mean + null-error count per numeric column.

    Output: one row per column (col_name, n, n_null, min_v, max_v, mean_v).
    One scan for every column; ``sample_fraction`` mirrors the
    reference's percent parameter (for an engine-portable sample use
    ``sampling.deterministic_sample`` upstream instead).
    """
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=42)
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        # decimal(38,4): a profiler must absorb full-range bigints (epoch
        # micros, 64-bit hash ids) — (20,4) overflows and, under ANSI,
        # ABORTS at values >= 10^16. Sum headroom: 10^34 / value.
        dec = col.try_cast("decimal(38,4)")
        aggs += [
            F.count(col).alias(f"_n{i}"),
            F.count(F.when(col.isNull(), 1)).alias(f"_nn{i}"),
            F.min(col).cast("double").alias(f"_mn{i}"),
            F.max(col).cast("double").alias(f"_mx{i}"),
            (F.sum(dec).cast("double") / F.count(col)).alias(f"_mean{i}"),
        ]
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', _n{i}, _nn{i}, _mn{i}, _mx{i}, _mean{i}" for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS (col_name, n, n_null, min_v, max_v, mean_v)"
    )


def string_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """count/min/max/mean over string LENGTH per column (StringAnalyzer).
    Same one-scan wide-agg + ``stack`` shape as ``numeric_profile``."""
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        ln = F.length(col)
        aggs += [
            F.count(col).alias(f"_n{i}"),
            F.count(F.when(col.isNull(), 1)).alias(f"_nn{i}"),
            F.min(ln).alias(f"_mn{i}"),
            F.max(ln).alias(f"_mx{i}"),
            (F.sum(ln.cast("decimal(20,0)")).cast("double") / F.count(col)).alias(
                f"_mean{i}"
            ),
        ]
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', _n{i}, _nn{i}, _mn{i}, _mx{i}, _mean{i}" for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS (col_name, n, n_null, min_len, max_len, mean_len)"
    )


def fd_audit(
    df: DataFrame, candidates: Sequence[tuple[Sequence[str], str]]
) -> DataFrame:
    """Functional-dependency audit (Deequ/metanome-style profiling):
    for each candidate ``(lhs_cols, rhs_col)`` measure how close
    LHS → RHS is to holding exactly.

    Returns one row per candidate: ``fd`` (display name), ``n_lhs``
    (distinct LHS groups), ``n_violating_lhs`` (groups with >1 distinct
    RHS), ``max_rhs_per_lhs``, and ``holds`` (no violations). The g1-
    style violation share is n_violating_lhs / n_lhs.

    Shape per candidate: one hash aggregate to the distinct (LHS, RHS)
    pair set, one to LHS-group RHS counts, one to the 1-row summary —
    all map-side partialed, no windows, no distinct-on-the-driver. The
    summaries union into a candidate-count-sized result. NULL RHS
    counts as a value (SQL ``COUNT(DISTINCT ...)`` drops NULLs; we
    audit determinism, so two groups differing only in NULL-ness must
    violate) — implemented by pair-set distinct, which keeps NULL rows.
    """
    outs = []
    for lhs, rhs in candidates:
        lhs = list(lhs)
        name = f"{','.join(lhs)} -> {rhs}"
        pairs = df.select(*lhs, rhs).distinct()
        per_lhs = pairs.groupBy(*lhs).agg(F.count(F.lit(1)).alias("_nd"))
        outs.append(
            per_lhs.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("bigint").alias("n_lhs"),
                F.sum((F.col("_nd") > 1).cast("bigint"))
                .cast("bigint")
                .alias("n_violating_lhs"),
                F.max("_nd").cast("bigint").alias("max_rhs_per_lhs"),
                (F.max("_nd") == F.lit(1)).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
