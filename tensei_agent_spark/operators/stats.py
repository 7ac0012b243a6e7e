"""Column profiling — the reference's Stats subsystem re-expressed.

Reference: ``Stats.scala:94-128`` streams parsed cells into per-column
``NumericAnalyzer`` (count/min/max/mean + error counters,
``analyzer/NumericAnalyzer.scala:48-103``) and ``StringAnalyzer`` (the
same stats over string *length*, ``analyzer/StringAnalyzer.scala:44-100``),
optionally on a sampled fraction.

Spark: one ``agg`` per table — partial aggregation is map-side, so this
is a single reduce regardless of table size. Sums are computed in exact
DECIMAL then cast to DOUBLE so results are bit-stable across engines.
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
    """
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=42)
    per_col = []
    for c in cols:
        col = F.col(c)
        dec = col.cast("decimal(20,4)")
        per_col.append(
            df.agg(
                F.lit(c).alias("col_name"),
                F.count(col).alias("n"),
                F.count(F.when(col.isNull(), 1)).alias("n_null"),
                F.min(col).cast("double").alias("min_v"),
                F.max(col).cast("double").alias("max_v"),
                (F.sum(dec).cast("double") / F.count(col)).alias("mean_v"),
            )
        )
    out = per_col[0]
    for other in per_col[1:]:
        out = out.unionByName(other)
    return out


def string_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """count/min/max/mean over string LENGTH per column (StringAnalyzer)."""
    per_col = []
    for c in cols:
        ln = F.length(F.col(c))
        per_col.append(
            df.agg(
                F.lit(c).alias("col_name"),
                F.count(F.col(c)).alias("n"),
                F.count(F.when(F.col(c).isNull(), 1)).alias("n_null"),
                F.min(ln).alias("min_len"),
                F.max(ln).alias("max_len"),
                (F.sum(ln.cast("decimal(20,0)")).cast("double") / F.count(F.col(c))).alias(
                    "mean_len"
                ),
            )
        )
    out = per_col[0]
    for other in per_col[1:]:
        out = out.unionByName(other)
    return out
