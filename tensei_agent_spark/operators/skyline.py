"""Skyline (Pareto-front) operator — beyond-reference analytics.

Motivated by the retrieved paper "Integration of Skyline Queries into
Spark SQL" (EDBT 2023): the skyline of a relation under (minimize x,
maximize y) is the set of rows no other row dominates, where row j
dominates row i iff x_j <= x_i AND y_j >= y_i with at least one strict
inequality. The classic use: price/quality trade-off frontiers.

The naive formulation is the O(n²) NOT EXISTS self-join — that is the
DuckDB oracle, not the plan. The 2-D skyline admits an exact
sort-based formulation that runs entirely on aggregates + one
distributed prefix scan:

1. collapse to one row per distinct x: ``g = max(y) per x`` — one
   partial-aggregated shuffle, the only corpus-sized exchange;
2. over g ordered by x ascending, the EXCLUSIVE running max of y
   (``operators/windows.with_global_prefix_max`` — range-partition +
   local window + broadcast offsets, no single-partition window);
3. a row survives iff y equals its x-group's max (ties all survive:
   equal x, equal y ⇒ neither strictly dominates) and y is strictly
   greater than the exclusive prefix max (any earlier x with y' >= y
   dominates via strictly-smaller x).

Scale shape: shuffle on x (partial agg), the prefix scan over
|distinct x| rows, one broadcast-able join back. No windows over the
raw relation, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import with_global_prefix_max


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
) -> DataFrame:
    """Rows on the Pareto front of (minimize ``minimize``, maximize
    ``maximize``). To flip a direction, negate the column upstream.
    NULL in either dimension excludes a row (NULL neither dominates
    nor is dominated meaningfully — the standard skyline convention).
    """
    base = df.filter(
        F.col(minimize).isNotNull() & F.col(maximize).isNotNull()
    )
    g = base.groupBy(minimize).agg(F.max(maximize).alias("_gmax"))
    pm = with_global_prefix_max(
        g, [minimize], "_gmax", out="_pm", exclusive=True
    )
    return (
        base.join(pm.select(minimize, "_gmax", "_pm"), minimize)
        .filter(
            (F.col(maximize) == F.col("_gmax"))
            & (F.col("_pm").isNull() | (F.col(maximize) > F.col("_pm")))
        )
        .drop("_gmax", "_pm")
    )
