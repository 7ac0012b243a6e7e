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


def _pandas_skyline(pdf, min_cols: list[str], max_cols: list[str]):
    """Block-nested-loop skyline of one in-memory block (numpy):
    O(n·|skyline|) dominance sweeps — the standard local phase."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    # orient every dimension as MINIMIZE
    mat = np.column_stack(
        [pdf[c].to_numpy(dtype="float64") for c in min_cols]
        + [-pdf[c].to_numpy(dtype="float64") for c in max_cols]
    )
    keep = np.ones(len(pdf), dtype=bool)
    for i in range(len(pdf)):
        if not keep[i]:
            continue
        le = (mat <= mat[i]).all(axis=1)
        lt = (mat < mat[i]).any(axis=1)
        dominators = le & lt & keep
        if dominators.any():
            keep[i] = False
            continue
        # i survives (so far); i dominates others -> drop them
        ge = (mat >= mat[i]).all(axis=1)
        gt = (mat > mat[i]).any(axis=1)
        keep &= ~(ge & gt)
        keep[i] = True
    return pdf[keep]


def skyline_nd(
    df: DataFrame,
    minimize: list[str],
    maximize: list[str],
) -> DataFrame:
    """General d-dimensional skyline via the classic two-phase
    distributed algorithm (d ≥ 3; for 2-D use the exact-relational
    ``skyline_2d``):

    1. LOCAL skyline per Arrow batch (``mapInPandas`` block-nested-loop
       — a justified Pandas kernel: no relational formulation exists
       for d ≥ 3; per-batch rather than per-partition pruning is merely
       less aggressive, never wrong, since skyline(S) ⊆ ∪ skyline(Sᵢ));
    2. GLOBAL skyline of the union of local candidates on ONE
       partition, CONCATENATED across its Arrow batches before the
       final sweep — batch-local sweeps in the global phase would miss
       cross-batch dominance. Sound because the candidate union
       contains the true skyline; sized by the candidate set (the
       local phase already removed everything batch-locally dominated;
       real skylines are tiny relative to |D|). A candidate set too
       big for one task means the skyline itself is that big —
       repartition and re-run the local phase, or cap dimensions.

    Exactness: dominance uses float64 compares of the raw values —
    exact for integers < 2^53 and for decimals that arrived as exact
    doubles; the oracle twin mirrors the same comparisons.
    NULL in any dimension excludes the row (same convention as
    ``skyline_2d``).
    """
    if len(minimize) + len(maximize) < 2:
        raise ValueError("skyline needs at least two dimensions")
    cond = None
    for c in list(minimize) + list(maximize):
        n = F.col(c).isNotNull()
        cond = n if cond is None else (cond & n)
    base = df.filter(cond)

    def local(it):
        for pdf in it:
            yield _pandas_skyline(pdf, minimize, maximize)

    def merged(it):
        import pandas as pd

        pdfs = list(it)
        if pdfs:
            yield _pandas_skyline(
                pd.concat(pdfs, ignore_index=True), minimize, maximize
            )

    candidates = base.mapInPandas(local, base.schema)
    return candidates.repartition(1).mapInPandas(merged, base.schema)
