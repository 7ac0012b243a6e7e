"""Hybrid retrieval: fuse lexical (BM25) and vector (cosine ANN)
rankings with Reciprocal Rank Fusion (Cormack, Clarke, Büttcher,
SIGIR'09):

    RRF(d) = Σ_lists 1 / (c + rank_list(d)),   c = 60

RRF is the standard hybrid-search combiner (rank-based, so the two
arms' incomparable score scales never meet) and is exactly computable:
ranks are integers, each term is one double division of exact
integers, and the terms are added in FIXED list order — bit-exact
across engines, unlike score-interpolation fusions.

Scale: each arm is already a top-k (bounded rows); the fusion is a
full-outer join of k-row relations — driver-light, broadcast-sized,
constant in corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    lists: Sequence[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
) -> DataFrame:
    """Fuse named ranked lists [(name, df(id_col, rank_col)), ...] into
    (id_col, rank_<name>..., rrf). Documents missing from a list
    contribute 0 for that arm (the standard RRF convention). Term
    addition follows the given list order so the float sum is
    reproducible.

    Shape (r12, guide §2.4): UNION the arms and pivot per-arm ranks in
    ONE groupBy — an N-arm fusion is one exchange of Σ|arm| rows. The
    r11 shape chained N−1 full-outer equi-joins, and Spark cannot
    broadcast a full outer join, so every arm paid its own sort-merge
    exchange even at top-k sizes. Each id appears at most once per arm
    (ranked lists), so min(when(arm=name, rank)) IS that arm's rank —
    or NULL when absent, exactly the old join's missing side."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        df.select(
            F.col(id_col),
            F.lit(name).alias("_arm"),
            F.col(rank_col).alias("_rank"),
        )
        for name, df in lists
    ]
    allarms = parts[0]
    for p in parts[1:]:
        allarms = allarms.unionByName(p)
    pivoted = allarms.groupBy(id_col).agg(
        *[
            F.min(F.when(F.col("_arm") == name, F.col("_rank"))).alias(
                f"rank_{name}"
            )
            for name, _ in lists
        ]
    )
    score = None
    for name, _ in lists:
        term = F.coalesce(
            F.lit(1.0)
            / (F.lit(float(c)) + F.col(f"rank_{name}").cast("double")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    return pivoted.select(
        id_col,
        *[F.col(f"rank_{name}") for name, _ in lists],
        score.alias("rrf"),
    )
