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
    reproducible."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    out: DataFrame | None = None
    for name, df in lists:
        cur = df.select(
            F.col(id_col), F.col(rank_col).alias(f"rank_{name}")
        )
        out = cur if out is None else out.join(cur, id_col, "full_outer")
    score = None
    for name, _ in lists:
        term = F.coalesce(
            F.lit(1.0)
            / (F.lit(float(c)) + F.col(f"rank_{name}").cast("double")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    assert out is not None
    return out.select(
        id_col,
        *[F.col(f"rank_{name}") for name, _ in lists],
        score.alias("rrf"),
    )
