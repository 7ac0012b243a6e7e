"""Distributed k-means over embedding columns (beyond-reference).

Lloyd's algorithm expressed the way it scales: centroids are tiny
(k × d floats) and live as BROADCAST LITERALS inside the assignment
expression, so assignment is a pure map stage — ZERO shuffle; the only
exchange per iteration is the partial-aggregated groupBy computing the
per-cluster per-dimension means (the shuffle carries k rows of d
partial sums per partition, not the corpus). The driver holds exactly
the k×d centroid matrix between iterations — the same "aggregate is
driver-scale by definition" argument as collecting a COUNT.

Everything is deterministic: init takes the k lowest-id vectors and
arg-min ties break on the first (lowest) centroid index, so repeated
runs produce identical assignments — which the tests assert.

Used standalone (corpus clustering, SemDeDup-style pruning buckets)
and as the coarse quantizer an IVF index would train.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lits import dlit


def _dist2(vec_col: str, centroid: list[float]):
    """Squared L2 distance to one literal centroid, folded dimension-
    by-dimension in array order (deterministic float summation).
    Centroid rendered via ``lits.dlit`` — per-scalar F.lit cost ~1 ms
    per dimension of driver time on every plan build."""
    lit = dlit(centroid)
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Map-side nearest-centroid assignment: adds ``cluster`` (0-based,
    first-wins ties) and ``_d2`` (squared distance to it)."""
    dists = F.array(*[_dist2(vec_col, c) for c in centroids])
    return (
        emb.withColumn("_dists", dists)
        .withColumn("_d2", F.array_min("_dists"))
        # array_position is 1-based and returns the FIRST match — the
        # deterministic tie-break.
        .withColumn(
            "cluster",
            (F.array_position(F.col("_dists"), F.col("_d2")) - 1).cast("int"),
        )
        .drop("_dists")
    )


def kmeans(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int | None = None,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Lloyd's k-means. Returns (assigned_df, centroids, sse_history).

    ``assigned_df`` is ``emb`` + (cluster, _d2); ``sse_history`` has one
    total squared error per executed iteration (non-increasing — Lloyd's
    monotonicity, asserted in tests). Empty clusters keep their previous
    centroid. ``dim`` is probed from the first row when omitted.
    """
    init = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(
            f"kmeans: k={k} but the input has only {len(init)} rows"
        )
    if dim is None:
        dim = len(init[0][vec_col])
    centroids = [[float(x) for x in r[vec_col]] for r in init]
    sse_history: list[float] = []
    for _ in range(max_iter):
        assigned = assign_clusters(emb, centroids, vec_col)
        # One aggregation job per iteration: per-cluster count, SSE and
        # d per-dimension sums (partial-aggregated — the exchange
        # carries ≤ k rows per map partition).
        agg = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("_d2").alias("_sse"),
                *[
                    F.sum(F.col(vec_col)[i]).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        sse_history.append(float(sum(r["_sse"] for r in agg)))
        new_centroids = [list(c) for c in centroids]  # empty keeps old
        shift = 0.0
        for r in agg:
            c = [r[f"_s{i}"] / r["_n"] for i in range(dim)]
            shift = max(
                shift,
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(c, centroids[r["cluster"]])
                ),
            )
            new_centroids[r["cluster"]] = c
        centroids = new_centroids
        if shift <= tol:
            break
    return assign_clusters(emb, centroids, vec_col), centroids, sse_history


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """Per-cluster summary of a k-means assignment:
    (cluster, n, sse, mean_d2) — the registry-facing shape."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_d2").alias("sse"),
            F.avg("_d2").alias("mean_d2"),
        )
        .orderBy("cluster")
    )
