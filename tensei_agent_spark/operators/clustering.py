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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import track
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


def nearest_centroid_confusion(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10_000,
) -> DataFrame:
    """Nearest-centroid classification audit with EXACT integer
    arithmetic: assign every vector to the label whose centroid is
    closest, and report the (true label, assigned label, n) confusion
    counts — the embedding-quality screen ("do labels cluster?").

    The trick that keeps an argmin over FLOAT centroids bit-exact:
    a centroid is s_l / n_l (integer sum vector / count); comparing
    squared distances d²(x, s_l/n_l) across labels multiplies through
    by n_l², giving the all-BIGINT score

        D_l = n_l²·‖x‖² − 2·n_l·(x·s_l) + ‖s_l‖²      (= n_l²·d²)

    …wait — D_l/n_l² is the comparable quantity, so the cross-label
    argmin compares D_l·n_m² vs D_m·n_l². Equivalently: rank on the
    exact rational via the pairwise cross-product. We avoid the
    pairwise form by ranking on the DOUBLE quotient D_l/n_l² with the
    label as tie-break — the quotient of exact integers is correctly
    rounded, identical in any IEEE engine, so the rank is engine-
    stable without a round() guard.

    Scale: one component explode, label sums are a 64·|labels| table
    (broadcast), per-(vec,label) dot via a 1:|labels| fan-out join,
    argmin is a vec-partitioned window over |labels| rows. Nothing
    quadratic in the corpus.
    """
    comps = emb.select(
        F.col(id_col),
        F.col(label_col).alias("_lt"),
        F.posexplode(vec_col).alias("i", "_v"),
    ).select(
        id_col,
        "_lt",
        F.col("i").cast("int").alias("i"),
        F.floor(
            F.col("_v").cast("double") * F.lit(float(scale)) + F.lit(0.5)
        )
        .cast("long")
        .alias("q"),
    )
    comps = track(comps)
    lsums = track(
        comps.groupBy(F.col("_lt").alias("_lc"), "i").agg(
            F.sum("q").alias("s")
        )
    )
    lmeta = lsums.groupBy("_lc").agg(
        F.sum(F.col("s") * F.col("s")).alias("ss")
    ).join(
        # Vector count per label = rows at component 0 — dimension-
        # agnostic (a count/dim quotient would silently break on any
        # other embedding width).
        comps.groupBy("_lt")
        .agg(
            F.sum(F.when(F.col("i") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n")
        )
        .withColumnRenamed("_lt", "_lc"),
        "_lc",
    )
    xx = comps.groupBy(id_col, "_lt").agg(
        F.sum(F.col("q") * F.col("q")).alias("xx")
    )
    xs = (
        comps.join(F.broadcast(lsums), "i")
        .groupBy(id_col, "_lc")
        .agg(F.sum(F.col("q") * F.col("s")).alias("xs"))
    )
    scored = (
        xs.join(F.broadcast(lmeta), "_lc")
        .join(xx, id_col)
        .withColumn(
            "_d2",
            (
                F.col("n") * F.col("n") * F.col("xx")
                - F.lit(2) * F.col("n") * F.col("xs")
                + F.col("ss")
            ).cast("double")
            / (F.col("n") * F.col("n")).cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("_d2", "_lc")
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_lt").alias("label_true"), F.col("_lc").alias("label_pred"))
    )
    return (
        assigned.groupBy("label_true", "label_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
