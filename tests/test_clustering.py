"""Distributed k-means (operators/clustering): Lloyd's invariants,
determinism, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.operators.clustering import (
    assign_clusters,
    cluster_profile,
    kmeans,
)


def _toy(spark):
    # two tight blobs around (0,0) and (10,10)
    rows = [
        (0, [0.0, 0.1]), (1, [0.1, 0.0]), (2, [-0.1, 0.1]),
        (3, [10.0, 10.1]), (4, [10.1, 9.9]), (5, [9.9, 10.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_recovers_blobs(spark):
    emb = _toy(spark)
    assigned, centroids, sse = kmeans(emb, k=2, max_iter=10)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]
    # converged centroids are the blob means
    blob_a = sorted(round(x, 6) for x in centroids[got[0]])
    assert blob_a == [0.0, round(0.2 / 3, 6)]


def test_kmeans_sse_monotone_and_deterministic(spark):
    from tensei_agent_spark.catalog import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    a1, c1, sse1 = kmeans(emb, k=4, dim=64, max_iter=5)
    # Lloyd's monotonicity: SSE never increases
    assert all(b <= a + 1e-9 for a, b in zip(sse1, sse1[1:]))
    # deterministic: a rerun yields identical centroids and assignment
    a2, c2, sse2 = kmeans(emb, k=4, dim=64, max_iter=5)
    assert c1 == c2 and sse1 == sse2
    s1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    s2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert s1 == s2


def test_assignment_is_map_side(spark):
    """The nearest-centroid stage must not shuffle: its plan contains
    no Exchange (centroids ride as literals)."""
    emb = _toy(spark)
    plan = assign_clusters(
        emb, [[0.0, 0.0], [10.0, 10.0]]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_cluster_keeps_centroid(spark):
    """k > distinct points: surplus clusters keep their init centroid
    and report zero members in the profile."""
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, centroids, _ = kmeans(emb, k=3, max_iter=4)
    prof = {r["cluster"]: r["n"] for r in cluster_profile(assigned).collect()}
    # point 1 duplicates point 0's position: cluster 1 ends up empty
    # (first-wins tie-break sends both to cluster 0)
    assert prof.get(0) == 2 and prof.get(2) == 1 and 1 not in prof
    assert centroids[1] == [0.0, 0.0]


def test_dlit_roundtrips_floats_exactly(spark):
    """lits.dlit must yield the IDENTICAL doubles to per-scalar F.lit —
    repr(float) round-trips through the SQL parser's Double.parseDouble
    bit-exactly, including extremes and negative zero."""
    import math
    import random
    import struct

    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.lits import dlit

    rnd = random.Random(7)
    vals = [0.0, -0.0, 1e-308, -1e308, 2**-52, 1 / 3, math.pi]
    for _ in range(40):
        # random bit patterns, skipping non-finite
        x = struct.unpack("<d", struct.pack("<q", rnd.getrandbits(63)))[0]
        if math.isfinite(x):
            vals.append(x)
    row = (
        spark.range(1)
        .select(
            dlit(vals).alias("a"),
            F.array(*[F.lit(v) for v in vals]).alias("b"),
        )
        .collect()[0]
    )
    got = [struct.pack("<d", v) for v in row["a"]]
    want = [struct.pack("<d", v) for v in row["b"]]
    assert got == want

    import pytest

    with pytest.raises(ValueError):
        dlit([float("nan")])


def test_nearest_centroid_confusion_on_separable_labels(spark):
    from tensei_agent_spark.operators.clustering import (
        nearest_centroid_confusion,
    )

    # Two tight, well-separated label clouds: every vector must be
    # assigned its own label's centroid.
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + 0.001 * i] + [0.0] * 63, 0))
    for i in range(10, 20):
        rows.append((i, [0.0, 1.0 + 0.001 * i] + [0.0] * 62, 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r["label_true"], r["label_pred"]): r["n"]
        for r in nearest_centroid_confusion(emb).collect()
    }
    assert got == {(0, 0): 10, (1, 1): 10}
