"""Diverse subset selection: greedy k-center coreset over embeddings.

The farthest-point-first traversal (Gonzalez 1985; the "k-Center-Greedy"
of Sener & Savarese's active-learning coreset paper, ICLR'18): grow the
selected set by repeatedly adding the point FARTHEST from everything
chosen so far. The result 2-approximates the optimal k-center cover —
the standard recipe for picking a small, diverse, representative subset
of a huge embedding corpus (dedup-aware seed sets, eval panels,
annotation batches).

Determinism: distances are computed on the engine-portable integer
quantization (floor(v·scale + 0.5)), so every squared distance is an
exact BIGINT; ties in the argmax break on the smaller vec_id; the seed
is the smallest vec_id. Same corpus → same subset, anywhere.

Scale shape: the per-point state is ONE running column (min squared
distance to the selected set), updated per round by a broadcast join
against the single new center — a pure map — followed by a 1-row
TakeOrdered argmax. k rounds → k map passes + k tiny reduces; the
corpus never shuffles. localCheckpoint every few rounds cuts the
linear-growth lineage exactly like the other iterative operators
(graph.pagerank, clustering.kmeans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import track


def _quantize(vec_col: str, scale: int):
    return F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(float(scale)) + F.lit(0.5))
        .cast("long"),
    )


def k_center_greedy(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10_000,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Select k diverse points by farthest-point-first traversal.

    Returns a (center_rank, id, radius2) DataFrame: the selection
    order, the chosen id, and the exact integer squared distance from
    the chosen point to the previously-selected set (radius2 of rank r
    upper-bounds the cover radius of the first r centers; it is
    non-increasing — asserted in tests). radius2 of the seed is 0.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = emb.sparkSession
    base = track(
        emb.select(F.col(id_col).alias("_id"), _quantize(vec_col, scale).alias("_q"))
    )
    seed = base.orderBy("_id").limit(1).collect()
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("center_rank", IntegerType()),
            StructField(id_col, emb.schema[id_col].dataType),
            StructField("radius2", LongType()),
        ]
    )
    if not seed:
        return spark.createDataFrame([], out_schema)
    selected: list[tuple[int, int, int]] = [(0, seed[0]["_id"], 0)]
    center_vec = seed[0]["_q"]

    def d2_to(vec: list[int]):
        lit_vec = F.array(*[F.lit(int(x)) for x in vec])
        return F.aggregate(
            F.zip_with(F.col("_q"), lit_vec, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    state = base.withColumn("_mind2", d2_to(center_vec))
    for r in range(1, int(k)):
        if r % int(checkpoint_every) == 0:
            state = state.localCheckpoint(eager=True)
        far = (
            state.filter(
                ~F.col("_id").isin([s[1] for s in selected])
            )
            .orderBy(F.col("_mind2").desc(), F.col("_id"))
            .limit(1)
            .collect()
        )
        if not far:
            break
        selected.append((r, far[0]["_id"], far[0]["_mind2"]))
        center_vec = far[0]["_q"]
        # Fold the new center into the running min-distance column for
        # the next round's argmax.
        state = state.withColumn(
            "_mind2", F.least(F.col("_mind2"), d2_to(center_vec))
        )
    return spark.createDataFrame(
        [(r, i, d) for r, i, d in selected], out_schema
    )
