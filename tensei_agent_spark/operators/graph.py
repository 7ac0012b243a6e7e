"""Distributed graph algorithms over edge-list DataFrames.

The reference has no graph surface; these are beyond-reference
operators for relationship-shaped training data (co-occurrence graphs,
link graphs, entity graphs). Design rules shared by every function:

- the edge list is the big thing: built once, persisted when any
  iteration or multi-reference plan would replay its lineage;
- per-node state (ranks, degrees, counts) is node-sized — orders of
  magnitude smaller than edges — so it rides hash joins keyed by the
  edge endpoints and broadcasts when tiny;
- no driver materialization, no cross products: every step is an
  equi-join or a hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..cache import track


def degrees(edges: DataFrame) -> DataFrame:
    """Out-degree per node of a directed edge list (src, dst) →
    (src, d). For an undirected graph pass the symmetrized edge list.
    """
    return edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    contrib_scale: int | None = 12,
) -> DataFrame:
    """PageRank by power iteration over a directed edge list
    (src, dst); nodes = every src (pass a symmetrized list for
    undirected graphs, which also guarantees no dangling nodes).

    Each iteration is one src-keyed equi-join (edges × node-sized rank
    table) plus one dst-keyed hash aggregate; the 1-row node count
    broadcasts. ``edges`` and the degree table are persisted here
    because every iteration's lineage would otherwise replay the edge
    build (measured 2x end-to-end with 3 iterations at sf0.1); for
    long runs, checkpoint every few iterations to truncate lineage.

    ``contrib_scale``: when set, each contribution r/deg is rounded to
    that many decimals and summed as an exact DECIMAL — summation-order
    independent, so results are bit-identical across engines and runs
    (the property the DuckDB oracle checks). Pass ``None`` for plain
    double arithmetic (cheaper; last-bit nondeterminism under shuffle
    ordering is acceptable in production ranking).

    Nodes with zero in-degree keep their teleport mass (1-d)/n each
    iteration: per-iteration sums are left-joined back onto the full
    node set with s=0, the standard formulation — not only dst-keyed
    survivors.

    Persisted intermediates are registered with ``cache.track`` so a
    registry sweep releases them before the next query builds.

    Output: (node, r) — ranks sum to ~1 over nodes.
    """
    edges = track(edges.select("src", "dst"))
    deg = track(degrees(edges))
    nodes = track(deg.select(F.col("src").alias("node")))
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = nodes.join(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(iters):
        contrib = F.col("r") / F.col("d")
        if contrib_scale is not None:
            contrib = F.round(contrib, contrib_scale).cast(
                f"decimal({contrib_scale + 18},{contrib_scale})"
            )
        sums = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(contrib).alias("s"))
        )
        # keep in-degree-0 nodes: left join the node set, missing sums → 0
        sums = nodes.join(sums, "node", "left")
        ranks = sums.join(F.broadcast(n)).select(
            "node",
            (
                F.lit(1.0 - damping) / F.col("n")
                + F.lit(damping) * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle membership counts of an undirected simple
    graph given as oriented edges (src < dst, each undirected edge
    once).

    Orientation makes every triangle materialize exactly once as
    (a<b<c): a wedge equi-join (e1.dst = e2.src) builds a-b-c paths
    and a closing equi-join checks the a-c edge, so the whole plan is
    two hash joins + one aggregate — no cross product anywhere. Wedge
    fan-out is bounded by out-degree under the orientation; at
    production scale orient by (degree, id) instead of raw id so hub
    nodes land on the low-fan-out side (same plan, one extra degree
    join). Nodes in no triangle are absent from the output.

    Output: (node, n_triangles).
    """
    e = edges.select("src", "dst")
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    members = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
