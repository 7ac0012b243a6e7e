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


def min_label_components(
    edges_sym: DataFrame, rounds: int = 4, nodes: DataFrame | None = None
) -> DataFrame:
    """Synchronous min-label propagation over a SYMMETRIC edge list
    (src, dst): after R rounds every node holds the smallest node id
    within R hops — the bounded-round core of connected components /
    label-propagation community seeding (and, run to fixpoint, exactly
    connected components).

    lbl_{r+1}(v) = min(lbl_r(v), min over in-neighbors u of lbl_r(u)).

    Per round: ONE src-keyed join (label table is node-sized — orders
    of magnitude below the edge list, broadcastable at scale) and one
    map-side-combined min aggregate. The edge list is persisted once
    and never re-shuffled; a fixed round count keeps the program
    oracle-expressible as unrolled CTEs. For unbounded components use
    operators/dedup.connected_components (large-star/small-star),
    which converges in O(log d) rounds; this bounded variant is the
    cheap R-hop approximation plus the exact per-round semantics.
    ``nodes`` defaults to the distinct src side (symmetric edges list
    every node as src); isolated nodes can be unioned in by passing an
    explicit node frame with a ``node`` column.
    """
    e = track(edges_sym.select("src", "dst"))
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).distinct()
    lbl = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(rounds):
        contrib = e.join(lbl, e["src"] == lbl["node"]).select(
            F.col("dst").alias("node"), "lbl"
        )
        lbl = (
            contrib.unionAll(lbl.select("node", "lbl"))
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
    return lbl


def bfs_hops(
    edges_sym: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Breadth-first hop distance from a seed set, bounded at
    ``max_hops``: returns (node, hops) for every node reachable within
    the bound (min-hop semantics — a node reached at hop 2 and hop 3
    reports 2). ``seeds`` is a one-column ``node`` frame.

    Same shape discipline as :func:`min_label_components`: per round
    one equi-join of the (reached-set-sized) frontier table against
    the persisted edge list plus a min aggregate; no driver loops over
    data, only over the fixed hop count. At scale the reached set
    stays a small fraction of the corpus for small bounds, so the join
    broadcasts; for full single-source shortest paths you'd iterate
    with delta frontiers and checkpointing instead.
    """
    e = track(edges_sym.select("src", "dst"))
    reached = seeds.select("node", F.lit(0).alias("hops"))
    for _ in range(max_hops):
        nxt = e.join(reached, e["src"] == reached["node"]).select(
            F.col("dst").alias("node"), (F.col("hops") + F.lit(1)).alias("hops")
        )
        reached = (
            nxt.unionAll(reached.select("node", "hops"))
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
    return reached
