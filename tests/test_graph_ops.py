"""Graph operators vs plain-Python models on random graphs —
the same invariant style as the reference's ScalaCheck suites."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from tensei_agent_spark.operators import graph as G


def _random_undirected(seed: int, n_nodes: int, n_edges: int):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.sample(range(n_nodes), 2)
        edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _py_pagerank(sym_edges, iters=3, damping=0.85):
    nodes = sorted({s for s, _ in sym_edges})
    deg = {v: 0 for v in nodes}
    for s, _ in sym_edges:
        deg[s] += 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        s = {v: 0.0 for v in nodes}
        for a, b in sym_edges:
            s[b] += r[a] / deg[a]
        r = {v: (1 - damping) / n + damping * s[v] for v in nodes}
    return r


def _py_triangles(oriented_edges):
    es = set(oriented_edges)
    nodes = sorted({v for e in oriented_edges for v in e})
    count = {v: 0 for v in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            count[a] += 1
            count[b] += 1
            count[c] += 1
    return {v: c for v, c in count.items() if c > 0}


@pytest.mark.parametrize("seed", [7, 21, 1234])
def test_pagerank_matches_python_model(spark, seed):
    und = _random_undirected(seed, n_nodes=24, n_edges=60)
    sym = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, ["src", "dst"])
    got = {
        r["node"]: r["r"]
        for r in G.pagerank(df, iters=3, contrib_scale=12).collect()
    }
    want = _py_pagerank(sym)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # ranks form a distribution (symmetrized graph has no dangling mass)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


@pytest.mark.parametrize("seed", [3, 99])
def test_triangle_counts_match_python_model(spark, seed):
    und = _random_undirected(seed, n_nodes=18, n_edges=50)
    df = spark.createDataFrame(und, ["src", "dst"])
    got = {
        r["node"]: r["n_triangles"] for r in G.triangle_counts(df).collect()
    }
    assert got == _py_triangles(und)


def test_triangle_counts_complete_graph(spark):
    """K5: every node sits in C(4,2) = 6 triangles."""
    und = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(und, ["src", "dst"])
    got = {r["node"]: r["n_triangles"] for r in G.triangle_counts(df).collect()}
    assert got == {v: 6 for v in range(5)}


def test_pagerank_star_graph_ranks_center_highest(spark):
    star = [(0, i) for i in range(1, 9)]
    sym = star + [(b, a) for a, b in star]
    df = spark.createDataFrame(sym, ["src", "dst"])
    got = {r["node"]: r["r"] for r in G.pagerank(df, iters=5).collect()}
    assert got[0] == max(got.values())
    leaf_ranks = [got[v] for v in range(1, 9)]
    assert max(leaf_ranks) == pytest.approx(min(leaf_ranks), abs=1e-12)


# --- min_label_components / bfs_hops --------------------------------------


def _sym(spark, pairs):
    from pyspark.sql import functions as F

    e = spark.createDataFrame(pairs, "src bigint, dst bigint")
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_min_label_two_components_converged(spark):
    from tensei_agent_spark.operators.graph import min_label_components

    # components {1,2,3} and {10,11}; diameter 2 → 4 rounds converge
    e = _sym(spark, [(1, 2), (2, 3), (10, 11)])
    got = {r["node"]: r["lbl"] for r in min_label_components(e, rounds=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_min_label_bounded_rounds_on_a_path(spark):
    from tensei_agent_spark.operators.graph import min_label_components

    # path 1-2-3-4-5-6: after ONE round each node sees only neighbors
    e = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    got = {r["node"]: r["lbl"] for r in min_label_components(e, rounds=1).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5}


def test_min_label_isolated_node_via_explicit_nodes(spark):
    from tensei_agent_spark.operators.graph import min_label_components

    e = _sym(spark, [(1, 2)])
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "node bigint")
    got = {
        r["node"]: r["lbl"]
        for r in min_label_components(e, rounds=2, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 99: 99}


def test_bfs_hops_min_distance_and_bound(spark):
    from tensei_agent_spark.operators.graph import bfs_hops

    # 1-2-3-4-5 path plus shortcut 1-4: node 4 is hop 1, node 5 hop 2;
    # with max_hops=1 node 3 is unreachable
    e = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)])
    seeds = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    got1 = {r["node"]: r["hops"] for r in bfs_hops(e, seeds, max_hops=1).collect()}
    assert got1 == {1: 0, 2: 1, 4: 1}


def test_bfs_hops_multi_seed(spark):
    from tensei_agent_spark.operators.graph import bfs_hops

    e = _sym(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(1,), (4,)], "node bigint")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, seeds, max_hops=1).collect()}
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}
