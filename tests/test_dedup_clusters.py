"""Connected-component clustering: large-star/small-star vs union-find.

The star algorithm (operators/dedup.connected_components_star) is the
at-scale path behind connected_components; these tests pin its
equivalence to the driver union-find on the shapes that break weaker
algorithms — deep chains (min-label propagation needs O(diameter)
rounds there), dense blobs, and singleton/self-pair edge cases.
"""

import random

from tensei_agent_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _union_find(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in parent}


def _star(spark, edges):
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {
        r["node"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }


def test_star_deep_chain(spark):
    # 0-1-2-...-199: diameter 199. Label propagation needs ~200 rounds;
    # the star alternation collapses it in O(log² n).
    edges = [(i, i + 1) for i in range(199)]
    random.Random(7).shuffle(edges)
    got = _star(spark, edges)
    assert got == {i: 0 for i in range(200)}


def test_star_matches_union_find_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        m = rng.randrange(40, 160)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find(edges)
        got = _star(spark, edges)
        assert got == want, f"trial {trial} diverged"


def test_star_self_pairs_and_duplicates(spark):
    # self-pairs become singleton components; duplicate/reversed edges
    # are harmless.
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (9, 9)]
    got = _star(spark, edges)
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_star_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(pairs).count() == 0


def test_connected_components_large_path_is_star(spark):
    # driver_threshold=0 forces the distributed path; equivalence with
    # the union-find fast path on a chain + triangle + pair mix.
    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21),
             (21, 22), (20, 22)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist == _union_find(edges)


def test_incremental_components_match_full_recompute(spark):
    import random

    from tensei_agent_spark.operators.dedup import (
        connected_components_star,
        incremental_components,
    )

    rng = random.Random(11)
    nodes = list(range(1, 120))
    edges = []
    for _ in range(150):
        a, b = rng.sample(nodes, 2)
        edges.append((min(a, b), max(a, b)))
    edges = sorted(set(edges))
    old, new = edges[:100], edges[100:]

    old_df = spark.createDataFrame(old, "id_a long, id_b long")
    new_df = spark.createDataFrame(new, "id_a long, id_b long")
    all_df = spark.createDataFrame(edges, "id_a long, id_b long")

    prev = connected_components_star(old_df)
    # Isolated-so-far nodes appear once new edges touch them; seed the
    # prev table with edge endpoints only (the realistic ledger).
    got = {
        (r["node"], r["lbl"])
        for r in incremental_components(prev, new_df).collect()
    }
    want = {
        (r["node"], r["component"])
        for r in connected_components_star(all_df).collect()
    }
    # Full recompute covers exactly the nodes with any edge; the
    # incremental table covers the same set.
    assert got == want


def test_incremental_components_new_nodes_and_merges(spark):
    from tensei_agent_spark.operators.dedup import incremental_components

    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10)], "node long, lbl long"
    )
    # New edge bridges the two old components AND introduces node 50.
    new = spark.createDataFrame(
        [(2, 10), (50, 11)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["lbl"]
        for r in incremental_components(prev, new).collect()
    }
    assert got == {1: 1, 2: 1, 10: 1, 11: 1, 50: 1}
