from __future__ import annotations

import numpy as np

from tensei_agent_spark.catalog import load
from tensei_agent_spark.operators.coreset import k_center_greedy

SF = "/root/testdata/sf0.001"


def _py_kcenter(ids, q, k):
    """Pure-python reference of the deterministic traversal."""
    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    q = q[order]
    sel = [0]
    out = [(0, int(ids[0]), 0)]
    mind2 = ((q - q[0]) ** 2).sum(axis=1)
    for r in range(1, k):
        cand = [i for i in range(len(ids)) if i not in sel]
        far = max(cand, key=lambda i: (mind2[i], -ids[i]))
        out.append((r, int(ids[far]), int(mind2[far])))
        sel.append(far)
        mind2 = np.minimum(mind2, ((q - q[far]) ** 2).sum(axis=1))
    return out


def test_kcenter_matches_python_model(spark):
    emb = load(spark, SF, "embeddings")
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    q = np.floor(
        np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
        * 10_000
        + 0.5
    ).astype(np.int64)
    want = _py_kcenter(ids, q, 6)
    got = [
        (r["center_rank"], r["vec_id"], r["radius2"])
        for r in k_center_greedy(emb, k=6).orderBy("center_rank").collect()
    ]
    assert got == want


def test_kcenter_radius_monotone_and_diverse(spark):
    emb = load(spark, SF, "embeddings")
    got = k_center_greedy(emb, k=8).orderBy("center_rank").collect()
    assert len(got) == 8
    radii = [r["radius2"] for r in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert len({r["vec_id"] for r in got}) == 8
    # Determinism across runs.
    again = k_center_greedy(emb, k=8).orderBy("center_rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_kcenter_tiny_corpus_stops_early(spark):
    emb = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [1.0] + [0.0] * 63)],
        "vec_id long, embedding array<float>",
    )
    got = k_center_greedy(emb, k=5).collect()
    assert len(got) == 2


def test_kcenter_accepts_string_ids(spark):
    emb = spark.createDataFrame(
        [("a", [0.0] * 64), ("b", [1.0] + [0.0] * 63), ("c", [0.0, 1.0] + [0.0] * 62)],
        "vec_id string, embedding array<float>",
    )
    got = k_center_greedy(emb, k=3).orderBy("center_rank").collect()
    assert [r["vec_id"] for r in got] == ["a", "b", "c"]
