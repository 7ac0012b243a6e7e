"""Recall of the approximate ANN paths against the exact baseline.

ivf_topk and lsh_bucket_topk are rows-only in the oracle gate (their
output is approximate by construction), so these tests are what pins
their quality: deterministic seeds → fixed recall, asserted as a floor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.catalog import load
from tensei_agent_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucket_topk,
)

SF = "/root/testdata/sf0.001"
K = 10


def _topk_sets(df):
    sets: dict[int, set[int]] = {}
    for r in df.collect():
        sets.setdefault(r["query_id"], set()).add(r["cand_id"])
    return sets


def _recall(approx, exact):
    hits = total = 0
    for q, cands in exact.items():
        total += len(cands)
        hits += len(cands & approx.get(q, set()))
    return hits / total


def test_ivf_recall_floor(spark):
    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_topk(emb, q, k=K, arith="double"))
    approx = _topk_sets(ivf_topk(emb, q, k=K, n_cells=8, n_probe=4))
    r = _recall(approx, exact)
    assert r >= 0.7, f"IVF recall {r:.2f} below floor"


def test_lsh_recall_floor_and_table_scaling(spark):
    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_topk(emb, q, k=K, arith="double"))
    r1 = _recall(_topk_sets(lsh_bucket_topk(emb, q, k=K, n_planes=4)), exact)
    r8 = _recall(
        _topk_sets(lsh_bucket_topk(emb, q, k=K, n_planes=4, n_tables=8)), exact
    )
    # more tables → union of candidates grows → recall must not drop
    assert r8 >= r1
    assert r8 >= 0.5, f"8-table LSH recall {r8:.2f} below floor"


def test_ivf_probe_widening_monotone(spark):
    """More probes → recall must not drop (the scale/quality dial)."""
    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_topk(emb, q, k=K, arith="double"))
    r2 = _recall(_topk_sets(ivf_topk(emb, q, k=K, n_cells=8, n_probe=2)), exact)
    r8 = _recall(_topk_sets(ivf_topk(emb, q, k=K, n_cells=8, n_probe=8)), exact)
    assert r8 >= r2
    assert r8 >= 0.95  # probing every cell ≈ brute force
