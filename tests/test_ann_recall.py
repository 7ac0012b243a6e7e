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


def test_lsh_multiprobe_monotone_and_exhaustive(spark):
    """Query-directed multi-probe (VERDICT r10 #5): probing more
    buckets per table must never drop recall, and probing ALL
    2^n_planes buckets makes every corpus vector a candidate — recall
    exactly 1.0 (the algebraic ceiling that pins probe-id generation:
    one duplicated/malformed probe mask would break exhaustiveness)."""
    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_topk(emb, q, k=K, arith="double"))
    r1 = _recall(_topk_sets(lsh_bucket_topk(emb, q, k=K, n_planes=4)), exact)
    r4 = _recall(
        _topk_sets(lsh_bucket_topk(emb, q, k=K, n_planes=4, n_probes=4)), exact
    )
    r_all = _recall(
        _topk_sets(lsh_bucket_topk(emb, q, k=K, n_planes=4, n_probes=16)), exact
    )
    assert r1 <= r4 <= r_all
    assert r_all == 1.0, f"exhaustive probing must equal brute force, got {r_all:.2f}"


def test_lsh_probe_buckets_shape(spark):
    """Probe-id invariants on the buckets array: n_tables*n_probes
    entries, the exact bucket leads each table's block, every probe
    stays inside its table's tag range (flips only low n_planes bits),
    and probes within a table are distinct."""
    from tensei_agent_spark.operators.similarity import random_hyperplane_buckets

    emb = load(spark, SF, "embeddings").limit(20)
    n_planes, n_tables, n_probes = 6, 3, 8
    rows = random_hyperplane_buckets(
        emb, n_planes=n_planes, n_tables=n_tables, n_probes=n_probes
    ).select("bucket", "buckets").collect()
    width = 1 << n_planes
    for r in rows:
        bs = r["buckets"]
        assert len(bs) == n_tables * n_probes
        assert bs[0] == r["bucket"]  # back-compat column = table 0 exact
        for t in range(n_tables):
            block = bs[t * n_probes : (t + 1) * n_probes]
            assert len(set(block)) == n_probes  # distinct probes
            assert all(t * width <= b < (t + 1) * width for b in block)


def test_ivf_probe_widening_monotone(spark):
    """More probes → recall must not drop (the scale/quality dial)."""
    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_topk(emb, q, k=K, arith="double"))
    r2 = _recall(_topk_sets(ivf_topk(emb, q, k=K, n_cells=8, n_probe=2)), exact)
    r8 = _recall(_topk_sets(ivf_topk(emb, q, k=K, n_cells=8, n_probe=8)), exact)
    assert r8 >= r2
    assert r8 >= 0.95  # probing every cell ≈ brute force


def test_int8_topk_recall_vs_exact(spark):
    from tensei_agent_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    exact = REGISTRY["ann_cosine_topk"].build(spark, sf).collect()
    quant = REGISTRY["ann_int8_topk"].build(spark, sf).collect()
    want = {}
    got = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["cand_id"])
    for r in quant:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    assert set(got) == set(want)
    recalls = [
        len(want[q] & got[q]) / len(want[q]) for q in want
    ]
    assert sum(recalls) / len(recalls) >= 0.85, recalls


def test_quantize_int8_bounds_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])], ["vec_id", "embedding"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[1]["qvec"] == [64, -127, 32]  # round(x/ (1.0/127))
    assert abs(rows[1]["scale"] - 1.0 / 127) < 1e-12
    assert rows[2]["qvec"] == [0, 0, 0] and rows[2]["scale"] == 0.0


def test_blocked_pairs_fast_agrees_with_exact(spark):
    from tensei_agent_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in REGISTRY["embedding_near_dup"].build(spark, sf).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in REGISTRY["embedding_near_dup_fast"].build(spark, sf).collect()
    }
    # membership may differ only for pairs sitting on the threshold
    for p in set(exact) ^ set(fast):
        c = exact.get(p, fast.get(p))
        assert abs(c - 0.3) < 1e-6, (p, c)
    # where both agree on membership, cosines match to the rounding grain
    for p in set(exact) & set(fast):
        assert abs(exact[p] - fast[p]) < 2e-9, p


def test_pq_encode_shape_and_determinism(spark):
    """Codes are m ints in [0, ksub); encoding twice is identical
    (deterministic codebooks + first-wins argmin)."""
    from tensei_agent_spark.operators import pq

    emb = load(spark, SF, "embeddings")
    cbs = pq.pq_train(emb, m=8, ksub=16, dim=64, max_iter=2)
    a = {r["vec_id"]: r["codes"] for r in pq.pq_encode(emb, cbs).collect()}
    b = {r["vec_id"]: r["codes"] for r in pq.pq_encode(emb, cbs).collect()}
    assert a == b
    for codes in a.values():
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)


def test_pq_adc_score_matches_reconstruction(spark):
    """The ADC lookup-table score must equal dot(q, reconstruct(codes))
    computed directly from the codebooks — the LUT is an exact
    factorization of the quantized dot product, not an approximation
    of it (the approximation lives in the quantization alone)."""
    import math

    from tensei_agent_spark.operators import pq

    emb = load(spark, SF, "embeddings")
    cbs = pq.pq_train(emb, m=8, ksub=16, dim=64, max_iter=2)
    codes = {r["vec_id"]: r["codes"] for r in pq.pq_encode(emb, cbs).collect()}
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    qv = [float(x) for x in qrow["embedding"]]
    nrm = math.sqrt(sum(x * x for x in qv))
    qv = [x / nrm for x in qv]
    scored = {
        r["cand_id"]: r["score"]
        for r in pq.pq_adc_topk(
            emb, emb.filter(F.col("vec_id") == 0), cbs, k=5
        ).collect()
    }
    for cand_id, score in scored.items():
        recon = [x for s in range(8) for x in cbs[s][codes[cand_id][s]]]
        want = sum(a * b for a, b in zip(qv, recon))
        assert abs(score - want) < 1e-6, (cand_id, score, want)


def test_ivf_pq_recall_floor_and_refine_monotone(spark):
    """IVF-PQ with exact refine: recall floor at the registered config,
    and a larger refine shortlist (a superset) never lowers recall."""
    from tensei_agent_spark.operators import pq

    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(brute_force_topk(emb, q, k=K, arith="double"))
    r20 = _recall(
        _topk_sets(pq.ivf_pq_topk(emb, q, k=K, n_cells=8, n_probe=4, refine=20)),
        exact,
    )
    r2 = _recall(
        _topk_sets(pq.ivf_pq_topk(emb, q, k=K, n_cells=8, n_probe=4, refine=2)),
        exact,
    )
    assert r20 >= r2
    assert r20 >= 0.85, f"IVF-PQ recall {r20:.2f} below floor"


def test_pq_adc_refine_exact_scores_and_recall_lift(spark):
    """pq_adc_topk with refine>0 (FAISS IndexRefineFlat-over-IndexPQ
    pairing): reported scores are EXACT cosines (not ADC estimates),
    and recall never drops below the pure-ADC path's — the refine
    shortlist is a superset re-ranked by the true metric. Registered
    config (refine=20) measured recall@10 1.00/0.98 at sf0.01/sf0.1
    (tools/verify_sweep.py floors 0.95/0.90); pure ADC was 0.54/0.44."""
    from tensei_agent_spark.operators import pq

    emb = load(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact_df = brute_force_topk(emb, q, k=K, arith="double")
    exact = _topk_sets(exact_df)
    cbs = pq.pq_train(emb, m=16, ksub=16, dim=64, max_iter=5)
    refined = pq.pq_adc_topk(emb, q, cbs, k=K, refine=20)
    pure = pq.pq_adc_topk(emb, q, cbs, k=K)
    r_ref = _recall(_topk_sets(refined), exact)
    r_pure = _recall(_topk_sets(pure), exact)
    assert r_ref >= r_pure, (r_ref, r_pure)
    # Refined scores are true cosines: wherever (query, cand) also
    # appears in the brute-force top-k, the scores agree to 1e-9
    # (unit-normalize-then-dot vs dot-then-divide can differ by 1 ULP
    # pre-round; ADC distortion is ~1e-2, so this pins "exact metric").
    truth = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in exact_df.collect()
    }
    hits = 0
    for r in refined.collect():
        key = (r["query_id"], r["cand_id"])
        if key in truth:
            hits += 1
            assert abs(r["score"] - truth[key]) <= 1e-9, (
                key, r["score"], truth[key])
    assert hits > 0


def test_mutual_nn_requires_reciprocity(spark):
    from tensei_agent_spark.operators.similarity import brute_force_topk

    # 0 and 1 are each other's nearest; 2 points at 0 but 0 does not
    # point back -> only (0, 1) is mutual.
    rows = [
        (0, [1.0, 0.0, 0.0] + [0.0] * 61),
        (1, [0.99, 0.14, 0.0] + [0.0] * 61),
        (2, [0.9, -0.43, 0.0] + [0.0] * 61),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    nn = brute_force_topk(emb, emb, k=1).select("query_id", "cand_id")
    got = {(r["query_id"], r["cand_id"]) for r in nn.collect()}
    assert got == {(0, 1), (1, 0), (2, 0)}
    mutual = {
        (a, b)
        for a, b in got
        if (b, a) in got and a < b
    }
    assert mutual == {(0, 1)}


def test_lsh_probe_sets_prefix_nested_across_budgets(spark):
    """The probe pool must not track n_probes (code review r11): at
    n_planes=7 the old pool jumped 6 -> 7 between 64 and 65 probes,
    re-ranking the candidate universe so the 65-probe set was NOT a
    superset of the 64-probe set — recall could drop as the dial went
    up. With the fixed pool, every budget's probe list is a PREFIX of
    the next one's, which implies the monotone-recall contract for
    all n_probes ≤ 2^pool."""
    from tensei_agent_spark.operators.similarity import (
        random_hyperplane_buckets,
    )

    emb = load(spark, SF, "embeddings").limit(8)
    per_budget = {}
    for n_probes in (8, 64, 65):
        rows = random_hyperplane_buckets(
            emb, n_planes=7, n_tables=1, n_probes=n_probes
        ).select("vec_id", "buckets").collect()
        per_budget[n_probes] = {r["vec_id"]: r["buckets"] for r in rows}
    for vid, small in per_budget[8].items():
        assert per_budget[64][vid][:8] == small
        assert per_budget[65][vid][:64] == per_budget[64][vid]
