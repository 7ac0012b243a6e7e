"""The driver-facing surface of __spark_entry__ must stay stable:
entry() smoke-runs, every oracle key maps to a query, and names obey
the column-alias parity rule the hash compare depends on."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    # flagship is the Q1 shape — stable column contract
    assert df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    ]


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
    # the vast majority of the surface must be oracle-checked
    assert len(osql) >= 0.9 * len(qs)


def test_rows_only_queries_are_documented_exceptions():
    """Queries without an oracle must be the known sketch/FP-variant
    set — anything new showing up here needs an oracle or an explicit
    decision."""
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    rows_only = set(qs) - set(osql)
    allowed = {
        "approx_distinct_users",      # HLL sketch
        "stats_quantiles_approx",     # KLL/GK sketch
        "ann_cosine_topk_fast",       # FP ULP twin
        "ann_lsh_topk",               # hash-bucket approximation
        "ann_ivf_topk",               # KMeans quantizer
        "ann_int8_topk",              # quantization error by design
        "dedup_ngram_jaccard_fast",   # OPH pre-screen by design
        "ann_pq_topk",                # PQ distortion by design
        "ann_ivf_pq_topk",            # approximate membership by design
        "dedup_minhash_lsh_fast",     # xxhash64 twin
        "embedding_near_dup_fast",    # FP ULP twin
        "embedding_kmeans",           # iterative, float-order-sensitive
        "sketch_distinct_rollup",     # HLL sketch merge (error bound in
                                      # tests/test_sketches.py)
        "record_linkage_em",          # EM recursion not SQL-expressible
                                      # (recovery pinned in test_linkage)
        "record_linkage_scores",      # scores derive from the EM weights
        "bpe_vocab_merges",           # iterative induction not SQL-
                                      # expressible (pinned vs naive
                                      # reference in test_bpe.py)
        "bpe_token_counts",           # segmentation applies the learned
                                      # merges (same justification)
        "embedding_pca_variance",     # driver eigh (numpy) — invariants
                                      # in test_projection.py
        "embedding_pca_project",      # float dot products of eigh output
        "dsir_select_english_like",   # libm log importance weights
                                      # (python-parity in test_dsir.py)
        "coreset_kcenter",            # iterative argmax traversal
                                      # (python-parity in test_coreset.py)
        "kll_value_quantiles",        # KLL sketch (error bound + merge
                                      # law in test_sketches.py)
        "audience_overlap_theta",     # Theta sketch set estimates
                                      # (accuracy in test_sketches.py)
        "doc_compression_ratio",      # DEFLATE not SQL-replayable
                                      # (discrimination in
                                      # test_text_quality_ops.py)
    }
    assert rows_only <= allowed, rows_only - allowed


def test_events_queries_survive_non_utc_host_session(spark, duck):
    """The driver supplies its own SparkSession; catalog.load must pin
    UTC so instant-typed event timestamps evaluate identically to the
    DuckDB oracle even if the host session was built with another
    timezone."""
    from tensei_agent_spark.catalog import TABLES
    from tensei_agent_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        q = REGISTRY["events_hourly_rollup"]
        got = q.build(spark, sf).toPandas()
        want = duck.execute(q.oracle).fetchdf()
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
        w = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
        assert g.equals(w)
        # load() pinned it back
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
