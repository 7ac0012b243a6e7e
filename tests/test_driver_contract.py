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
        "dedup_minhash_lsh_fast",     # xxhash64 twin
        "embedding_near_dup_fast",    # FP ULP twin
    }
    assert rows_only <= allowed, rows_only - allowed
