"""Results must be invariant to the physical partitioning.

A query whose output changes with `spark.sql.shuffle.partitions` is
leaking execution order into its results (nondeterministic ranks,
float-sum ordering, first/last without ordering) — correct at sf0.001
by luck, wrong on a cluster. Run a representative slice of the
registry at a hostile low partition count and compare against the
default-width run."""

from __future__ import annotations

import pytest

from tensei_agent_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# One query per sensitive shape: window ranks, decimal aggregation,
# iterative graph, LSH bucketing, island keys, top-k with ties.
SAMPLE = [
    "q1_pricing_summary",
    "stratified_sample_exact",
    "part_copurchase_pagerank",
    "dedup_minhash_lsh",
    "user_longest_streak",
    "part_single_source_risk",
    "revenue_concentration_trend",
    # round-3 shapes: range-partitioned global rank, MG summaries whose
    # per-partition content DOES change with layout (only the final
    # exact counts may not), star-CC fixpoint, fixed-order float sums
    "corpus_shuffle_shards",
    "heavy_hitter_words",
    "dedup_components",
    "bm25_topk",
    # distributed exclusive prefix-max over range partitions
    "part_skyline",
    # OPH bit screen + prefix filter: all hash-derived, layout-free
    "dedup_ngram_jaccard_fast",
    # round-4 shapes: disjoint blocking passes + EM on float-summed
    # pattern counts (sorted before the fold — THE layout hazard),
    # distributed-rank neighbor join, per-key recurrence fold over a
    # collect_list whose gather order varies with layout, A-ES top-k
    "record_linkage_em",
    "linkage_sorted_neighborhood",
    "revenue_holt_forecast",
    "weighted_sample_docs",
    "view_purchase_overlap_windows",
    # round-5 shapes: lag-join decimal moments (float combination from
    # exact sums), per-key EWMA fold over layout-varying gather order,
    # bounded-round label propagation / BFS (min semantics must erase
    # layout), driver-side BPE over a distributed word count, bigram
    # lift with scalar broadcasts, cross-series lag join
    "acf_daily_revenue",
    "ewma_daily_anomalies",
    "graph_components_census",
    "graph_bfs_hops",
    "bpe_vocab_merges",
    "pmi_collocations",
    "ccf_view_purchase",
    "fd_discovery_audit",
]


def _rows(spark, name):
    df = REGISTRY[name].build(spark, SF)
    cols = sorted(df.columns)
    return sorted(
        [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    )


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_under_partition_count(spark, name):
    baseline = _rows(spark, name)
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert narrow == baseline
