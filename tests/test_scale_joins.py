"""Scale-toolbox join tests: salting correctness, bucketed co-located
joins (shuffle-free), and the distributed row-index invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.operators.joins import (
    bucketed_table,
    with_row_index,
)
from tensei_agent_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    """Salting must not change the result set — only the distribution."""
    # skewed: 10k rows of one hot key + a tail
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    skewed = hot.unionByName(tail)
    dim = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))

    plain = skewed.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
    ).first()
    salted = salted_join(skewed, dim, ["k"], salt_src="v", n_salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
    ).first()
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the join key must sort-merge join without
    a shuffle exchange (broadcast disabled to force the SMJ path — with
    small tables the planner prefers broadcast, which is also fine)."""
    orders = spark.range(1000).select(
        F.col("id").alias("orderkey"), (F.col("id") % 7).alias("x")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("orderkey"), F.col("id").alias("item")
    )
    t1 = bucketed_table(orders, "b_orders", ["orderkey"], 8)
    t2 = bucketed_table(items, "b_items", ["orderkey"], 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = t1.join(t2, "orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:2000]}"
        )
        assert "Bucketed: true" in plan
        assert joined.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_with_row_index_dense_and_ordered(spark):
    df = spark.range(0, 10_000).select(
        (F.lit(9_999) - F.col("id")).alias("key")  # descending input
    ).repartition(16)
    out = with_row_index(df, ["key"], "rn").collect()
    pairs = sorted((r["rn"], r["key"]) for r in out)
    # dense 0..N-1 index, aligned with the requested total order
    assert [p[0] for p in pairs] == list(range(10_000))
    assert [p[1] for p in pairs] == list(range(10_000))


def test_salted_join_rejects_right_preserving(spark):
    """Replication duplicates unmatched replicated-side rows once per
    salt value — right/full joins must be rejected, not silently wrong."""
    import pytest

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(a, b, ["k"], salt_src="v", how="full")


def test_interval_overlap_join_exact_and_once(spark):
    """Bucketed overlap join must equal the theta-join result with each
    overlapping pair emitted exactly once — including pairs spanning
    many shared buckets and touching-endpoint pairs."""
    from tensei_agent_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [
            (1, 10, 0, 100),     # long: overlaps both b-intervals
            (1, 11, 500, 510),   # disjoint from everything
            (1, 12, 200, 200),   # degenerate point interval
            (2, 13, 0, 50),      # other key: must not cross keys
        ],
        "k int, id_a int, sa long, ea long",
    ).select(
        "k", "id_a",
        F.timestamp_seconds("sa").alias("sa"),
        F.timestamp_seconds("ea").alias("ea"),
    )
    b = spark.createDataFrame(
        [
            (1, 20, 90, 300),    # overlaps 10 (90..100) and contains 12
            (1, 21, 100, 100),   # touches 10 exactly at its end point
            (1, 22, 301, 400),   # disjoint
        ],
        "k int, id_b int, sb long, eb long",
    ).select(
        "k", "id_b",
        F.timestamp_seconds("sb").alias("sb"),
        F.timestamp_seconds("eb").alias("eb"),
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(
            a, b, "k", "sa", "ea", "sb", "eb", bucket="1 minute"
        ).collect()
    )
    assert got == [(10, 20), (10, 21), (12, 20)]


def test_interval_overlap_join_empty_sides(spark):
    from tensei_agent_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [], "k int, id_a int, sa timestamp, ea timestamp"
    )
    b = spark.createDataFrame(
        [], "k int, id_b int, sb timestamp, eb timestamp"
    )
    assert interval_overlap_join(a, b, "k", "sa", "ea", "sb", "eb").count() == 0


def test_bucketed_join_has_no_exchange(spark):
    """Co-bucketed tables join without ANY shuffle: the O(data)
    exchange is paid once at layout time, then every key-join is
    map-side — the core 100 TB co-location strategy."""
    from tensei_agent_spark.catalog import load
    from tensei_agent_spark.operators.maintenance import write_bucketed

    sf = "/root/testdata/sf0.001"
    write_bucketed(
        load(spark, sf, "orders"), "t_orders_b", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load(spark, sf, "lineitem"), "t_lineitem_b", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_lineitem_b").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        n = j.count()  # force execution so AQE finalizes the plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # correctness: every lineitem row finds its order
        assert n == load(spark, sf, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_aggregation_has_no_exchange(spark):
    """A groupBy on the bucket key of a bucketed table aggregates
    without a shuffle (the scan's hash partitioning satisfies the
    aggregate's distribution requirement)."""
    from tensei_agent_spark.catalog import load
    from tensei_agent_spark.operators.maintenance import write_bucketed

    sf = "/root/testdata/sf0.001"
    write_bucketed(
        load(spark, sf, "lineitem"), "t_li_agg_b", ["l_orderkey"], 8
    )
    try:
        agg = (
            spark.table("t_li_agg_b")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        agg.count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_agg_b")


def test_row_aligned_merge_collect_is_exact_at_sf01(spark):
    """Regression (r9, found by the sf0.1 strict sweep): the positional
    merge's rank and offsets branches match rows on the physical
    partition id, and before the range-shuffle persist two independent
    executions of the exchange sampled DIFFERENT partition bounds —
    collect()/toPandas() of this exact composite returned 1022 rows
    (duplicated ranks, rank 914 missing) while count() said 1000. AQE
    exchange reuse is best-effort; the persisted frame makes the
    single materialization structural. The sf0.1 inputs reproduce the
    drift deterministically (supplier's 1000 rows over 32 sampled
    range partitions); sf0.001 never tripped it."""
    import os

    from tensei_agent_spark.catalog import load as cat_load
    from tensei_agent_spark.operators.joins import row_aligned_merge

    sf = "/root/testdata/sf0.1"
    if not os.path.isdir(sf):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    cust = cat_load(spark, sf, "customer").select("c_custkey", "c_name")
    supp = cat_load(spark, sf, "supplier").select("s_suppkey", "s_name")
    out = row_aligned_merge(
        cust, supp, ["c_custkey"], ["s_suppkey"], "rn"
    )
    rows = out.collect()  # the failing path was collect, NOT count
    assert len(rows) == 1000
    rns = sorted(r["rn"] for r in rows)
    assert rns == list(range(1000)), "ranks must be dense and unique"
