"""spread_for_cpu_map: the shared CPU-parallelism helper (operators/
spread.py) — few-split inputs get repartitioned, already-shuffled
frames pass through untouched WITHOUT materializing query stages
(ADVICE r9: .rdd on a plan with exchanges runs real shuffle jobs under
AQE at graph-build time)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.operators.spread import spread_for_cpu_map


def test_spread_repartitions_few_split_scan(spark):
    df = spark.range(100).coalesce(1)
    out = spread_for_cpu_map(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_leaves_wide_frames_alone(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    out = spread_for_cpu_map(df)
    assert out is df


def test_spread_is_lazy_on_exchange_rooted_frames(spark):
    """A frame whose plan already holds an Exchange must be returned
    as-is with ZERO jobs run: its partitioning was set by the shuffle,
    and probing .rdd would materialize the upstream query stage."""
    sc = spark.sparkContext
    agg = (
        spark.range(10_000)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sc.setJobGroup("spread-probe", "spread must not run jobs", True)
    try:
        out = spread_for_cpu_map(agg)
    finally:
        sc.setJobGroup(None, None)  # type: ignore[arg-type]
    assert out is agg
    jobs = sc.statusTracker().getJobIdsForGroup("spread-probe")
    assert list(jobs) == [], f"spread ran jobs at build time: {jobs}"
