"""Partitioned writes + partition pruning: the scan-side optimization
that matters most at 100 TB (a pruned partition is never even listed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.catalog import load
from tensei_agent_spark.plans.spec import TargetSpec
from tensei_agent_spark.sinks import write_target

SF = "/root/testdata/sf0.001"


def test_partitioned_write_and_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load(spark, SF, "events")
    write_target(
        ev,
        TargetSpec(
            "events_part", "parquet", out,
            options={"partition_by": ["event_type"]},
        ),
    )
    back = spark.read.parquet(out)
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan[:1500]
    # pruned read returns exactly the partition's rows
    want = ev.filter(F.col("event_type") == "click").count()
    assert one.count() == want


def test_partitioned_layout_on_disk(spark, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = load(spark, SF, "documents")
    write_target(
        docs,
        TargetSpec("docs_part", "parquet", out, options={"partition_by": ["lang"]}),
    )
    import os

    subdirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert subdirs == {f"lang={l}" for l in langs}
