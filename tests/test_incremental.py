"""Cross-run incremental processing via the parquet ledger."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.operators.incremental import ParquetLedger, process_increment


def test_ledger_filters_already_processed(spark, tmp_path):
    ledger = ParquetLedger(spark, str(tmp_path / "ledger"))

    def clean(df):
        return df.withColumn("n_chars", F.length("text"))

    b1 = spark.createDataFrame(
        [(1, "aa"), (2, "bbb"), (3, "c")], ["doc_id", "text"]
    )
    out1 = process_increment(b1, ledger, clean)
    assert out1.count() == 3

    # batch 2 overlaps batch 1 — only the 2 new docs process
    b2 = spark.createDataFrame(
        [(2, "bbb"), (3, "c"), (4, "dddd"), (5, "e")], ["doc_id", "text"]
    )
    out2 = process_increment(b2, ledger, clean)
    assert sorted(r["doc_id"] for r in out2.collect()) == [4, 5]

    # replay of batch 2 is a no-op (idempotent)
    out3 = process_increment(b2, ledger, clean)
    assert out3.count() == 0
    assert ledger.seen().count() == 5


def test_ledger_empty_on_missing_path(spark, tmp_path):
    ledger = ParquetLedger(spark, str(tmp_path / "never_written"))
    assert ledger.seen().count() == 0
    df = spark.createDataFrame([(9, "x")], ["doc_id", "text"])
    assert ledger.filter_new(df).count() == 1


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from tensei_agent_spark.operators.maintenance import compact_parquet

    path = str(tmp_path / "tbl")
    df = spark.range(10_000).withColumnRenamed("id", "v")
    df.repartition(40).write.parquet(path)
    import os

    before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert before >= 40
    n = compact_parquet(spark, path, target_file_mb=128)
    after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert after == n == 1  # tiny table → single file
    got = spark.read.parquet(path)
    assert got.count() == 10_000
    assert got.agg({"v": "sum"}).collect()[0][0] == 10_000 * 9_999 // 2
