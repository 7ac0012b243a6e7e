"""Incremental corpus processing: a parquet-backed ledger of processed
ids, so a recurring pipeline run touches only documents it has never
seen.

This extends the reference's within-run unique-value dedup
(`/root/reference/src/main/scala/com/wegtam/tensei/agent/writers/
BaseWriterFilter.scala:82-143`, which drops rows whose unique column was
already written *in this run*) across runs: the ledger IS the persisted
UniqueValueBuffer.

Scale notes: the ledger holds only the id column (narrow parquet,
splittable); membership is a left_anti equi-join — hash shuffle on the
id, broadcast when the increment is small, never a driver-side set.
Commit appends a new parquet file per run (object-store friendly:
append = add file, no rewrite); compaction is a periodic
``repartition`` rewrite. For exactly-once semantics pair `commit` with
the idempotent JDBC upsert sink — replays re-add the same ids and the
anti-join keeps the pipeline idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


class ParquetLedger:
    """Cross-run processed-id ledger at a parquet path."""

    def __init__(self, spark: SparkSession, path: str, id_col: str = "doc_id"):
        self.spark = spark
        self.path = path
        self.id_col = id_col

    def seen(self) -> DataFrame:
        """All ids processed by any prior run (empty frame if none)."""
        if not os.path.exists(self.path):
            return self.spark.createDataFrame(
                [], StructType([StructField(self.id_col, LongType())])
            )
        return self.spark.read.parquet(self.path).select(self.id_col).distinct()

    def filter_new(self, df: DataFrame) -> DataFrame:
        """Rows of ``df`` whose id has never been committed."""
        return df.join(self.seen(), self.id_col, "left_anti")

    def commit(self, df: DataFrame) -> None:
        """Record ids as processed (append-only; idempotent with
        ``filter_new`` because duplicates in the ledger are harmless —
        ``seen`` reads distinct)."""
        df.select(self.id_col).write.mode("append").parquet(self.path)


def process_increment(
    batch: DataFrame, ledger: ParquetLedger, process
) -> DataFrame:
    """Run ``process`` over only the never-seen rows of ``batch`` and
    commit their ids. Returns the processed frame.

    The result is eagerly ``localCheckpoint``-ed BEFORE the commit:
    appending to the ledger path invalidates any cache whose plan reads
    that path (Spark refreshes caches on write-to-read-path), so a
    merely-persisted result would silently recompute against the
    post-commit ledger and come back empty. Checkpointing cuts the
    lineage, making the returned frame independent of the ledger state.
    """
    fresh = ledger.filter_new(batch)
    out = process(fresh).localCheckpoint(eager=True)
    ledger.commit(out)
    return out
