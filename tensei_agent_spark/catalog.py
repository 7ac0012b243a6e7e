"""Test-table catalog: load the driver-generated parquet tables.

The driver materializes a TPC-H-ish star schema plus ``events``
(stream-shaped), ``documents`` (text corpus) and ``embeddings``
(vector corpus) at /root/testdata/sf{0.001,0.01,0.1} — see TESTDATA.md.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join these against facts.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Every query loads tables through here, including under a caller-
    # provided SparkSession (the driver contract passes its own). Pin
    # the session timezone defensively: date/window functions over the
    # instant-typed events.ts column must evaluate in UTC to match the
    # DuckDB oracle, whatever the host session was built with.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Some driver builds write events.ts as TIMESTAMP(NANOS) parquet,
        # which Spark rejects; others write TIMESTAMP(MICROS), which it
        # reads natively. Handle both: with nanosAsLong the nanos variant
        # surfaces as LongType and we truncate to micros (exactly what
        # DuckDB does internally, so oracle comparisons stay exact);
        # the micros variant arrives as a timestamp already.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Session TZ is pinned to UTC, so NTZ→LTZ keeps the same wall
            # clock AND the same instant; downstream unix_micros/window
            # code (and the DuckDB oracle) see identical values.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
