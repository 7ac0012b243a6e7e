"""Columnar file sources — parquet and ORC (beyond-reference).

The reference only parses row formats (CSV/XML/JSON/DB/Excel —
``Parser.scala:451-511``); a 100 TB Spark pipeline lives on columnar
files, so these are first-class here. Both formats give Catalyst
predicate pushdown, column pruning, and partition pruning natively;
the spec schema (when present) is applied as a read schema so type
drift in files surfaces at scan time, not mid-query.

Avro would be the row-oriented interchange analogue, but the
``spark-avro`` datasource jar is not bundled with the pyspark
distribution in this environment, so ``avro`` registers a clear gate
rather than failing deep inside the DataSource resolver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.spec import SourceSpec
from . import register, to_struct_type


def _read(spark: SparkSession, spec: SourceSpec, fmt: str) -> DataFrame:
    reader = spark.read.format(fmt)
    if spec.fields:
        reader = reader.schema(to_struct_type(spec.fields))
    for key, val in spec.options.items():
        reader = reader.option(key, val)
    df = reader.load(spec.uri)
    if spec.fields:
        df = df.select(*[f.name for f in spec.fields])
    return df


@register("parquet")
def read_parquet(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    return _read(spark, spec, "parquet")


@register("orc")
def read_orc(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    return _read(spark, spec, "orc")


@register("avro")
def read_avro(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    raise NotImplementedError(
        "the spark-avro datasource jar is not bundled in this environment; "
        "add org.apache.spark:spark-avro to spark.jars.packages to enable"
    )


@register("binary")
def read_binary_files(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Whole-file binary source (Spark's ``binaryFile`` format): one row
    per file — (path, modificationTime, length, content) — the ingest
    path for the multimodal pipeline (operators/multimodal): raw
    image/audio/video bytes become an opaque binary column with file
    metadata attached.

    Options: ``pathGlobFilter`` (e.g. ``*.png``) pushes the name filter
    into file listing; ``recursiveFileLookup`` walks subdirectories.
    Files larger than ``spark.sql.sources.binaryFile.maxLength`` (2 GiB
    default cap) fail loudly rather than truncate.
    """
    reader = spark.read.format("binaryFile")
    for key, val in spec.options.items():
        reader = reader.option(key, str(val))
    df = reader.load(spec.uri)
    if spec.fields:
        df = df.select(*[f.name for f in spec.fields])
    return df
