"""Source readers: SourceSpec → DataFrame.

Reference parity (SURVEY.md §2.1): FileParser/CSV, JsonFileParser,
XmlFileParser, DatabaseParser, ExcelToCSVConverter, NetworkFileParser.
Each reader maps a spec's schema (≙ DFASDL) to a Spark read with the
schema applied, so Catalyst gets pushdown/pruning for free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, _parse_datatype_string

from ..plans.spec import Field, SourceSpec

READERS: dict[str, Callable[[SparkSession, SourceSpec], DataFrame]] = {}


def register(fmt: str):
    def deco(fn):
        READERS[fmt] = fn
        return fn

    return deco


def to_struct_type(fields: tuple[Field, ...]) -> StructType:
    """DFASDL element list → Spark StructType (type table SURVEY.md §1.2)."""
    return StructType(
        [StructField(f.name, _parse_datatype_string(f.type), f.nullable) for f in fields]
    )


def read_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Dispatch by format (≙ ``Parser.scala:451-511`` subparser choice),
    staging network URIs to local files first (≙ NetworkFileParser).

    ``ref`` fields (DFASDL reference elements — copies of another
    element's value, ``BaseParser.scala:285-312``) consume no input:
    they are stripped from the physical read schema and appended as
    cast projection aliases afterwards.
    """
    from pyspark.sql import functions as F

    from .net import stage_uri

    if spec.format not in READERS:
        raise ValueError(f"unsupported source format {spec.format!r}")
    staged = stage_uri(spec.uri)
    if staged != spec.uri:
        spec = SourceSpec(spec.name, spec.format, staged, spec.fields, spec.options)
    # Engine-level options that must NOT reach the underlying reader:
    # ``limit`` (DFASDL ``seq max`` / ``fixseq count`` — applied to the
    # DataFrame below so EVERY format honors it; the JDBC reader also
    # consumes it itself, earlier, to push LIMIT into the dialect SQL),
    # and spec metadata (``primary_key``, ``alt_layouts``) that only
    # sinks/plan ordering care about. Spark readers silently ignore
    # unknown options, which would otherwise drop these semantics.
    # ``limit`` stays in the options for jdbc only (read_jdbc pushes it
    # into the dialect SQL itself); the pure-metadata keys are stripped
    # for EVERY format — read_jdbc forwards leftover options as JDBC
    # connection properties, where a str()-ified tuple is junk.
    meta_opts = {"primary_key", "alt_layouts"}
    if spec.format != "jdbc":
        meta_opts = meta_opts | {"limit"}
    limit = spec.options.get("limit")
    if meta_opts & spec.options.keys():
        cleaned = {
            k: v for k, v in spec.options.items() if k not in meta_opts
        }
        spec = SourceSpec(spec.name, spec.format, spec.uri, spec.fields, cleaned)
    ref_fields = tuple(f for f in (spec.fields or ()) if f.ref)
    if ref_fields:
        phys = tuple(f for f in spec.fields if not f.ref)
        spec = SourceSpec(spec.name, spec.format, spec.uri, phys, spec.options)
    df = READERS[spec.format](spark, spec)
    for f in ref_fields:
        df = df.withColumn(f.name, F.col(f.ref).cast(f.type))
    if limit is not None and spec.format != "jdbc":
        df = df.limit(int(limit))
    return df


from . import columnar, csv, jdbc, json, xml, excel, net  # noqa: E402,F401
