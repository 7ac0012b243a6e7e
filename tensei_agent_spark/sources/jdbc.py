"""JDBC source (≙ parsers/DatabaseParser.scala).

The reference generates ``SELECT cols FROM table [WHERE filter]
[LIMIT n]`` per sequence, or uses a raw ``db-select`` override
(``DatabaseParser.scala:379-416``). Spark's JDBC reader does the same
declaratively — and Catalyst pushes filters/column pruning/limits down
to the database, which is the reference's hand-rolled optimization for
free (SURVEY.md §4).

Spec options:
- ``table``      table name (≙ DFASDL seq id / db-table-name)
- ``query``      raw SQL override (≙ db-select)
- ``filter``     predicate appended via pushdown (≙ filter attribute)
- ``limit``      row cap (≙ seq max)
- ``partitionColumn/lowerBound/upperBound/numPartitions`` — parallel
  scan striping; REQUIRED at real scale (a bare JDBC read is a single
  partition = single connection).
- ``driver``     JDBC driver class (derby embedded for tests)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.spec import SourceSpec
from . import register


@register("jdbc")
def read_jdbc(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    opts = dict(spec.options)
    filter_expr = opts.pop("filter", None)
    limit = opts.pop("limit", None)
    # engine-level parse metadata — must not leak into the JDBC
    # connection properties
    dec_sep = str(opts.pop("decimalSeparator", "") or ",")
    for meta in ("stop_signs", "seps", "trims", "sep", "groupingSeparator",
                 "dateFormat", "timestampFormat", "leading_lines",
                 "trailing_newline", "explodePath"):
        opts.pop(meta, None)
    select_cols = [f.name for f in spec.fields] if spec.fields else None

    reader = spark.read.format("jdbc").option("url", spec.uri)
    if "query" not in opts and "dbtable" not in opts:
        opts["dbtable"] = opts.pop("table", spec.name)
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    df = reader.load()

    if select_cols:
        df = df.select(*select_cols)  # column pruning → pushed to DB
    if filter_expr:
        df = df.filter(filter_expr)  # predicate pushdown via Catalyst
    if limit:
        df = df.limit(int(limit))
    # formatnum elements over VARCHAR columns (the reference's
    # DatabaseParser applies the format regex + locale cleanup to
    # string-typed money columns, DatabaseParsers/simple-01:
    # '1.500.000,83 €' → 1500000.83): extract the capture group, strip
    # grouping marks, normalize the decimal separator, cast.
    if spec.fields:
        dtypes = dict(df.dtypes)
        for f in spec.fields:
            numeric = f.type in ("double", "long") or f.type.startswith(
                "decimal"
            )
            if f.format and numeric and dtypes.get(f.name) == "string":
                df = df.withColumn(
                    f.name,
                    formatnum_clean_col(f.name, f.format, dec_sep, f.type),
                )
    return df


def formatnum_clean_col(name: str, fmt: str, dec: str, target_type: str):
    """The locale-cleanup column for a formatnum-over-VARCHAR field:
    extract the format's capture group, strip grouping marks, normalize
    the decimal separator, cast.

    Groupless formats exist in the corpus (``[0-9]+``, ``-?\\d+\\.\\d+``):
    Spark's regexp_extract raises 'Regex group count is 0' for group 1
    there — take the whole match (group 0) when the pattern has no
    capture group (ADVICE r8).
    """
    import re as _re

    try:
        n_groups = _re.compile(fmt).groups
    except _re.error:
        # Java-only syntax Python cannot parse: we cannot PROVE the
        # pattern is groupless, and group 1 (the pre-r8 behavior) works
        # in Spark for every grouped Java pattern — falling back to
        # group 0 would silently change extraction when digits exist
        # outside group 1 (ADVICE r9). Group 0 is only safe when the
        # pattern compiles and provably has zero groups.
        n_groups = 1
    c = F.regexp_extract(F.col(name), fmt, 1 if n_groups >= 1 else 0)
    c = F.regexp_replace(c, f"[^0-9\\-{_re.escape(dec)}]", "")
    if dec != ".":
        c = F.translate(c, dec, ".")
    return c.cast(target_type)


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **options,
) -> DataFrame:
    """Convenience wrapper used by the JDBC sink's read-back paths."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
