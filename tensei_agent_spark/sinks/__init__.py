"""Sink writers: DataFrame + TargetSpec → persisted output.

Reference parity (SURVEY.md §2.2): WriterSupervisor dispatch by target
URI type (``WriterSupervisor.scala:181-199``), FileWriterActor (CSV /
flat), JsonFileWriterActor (nested JSON), DatabaseWriterActor (JDBC
insert/upsert/DDL), NetworkFileWriterActor (FTP/SFTP push staging).

Write-side semantics shared by every sink (applied in ``prepare``):

- **unique-column dedup** ≙ BaseWriterFilter: rows whose unique-column
  values repeat are dropped, first-in-order wins
  (``writers/BaseWriterFilterWorker.scala:231-280``);
- **default substitution** on NULL target cells ≙ ``processTargetData``
  (``helpers/ProcessorHelpers.scala:124-139``);
- **row cap** ≙ target ``seq max`` / ``fixseq count``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.spec import TargetSpec

WRITERS: dict[str, Callable[[DataFrame, TargetSpec], None]] = {}


def register(fmt: str):
    def deco(fn):
        WRITERS[fmt] = fn
        return fn

    return deco


def prepare(df: DataFrame, spec: TargetSpec) -> DataFrame:
    """Apply the shared write-side semantics (dedup / defaults / cap,
    plus outgoing value formatting ≙ ``ProcessorHelpers.
    processTargetData``, ``helpers/ProcessorHelpers.scala:148-212``:
    numeric precision truncation via the declared decimal type, and
    regex re-validation of ``format`` fields — non-matching values
    null out, exactly like the reference's formatstr re-check)."""
    out = df
    # Declared target columns NO mapping produced still exist in the
    # written row set, as typed NULLs placed at their tree position
    # (the reference writes None for unmapped elements —
    # MappingModeAssociation.scala:526-756 leaves date_entered
    # unmapped and the target table still has the column). Defaults
    # coalesce over them right below.
    missing = [f for f in spec.fields if f.name not in out.columns]
    if missing:
        out = out.select(
            "*",
            *[F.lit(None).cast(f.type).alias(f.name) for f in missing],
        )
        declared = [f.name for f in spec.fields if f.name in out.columns]
        out = out.select(
            *declared, *[c for c in out.columns if c not in declared]
        )
    # Coerce each column to its declared target element type first —
    # ≙ processTargetData, which converts every incoming value to the
    # target element's type before the writer sees it (a num source
    # mapped onto a str target lands as its string rendering, e.g.
    # Drupal2WP status→comment_approved VARCHAR). No-op casts are
    # eliminated by Catalyst's SimplifyCasts.
    dtypes = dict(out.dtypes)
    for f in spec.fields:
        if f.type and f.name in dtypes and dtypes[f.name] != f.type:
            out = out.withColumn(f.name, F.col(f.name).cast(f.type))
    for f in spec.fields:
        if f.default is not None and f.name in out.columns:
            out = out.withColumn(
                f.name, F.coalesce(F.col(f.name), F.lit(f.default).cast(f.type))
            )
    for f in spec.fields:
        if f.name not in out.columns:
            continue
        if f.type.startswith("decimal"):
            out = out.withColumn(f.name, F.col(f.name).cast(f.type))
        if f.format and f.type == "string":
            out = out.withColumn(
                f.name,
                F.when(
                    F.col(f.name).rlike(f.format), F.col(f.name)
                ),
            )
        if f.max_length and f.type == "string":
            # dfasdl-utils processStringData cuts an overlong value to
            # the target's max-length (ProcessorTest "should truncate
            # the appropriate target fields",
            # processors/long-column-expected-target.csv)
            out = out.withColumn(
                f.name, F.substring(F.col(f.name), 1, int(f.max_length))
            )
    unique_cols = [f.name for f in spec.fields if f.unique and f.name in out.columns]
    if unique_cols:
        from ..operators.dedup import dedup_exact

        order_cols = [c for c in out.columns if c not in unique_cols] or unique_cols
        out = dedup_exact(out, unique_cols, keep_order=order_cols)
    limit = spec.options.get("limit")
    if limit:
        out = out.limit(int(limit))
    return out


def write_target(df: DataFrame, spec: TargetSpec) -> None:
    """Dispatch by format (≙ WriterSupervisor) after shared prepare.

    Remote (ftp/sftp) target URIs get the NetworkFileWriter treatment:
    write a single local file, then push (``sources.net.push_file``).
    """
    import urllib.parse

    if spec.format not in WRITERS:
        raise ValueError(f"unsupported target format {spec.format!r}")
    scheme = urllib.parse.urlparse(spec.uri).scheme.lower()
    if scheme in ("ftp", "ftps", "sftp"):
        import os
        import tempfile

        from ..sources.net import push_file
        from .. import plans

        local = os.path.join(
            tempfile.mkdtemp(prefix="tensei_push_"),
            os.path.basename(urllib.parse.urlparse(spec.uri).path) or "out",
        )
        local_spec = plans.TargetSpec(
            spec.name, spec.format, local, spec.fields,
            {**spec.options, "single_file": True}, spec.mode, spec.foreign_keys,
        )
        WRITERS[spec.format](prepare(df, local_spec), local_spec)
        push_file(local, spec.uri)
        return
    WRITERS[spec.format](prepare(df, spec), spec)


from . import csv, jdbc, json, orc, parquet  # noqa: E402,F401
