"""CSV / delimited flat-file sink (≙ writers/FileWriterActor.scala).

The reference appends cell payloads joined by per-element stop-signs,
skipping the stop-sign after the last column
(``MappingOneToOneWorker.scala:309-315``) — i.e. ordinary delimited
lines, which is exactly ``df.write.csv``. ``\\t`` escapes in stop-signs
(``FileWriterActor.scala:231-251``) map to the ``sep`` option.

Options: ``sep`` ``header`` ``encoding`` ``lineSep`` pass through to the
Spark writer; ``single_file=true`` coalesces to one partition and (for
local paths) renames the part-file to the exact target path — small
outputs only, the distributed layout is the scale path; ``order_by``
gives a deterministic row order (the reference's writer-message
ordering, ``BaseWriter.scala:65-75``).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.spec import TargetSpec
from . import register


@register("csv")
def write_csv(df: DataFrame, spec: TargetSpec) -> None:
    # Doubles render BigDecimal-style (the reference's formatnum values
    # are BigDecimals; toPlainString prints integral values WITHOUT a
    # fractional part): 123.0 → "123", 2.11111 → "2.11111"
    # (copy/target-05..07 goldens). A genuinely scaled integral like
    # BigDecimal("1.0") would print "1.0" there — double can't carry
    # that scale, a documented non-divergence for the corpus.
    for sf in df.schema.fields:
        if sf.dataType.typeName() in ("double", "float"):
            c = F.col(f"`{sf.name}`")
            df = df.withColumn(
                sf.name,
                F.when(
                    # NaN == NaN is TRUE in Spark and floor(NaN) = NaN,
                    # and |v| >= 1e38 overflows the decimal(38,0) cast
                    # to NULL (written as empty string) — both must
                    # fall through to the plain string rendering.
                    (~F.isnan(c))
                    & (F.abs(c) < F.lit(1e38))
                    & (c == F.floor(c)),
                    c.cast("decimal(38,0)").cast("string"),
                ).otherwise(c.cast("string")),
            )
    opts = {
        "header": "false",
        "sep": ",",
        "encoding": "UTF-8",
        "emptyValue": "",
        **{k: str(v) for k, v in spec.options.items()
           if k not in ("single_file", "order_by", "limit",
                        "trailing_newline", "seps", "raw", "stop_signs")},
    }
    order_by = spec.options.get("order_by")
    # Raw append mode (≙ FileWriterActor: cell payload + stop-sign, NO
    # quoting ever — an embedded newline is written verbatim, see
    # target-newline-01.csv). Triggered explicitly via ``raw`` or
    # implicitly by per-column separators (``seps``, from a DFASDL whose
    # stop-signs differ — copy/target-01.xml's " : " then ",") which a
    # single-sep CSV writer cannot express. The row becomes ONE concat
    # column written through the text writer; Catalyst still prunes and
    # pushes as usual upstream of the projection.
    seps = spec.options.get("seps")
    if seps or str(spec.options.get("raw", "")).lower() in ("1", "true", "yes"):
        gap = list(seps) if seps else [opts["sep"]] * (len(df.columns) - 1)

        def _finalize(frame: DataFrame) -> DataFrame:
            # applied AFTER any order_by sort — the sort needs the
            # original columns, the text writer needs exactly one
            parts = []
            for i, c in enumerate(frame.columns):
                parts.append(
                    F.coalesce(F.col(f"`{c}`").cast("string"), F.lit(""))
                )
                if i < len(frame.columns) - 1:
                    parts.append(F.lit(gap[i]))
            return frame.select(F.concat(*parts).alias("value"))

        opts = {
            k: v for k, v in opts.items()
            if k in ("encoding", "lineSep", "compression")
        }
        _write = lambda w, path: w.options(**opts).text(path)  # noqa: E731
    else:
        _finalize = lambda frame: frame  # noqa: E731
        _write = lambda w, path: w.options(**opts).csv(path)  # noqa: E731
    # Non-seq (single-record <elem>) targets DO keep the final record
    # terminator (plans/dfasdl synthesizes trailing_newline for them).
    keep_trailing = str(spec.options.get("trailing_newline", "")).lower() in (
        "1", "true", "yes",
    )
    single = str(spec.options.get("single_file", "")).lower() in ("1", "true", "yes")
    if single:
        # coalesce(1) + local sort, NOT a global orderBy: orderBy inserts
        # a RangePartitioning exchange whose boundary-sampling job
        # re-executes the whole upstream (double scan, and double-counted
        # `observe` metrics); with one output partition a local sort is
        # the same file for one pass.
        one = df.coalesce(1)
        if order_by:
            one = one.sortWithinPartitions(*order_by)
        tmp = spec.uri + "._spark_tmp"
        _write(
            _finalize(one).write.mode(
                spec.mode if spec.mode != "upsert" else "overwrite"
            ),
            tmp,
        )
        part = glob.glob(os.path.join(tmp, "part-*"))[0]
        shutil.move(part, spec.uri)
        shutil.rmtree(tmp)
        # The reference writes the record separator BETWEEN rows only —
        # its golden files end WITHOUT a trailing newline
        # (FileWriterActor appends per-row; no terminator after the
        # last). Spark terminates every record, so trim the final
        # separator to stay byte-identical. Single-file only: part
        # files of a distributed layout must keep their terminators or
        # concatenation would glue rows together.
        if not keep_trailing:
            sep_b = opts.get("lineSep", "\n").encode(opts.get("encoding", "UTF-8"))
            with open(spec.uri, "rb+") as fh:
                fh.seek(0, 2)
                size = fh.tell()
                if size >= len(sep_b):
                    fh.seek(size - len(sep_b))
                    if fh.read(len(sep_b)) == sep_b:
                        fh.truncate(size - len(sep_b))
    else:
        # Multi-file targets use a global orderBy: range partitioning makes
        # the part files concatenate into a globally sorted stream, which is
        # the documented `order_by` contract (the range-sampling double-scan
        # concern only bites the observe-metrics single_file path above).
        writer = df.orderBy(*order_by) if order_by else df
        _write(
            _finalize(writer).write.mode(
                spec.mode if spec.mode != "upsert" else "overwrite"
            ),
            spec.uri,
        )
