"""CSV / delimited flat-file source (≙ parsers/FileParser.scala).

The reference tokenizes flat files with per-element stop-signs (row
grammar). For the delimited-file case — every reference CSV fixture —
that is exactly Spark's CSV reader with explicit schema + options:
the schema is the DFASDL, ``sep`` is the stop-sign, ``encoding`` the
element encoding attribute. Ragged `choice` layouts are handled by
permissive mode + try-cascade (see ``read_choice``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.spec import Field, SourceSpec
from . import register, to_struct_type


def _read_stream_grammar(
    spark: SparkSession, spec: SourceSpec, stop_signs: tuple,
    trims: tuple = (),
    leading: int = 0,
    token_fields: tuple | None = None,
) -> DataFrame:
    """Stop-sign stream parse (≙ ``FileParserFunctions.scala:84-133``
    regex grammar): records are NOT line-delimited — each field consumes
    characters until its stop-sign, so values may contain raw, unquoted
    newlines (the reference's ``source-newline-01.csv``). Spark's CSV
    reader is line-based and cannot express that; instead each file is
    read whole and one record-regex (non-greedy group per field, dotall)
    is applied with ``regexp_extract_all`` → ``arrays_zip`` → explode.

    Stop-signs are regex fragments, exactly as the reference compiles
    them. The last field's missing stop-sign means end-of-line/file.
    Scale shape: one row per FILE before the explode — right for the
    many-files corpus this grammar targets; a single huge grammar file
    would need a custom splittable input, which the reference (one
    sequential stream) never had either.
    """
    pat = "(?s)"
    for ss in stop_signs[:-1]:
        pat += f"(.*?)(?:{ss or chr(10)})"
    pat += "(.*?)(?:\r?\n|$)" if stop_signs[-1] is None else (
        f"(.*?)(?:{stop_signs[-1]})"
    )
    fields_by_name = {f.name: f for f in spec.fields}
    groups = (
        tuple(token_fields)
        if token_fields
        else tuple((f.name,) for f in spec.fields)
    )
    blob = spark.read.text(spec.uri, wholetext=True)
    if leading:
        # leading top-level DFASDL elements = header lines, per file
        blob = blob.select(
            F.regexp_replace(
                "value", f"^(?:[^\n]*\n){{{int(leading)}}}", ""
            ).alias("value")
        )
    n = len(groups)
    zipped = F.arrays_zip(
        *[
            F.regexp_extract_all("value", F.lit(pat), i + 1).alias(f"_g{i}")
            for i in range(n)
        ]
    )
    rec = F.explode(zipped).alias("_rec")

    def _trimmed(c, i):
        # per-element DFASDL trim attribute; a padded source may pad
        # with the separator character itself (trailing tabs in
        # source-newline-02.tsv), so trim runs BEFORE the type cast.
        # Java's String.trim drops every char ≤ 0x20 — Spark's trim()
        # only drops spaces, so use regexp (\s covers tab/CR/LF).
        mode = trims[i] if i < len(trims) else None
        if mode == "both":
            return F.regexp_replace(c, r"^\s+|\s+$", "")
        if mode == "left":
            return F.regexp_replace(c, r"^\s+", "")
        if mode == "right":
            return F.regexp_replace(c, r"\s+$", "")
        return c

    # One projected column per FIELD. A multi-alternative token (field-
    # level choice, FileParsers/CSV/choice-01.xml) dispatches its value
    # first-parse-wins across its candidate fields: a typed alternative
    # claims the token iff it parses (try_cast non-null / formatstr
    # match); an unconstrained str alternative is the catch-all.
    projected = []
    for ti, fnames in enumerate(groups):
        token = _trimmed(F.col(f"_rec._g{ti}"), ti)
        if len(fnames) == 1:
            f = fields_by_name[fnames[0]]
            projected.append(token.cast(f.type).alias(f.name))
            continue
        claimed = F.lit(False)
        for fname in fnames:
            f = fields_by_name[fname]
            if f.type != "string":
                parses = token.try_cast(f.type).isNotNull()
            elif f.format:
                parses = token.rlike(f.format)
            else:
                parses = F.lit(True)
            take = parses & ~claimed
            projected.append(
                F.when(take, token.cast(f.type)).alias(f.name)
            )
            claimed = claimed | parses
    out = blob.select(rec).select(*projected)
    # An all-empty match (e.g. a separator-only line) is no record —
    # the reference's parser yields nothing for it.
    non_empty = None
    for f in spec.fields:
        c = F.col(f.name).cast("string") != ""
        non_empty = c if non_empty is None else (non_empty | c)
    return _apply_defaults(out.filter(non_empty), spec)


@register("csv")
def read_csv(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    options = dict(spec.options)
    stop_signs = options.pop("stop_signs", None)
    options.pop("seps", None)
    token_fields = options.pop("token_fields", None)
    trims = options.pop("trims", None) or ()
    if options.pop("stream_grammar", False):
        if not spec.fields:
            raise ValueError("stream_grammar needs an explicit field list")
        n_tokens = len(token_fields) if token_fields else len(spec.fields)
        signs = tuple(stop_signs) if stop_signs else (
            (options.get("sep", ","),) * (n_tokens - 1) + (None,)
        )
        return _read_stream_grammar(
            spark, spec, signs, tuple(trims),
            leading=int(options.get("leading_lines", 0) or 0),
            token_fields=token_fields,
        )
    # formatnum locale attributes (≙ decimal-separator / grouping on the
    # reference's formatnum elements, ExcelToCSVConverter locale path):
    # numeric fields are read as strings and normalized JVM-side.
    dec_sep = str(options.pop("decimalSeparator", "") or "")
    grp_sep = str(options.pop("groupingSeparator", "") or "")
    # ``captureCorrupt``: keep the raw line of rows that failed the
    # grammar in a ``_corrupt_record`` column instead of silently
    # nulling fields (≙ the reference marking a broken parse branch and
    # logging the offset, ``BaseParser.scala:602-611``). Good rows carry
    # NULL there; split with ``df.filter("_corrupt_record IS NULL")``.
    capture_corrupt = bool(options.pop("captureCorrupt", False))
    # ``leading_lines``: top-level DFASDL data elements ahead of the seq
    # consume that many lines per file (header idiom). Spark's header
    # option skips exactly one line per file — the only multiplicity the
    # reference corpus uses; anything deeper needs a custom pre-scan.
    leading = int(options.pop("leading_lines", 0) or 0)
    if leading > 1:
        raise NotImplementedError(
            f"{leading} leading non-seq elements before the row set; "
            "only a single header line is supported"
        )
    opts = {
        "header": "true" if leading == 1 else "false",
        "sep": ",",
        "encoding": "UTF-8",
        "nullValue": "",
        "mode": "PERMISSIVE",
        # reference trims element values during cleanAndValidateData
        "ignoreLeadingWhiteSpace": "true",
        "ignoreTrailingWhiteSpace": "true",
        **{k: str(v) for k, v in options.items()},
    }
    reader = spark.read.options(**opts)
    localized = ()
    if spec.fields is not None:
        read_fields = spec.fields
        if dec_sep:
            # Any dec-sep (incl '.') activates the formatnum cleanup:
            # the reference strips EVERY captured non-digit that isn't
            # the declared decimal separator — "22⎖33" with dec-sep "."
            # is 2233, with dec-sep "⎖" it's 22.33 (CopyCSVTest
            # source-05/06/07 ↔ target-05/06/07 goldens).
            from dataclasses import replace

            localized = tuple(
                f
                for f in spec.fields
                if f.type.startswith("decimal") or f.type in ("double", "float")
            )
            read_fields = tuple(
                replace(f, type="string") if f in localized else f
                for f in spec.fields
            )
        if capture_corrupt:
            read_fields = read_fields + (Field("_corrupt_record", "string"),)
            reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
        reader = reader.schema(to_struct_type(read_fields))
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(spec.uri)
    if localized:
        import re as _re

        strip = f"[^0-9\\-{_re.escape(dec_sep)}]"
    for f in localized:
        c = F.regexp_replace(F.col(f.name), strip, "")
        if dec_sep != ".":
            c = F.translate(c, dec_sep, ".")
        df = df.withColumn(f.name, c.cast(f.type))
    return _apply_defaults(df, spec)


@register("text")
def read_text(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    """Non-delimited flat grammar: read raw lines, extract per-field via
    the spec's regex ``format`` attributes (≙ formatstr elements,
    ``FileParserFunctions.scala:146-260``).

    ``recordSep`` option: for multi-line records (the reference's
    vCard/email grammars — one DFASDL record spans several physical
    lines) set the record terminator; it becomes the reader's
    ``lineSep`` so each record arrives as one blob and field regexes
    match across its inner newlines. Records stay splittable: Spark's
    text source splits on the custom separator, not on \\n.

    ``wholeFile`` option: one record per FILE (the reference's
    email-header grammar parses a whole message,
    ``usecases/copy/EmailToCSV.scala``); field regexes run against the
    full text — use ``(?m)``/``(?s)`` flags. Scales across a corpus:
    each file is one row, files distribute over the cluster.
    """
    reader = spark.read
    record_sep = spec.options.get("recordSep")
    if record_sep:
        reader = reader.option("lineSep", record_sep)
    # wholetext must go through the .text() kwarg — the reader treats a
    # pre-set option of that name as unknown and still splits on lines.
    lines = reader.text(spec.uri, wholetext=bool(spec.options.get("wholeFile")))
    if record_sep:  # drop empty trailing fragments between separators
        lines = lines.filter(F.length(F.trim("value")) > 0)
    if not spec.fields:
        return lines
    cols = []
    for f in spec.fields:
        if f.format:
            c = F.regexp_extract(F.col("value"), f.format, 1)
        else:
            c = F.col("value")
        cols.append(c.cast(f.type).alias(f.name))
    return lines.select(*cols)


def read_choice(
    spark: SparkSession, spec: SourceSpec, layouts: list[tuple[tuple, str]]
) -> DataFrame:
    """`choice` parsing: ordered alternative row layouts; first branch
    that parses wins (``BaseParser.scala:250-271``).

    ``layouts`` = [(fields_tuple, sep), ...] in priority order. Spark CSV
    cannot backtrack, so read raw lines once and run a from_csv cascade:
    a branch "parses" when all its non-null columns materialize; earlier
    branches win via coalesce on a tagged struct.
    """
    lines = spark.read.text(spec.uri)
    # Unified output schema: union of all branch fields (first type wins);
    # coalesce needs every branch struct to share this exact type.
    union_fields: dict[str, str] = {}
    for fields, _sep in layouts:
        for f in fields:
            union_fields.setdefault(f.name, f.type)
    structs = []
    for i, (fields, sep) in enumerate(layouts):
        # explicit backticked DDL: simpleString() emits bare names,
        # which from_csv's parser rejects for ids like ``e-mail``
        ddl = ", ".join(
            "`" + f.name.replace("`", "``") + "` " + f.type for f in fields
        )
        parsed = F.from_csv(F.col("value"), ddl, {"sep": sep})
        # Branch validity ≙ the reference's grammar match
        # (BaseParser.scala:250-271): every TYPED (non-string) element
        # must parse; a ``start-sign`` is a required value prefix; a
        # ``format`` (formatstr) must match. A branch of plain str
        # elements with no constraints is a catch-all — a str element
        # consumes anything, including nothing (the empty-row branch of
        # FileParsers/CSV/complex-02-with-seq.xml).
        valid = F.lit(True)
        for f in fields:
            if f.type != "string":
                valid = valid & parsed[f.name].isNotNull()
            if f.start_sign:
                valid = valid & F.coalesce(
                    parsed[f.name].cast("string"), F.lit("")
                ).rlike(f"^(?:{f.start_sign})")
            if f.format and f.type == "string":
                valid = valid & F.coalesce(
                    parsed[f.name].cast("string"), F.lit("")
                ).rlike(f.format)
        present = {f.name for f in fields}
        row = F.struct(
            *[
                (parsed[name] if name in present else F.lit(None))
                .cast(t)
                .alias(name)
                for name, t in union_fields.items()
            ]
        )
        structs.append(F.when(valid, F.struct(F.lit(i).alias("_branch"), row.alias("row"))))
    chosen = F.coalesce(*structs)
    return lines.select(chosen.alias("_c")).select("_c._branch", "_c.row.*")


def _apply_defaults(df: DataFrame, spec: SourceSpec) -> DataFrame:
    """default-str / default-num substitution on empty cells
    (``helpers/ProcessorHelpers.scala:124-139``)."""
    if not spec.fields:
        return df
    out = df
    for f in spec.fields:
        if f.default is not None:
            out = out.withColumn(
                f.name, F.coalesce(F.col(f.name), F.lit(f.default).cast(f.type))
            )
    return out
