"""DFASDL emission from CSV / JSON samples (≙ SchemaExtractor output).

The Spark-native inference in :mod:`tensei_agent_spark.infer` votes
directly to Spark types for :class:`SourceSpec`.  This module is its
reference-conformant twin: it emits the *DFASDL XML document* the
reference's schema extractors produce, so the output can be compared
byte-for-structure against the 37 CSV and 8 JSON golden fixtures the
reference ships, and then fed straight into
:func:`tensei_agent_spark.plans.dfasdl.parse_dfasdl` for a typed read.

Behavioral contract (all public reference code):

- ``helpers/CSVSchemaExtractor.scala:128-454`` — 50-line sample,
  header element, per-column vote long → formattime(date) → num,
  else formatnum (single decimal separator only), else
  date/time/datetime, else formattime(timestamp|date|time), else str.
- ``helpers/JSONSchemaExtractor.scala:146-425`` — recursive walk,
  ``parent-id + '-' + field`` ids, arrays become
  ``<seq id="…-seq" keepID="true">`` with a ``…-row`` element.
- ``helpers/ExtractorHelpers.scala:44-323`` — id cleaning, Java-ish
  long/double parsing, java.sql Date/Time/Timestamp literal shapes,
  quirky decimal-separator regexes (replicated verbatim, including
  the ``[\\d{1,2}|\\d{4,]`` character class), precision length.
- ``src/main/resources/extractors.conf`` — the formattime vote lists.

Driver-side sampling only — no Spark job runs here; the distributed
read happens later against the compiled schema.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from datetime import datetime

LINES_TO_EXTRACT = 50

DECIMAL_POINT = "."
DECIMAL_COMMA = ","
DECIMAL_UNICODE = "⎖"  # ⎖

# ``createGeneralFormatnumRegex`` (ExtractorHelpers.scala:87-88).
GENERAL_FORMATNUM_REGEX = f"(-?[\\d\\.,{DECIMAL_UNICODE}]+)"

# --- formattime format tables (extractors.conf) ------------------------------
# Each entry: (java-pattern, anchored-regex, strptime-format-or-None).
# The regex enforces Java's digit-width strictness (strptime alone is
# laxer: %d accepts 1-2 digits where Java ``dd`` demands 2); the
# strptime pass then enforces calendar validity.  A ``None`` strptime
# means the regex (plus group-wise range checks in the validator) is
# the whole check — used for the zone-suffixed patterns Python cannot
# parse portably.

_AMPM = r"(?:AM|PM)"
_ZONE = r"[A-Za-z]{1,5}(?:[+-]\d{1,2}(?::\d{2})?)?"

# Clock fields in the regex-only patterns carry NAMED GROUPS so the
# validator range-checks exactly the captured digits — reading "the
# last N numbers of the string" instead would pull zone-offset digits
# (``GMT+5:30``) into the clock slice.  ``h12`` = Java ``h``
# (clock-hour-of-am-pm), ``h24`` = Java ``HH``.
TIMESTAMP_FORMATS: list[tuple[str, str, str | None]] = [
    (
        "yyyy-MM-dd h:mm:ss a",
        r"\d{4}-\d{2}-\d{2} (?P<h12>\d{1,2}):(?P<mi>\d{2}):(?P<se>\d{2}) " + _AMPM,
        None,
    ),
    (
        "yyyy-MM-dd h:mm:ss a z",
        r"\d{4}-\d{2}-\d{2} (?P<h12>\d{1,2}):(?P<mi>\d{2}):(?P<se>\d{2}) "
        + _AMPM + " " + _ZONE,
        None,
    ),
    (
        "EEE, dd LLL yyyy HH:mm:ss z",
        r"[A-Z][a-z]{2}, \d{2} [A-Z][a-z]{2} \d{4} "
        r"(?P<h24>\d{2}):(?P<mi>\d{2}):(?P<se>\d{2}) " + _ZONE,
        None,
    ),
]

DATE_FORMATS: list[tuple[str, str, str | None]] = [
    ("yyyyMMdd", r"\d{8}", "%Y%m%d"),
    ("dd.MM.yyyy", r"\d{2}\.\d{2}\.\d{4}", "%d.%m.%Y"),
    ("dd MM yyyy", r"\d{2} \d{2} \d{4}", "%d %m %Y"),
    ("dd.LLL.yyyy", r"\d{2}\.[A-Z][a-z]{2}\.\d{4}", "%d.%b.%Y"),
    ("dd LLL yyyy", r"\d{2} [A-Z][a-z]{2} \d{4}", "%d %b %Y"),
    ("dd/MM/yyyy", r"\d{2}/\d{2}/\d{4}", "%d/%m/%Y"),
    ("dd/LLL/yyyy", r"\d{2}/[A-Z][a-z]{2}/\d{4}", "%d/%b/%Y"),
    ("MM/dd/yyyy", r"\d{2}/\d{2}/\d{4}", "%m/%d/%Y"),
    ("LLL/dd/yyyy", r"[A-Z][a-z]{2}/\d{2}/\d{4}", "%b/%d/%Y"),
]

TIME_FORMATS: list[tuple[str, str, str | None]] = [
    ("h:mm a", r"(?P<h12>\d{1,2}):(?P<mi>\d{2}) " + _AMPM, None),
    ("HH:mm", r"\d{2}:\d{2}", "%H:%M"),
]


def _java_format_matches(value: str, entry: tuple[str, str, str | None]) -> bool:
    _, rx, strp = entry
    m = re.fullmatch(rx, value)
    if m is None:
        return False
    if strp is not None:
        try:
            datetime.strptime(value, strp)
        except ValueError:
            return False
        return True
    # Regex-only patterns: range-check the clock fields via the NAMED
    # CAPTURES, never positional number slices of the whole string.
    # Java's clock-hour-of-am-pm ``h`` spans 1-12 but the SMART
    # resolver the reference relies on also admits 0 (the goldens
    # contain ``0:00:00 AM``), so 0-12 here; 13-23 is a parse error
    # for ``h`` exactly as in Java.
    gd = m.groupdict()
    if gd.get("h12") is not None and int(gd["h12"]) > 12:
        return False
    if gd.get("h24") is not None and int(gd["h24"]) > 23:
        return False
    if any(
        gd.get(g) is not None and int(gd[g]) > 59 for g in ("mi", "se")
    ):
        return False
    return True


def determine_specific_format(values: list[str], formats) -> str | None:
    """First format that every value satisfies
    (≙ ``ExtractorHelpers.determineSpecificFormat``)."""
    for entry in formats:
        if values and all(_java_format_matches(v, entry) for v in values):
            return entry[0]
    return None


# --- scalar parsers (java.sql literal shapes) --------------------------------


def clean_element_id(ident: str) -> str:
    """≙ ``ExtractorHelpers.cleanElementId`` (scala:44-56).

    The reference's start-char test is the quirky class ``[a-zA-z]``
    (capital A through lowercase z), which also admits ``[\\]^_`` and
    the backtick — of those only ``_`` survives the preceding ``\\W``
    strip, so a leading underscore is a VALID start (``_foo`` stays
    ``_foo``, not ``e-_foo``)."""
    cleaned = (
        ident.replace("ß", "ss")
        .replace("ä", "ae")
        .replace("ü", "ue")
        .replace("ö", "oe")
    )
    cleaned = re.sub(r"[\W]", "", cleaned)
    if cleaned and re.match(r"[a-zA-Z_]", cleaned[0]):
        return cleaned
    return f"e-{cleaned}"


def parse_long(value: str) -> bool:
    """Java ``Long.parseLong``: Python's int() is unbounded, Java's
    overflows past the signed 64-bit range — an overflow must fall
    through to the parseDouble/formatnum vote."""
    try:
        n = int(value)
    except ValueError:
        return False
    if not (-(1 << 63) <= n < (1 << 63)):
        return False
    return value.strip() == value and "_" not in value


def parse_double(value: str) -> bool:
    """Java ``Double.parseDouble`` after the reference's comma/⎖ → point
    substitution.  Python's float() is the closest portable analogue;
    underscores (Python-only lenience) are rejected."""
    v = value.replace(DECIMAL_COMMA, DECIMAL_POINT).replace(
        DECIMAL_UNICODE, DECIMAL_POINT
    )
    if "_" in v:
        return False
    try:
        float(v)
    except ValueError:
        return False
    return True


def parse_sql_date(value: str) -> bool:
    """≙ ``parseDate`` via ``java.sql.Date.valueOf`` (scala:212-219).

    The JDK checks only the field widths (4-digit year, 1-2 digit
    month/day), month 1-12 and day 1-31, then hands off to a LENIENT
    calendar — ``2020-02-30`` normalizes to 2020-03-01 and is
    ACCEPTED. No calendar-validity check here, to match."""
    m = re.fullmatch(r"(\d{4})-(\d{1,2})-(\d{1,2})", value)
    return (
        m is not None
        and 1 <= int(m.group(2)) <= 12
        and 1 <= int(m.group(3)) <= 31
    )


def parse_sql_time(value: str) -> bool:
    """≙ ``parseTime`` via ``java.sql.Time.valueOf`` (scala:227-234):
    colon layout only — the deprecated Time constructor is lenient, so
    ``25:00:00`` rolls over and is ACCEPTED (no range checks)."""
    return re.fullmatch(r"(\d+):(\d+):(\d+)", value) is not None


def parse_sql_timestamp(value: str) -> bool:
    """≙ ``parseTimestamp`` via ``java.sql.Timestamp.valueOf`` on the
    T→space form (scala:242-249): dash/colon layout + ≤9 fraction
    digits — the deprecated Timestamp constructor is lenient, so hour
    25 or month 13 normalize and are ACCEPTED (no range checks)."""
    v = value.replace("T", " ")
    return (
        re.fullmatch(r"(\d+)-(\d+)-(\d+) (\d+):(\d+):(\d+)(\.\d{1,9})?", v)
        is not None
    )


# --- decimal separator voting -------------------------------------------------

# Literal ports of the reference's Java regexes, quirks included: the
# trailing character class ``[\d{1,2}|\d{4,]`` matches exactly ONE
# char from {digit, '{', '}', ',', '|', 1, 2, 4}; Python's re gives it
# the same semantics, so the FP/FN behavior is identical.
_DOT_SEP_1 = re.compile(r"-?[\d,]+(\.)[\d{1,2}|\d{4,]$")
_DOT_SEP_2 = re.compile(r"-?[\d,]+(\.)\d+$")
_COMMA_SEP_1 = re.compile(r"-?[\d\.]+(,)[\d{1,2}|\d{4,]$")
_COMMA_SEP_2 = re.compile(r"-?[\d\.]+(,)\d+$")
_UNI_SEP_1 = re.compile(r"-?[\d\.,]+(" + DECIMAL_UNICODE + r")[\d{1,2}|\d{4,]$")
_UNI_SEP_2 = re.compile(r"-?[\d\.,]+(" + DECIMAL_UNICODE + r")\d+$")


def determine_decimal_separator(entries: list[str]) -> str | None:
    """≙ ``ExtractorHelpers.determineSeparator`` — Java ``matches`` is a
    full match, hence fullmatch here."""
    if not entries:
        return None
    for pat, sep in (
        (_DOT_SEP_1, DECIMAL_POINT),
        (_COMMA_SEP_1, DECIMAL_COMMA),
        (_DOT_SEP_2, DECIMAL_POINT),
        (_COMMA_SEP_2, DECIMAL_COMMA),
        (_UNI_SEP_1, DECIMAL_UNICODE),
        (_UNI_SEP_2, DECIMAL_UNICODE),
    ):
        if all(pat.fullmatch(e) for e in entries):
            return sep
    return None


def determine_precision_length(entries: list[str], separator: str) -> int | None:
    """≙ ``ExtractorHelpers.determinePrecisionLength``."""
    if not entries:
        return None
    lengths = []
    for e in entries:
        decimal_part = e[e.rfind(separator) + 1 :]
        lengths.append(len(decimal_part) if re.fullmatch(r"\d*", decimal_part) else 0)
    longest = max(lengths)
    return longest if longest > 0 else None


# --- CSV column vote ----------------------------------------------------------


def _strip_outer_quotes(field: str) -> str:
    return re.sub(r"^[\"']", "", re.sub(r"[\"']$", "", field))


def vote_csv_element(entries: list[str]) -> tuple[str, dict[str, str]]:
    """One column's DFASDL element: ``(tag, attributes)``
    (≙ ``CSVSchemaExtractor.createRow``, the vote cascade only)."""
    is_long = all(
        (not e.startswith("0") and parse_long(e)) if len(e) > 1 else parse_long(e)
        for e in entries
    )
    if is_long:
        date_fmt = determine_specific_format(entries, DATE_FORMATS)
        if date_fmt is not None:
            return "formattime", {"format": date_fmt}
        return "num", {}

    is_formatted_numeric = all(
        (
            not (
                e.startswith("0")
                and DECIMAL_POINT not in e
                and DECIMAL_COMMA not in e
                and DECIMAL_UNICODE not in e
            )
            and parse_double(e)
        )
        if len(e) > 1
        else parse_double(e)
        for e in entries
    )
    seps_seen = {
        DECIMAL_POINT
        if DECIMAL_POINT in e
        else DECIMAL_COMMA
        if DECIMAL_COMMA in e
        else DECIMAL_UNICODE
        if DECIMAL_UNICODE in e
        else ""
        for e in entries
    }
    if is_formatted_numeric and len(seps_seen) < 2:
        sep = determine_decimal_separator(entries) or DECIMAL_POINT
        attrs = {
            "format": GENERAL_FORMATNUM_REGEX,
            "decimal-separator": sep,
        }
        precision = determine_precision_length(entries, sep)
        if precision is not None:
            attrs["max-precision"] = str(precision)
            attrs["max-digits"] = str(38 - precision)
        else:
            attrs["max-digits"] = "38"
        return "formatnum", attrs

    if entries and all(parse_sql_date(e) for e in entries):
        return "date", {}
    if entries and all(parse_sql_time(e) for e in entries):
        return "time", {}
    if entries and all(parse_sql_timestamp(e) for e in entries):
        return "datetime", {}
    for fmts in (TIMESTAMP_FORMATS, DATE_FORMATS, TIME_FORMATS):
        fmt = determine_specific_format(entries, fmts)
        if fmt is not None:
            return "formattime", {"format": fmt}
    return "str", {}


def _java_split(line: str, separator: str) -> list[str]:
    """Java ``String.split(regex)``: the separator is a regex and
    trailing empty strings are dropped."""
    parts = re.split(separator, line)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def extract_dfasdl_csv(
    path: str,
    separator: str = ",",
    has_header: bool = False,
    encoding: str = "utf-8",
) -> str:
    """CSV sample → DFASDL XML string (≙ ``createDFASDL``).

    ``separator`` keeps Java semantics: it is spliced verbatim into
    ``stop-sign`` attributes but interpreted as a *regex* when
    splitting (so ``"\\t"`` — backslash-t — splits on tab exactly as
    the reference's ``String.split`` does).
    """
    with open(path, encoding=encoding) as fh:
        lines = [ln.rstrip("\r\n") for _, ln in zip(range(LINES_TO_EXTRACT), fh)]

    root = ET.Element("dfasdl")
    root.set("xmlns", "http://www.dfasdl.org/DFASDL")
    root.set("semantic", "custom")

    header_names: list[str] | None = None
    if has_header and lines:
        header_names = [clean_element_id(h.strip()) for h in _java_split(lines[0], separator)]
        header_elem = ET.SubElement(root, "elem", {"id": "csv_header"})
        for pos, name in enumerate(header_names):
            attrs = {"id": f"csv_header_{_strip_outer_quotes(name).lower()}"}
            if pos < len(header_names) - 1:
                attrs["stop-sign"] = separator
            ET.SubElement(header_elem, "str", attrs)

    # Column extraction (≙ extractColumns): short rows are padded to
    # the header width so trailing empty columns survive Java's
    # trailing-empty-drop split.
    columns: dict[int, list[str]] = {}
    start = 1 if has_header else 0
    header_size = len(_java_split(lines[0], separator)) if has_header and lines else None
    for line in lines[start:]:
        fields = _java_split(line, separator)
        if header_size is not None and header_size > len(fields):
            fields = fields + [""] * (header_size - len(fields))
        for pos, field in enumerate(fields):
            columns.setdefault(pos, []).append(_strip_outer_quotes(field))

    seq = ET.SubElement(root, "seq", {"id": "lines"})
    row = ET.SubElement(seq, "elem", {"id": "row"})
    for pos in range(len(columns)):
        tag, attrs = vote_csv_element(columns[pos])
        ordered = dict(attrs)
        if pos < len(columns) - 1:
            ordered["stop-sign"] = separator
        if header_names is not None and pos < len(header_names):
            ordered["id"] = _strip_outer_quotes(header_names[pos]).lower()
        else:
            ordered["id"] = f"entry-{pos}"
        ET.SubElement(row, tag, ordered)

    return ET.tostring(root, encoding="unicode")


# --- JSON ---------------------------------------------------------------------


class JsonNumberLexeme(str):
    """Raw JSON number token, preserved by the ``parse_float`` /
    ``parse_int`` load hooks.  Argonaut keeps the source lexeme of a
    number (scale-preserving ``JsonDecimal``), and the reference votes
    on ``valueObject.toString()`` — so ``1.10`` must see precision 2,
    and an integer beyond Long range must fail ``parseLong`` and vote
    formatnum.  A round-trip through Python float/int loses both."""


def _vote_json_value(value) -> tuple[str, dict[str, str]]:
    """Scalar JSON value → DFASDL element
    (≙ ``JSONSchemaExtractor.determineElementParameter``)."""
    if value is None or isinstance(value, bool):
        # Argonaut's isNumber/isString are both false for bool/null, so
        # the reference falls through to a bare ELEMENT.
        return "elem", {}
    if isinstance(value, (int, float, str)):
        if isinstance(value, JsonNumberLexeme):
            # isNumber branch (JSONSchemaExtractor.scala:233-241) on
            # the source lexeme: leading-zero → str, else parseLong →
            # num, parseDouble → formatnum, else str.
            clean = str(value)
            if len(clean) > 1 and clean.startswith("0"):
                name = "str"
            elif parse_long(clean):
                name = "num"
            elif parse_double(clean):
                name = "formatnum"
            else:
                name = "str"
        elif isinstance(value, (int, float)):
            # Already-parsed Python numbers (direct callers without the
            # load hooks): best-effort rendering of the lost lexeme.
            clean = repr(value) if isinstance(value, float) else str(value)
            if len(clean) > 1 and clean.startswith("0"):
                name = "str"
            elif isinstance(value, int):
                name = "num"
            else:
                name = "formatnum"
        else:
            clean = value
            if parse_long(clean):
                name = "str" if len(clean) > 1 and clean.startswith("0") else "num"
            elif parse_double(clean):
                name = "str" if len(clean) > 1 and clean.startswith("0") else "formatnum"
            elif parse_sql_date(clean):
                name = "date"
            elif parse_sql_time(clean):
                name = "time"
            elif parse_sql_timestamp(clean):
                name = "datetime"
            else:
                name = "str"

        attrs: dict[str, str] = {}
        if name in ("str", "num"):
            for fmts in (TIMESTAMP_FORMATS, DATE_FORMATS, TIME_FORMATS):
                fmt = determine_specific_format([clean], fmts)
                if fmt is not None:
                    return "formattime", {"format": fmt}
        if name == "formatnum":
            attrs["format"] = GENERAL_FORMATNUM_REGEX
            attrs["decimal-separator"] = DECIMAL_POINT
            precision = determine_precision_length([clean], DECIMAL_POINT)
            if precision is not None:
                attrs["max-precision"] = str(precision)
                attrs["max-digits"] = str(38 - precision)
            else:
                attrs["max-digits"] = "38"
        return name, attrs
    return "elem", {}


def _child_id(parent: ET.Element, field: str) -> str:
    parent_id = parent.get("id", "")
    cleaned = clean_element_id(field.lower().strip())
    return f"{parent_id}-{cleaned}" if parent_id else cleaned


def _json_walk(node, parent: ET.Element) -> None:
    """≙ ``JSONSchemaExtractor.traverseRec``."""
    if isinstance(node, dict):
        for field, value in node.items():
            if isinstance(value, (dict, list)):
                tag, attrs = "elem", {}
            else:
                tag, attrs = _vote_json_value(value)
            attrs = dict(attrs)
            attrs["id"] = _child_id(parent, field)
            attrs["json-attribute-name"] = clean_element_id(field.strip())
            child = ET.SubElement(parent, tag, attrs)
            _json_walk(value, child)
    elif isinstance(node, list):
        base = parent.get("id", "")
        seq_id = f"{base}-seq" if base else "seq"
        seq = ET.SubElement(parent, "seq", {"id": seq_id, "keepID": "true"})
        row = ET.SubElement(seq, "elem", {"id": f"{seq_id}-row"})
        if node and isinstance(node[0], dict):
            _json_walk(node[0], row)
        elif node:
            tag, attrs = _vote_json_value(node[0])
            attrs = dict(attrs)
            attrs["id"] = f"{seq_id}-row-element"
            ET.SubElement(row, tag, attrs)
        # empty array: bare row element, exactly like the reference


# --- database (SQLite dialect) ------------------------------------------------
#
# ≙ ``DatabaseSchemaExtractor.describeSqliteTable``
# (``DatabaseSchemaExtractor.scala:1040-1160``) + ``createColumnElement``
# (``:1260-1390``) + ``createTableSkeleton`` (``:1234-1243``) +
# ``createFormatnumRegex`` (``ExtractorHelpers.scala:65-85``), driven by
# the same PRAGMA queries through the stdlib ``sqlite3`` module instead
# of JDBC. Conformance is pinned live against the reference's own
# ``databaseSchemaExtractor/extract-sqlite.xml`` /
# ``create-tables-sqlite.xml`` goldens.

# ``createColumnElement`` type dispatch. NUMBER/BINARY_FLOAT/
# BINARY_DOUBLE appear in BOTH the num and formatnum case lists of the
# reference's match — the FIRST case wins in Scala, so they belong to
# num here (with the NUMBER+precision sub-branch).
_DB_BINARY_TYPES = {
    "BINARY", "BYTEA", "BLOB", "CLOB", "TINYBLOB", "MEDIUMBLOB",
    "LONGBLOB", "NCLOB", "BFILE", "RAW", "LONG RAW",
}
_DB_DATETIME_TYPES = {
    "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIMESTAMP WITHOUT TIME ZONE",
    "DATETIME", "TIMESTAMP WITHOUT LOCAL TIME ZONE", "DATETIME2",
    "DATETIMEOFFSET", "SMALLDATETIME",
}
_DB_TIME_TYPES = {
    "TIME", "TIME WITH TIME ZONE", "TIME WITHOUT TIME ZONE",
    "INTERVAL DAY TO SECOND", "INTERVAL YEAR TO MONTH",
}
_DB_NUM_TYPES = {
    "BIGINT", "IDENTITY", "INT", "SMALLINT", "TINYINT", "BIGSERIAL",
    "INTEGER", "SERIAL", "SMALLSERIAL", "BIT", "BOOL", "BOOLEAN", "DEC",
    "MEDIUMINT", "NUMBER", "BINARY_FLOAT", "BINARY_DOUBLE",
}
_DB_FORMATNUM_TYPES = {
    "DECIMAL", "DOUBLE", "REAL", "DOUBLE PRECISION", "NUMERIC", "FLOAT",
}

_INT_MAX = 2147483647


def create_formatnum_regex(length: int, precision: int, separator: str = ".") -> str:
    """≙ ``ExtractorHelpers.createFormatnumRegex``."""
    sep = r"\." if separator == "." else ","
    if length > 0:
        if precision > 0:
            return f"(-?\\d{{0,{length - precision}}}{sep}\\d{{0,{precision}}})"
        return f"(-?\\d{{1,{length}}})"
    if precision > 0:
        return f"(-?\\d*?{sep}\\d{{0,{precision}}})"
    return GENERAL_FORMATNUM_REGEX


def _is_value_numeric(x: str) -> bool:
    """≙ ``isValueNumeric`` — all digits (so '-1' or '1.5' are NOT)."""
    return bool(x) and all(c.isdigit() for c in x)


def create_column_element(
    parent: ET.Element,
    table_name: str,
    column_name: str,
    column_type: str,
    column_length: int = 0,
    column_precision: int = 0,
    column_default: str | None = None,
    column_is_autoincrement: bool = False,
    column_foreignkey: str | None = None,
) -> ET.Element:
    """≙ ``createColumnElement`` — one DFASDL data element per column."""
    t = column_type.upper()
    attrs: dict[str, str] = {}
    if t in _DB_BINARY_TYPES:
        # Reference FIXME: binary columns still emit as str elements.
        tag = "str"
        if 0 < column_length <= _INT_MAX:
            attrs["max-length"] = str(column_length)
        if column_default:
            attrs["defaultstr"] = column_default
    elif t == "DATE":
        tag = "date"
    elif t in _DB_DATETIME_TYPES:
        tag = "datetime"
    elif t in _DB_TIME_TYPES:
        tag = "time"
    elif t in _DB_NUM_TYPES:
        if t == "NUMBER" and column_precision > 0:
            tag = "formatnum"
            if column_default:
                attrs["defaultnum"] = column_default
            attrs["max-precision"] = str(column_precision)
            attrs["decimal-separator"] = "."
            attrs["format"] = create_formatnum_regex(column_length, column_precision)
        else:
            tag = "num"
            if column_default and _is_value_numeric(column_default.strip()):
                attrs["defaultnum"] = column_default.strip()
            if column_precision > 0:
                attrs["precision"] = str(column_precision)
        if column_length > 0:
            attrs["max-digits"] = str(column_length)
    elif t in _DB_FORMATNUM_TYPES:
        tag = "formatnum"
        if column_precision > 0:
            attrs["max-precision"] = str(column_precision)
            attrs["format"] = create_formatnum_regex(column_length, column_precision)
            attrs["decimal-separator"] = "."
        else:
            attrs["format"] = create_formatnum_regex(column_length, column_precision)
        if column_default and _is_value_numeric(column_default):
            attrs["defaultnum"] = column_default
        if column_length > 0:
            attrs["max-digits"] = str(column_length)
    else:
        tag = "str"
        if 0 < column_length <= _INT_MAX:
            attrs["max-length"] = str(column_length)
        if column_default:
            attrs["defaultstr"] = column_default
    attrs["id"] = f"{table_name}_row_{column_name}"
    attrs["db-column-name"] = column_name
    if column_is_autoincrement:
        attrs["db-auto-inc"] = "true"
    if column_foreignkey is not None:
        attrs["db-foreign-key"] = column_foreignkey.lower()
    return ET.SubElement(parent, tag, attrs)


_TYPE_PARAMS = re.compile(r"\((\d+),?(\d+)?\)")


def _split_sql_type(type_string: str) -> tuple[str, int, int]:
    """'DECIMAL(4,2)' → ('DECIMAL', 4, 2); bare types → (t, 0, 0)."""
    if "(" not in type_string:
        return type_string, 0, 0
    base = type_string[: type_string.index("(")]
    m = _TYPE_PARAMS.search(type_string)
    if m is None:
        return base, 0, 0
    return base, int(m.group(1)), int(m.group(2)) if m.group(2) else 0


def describe_sqlite_table(conn, table: str, parent: ET.Element) -> ET.Element | None:
    """One table → ``<seq id=t><elem id=t_row>…`` (≙ describeSqliteTable)."""
    if table.lower() == "sqlite_sequence":
        return None
    cur = conn.cursor()
    seq = ET.SubElement(parent, "seq", {"id": table.strip()})
    # SQLite's getTables statement returns names only, so the skeleton
    # never carries db-primary-key (the H2/MySQL paths do) — faithful.
    row = ET.SubElement(seq, "elem", {"id": f"{table.strip()}_row"})
    fk_cols: dict[str, str] = {}
    try:
        for r in cur.execute(f"PRAGMA foreign_key_list({table})"):
            # columns: id, seq, table, from, to, ...
            fk_cols[r[3]] = f"{r[2]}_row_{r[4]}"
    except Exception:  # noqa: BLE001 - ≙ reference's swallowed SQLException
        pass
    pk_cols = [
        r[1] for r in cur.execute(f"PRAGMA table_info({table})") if r[5] > 0
    ]
    for r in cur.execute(f"PRAGMA table_info({table})"):
        # columns: cid, name, type, notnull, dflt_value, pk
        name, type_string, dflt = r[1], r[2] or "", r[4]
        base, length, precision = _split_sql_type(type_string)
        is_auto = (
            base.upper() in ("INTEGER", "INT")
            and len(pk_cols) == 1
            and name in pk_cols
        )
        create_column_element(
            row,
            table.strip(),
            name.lower(),
            base,
            length,
            precision,
            dflt if dflt not in (None, "") else None,
            is_auto,
            fk_cols.get(name),
        )
    return seq


def extract_dfasdl_sqlite(conn) -> str:
    """SQLite database → DFASDL XML string (≙ ``extractFromDatabase``
    through the SQLite dialect branch), over a stdlib ``sqlite3``
    connection. Driver-side metadata only — no Spark job."""
    root = ET.Element("dfasdl")
    root.set("xmlns", "http://www.dfasdl.org/DFASDL")
    root.set("semantic", "custom")
    tables = [
        r[0]
        for r in conn.execute(
            "SELECT name FROM sqlite_master WHERE UPPER(type) = 'TABLE' ORDER BY name"
        )
    ]
    for t in tables:
        describe_sqlite_table(conn, t, root)
    return ET.tostring(root, encoding="unicode")


def extract_dfasdl_json(path: str, encoding: str = "utf-8") -> str:
    """JSON document → DFASDL XML string (≙ ``traverseJSON``)."""
    import json as _json

    with open(path, encoding=encoding) as fh:
        # Keep number lexemes verbatim — see JsonNumberLexeme.
        doc = _json.load(
            fh, parse_float=JsonNumberLexeme, parse_int=JsonNumberLexeme
        )

    root = ET.Element("dfasdl")
    root.set("xmlns", "http://www.dfasdl.org/DFASDL")
    root.set("semantic", "custom")
    json_root = ET.SubElement(root, "elem")
    # The reference traverses FIRST and sets the root id afterwards,
    # so top-level children get un-prefixed ids.
    _json_walk(doc, json_root)
    json_root.set("id", "json-root")
    return ET.tostring(root, encoding="unicode")
