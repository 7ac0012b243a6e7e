"""FileParser conformance: the reference's CSV parser fixtures replayed.

Each fixture triple under
``src/test/resources/com/wegtam/tensei/agent/parsers/FileParsers/CSV``
is (data file, DFASDL, expected-data.xml — the reference's parsed
DataTreeDocument serialized back as the DFASDL with values as text).
The suite parses the data through this engine's sources — the stop-sign
STREAM GRAMMAR, the reference's parse model: quote-unaware (quoted
fixtures keep their literal quotes), per-element trim, regex
stop-signs — and compares every record's every value against the
expected tree.

Covered semantics, fixture by fixture: flat no-seq documents are a
single record (simple-01 family: pipes/semicolon/tabs separators,
full and partial quoting, umlauts); elem-wrapped single records
(complex-01) and their fixseq-bounded variant; typed num/formatnum
rows (simple-03); row-level choice with start-sign rejection and an
empty-row catch-all branch (complex-02); per-element trim variants
(complex-03); empty trailing columns (empty-column-at-end); nested
seq-in-seq cell explosion (sequence-stop-sign-01).

choice-01/02 (PER-FIELD choice — each column independently
num-or-str) dispatch each token first-parse-wins across the branch
fields, so every record lands its value under the element id of the
branch that matched ("42" under num-field3, "test01" under
str-field3), exactly as the expected trees record.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pytest

from tensei_agent_spark.plans.dfasdl import parse_dfasdl, source_spec
from tensei_agent_spark.sources import read_source

CSV_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/parsers"
    "/FileParsers/CSV"
)

requires_fixtures = pytest.mark.skipif(
    not os.path.isdir(CSV_DIR), reason="reference fixture corpus not present"
)

_DATA_TAGS = {
    "str", "num", "formatstr", "formatnum", "formattime",
    "date", "time", "datetime", "bin", "ref",
}
_WRAPPERS = {"elem", "celem", "choice"}


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _leaf_id(e):
    eid = e.get("id")
    if eid:
        return eid
    cls = e.get("class") or ""
    return cls.split("id:", 1)[-1]


def _leaves(node):
    out = []
    for c in node:
        t = _local(c.tag)
        if t in _DATA_TAGS:
            out.append(c)
        elif t in _WRAPPERS:
            out.extend(_leaves(c))
    return out


def expected_records(path):
    """expected-data.xml → list of {element id: text-or-None} records."""
    root = ET.parse(path).getroot()
    seq = next(
        (c for c in root if _local(c.tag) in ("seq", "fixseq")), None
    )
    if seq is None:
        leaves = _leaves(root)
        return [{_leaf_id(e): e.text for e in leaves}]
    return [
        {_leaf_id(e): e.text for e in _leaves(child)}
        for child in seq
        if _local(child.tag) in _WRAPPERS
    ]


def _norm(v):
    """'' / None / the reference's literal Option rendering 'None' all
    mean 'no value'; integral values compare canonically (the reference
    keeps the source LEXEME for parsed nums — '01' in
    choice-02-expected-data.xml is the Long 1)."""
    if v is None or v == "" or v == "None":
        return None
    s = str(v)
    try:
        return str(int(s))
    except ValueError:
        return s


def _rows_to_records(df):
    cols = [c for c in df.columns if not c.startswith("_")]
    out = []
    for r in df.collect():
        rec = {}
        for c in cols:
            v = r[c]
            if v is not None:
                rec[c] = str(v)
        out.append(rec)
    return out


def _compare(got_records, exp_records):
    assert len(got_records) == len(exp_records), (
        f"record count: got {len(got_records)} expected {len(exp_records)}"
    )
    for i, (got, exp) in enumerate(zip(got_records, exp_records)):
        exp_vals = {k: _norm(v) for k, v in exp.items()}
        for k, ev in exp_vals.items():
            gv = _norm(got.get(k))
            assert gv == ev, f"record {i} field {k!r}: got {gv!r} expected {ev!r}"
        # no spurious extra values outside the expected branch
        extra = {k: v for k, v in got.items() if k not in exp_vals and _norm(v)}
        assert not extra, f"record {i} has unexpected values {extra}"


# (fixture stem, data file) — read through the stream grammar.
GRAMMAR_CASES = [
    ("simple-01", "simple-01.csv"),
    ("simple-01-pipes", "simple-01-pipes.csv"),
    ("simple-01-quotes", "simple-01-quotes.csv"),
    ("simple-01-quotes-partial", "simple-01-quotes-partial.csv"),
    ("simple-01-semicolon", "simple-01-semicolon.csv"),
    ("simple-01-tabs", "simple-01.tsv"),
    ("simple-02", "simple-02.csv"),
    ("simple-03", "simple-03.csv"),
    ("complex-01", "complex-01.csv"),
    ("complex-01-with-fixseq", "complex-01.csv"),
    ("complex-03-with-seq", "complex-03.csv"),
    ("empty-column-at-end", "empty-column-at-end.csv"),
    ("choice-01", "choice-01.csv"),
    ("choice-02", "choice-02.csv"),
]


@requires_fixtures
@pytest.mark.parametrize("stem,data", GRAMMAR_CASES, ids=[c[0] for c in GRAMMAR_CASES])
def test_csv_parser_conformance(spark, stem, data):
    with open(f"{CSV_DIR}/{stem}.xml", encoding="utf-8") as fh:
        xml = fh.read()
    schema = parse_dfasdl(xml)[0]
    spec = source_spec(xml, "in", f"{CSV_DIR}/{data}", fmt="csv",
                       seq_id=schema.seq_id)
    spec.options["stream_grammar"] = True
    df = read_source(spark, spec)
    _compare(
        _rows_to_records(df),
        expected_records(f"{CSV_DIR}/{stem}-expected-data.xml"),
    )


@requires_fixtures
def test_csv_parser_conformance_choice_rows(spark):
    """complex-02-with-seq: row-level choice — a 6-column branch guarded
    by start-sign="\\w" on its first element, and a single-str catch-all
    branch that absorbs empty lines as empty-row records."""
    from tensei_agent_spark.plans.spec import SourceSpec
    from tensei_agent_spark.sources.csv import read_choice

    with open(f"{CSV_DIR}/complex-02-with-seq.xml", encoding="utf-8") as fh:
        xml = fh.read()
    schema = parse_dfasdl(xml)[0]
    layouts = [(schema.fields, schema.options.get("sep", ","))]
    for alt in schema.options.get("alt_layouts", ()):
        layouts.append((alt, schema.options.get("sep", ",")))
    spec = SourceSpec("in", "csv", f"{CSV_DIR}/complex-02.csv", schema.fields)
    df = read_choice(spark, spec, layouts)
    _compare(
        _rows_to_records(df),
        expected_records(f"{CSV_DIR}/complex-02-with-seq-expected-data.xml"),
    )


@requires_fixtures
def test_csv_parser_conformance_nested_seq(spark):
    """sequence-stop-sign-01: a seq of seqs — outer rows split on the
    seq stop-sign (line ends), inner cells on commas; every CELL is one
    record of the inner layout. Spark-first: split + posexplode, fully
    parallel over lines."""
    from pyspark.sql import functions as F

    # expected tree nests seq-in-seq: one <elem> per CELL
    root = ET.parse(
        f"{CSV_DIR}/sequence-stop-sign-01-expected-data.xml"
    ).getroot()
    exp = [
        {_leaf_id(e): e.text for e in _leaves(cell)}
        for line in next(c for c in root if _local(c.tag) == "seq")
        for cell in line
        if _local(cell.tag) == "elem"
    ]
    lines = spark.read.text(f"{CSV_DIR}/sequence-stop-sign-01.csv")
    cells = lines.select(
        F.explode(F.split("value", ",")).alias("data")
    )
    _compare(_rows_to_records(cells), exp)


# --- vCard grammar (multi-line records, label:value pairs) -----------------------

VCARD_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/parsers"
    "/FileParsers/vCard"
)


def _expected_values(path):
    """Leaf TEXTS in document order, per record (label elements have no
    id — positional comparison)."""
    root = ET.parse(path).getroot()
    seq = next((c for c in root if _local(c.tag) in ("seq", "fixseq")), None)
    groups = (
        [c for c in seq if _local(c.tag) in _WRAPPERS]
        if seq is not None
        else [root]
    )
    return [[e.text for e in _leaves(g)] for g in groups]


def _vcard_case(spark, stem, data):
    with open(f"{VCARD_DIR}/{stem}.xml", encoding="utf-8") as fh:
        xml = fh.read()
    schema = parse_dfasdl(xml)[0]
    spec = source_spec(xml, "in", f"{VCARD_DIR}/{data}", fmt="csv",
                       seq_id=schema.seq_id)
    spec.options["stream_grammar"] = True
    df = read_source(spark, spec)
    got = [
        [None if v in (None, "") else str(v) for v in r]
        for r in df.collect()
    ]
    exp = [
        [_norm(v) for v in rec]
        for rec in _expected_values(f"{VCARD_DIR}/{stem}-expected-data.xml")
    ]
    assert got == exp


@pytest.mark.skipif(
    not os.path.isdir(VCARD_DIR), reason="reference fixture corpus not present"
)
def test_vcard_simple_conformance(spark):
    """vCard/simple-01 — ONE 17-line record; label fields stop at ':',
    value fields at end-of-line, so the record regex spans the lines
    (the PHOTO value keeps its inner ':' — only the FIRST colon is the
    label separator)."""
    _vcard_case(spark, "simple-01", "simple-01.vcf")


@pytest.mark.skipif(
    not os.path.isdir(VCARD_DIR), reason="reference fixture corpus not present"
)
def test_vcard_complex_conformance(spark):
    """vCard/complex-01 — a SEQ of multi-line vCards (label elements
    carry no id, exercising the positional field-name synthesis); each
    17-line card is one record."""
    _vcard_case(spark, "complex-01", "complex-01.vcf")


# --- XML grammar (XmlFileParser fixtures) ----------------------------------------

XML_DIR = "/root/reference/src/test/resources/com/wegtam/tensei/agent/parsers"


@pytest.mark.skipif(
    not os.path.isdir(XML_DIR), reason="reference fixture corpus not present"
)
def test_xml_simple_conformance(spark):
    """simple-xml-dfasdl + simple-dfasdl-data.xml — element-per-column
    rows; parse-identity against the source document's own values."""
    with open(f"{XML_DIR}/simple-xml-dfasdl.xml", encoding="utf-8") as fh:
        xml = fh.read()
    spec = source_spec(xml, "in", f"{XML_DIR}/simple-dfasdl-data.xml",
                       fmt="xml", seq_id="rows")
    spec.options["rowTag"] = "row"
    got = [
        (r["firstname"], r["lastname"], r["email"], str(r["birthday"]))
        for r in read_source(spark, spec).collect()
    ]
    doc = ET.parse(f"{XML_DIR}/simple-dfasdl-data.xml").getroot()
    exp = [
        tuple(row.find(t).text for t in
              ("firstname", "lastname", "email", "birthday"))
        for row in doc
    ]
    assert sorted(got) == sorted(exp) and len(exp) == 5


@pytest.mark.skipif(
    not os.path.isdir(XML_DIR), reason="reference fixture corpus not present"
)
def test_xml_stacked_conformance(spark):
    """simple-xml-stacked-dfasdl — a nested <elem id="name"> whose
    children map via xml-element-name: the compiler derives the struct
    paths name.firstname / name.lastname and the XML reader resolves
    them."""
    with open(f"{XML_DIR}/simple-xml-stacked-dfasdl.xml", encoding="utf-8") as fh:
        xml = fh.read()
    schema = parse_dfasdl(xml)[0]
    assert [f.name for f in schema.fields] == [
        "name.firstname", "name.lastname", "email", "birthday",
    ]
    spec = source_spec(xml, "in", f"{XML_DIR}/simple-dfasdl-stacked-data.xml",
                       fmt="xml", seq_id="rows")
    spec.options["rowTag"] = "row"
    rows = {r["email"]: r for r in read_source(spark, spec).collect()}
    assert rows["gauss@example.com"]["name.firstname"] == "Johann Carl Friedrich"
    assert rows["gauss@example.com"]["name.lastname"] == "Gauß"
    assert str(rows["br@example.com"]["birthday"]) == "1826-09-17"


@pytest.mark.skipif(
    not os.path.isdir(XML_DIR), reason="reference fixture corpus not present"
)
def test_xml_nested_seq_conformance(spark):
    """complex-small-xml-dfasdl — per-row nested seq (awards): rows with
    N awards yield N child records, an empty <awards/> yields ONE empty
    award record (the reference emits an empty award-complete element,
    complex-small-xml-dfasdl-expected-data.xml). Value-exact against the
    expected tree via explode_outer."""
    from pyspark.sql import functions as F
    from tensei_agent_spark.plans.spec import SourceSpec
    from tensei_agent_spark.sources import read_source as rs

    df = rs(spark, SourceSpec(
        "in", "xml",
        f"{XML_DIR}/complex-dfasdl-small-data.xml",
        None, {"rowTag": "row"},
    ))
    flat = df.select(
        "firstname",
        F.explode_outer("awards.award").alias("award"),
    ).select(
        "firstname",
        F.col("award.year").alias("year"),
        F.col("award.name").alias("name"),
    )
    got = {
        (r["firstname"], None if r["year"] is None else str(r["year"]),
         r["name"])
        for r in flat.collect()
    }

    root = ET.parse(
        f"{XML_DIR}/complex-small-xml-dfasdl-expected-data.xml"
    ).getroot()
    exp = set()
    seq = next(c for c in root if _local(c.tag) == "seq")
    for row in seq:
        first = next(
            e.text for e in row if "firstname" in (e.get("class") or "")
        )
        awards_seq = next(c for c in row if _local(c.tag) == "seq")
        for award in awards_seq:
            # leaf ids here are compare-helper-NN; the semantic name is
            # the class suffix (award-complete-year → year)
            vals = {
                ((e.get("class") or "").split("id:", 1)[-1]).rsplit("-", 1)[-1]:
                e.text
                for e in _leaves(award)
            }
            exp.add((first, vals.get("year"), vals.get("name")))
    assert got == exp


# --- JSON grammar (JsonFileParser example fixture) --------------------------------

JSON_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/parsers"
    "/FileParsers/JSON"
)


@pytest.mark.skipif(
    not os.path.isdir(JSON_DIR), reason="reference fixture corpus not present"
)
def test_json_nested_seq_conformance(spark):
    """example-dfasdl — the persons array lives at a JSON path inside
    wrapper elems; the compiler discovers the nested seq and records
    its explodePath, and json-attribute-name drives both the path
    segments and the struct field names (name.firstname). Values are
    the reference test's own assertions
    (JsonFileParserTest.scala:116-150: 2 person rows, Max/Eva,
    apartment 4 as a Long; house-size-seq 3 rows)."""
    with open(f"{JSON_DIR}/example-dfasdl.xml", encoding="utf-8") as fh:
        xml = fh.read()

    persons = source_spec(xml, "in", f"{JSON_DIR}/example.json",
                          fmt="json", seq_id="persons-seq")
    assert persons.options["explodePath"] == "persons"
    rows = read_source(spark, persons).collect()
    assert len(rows) == 2
    by_first = {r["name.firstname"]: r for r in rows}
    assert set(by_first) == {"Max", "Eva"}
    assert by_first["Eva"]["apartment"] == 4
    assert by_first["Max"]["name.lastname"] == "Mustermann"
    assert str(by_first["Max"]["birthday"]) == "1997-03-21"
    assert str(by_first["Eva"]["lastPay"]) == "2015-11-01 12:34:55"

    sizes = source_spec(xml, "in", f"{JSON_DIR}/example.json",
                        fmt="json", seq_id="house-size-seq")
    assert sizes.options["explodePath"] == "house.size"
    vals = [r[0] for r in read_source(spark, sizes).collect()]
    assert sorted(vals) == [15, 30, 45]


# --- DatabaseParser (formatnum over VARCHAR money columns) ------------------------

DB_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/parsers"
    "/DatabaseParsers"
)


@pytest.mark.skipif(
    not os.path.isdir(DB_DIR), reason="reference fixture corpus not present"
)
def test_database_parser_formatnum_conformance(spark, tmp_path):
    """DatabaseParserTest.scala:84-155 over DatabaseParsers/simple-01 —
    a VARCHAR salary '1.500.000,83 €' passes the formatnum regex, loses
    its grouping dots and currency sign, and lands as the decimal the
    expected tree records with its inferred decimal-separator=","
    (simple-01-expected-data.xml: 1500000,83). Typed values asserted:
    id Long, birthday LocalDate, salary 1500000.83."""
    from tensei_agent_spark.sinks.jdbc import jvm_execute

    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    url = f"jdbc:derby:{tmp_path}/dbparser;create=true"
    jvm_execute(spark, url, [
        "CREATE TABLE accounts (id BIGINT, name VARCHAR(254),"
        " description VARCHAR(4000), birthday DATE, salary VARCHAR(100))",
        "INSERT INTO accounts VALUES (1, 'Max Mustermann', 'Vorstand',"
        " '1963-01-01', '1.500.000,83 €')",
        "INSERT INTO accounts VALUES (2, 'Eva Musterfrau', 'Aufsichtsrat',"
        " '1968-01-01', '2.800.000,00 €')",
    ], driver)

    with open(f"{DB_DIR}/simple-01.xml", encoding="utf-8") as fh:
        xml = fh.read()
    spec = source_spec(xml, "in", url, fmt="jdbc", seq_id="accounts")
    assert spec.options.get("decimalSeparator") == ","
    spec.options.update({"driver": driver, "table": "accounts"})
    rows = {r["id"]: r for r in read_source(spark, spec).collect()}

    assert rows[1]["name"] == "Max Mustermann"
    assert rows[1]["description"] == "Vorstand"
    assert str(rows[1]["birthday"]) == "1963-01-01"
    assert rows[1]["salary"] == 1500000.83
    assert rows[2]["salary"] == 2800000.00


# --- Stats analyzers over the stats fixture ----------------------------------------

STATS_DIR = "/root/reference/src/test/resources/com/wegtam/tensei/agent/stats"


@pytest.mark.skipif(
    not os.path.isdir(STATS_DIR), reason="reference fixture corpus not present"
)
def test_stats_analyzers_fixture_conformance(spark):
    """StatsTest.scala:297-400 over stats/simple-data.csv — the
    NumericAnalyzer on `alter` (count 3, min 3.0, max 27.0, mean
    18.666666666666668 — the exact double the reference asserts) and
    the StringAnalyzer on `name` length (min 4, max 8, mean
    5.666666666666667)."""
    from tensei_agent_spark.operators.stats import numeric_profile, string_profile

    with open(f"{STATS_DIR}/simple-dfasdl.xml", encoding="utf-8") as fh:
        xml = fh.read()
    spec = source_spec(xml, "in", f"{STATS_DIR}/simple-data.csv",
                       fmt="csv", seq_id="rows")
    # StatsTest feeds the analyzers ALL THREE rows directly (SaveData
    # messages, no FileParser) — the fixture DFASDL's header element is
    # not exercised there, and the data file carries no header line.
    spec.options.pop("leading_lines", None)
    df = read_source(spark, spec)

    num = numeric_profile(df, ["alter"]).first()
    assert (num["n"], num["min_v"], num["max_v"]) == (3, 3.0, 27.0)
    assert num["mean_v"] == 18.666666666666668

    s = string_profile(df, ["name"]).first()
    assert (s["n"], s["min_len"], s["max_len"]) == (3, 4, 8)
    assert s["mean_len"] == 5.666666666666667


@pytest.mark.skipif(
    not os.path.isdir(DB_DIR), reason="reference fixture corpus not present"
)
def test_database_parser_where_filter_conformance(spark, tmp_path):
    """DatabaseParserTest.scala:272-370 over simple-03-where — the seq's
    ``filter="salary > 2000000"`` pushes into the scan and keeps exactly
    the three matching rows (Eva 2.8M, Chris 3.2M, Jack 9.9M); the
    DOUBLE salary stays numeric through the formatnum element."""
    from tensei_agent_spark.sinks.jdbc import jvm_execute

    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    url = f"jdbc:derby:{tmp_path}/dbwhere;create=true"
    jvm_execute(spark, url, [
        "CREATE TABLE accounts (id BIGINT, name VARCHAR(254),"
        " description VARCHAR(4000), birthday DATE, salary DOUBLE)",
        "INSERT INTO accounts VALUES (1, 'Max Mustermann', 'Vorstand',"
        " '1963-01-01', 1500000.83)",
        "INSERT INTO accounts VALUES (2, 'Eva Musterfrau', 'Aufsichtsrat',"
        " '1968-01-01', 2800000.00)",
        "INSERT INTO accounts VALUES (3, 'Marki Mark', 'Gesellschafter',"
        " '1974-02-22', 1900000.00)",
        "INSERT INTO accounts VALUES (4, 'Chris Christoffer', 'IT-Chef',"
        " '1981-06-22', 3200000.00)",
        "INSERT INTO accounts VALUES (5, 'Jack Slater', 'Marketing-Chef',"
        " '1977-11-12', 9900000.00)",
    ], driver)

    with open(f"{DB_DIR}/simple-03-where.xml", encoding="utf-8") as fh:
        xml = fh.read()
    spec = source_spec(xml, "in", url, fmt="jdbc", seq_id="accounts")
    assert spec.options["filter"] == "salary > 2000000"
    spec.options.update({"driver": driver, "table": "accounts"})
    df = read_source(spark, spec)
    rows = {r["id"]: r for r in df.collect()}
    assert sorted(rows) == [2, 4, 5]
    assert rows[2]["name"] == "Eva Musterfrau"
    assert rows[4]["name"] == "Chris Christoffer"
    assert rows[4]["salary"] == 3200000.0
    # the predicate must reach the DB scan, not a post-filter
    assert "PushedFilters: [" in df._jdf.queryExecution().simpleString() or \
        "salary" in df._jdf.queryExecution().executedPlan().toString()


# --- Text grammar (seq bounded by its stop-sign, then a footer) --------------------

TEXT_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/parsers"
    "/FileParsers/Text"
)


@pytest.mark.skipif(
    not os.path.isdir(TEXT_DIR), reason="reference fixture corpus not present"
)
def test_text_seq_stop_sign_conformance(spark):
    """Text/text-01 — the headers seq is bounded by ITS OWN stop-sign
    (``\\A$``, the first blank line): every line before it is one row,
    the blank line itself is an EMPTY row (the expected tree records
    content None for it), and the trailing ``<str id="footer"
    stop-sign="EOF"/>`` absorbs the rest of the file. Spark-first: one
    wholetext split at the first blank line; header lines explode to
    rows."""
    from pyspark.sql import functions as F

    blob = spark.read.text(f"{TEXT_DIR}/text-01.txt", wholetext=True)
    parts = blob.select(
        F.split("value", "\n\n", 2).alias("p")
    ).select(
        F.element_at("p", 1).alias("head"),
        F.element_at("p", 2).alias("footer"),
    )
    # blank-line row: the seq consumed the terminator as one empty row
    rows = parts.select(
        F.explode(
            F.concat(F.split("head", "\n"), F.array(F.lit(None)))
        ).alias("content")
    )
    got = [r["content"] for r in rows.collect()]

    root = ET.parse(f"{TEXT_DIR}/text-01-expected-data.xml").getroot()
    seq = next(c for c in root if _local(c.tag) == "seq")
    exp = [
        next(e.text for e in _leaves(row))
        for row in seq
        if _local(row.tag) in _WRAPPERS
    ]
    assert [_norm(v) for v in got] == [_norm(v) for v in exp]

    footer = parts.first()["footer"]
    exp_footer = next(
        e.text for e in root
        if _local(e.tag) == "str" and _leaf_id(e) == "footer"
    )
    assert footer == exp_footer
