"""Golden-fixture conformance for DFASDL schema extraction.

Runs :mod:`tensei_agent_spark.dfasdl_extract` against every CSV↔DFASDL
and JSON↔DFASDL golden pair the reference ships
(``src/test/resources/com/wegtam/tensei/agent/helpers/
{csv,json}SchemaExtractor/``) and asserts the generated document is
structurally identical — same element tags, ids, stop-signs, formats,
decimal separators, precisions — to the reference's expected output.

The reference harness (``CSVSchemaExtractorTest.scala``) supplies the
separator and header flag as options, so this suite derives them from
the golden itself (stop-sign attribute / csv_header presence) and
conformance-tests the *type-vote + document shape*, which is what the
goldens pin.

Pure driver-side — no SparkSession needed.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pytest

from tensei_agent_spark.dfasdl_extract import (
    extract_dfasdl_csv,
    extract_dfasdl_json,
)

CSV_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/helpers/"
    "csvSchemaExtractor"
)
JSON_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/helpers/"
    "jsonSchemaExtractor"
)

requires_fixtures = pytest.mark.skipif(
    not os.path.isdir(CSV_DIR), reason="reference fixture corpus not present"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _canon(node: ET.Element):
    """(tag, sorted attrs, children) — whitespace/attr-order agnostic."""
    attrs = {k.rsplit("}", 1)[-1]: v for k, v in node.attrib.items()}
    return (_local(node.tag), tuple(sorted(attrs.items())), tuple(_canon(c) for c in node))


def _parse(xml_str: str):
    return _canon(ET.fromstring(xml_str))


def _golden_csv_options(golden_root: ET.Element) -> tuple[str, bool]:
    has_header = any(
        _local(e.tag) == "elem" and e.get("id") == "csv_header"
        for e in golden_root
    )
    sep = ","
    for e in golden_root.iter():
        if e.get("stop-sign"):
            sep = e.get("stop-sign")
            break
    return sep, has_header


def _csv_pairs() -> list[str]:
    if not os.path.isdir(CSV_DIR):
        return []
    return sorted(
        f[:-4] for f in os.listdir(CSV_DIR) if f.endswith(".csv")
    )


def _json_pairs() -> list[str]:
    if not os.path.isdir(JSON_DIR):
        return []
    return sorted(
        f[:-5] for f in os.listdir(JSON_DIR) if f.endswith(".json")
    )


@requires_fixtures
@pytest.mark.parametrize("name", _csv_pairs())
def test_csv_golden_conformance(name):
    golden_xml = open(os.path.join(CSV_DIR, f"{name}.xml"), encoding="utf-8").read()
    golden_root = ET.fromstring(golden_xml)
    sep, has_header = _golden_csv_options(golden_root)
    produced = extract_dfasdl_csv(
        os.path.join(CSV_DIR, f"{name}.csv"), separator=sep, has_header=has_header
    )
    assert _parse(produced) == _canon(golden_root), (
        f"{name}: produced DFASDL diverges from reference golden\n{produced}"
    )


@requires_fixtures
@pytest.mark.parametrize("name", _json_pairs())
def test_json_golden_conformance(name):
    golden_xml = open(
        os.path.join(JSON_DIR, f"{name}-dfasdl.xml"), encoding="utf-8"
    ).read()
    produced = extract_dfasdl_json(os.path.join(JSON_DIR, f"{name}.json"))
    assert _parse(produced) == _parse(golden_xml), (
        f"{name}: produced DFASDL diverges from reference golden\n{produced}"
    )


def test_extracted_dfasdl_feeds_the_compiler(tmp_path):
    """The emitted DFASDL round-trips through plans.dfasdl.parse_dfasdl —
    extraction output is directly consumable by the pipeline compiler."""
    from tensei_agent_spark.plans.dfasdl import parse_dfasdl

    p = tmp_path / "people.csv"
    p.write_text(
        "name,joined,score\n"
        "ada,01.02.2020,1.50\n"
        "bob,02.03.2021,2.25\n"
    )
    xml_str = extract_dfasdl_csv(str(p), separator=",", has_header=True)
    seqs = parse_dfasdl(xml_str)
    (lines,) = [s for s in seqs if s.seq_id == "lines"]
    names = [f.name for f in lines.fields]
    assert names == ["name", "joined", "score"]


# --- reference-quirk unit pins (ADVICE round-6 items) -------------------------


def test_clean_element_id_leading_underscore_is_valid_start():
    # cleanElementId's [a-zA-z] class admits '_' (the only \W survivor
    # in the Z..a gap): '_foo' stays '_foo', digits still prefix.
    from tensei_agent_spark.dfasdl_extract import clean_element_id

    assert clean_element_id("_foo") == "_foo"
    assert clean_element_id("7foo") == "e-7foo"
    assert clean_element_id("foo bar") == "foobar"


def test_sql_parsers_are_jdk_lenient():
    # java.sql.*.valueOf checks layout, not the calendar: impossible
    # dates normalize, clocks roll over.
    from tensei_agent_spark.dfasdl_extract import (
        parse_sql_date,
        parse_sql_time,
        parse_sql_timestamp,
    )

    assert parse_sql_date("2020-02-30")       # normalizes to Mar 1
    assert not parse_sql_date("2020-13-01")   # month 1-12 IS checked
    assert not parse_sql_date("2020-01-32")   # day 1-31 IS checked
    assert not parse_sql_date("20-01-01")     # year must be 4 digits
    assert parse_sql_time("25:00:00")         # lenient Time rolls over
    assert parse_sql_timestamp("2020-02-30 25:61:00")
    assert parse_sql_timestamp("2020-01-01T10:00:00.123456789")
    assert not parse_sql_timestamp("2020-01-01 10:00:00.1234567890")


def test_format_clock_check_uses_captures_not_trailing_numbers():
    from tensei_agent_spark.dfasdl_extract import (
        TIMESTAMP_FORMATS,
        determine_specific_format,
    )

    zoned = [e for e in TIMESTAMP_FORMATS if e[0] == "EEE, dd LLL yyyy HH:mm:ss z"]
    # Zone-offset digits must NOT be mistaken for clock fields: with
    # the trailing-numbers slice, '+5:30' displaced the real clock and
    # rejected a value Java accepts.
    assert (
        determine_specific_format(
            ["Tue, 03 Jun 2008 11:05:30 GMT+5:30"], zoned
        )
        == "EEE, dd LLL yyyy HH:mm:ss z"
    )
    h12 = [e for e in TIMESTAMP_FORMATS if e[0] == "yyyy-MM-dd h:mm:ss a"]
    # 'h' (clock-hour-of-am-pm) caps at 12 — 13-23 is a Java parse
    # error; 0 is admitted (SMART resolver, goldens contain 0:00:00 AM)
    assert determine_specific_format(["2015-01-01 0:30:00 AM"], h12) is not None
    assert determine_specific_format(["2015-01-01 14:30:00 PM"], h12) is None


def test_json_number_vote_preserves_source_lexeme(tmp_path):
    import xml.etree.ElementTree as ET

    from tensei_agent_spark.dfasdl_extract import extract_dfasdl_json

    p = tmp_path / "nums.json"
    p.write_text(
        '{"scaled": 1.10, "huge": 123456789012345678901234567890, "plain": 7}'
    )
    root = ET.fromstring(extract_dfasdl_json(str(p)))
    ns = "{http://www.dfasdl.org/DFASDL}"
    by_id = {e.get("id"): e for e in root.iter() if e.get("id")}
    scaled = by_id["scaled"]
    # Argonaut renders '1.10' scale-preservingly → max-precision 2
    # (a float round-trip would repr to '1.1' → precision 1).
    assert scaled.tag == f"{ns}formatnum"
    assert scaled.get("max-precision") == "2"
    # Long-overflow integer fails parseLong → formatnum, not num.
    assert by_id["huge"].tag == f"{ns}formatnum"
    assert by_id["plain"].tag == f"{ns}num"


# --- database schema extraction (SQLite dialect, live) ------------------------

DB_DIR = (
    "/root/reference/src/test/resources/com/wegtam/tensei/agent/helpers/"
    "databaseSchemaExtractor"
)

requires_db_fixtures = pytest.mark.skipif(
    not os.path.isdir(DB_DIR), reason="reference fixture corpus not present"
)


@requires_db_fixtures
def test_sqlite_extract_golden_conformance():
    """Replays the reference's 'using Sqlite' extraction test
    (``DatabaseSchemaExtractorTest.scala:246-275``) against a LIVE
    sqlite3 database built with the test's exact DDL, and compares the
    emitted document against its own ``extract-sqlite.xml`` golden."""
    import sqlite3

    from tensei_agent_spark.dfasdl_extract import extract_dfasdl_sqlite

    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE accounts (id DOUBLE(17), name VARCHAR(254),"
        " description CLOB(2147483647), birthday DATE(8),"
        " salary DOUBLE(17), points DECIMAL(4,2))"
    )
    conn.execute(
        "CREATE TABLE person (id DOUBLE(17), name VARCHAR(254),"
        " vorname VARCHAR(100), birthday DATE(8))"
    )
    produced = extract_dfasdl_sqlite(conn)
    golden = open(f"{DB_DIR}/extract-sqlite.xml", encoding="utf-8").read()
    assert _parse(produced) == _parse(golden), (
        f"sqlite extraction diverges from reference golden\n{produced}"
    )


@requires_db_fixtures
def test_sqlite_create_tables_golden_conformance():
    """Single-table variant (``DatabaseSchemaExtractorTest.scala:164-
    200``): BIGINT → num, a textual DEFAULT lands as defaultstr —
    pinned by ``create-tables-sqlite.xml`` (a bare ``<seq>`` golden)."""
    import sqlite3

    from tensei_agent_spark.dfasdl_extract import extract_dfasdl_sqlite

    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE accounts (id BIGINT(17), name VARCHAR(254) default foo,"
        " description CLOB(2147483647), birthday DATE(8),"
        " salary DOUBLE(17), points DECIMAL(4,2))"
    )
    produced = ET.fromstring(extract_dfasdl_sqlite(conn))
    (seq,) = list(produced)
    golden = open(f"{DB_DIR}/create-tables-sqlite.xml", encoding="utf-8").read()
    assert _canon(seq) == _parse(golden), (
        "sqlite single-table extraction diverges from reference golden"
    )


def test_sqlite_extract_pk_fk_autoincrement_attributes():
    """SQLite-native pk/fk/auto-inc semantics of describeSqliteTable:
    an INTEGER single-column PK is db-auto-inc, a FOREIGN KEY column
    carries db-foreign-key=<table>_row_<col>, and sqlite_sequence is
    skipped (the H2 twin of this shape is pinned by
    ``extract-tables-h2-pk-fk-ai.xml``; type names differ by dialect)."""
    import sqlite3

    from tensei_agent_spark.dfasdl_extract import extract_dfasdl_sqlite

    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE t1 (id INTEGER PRIMARY KEY AUTOINCREMENT,"
        " name VARCHAR(254))"
    )
    conn.execute(
        "CREATE TABLE t2 (id2 INTEGER PRIMARY KEY,"
        " fkid BIGINT(19), FOREIGN KEY(fkid) REFERENCES t1(id))"
    )
    conn.execute("INSERT INTO t1 (name) VALUES ('x')")  # materializes sqlite_sequence
    root = ET.fromstring(extract_dfasdl_sqlite(conn))
    seqs = {e.get("id"): e for e in root}
    assert set(seqs) == {"t1", "t2"}  # sqlite_sequence skipped
    cols = {e.get("id"): e for s in seqs.values() for e in s[0]}
    t1_id = cols["t1_row_id"]
    assert _local(t1_id.tag) == "num"
    assert t1_id.get("db-auto-inc") == "true"
    fkid = cols["t2_row_fkid"]
    assert fkid.get("db-foreign-key") == "t1_row_id"
    assert fkid.get("max-digits") == "19"
    assert cols["t2_row_id2"].get("db-auto-inc") == "true"
