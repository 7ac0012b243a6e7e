"""Source reader tests (≙ the reference's parser unit tests:
CSV/XML/JSON/text tokenization, choice branching)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tensei_agent_spark.plans import Field, SourceSpec
from tensei_agent_spark.sources import read_source, to_struct_type
from tensei_agent_spark.sources.csv import read_choice


def test_csv_with_schema_and_defaults(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("1, alice ,\n2,bob,9\n")
    spec = SourceSpec(
        "s", "csv", str(p),
        (Field("id", "long"), Field("name"), Field("score", "long", default=0)),
    )
    rows = {r["id"]: r for r in read_source(spark, spec).collect()}
    assert rows[1]["name"] == "alice"  # whitespace trimmed
    assert rows[1]["score"] == 0  # empty → default-num
    assert rows[2]["score"] == 9


def test_text_regex_extraction(spark, tmp_path):
    """formatstr elements over a non-delimited flat grammar."""
    p = tmp_path / "log.txt"
    p.write_text("ts=100 user=alice\nts=200 user=bob\n")
    spec = SourceSpec(
        "s", "text", str(p),
        (Field("ts", "long", format=r"ts=(\d+)"),
         Field("user", "string", format=r"user=(\w+)")),
    )
    rows = sorted(read_source(spark, spec).collect())
    assert [(r["ts"], r["user"]) for r in rows] == [(100, "alice"), (200, "bob")]


def test_choice_cascade(spark, tmp_path):
    """`choice`: ordered alternative layouts, first parse wins
    (BaseParser.scala:250-271)."""
    p = tmp_path / "mixed.csv"
    # layout A: id,name,amount ; layout B: id,name
    p.write_text("1,alice,10\n2,bob\n3,carol,30\n")
    spec = SourceSpec("s", "csv", str(p), None)
    layouts = [
        ((Field("id", "long"), Field("name"), Field("amount", "long")), ","),
        ((Field("id", "long"), Field("name")), ","),
    ]
    df = read_choice(spark, spec, layouts)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["_branch"] == 0 and rows[1]["amount"] == 10
    # branch B has no amount: unified schema pads it with NULL
    assert rows[2]["_branch"] == 1 and rows[2]["amount"] is None
    assert rows[3]["_branch"] == 0


def test_json_explode_path(spark, tmp_path):
    p = tmp_path / "doc.json"
    p.write_text('{"items": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]}')
    spec = SourceSpec(
        "s", "json", str(p),
        (Field("id", "long"), Field("v")),
        {"explodePath": "items"},
    )
    rows = sorted((r["id"], r["v"]) for r in read_source(spark, spec).collect())
    assert rows == [(1, "a"), (2, "b")]


def test_xml_source(spark, tmp_path):
    p = tmp_path / "d.xml"
    p.write_text(
        "<rows><row id=\"1\"><name>ada</name><bal>10.5</bal></row>"
        "<row id=\"2\"><name>alan</name><bal>7.25</bal></row></rows>"
    )
    spec = SourceSpec(
        "s", "xml", str(p),
        (Field("_id", "long"), Field("name"), Field("bal", "decimal(10,2)")),
        {"rowTag": "row"},
    )
    df = read_source(spark, spec)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["name"] == "ada" and str(rows[1]["bal"]) == "10.50"


def test_excel_gated(tmp_path):
    """Excel conversion is import-gated: without an engine it must raise
    the documented NotImplementedError, not crash arbitrarily."""
    from tensei_agent_spark.sources.excel import excel_to_csv

    fake = tmp_path / "wb.xlsx"
    fake.write_bytes(b"PK\x03\x04 not a real workbook")
    with pytest.raises((NotImplementedError, ValueError, Exception)):
        excel_to_csv(str(fake))


def test_struct_type_mapping():
    st = to_struct_type(
        (Field("a", "long"), Field("b", "decimal(12,2)"), Field("c", "date"))
    )
    assert [f.dataType.simpleString() for f in st.fields] == [
        "bigint", "decimal(12,2)", "date",
    ]


def test_csv_locale_decimal_separator(spark, tmp_path):
    """formatnum locale parity: German-style numbers (grouping '.',
    decimal ',') normalize JVM-side before the decimal cast."""
    p = tmp_path / "de.csv"
    p.write_text("widget;1.234,56\nbolt;7,5\nnut;999\n")
    from tensei_agent_spark.plans.spec import Field, SourceSpec
    from tensei_agent_spark.sources import read_source

    spec = SourceSpec(
        name="de",
        format="csv",
        uri=str(p),
        fields=(Field("name", "string"), Field("price", "decimal(10,2)")),
        options={"sep": ";", "decimalSeparator": ",", "groupingSeparator": "."},
    )
    rows = {r["name"]: str(r["price"]) for r in read_source(spark, spec).collect()}
    assert rows == {"widget": "1234.56", "bolt": "7.50", "nut": "999.00"}
