"""DFASDL XML → spec compiler (plans/dfasdl.py): a reference user's
schema documents drive Spark reads/writes directly."""

import pytest

from tensei_agent_spark.plans.dfasdl import (
    parse_dfasdl,
    resolve_foreign_keys,
    source_spec,
    target_spec,
)

CSV_DFASDL = """<?xml version="1.0" encoding="UTF-8"?>
<dfasdl xmlns="http://www.dfasdl.org/DFASDL" semantic="custom" default-encoding="utf-8">
  <seq id="rows" max="100">
    <elem id="row">
      <str id="city" stop-sign=";" max-length="64"/>
      <formattime format="dd.MM.yyyy HH:mm" id="observed" stop-sign=";"/>
      <num id="population" stop-sign=";"/>
      <formatnum id="area" format="([-]?\\d+\\,\\d{2})" decimal-separator="," stop-sign=";"/>
      <str id="note" defaultstr="n/a"/>
    </elem>
  </seq>
</dfasdl>"""

DB_DFASDL = """<?xml version="1.0" encoding="UTF-8"?>
<dfasdl xmlns="http://www.dfasdl.org/DFASDL" semantic="niem">
  <seq id="owners" db-primary-key="id">
    <elem id="owners_row">
      <num id="owners_row_id" db-column-name="id" db-auto-inc="true" max-digits="19"/>
      <str id="owners_row_name" db-column-name="name" max-length="254" unique="true"/>
      <date id="owners_row_since" db-column-name="since"/>
    </elem>
  </seq>
  <seq id="pets">
    <elem id="pets_row">
      <num id="pets_row_id" db-column-name="id" db-auto-inc="true" max-digits="19"/>
      <num id="pets_row_owner" db-column-name="owner_fk" db-foreign-key="owners_row_id" max-digits="19"/>
      <num id="pets_row_price" db-column-name="price" precision="2" max-digits="12" defaultnum="0"/>
    </elem>
  </seq>
</dfasdl>"""

CHOICE_DFASDL = """<?xml version="1.0" encoding="UTF-8"?>
<dfasdl xmlns="http://www.dfasdl.org/DFASDL" semantic="custom">
  <seq id="lines">
    <choice>
      <elem id="long_row">
        <str id="a" stop-sign=","/>
        <str id="b" stop-sign=","/>
        <num id="c"/>
      </elem>
      <elem id="short_row">
        <str id="a2" stop-sign=","/>
        <num id="c2"/>
      </elem>
    </choice>
  </seq>
</dfasdl>"""


def test_parse_csv_dfasdl_types_separator_defaults():
    (s,) = parse_dfasdl(CSV_DFASDL)
    assert s.seq_id == "rows"
    assert s.options["sep"] == ";"
    assert s.options["limit"] == 100
    assert s.options["encoding"] == "utf-8"
    by_name = {f.name: f for f in s.fields}
    assert [f.name for f in s.fields] == [
        "city", "observed", "population", "area", "note",
    ]
    assert by_name["city"].type == "string"
    assert by_name["city"].max_length == 64
    assert by_name["observed"].type == "timestamp"
    assert by_name["observed"].format == "dd.MM.yyyy HH:mm"
    assert by_name["population"].type == "long"
    assert by_name["area"].type == "double"  # decimal-separator => locale double
    assert by_name["note"].default == "n/a"


def test_db_dfasdl_target_spec_fk_pk_autoinc():
    t = target_spec(DB_DFASDL, "pets", "jdbc:derby:memory:x", seq_id="pets")
    by_name = {f.name: f for f in t.fields}
    assert by_name["id"].auto_increment
    assert by_name["price"].type == "decimal(12,2)"
    assert by_name["price"].default == 0
    # FK resolves through the element id to the parent's COLUMN name
    assert t.foreign_keys == {"owner_fk": ("owners", "id")}

    owners = target_spec(DB_DFASDL, "owners", "jdbc:derby:memory:x", seq_id="owners")
    assert owners.options["primary_key"] == ("id",)
    assert {f.name: f.unique for f in owners.fields}["name"]
    assert owners.foreign_keys == {}


def test_multi_seq_requires_seq_id():
    with pytest.raises(ValueError, match="pass seq_id"):
        source_spec(DB_DFASDL, "x", "file:///tmp/x")
    seqs = parse_dfasdl(DB_DFASDL)
    fks = resolve_foreign_keys(seqs)
    assert fks == {"pets": {"owner_fk": ("owners", "id")}}


def test_choice_layouts():
    (s,) = parse_dfasdl(CHOICE_DFASDL)
    assert [f.name for f in s.fields] == ["a", "b", "c"]
    (alt,) = s.options["alt_layouts"]
    assert [f.name for f in alt] == ["a2", "c2"]


def test_bad_documents_rejected():
    with pytest.raises(ValueError, match="not a DFASDL"):
        parse_dfasdl("<cookbook/>")
    with pytest.raises(ValueError, match="no seq"):
        parse_dfasdl('<dfasdl xmlns="http://www.dfasdl.org/DFASDL"/>')
    broken_fk = DB_DFASDL.replace(
        'db-foreign-key="owners_row_id"', 'db-foreign-key="ghost"'
    )
    with pytest.raises(ValueError, match="ghost"):
        resolve_foreign_keys(parse_dfasdl(broken_fk))


def test_dfasdl_csv_end_to_end(spark, tmp_path):
    """A DFASDL-described semicolon CSV reads through read_source with
    typed columns, locale numbers, and default substitution."""
    p = tmp_path / "cities.csv"
    p.write_text(
        "berlin;03.07.2024 10:30;3645000;891,68;capital\n"
        "bremen;04.07.2024 09:15;569352;326,72;\n"
    )
    spec = source_spec(CSV_DFASDL, "cities", str(p), fmt="csv")
    from tensei_agent_spark.sources import read_source

    rows = {r["city"]: r for r in read_source(spark, spec).collect()}
    assert rows["berlin"]["population"] == 3645000
    assert abs(rows["berlin"]["area"] - 891.68) < 1e-9
    assert rows["berlin"]["observed"].month == 7
    assert rows["bremen"]["note"] == "n/a"


def test_dfasdl_seq_max_limits_read(spark, tmp_path):
    """seq max="N" must cap rows for FILE formats too (it was JDBC-only
    before read_source learned to strip/apply engine-level options)."""
    xml = CSV_DFASDL.replace('max="100"', 'max="1"')
    p = tmp_path / "two.csv"
    p.write_text(
        "a;03.07.2024 10:30;1;1,00;x\n"
        "b;03.07.2024 10:31;2;2,00;y\n"
    )
    from tensei_agent_spark.sources import read_source

    spec = source_spec(xml, "two", str(p), fmt="csv")
    assert read_source(spark, spec).count() == 1


# --- Property fuzz: random schemas round-trip through the compiler ---------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s != "zz_rid"  # reserved for the test's row-id column
)
_str_val = st.from_regex(r"[A-Za-z0-9 _.-]{1,20}", fullmatch=True).map(
    str.strip
).filter(bool)
_num_val = st.integers(min_value=-(10**12), max_value=10**12)
_date_val = st.dates().map(lambda d: d.isoformat())

_field = st.sampled_from(["str", "num", "date"]).flatmap(
    lambda t: st.tuples(
        st.just(t),
        {"str": _str_val, "num": _num_val, "date": _date_val}[t],
    )
)


@given(
    names=st.lists(_ident, min_size=1, max_size=5, unique=True),
    data=st.data(),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzz_random_schema_roundtrips(spark, tmp_path_factory, names, data):
    """Any well-formed flat schema of str/num/date fields must compile,
    read, and round-trip typed values exactly — the compiler and CSV
    reader must never disagree about a column's position or type."""
    import datetime

    from tensei_agent_spark.sources import read_source

    rows = [
        [data.draw(_field, label=f"row{r}.{n}") for n in names]
        for r in range(3)
    ]
    # one schema: per-column type comes from row 0's draw
    types = [t for t, _ in rows[0]]
    # re-draw value-only for other rows to match row 0's type
    vals = [[v for _, v in rows[0]]]
    for r in rows[1:]:
        vals.append(
            [
                data.draw(
                    {"str": _str_val, "num": _num_val, "date": _date_val}[t],
                    label="v",
                )
                for t in types
            ]
        )
    stop = ' stop-sign=";"'
    # a guaranteed-unique leading row id decouples row matching from
    # the (possibly colliding) fuzzed values
    all_types = ["num", *types]
    all_names = ["zz_rid", *names]
    fields_xml = "".join(
        f'<{t} id="{n}"{"" if i == len(all_names) - 1 else stop}/>'
        for i, (t, n) in enumerate(zip(all_types, all_names))
    )
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<dfasdl xmlns="http://www.dfasdl.org/DFASDL" semantic="custom">'
        f'<seq id="rows"><elem id="row">{fields_xml}</elem></seq></dfasdl>'
    )
    d = tmp_path_factory.mktemp("fuzz")
    p = d / "data.csv"
    p.write_text(
        "\n".join(
            ";".join(str(v) for v in [rid, *row])
            for rid, row in enumerate(vals)
        )
        + "\n"
    )
    spec = source_spec(xml, "fuzz", str(p), fmt="csv")
    from tensei_agent_spark.sources import read_source  # noqa: F811

    got = read_source(spark, spec).collect()
    assert len(got) == len(vals)
    by_rid = {r["zz_rid"]: r for r in got}
    for rid, row in enumerate(vals):
        r = by_rid[rid]
        for (t, n), v in zip(zip(types, names), row):
            if t == "num":
                assert r[n] == v
            elif t == "date":
                assert r[n] == datetime.date.fromisoformat(v)
            else:
                assert r[n] == v


# --- ADVICE r8 regressions ------------------------------------------------


def _fmt_spec(fmt_attr: str):
    doc = f"""<?xml version="1.0" encoding="UTF-8"?>
<dfasdl xmlns="http://www.dfasdl.org/DFASDL" semantic="custom">
  <seq id="rows">
    <elem id="row">
      <formatnum id="v" format="{fmt_attr}"/>
    </elem>
  </seq>
</dfasdl>"""
    return source_spec(doc, "t", "file:///tmp/t.csv")


def test_formatnum_quantifier_commas_stay_integral():
    """(-?\\d{1,17}) — the reference DatabaseSchemaExtractor's BIGINT
    idiom — has NO decimal mark: the column must stay long (a double
    would lose precision above 2^53) and no decimalSeparator may be
    injected into the seq options."""
    spec = _fmt_spec("(-?\\d{1,17})")
    assert spec.fields[0].type == "long"
    assert "decimalSeparator" not in spec.options


def test_formatnum_class_quantifier_stays_integral():
    spec = _fmt_spec("[0-9]{3,3}")
    assert spec.fields[0].type == "long"
    assert "decimalSeparator" not in spec.options


def test_formatnum_escaped_comma_still_decimal():
    spec = _fmt_spec("(-?\\d+\\,\\d{2})")
    assert spec.fields[0].type == "double"
    assert spec.options.get("decimalSeparator") == ","


def test_formatnum_mark_class_alternation_is_decimal():
    """[.,] really is a decimal-mark alternation — the class collapse
    must keep it (last mark in pattern order wins)."""
    spec = _fmt_spec("(-?\\d+[.,]\\d{2})")
    assert spec.fields[0].type == "double"


def test_anonymous_wrapper_does_not_dot_the_path():
    """A nested wrapper with no id/xml-element-name/json-attribute-name
    is structural only: field paths must not gain 'parent.'-style empty
    segments ('parent..child')."""
    doc = """<?xml version="1.0" encoding="UTF-8"?>
<dfasdl xmlns="http://www.dfasdl.org/DFASDL" semantic="custom">
  <seq id="rows">
    <elem id="row">
      <elem id="parent">
        <elem>
          <str id="child"/>
        </elem>
      </elem>
    </elem>
  </seq>
</dfasdl>"""
    spec = source_spec(doc, "t", "file:///tmp/t.csv")
    assert [f.name for f in spec.fields] == ["parent.child"]


def test_jdbc_formatnum_groupless_pattern(spark):
    """Groupless formatnum formats ([0-9]+) must extract group 0 — not
    raise 'Regex group count is 0' (ADVICE r8)."""
    from tensei_agent_spark.sources.jdbc import formatnum_clean_col

    df = spark.createDataFrame(
        [("1.500.000,83 EUR",), ("42",)], "v string"
    )
    grouped = df.select(
        formatnum_clean_col("v", r"([-]?[0-9.,]+)", ",", "double").alias("x")
    ).collect()
    assert [r["x"] for r in grouped] == [1500000.83, 42.0]
    groupless = df.select(
        formatnum_clean_col("v", r"[-]?[0-9.,]+", ",", "double").alias("x")
    ).collect()
    assert [r["x"] for r in groupless] == [1500000.83, 42.0]
    ints = df.select(
        formatnum_clean_col("v", r"[0-9]+", ",", "long").alias("x")
    ).collect()
    assert [r["x"] for r in ints] == [1, 42]


def test_jdbc_formatnum_java_only_pattern_keeps_group_1(spark):
    """A format valid in Java regex but rejected by Python re (here a
    possessive quantifier) must keep extracting group 1 — the pre-r8
    behavior — not silently fall back to group 0, which would sweep in
    digits outside the capture group (ADVICE r9)."""
    import re

    from tensei_agent_spark.sources.jdbc import formatnum_clean_col

    fmt = r"(\p{Digit}[0-9.,]*)x[0-9]+"  # \p{Digit}: Java-only
    with pytest.raises(re.error):
        re.compile(fmt)
    df = spark.createDataFrame([("1.500,83x999",)], "v string")
    got = df.select(
        formatnum_clean_col("v", fmt, ",", "double").alias("x")
    ).collect()
    # group 1 → '1.500,83' → 1500.83; group 0 would give 1500.83999
    assert [r["x"] for r in got] == [1500.83]


def test_csv_sink_double_rendering_nan_and_huge(spark, tmp_path):
    """NaN and |v| >= 1e38 doubles must render as their plain string
    form, not empty (the decimal(38,0) cast overflows to NULL)."""
    from tensei_agent_spark.plans.spec import TargetSpec
    from tensei_agent_spark.sinks import write_target

    out = tmp_path / "doubles.csv"
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 1e40), (3, 123.0), (4, 2.5)],
        "i int, v double",
    ).select("v")
    spec = TargetSpec(
        name="t", format="csv", uri=str(out),
        options={"single_file": True, "order_by": "v"},
    )
    write_target(df, spec)
    text = out.read_text().strip().splitlines()
    assert "123" in text          # integral double renders without .0
    assert "2.5" in text
    assert "NaN" in text          # not an empty cell
    assert any("E38" in ln or "e+40" in ln or "1.0E40" in ln for ln in text)


def test_overwrite_now_is_case_insensitive(spark):
    from tensei_agent_spark.functions.transformers import build

    df = spark.createDataFrame([(1,)], "i int")
    out = df.select(
        build("overwrite", [], value="NOW", type="date")[0].alias("d")
    ).first()
    import datetime

    assert isinstance(out["d"], datetime.date)
