"""Transformer-registry unit tests.

Golden values mirror the reference's transformer specs
(src/test/scala/com/wegtam/tensei/agent/transformers/*Test.scala):
each case is (inputs, params) → expected output.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tensei_agent_spark.functions import build
from tensei_agent_spark.functions.transformers import drupal_vancode


def run1(spark, cols, name, values: dict, **params):
    """Apply transformer `name` to literal inputs; return row 1 value."""
    df = spark.range(1)
    in_cols = []
    for cname, v in values.items():
        df = df.withColumn(cname, F.lit(v))
        in_cols.append(F.col(cname))
    out = build(name, [in_cols[i] for i in cols], **params)
    return df.select(*[c.alias(f"o{i}") for i, c in enumerate(out)]).collect()[0]


@pytest.mark.parametrize(
    "name,cols,values,params,expected",
    [
        # ConcatTest.scala-style
        ("concat", [0, 1], {"a": "foo", "b": "bar"}, {"separator": "-"}, "foo-bar"),
        ("concat", [0, 1], {"a": "x", "b": "y"},
         {"separator": "", "prefix": "<", "suffix": ">"}, "<xy>"),
        # SplitTest-style
        ("split", [0], {"a": "one, two, three"},
         {"pattern": ",", "selected": [1]}, "two"),
        # ReplaceTest-style (all occurrences)
        ("replace", [0], {"a": "aXbXc"}, {"search": ["X"], "replace": "-"}, "a-b-c"),
        # LowerOrUpperTest-style
        ("lower_or_upper", [0], {"a": "HeLLo"}, {"perform": "lower"}, "hello"),
        ("lower_or_upper", [0], {"a": "HeLLo"}, {"perform": "upper"}, "HELLO"),
        ("lower_or_upper", [0], {"a": "hello"}, {"perform": "firstupper"}, "Hello"),
        ("lower_or_upper", [0], {"a": "HELLO"}, {"perform": "firstlower"}, "hELLO"),
        # EmptyString / Nullify
        ("empty_string", [], {}, {}, ""),
        ("nullify", [], {}, {}, None),
        # Overwrite (typed constants)
        ("overwrite", [], {}, {"type": "string", "value": "fixed"}, "fixed"),
        ("overwrite", [], {}, {"type": "long", "value": "42"}, 42),
        ("overwrite", [], {}, {"type": "date", "value": "2020-01-02"},
         datetime.date(2020, 1, 2)),
        # CastStringToLongTest-style
        ("cast_string_to_long", [0], {"a": "12345"}, {}, 12345),
        ("cast_string_to_long", [0], {"a": "abc"}, {}, None),
        ("cast_string_to_long", [0], {"a": " 7 "}, {}, 7),
        # TimestampCalibrateTest-style
        ("timestamp_calibrate", [0], {"a": 1500},  {"perform": "add"}, 1500000),
        ("timestamp_calibrate", [0], {"a": 1500999}, {"perform": "reduce"}, 1500),
        # MergeAndExtractByRegExTest-style
        ("merge_and_extract_by_regex", [0], {"a": "order-123-x"},
         {"regexp": r"order-(\d+)", "groups": [1]}, "123"),
        # IfThenElseNumeric (dec)
        ("if_then_else_numeric", [0], {"a": 50},
         {"condition": "x>42", "then": "x=x+3", "format": "dec"}, 53.0),
        ("if_then_else_numeric", [0], {"a": 10},
         {"condition": "x>42", "then": "x=x+3", "otherwise": "x=0", "format": "dec"}, 0.0),
        ("if_then_else_numeric", [0], {"a": 10.4},
         {"condition": "x>0", "then": "x=x", "format": "num"}, 10),
        # bare-constant and reversed-operand branches
        # (IfThenElseNumeric.scala regex_const / regex_func2)
        ("if_then_else_numeric", [0], {"a": 0},
         {"condition": "x>0", "then": "x=x-819", "otherwise": "0",
          "format": "num"}, 0),
        ("if_then_else_numeric", [0], {"a": 10},
         {"condition": "x>0", "then": "x=100-x", "format": "dec"}, 90.0),
        ("if_then_else_numeric", [0], {"a": 4},
         {"condition": "x>0", "then": "x=100/x", "format": "dec"}, 25.0),
        # ExtractBiggestValue
        ("extract_biggest_value", [0, 1, 2], {"a": 3, "b": 9, "c": 5}, {}, 9),
        ("extract_longest_string", [0, 1], {"a": "ab", "b": "abcd"}, {}, "abcd"),
        # JSON builders
        ("merge_to_json", [0, 1], {"a": 1, "b": "x"},
         {"labels": ["k", "v"]}, '{"k":1,"v":"x"}'),
        ("to_json", [0], {"a": 5}, {"label": "n"}, '{"n":5}'),
    ],
)
def test_transformer_golden(spark, name, cols, values, params, expected):
    got = run1(spark, cols, name, values, **params)["o0"]
    assert got == expected, f"{name}: {got!r} != {expected!r}"


def test_replace_first_n(spark):
    """count>0 → only first N occurrences replaced (pandas UDF path)."""
    got = run1(spark, [0], "replace", {"a": "aXbXcX"},
               search=["X"], replace="-", count=2)["o0"]
    assert got == "a-b-cX"


def test_split_multi_select(spark):
    out = build("split", [F.lit("a;b;c")], pattern=";", selected=[0, 2])
    row = (
        __import__("pyspark").sql.SparkSession.getActiveSession()
        .range(1)
        .select(out[0].alias("x"), out[1].alias("y"))
        .collect()[0]
    )
    assert (row["x"], row["y"]) == ("a", "c")


def test_date_converter_epoch_and_string(spark):
    df = spark.range(1).select(
        build("date_converter", [F.lit("2021-03-04 05:06:07")])[0].alias("from_str"),
        build("date_converter", [F.lit(1614834367000)])[0].alias("from_millis"),
    )
    row = df.collect()[0]
    assert row["from_str"] == datetime.datetime(2021, 3, 4, 5, 6, 7)
    assert row["from_millis"] == datetime.datetime(2021, 3, 4, 5, 6, 7)


def test_timestamp_offset_convert_and_keep(spark):
    """convert: shift the instant into the offset zone; keep: relabel
    the wall-clock (shift the instant the other way)."""
    ts = F.lit("2021-06-01 12:00:00").cast("timestamp")
    df = spark.range(1).select(
        build("timestamp_offset", [ts], offset="+02:00", mode="convert")[0].alias("c"),
        build("timestamp_offset", [ts], offset="+02:00", mode="keep")[0].alias("k"),
    )
    row = df.collect()[0]
    assert row["c"] == datetime.datetime(2021, 6, 1, 14, 0, 0)
    assert row["k"] == datetime.datetime(2021, 6, 1, 10, 0, 0)


def test_drupal_vancode_threaded(spark):
    """Threaded numbering: child codes extend the parent's code
    (DrupalVanCodeGeneratorTest semantics)."""
    rows = [
        # (comment_id, article, parent)
        (1, 100, 0),
        (2, 100, 0),
        (3, 100, 1),   # first child of comment 1
        (4, 100, 1),   # second child of comment 1
        (5, 100, 3),   # child of child
        (6, 200, 0),   # other article restarts numbering
    ]
    df = spark.createDataFrame(rows, "comment_id long, article long, parent long")
    got = {
        r["comment_id"]: r["vancode"]
        for r in drupal_vancode(df, "comment_id", "article", "parent").collect()
    }
    assert got[1] == "01/"
    assert got[2] == "02/"
    assert got[3] == "0101/"
    assert got[4] == "0102/"
    assert got[5] == "010101/"
    assert got[6] == "01/"


def test_sequential_id_is_dense_and_ordered(spark):
    from tensei_agent_spark.functions.transformers import sequential_id

    df = spark.createDataFrame([(c,) for c in "edcba"], "k string")
    out = sequential_id(df, ["k"], start=10, out_col="sid").collect()
    got = {r["k"]: r["sid"] for r in out}
    assert got == {"a": 10, "b": 11, "c": 12, "d": 13, "e": 14}


def test_ansi_safety_split_and_dates(spark):
    """Under ANSI (Spark 4 default) a ragged split row or malformed date
    must yield NULL — one bad row may not abort the job."""
    from tensei_agent_spark.functions import build as T

    df = spark.createDataFrame([("a,b",), ("x",)], "s string")
    out = T("split", [F.col("s")], pattern=",", selected=[0, 2])
    rows = df.select(out[0].alias("p0"), out[1].alias("p2")).collect()
    assert [r["p2"] for r in rows] == [None, None]
    assert [r["p0"] for r in rows] == ["a", "x"]

    (bad,) = df.limit(1).select(
        T("date_converter", [F.lit("garbage")])[0].alias("ts")
    ).first()
    assert bad is None


def test_overwrite_now_is_literal_for_non_temporal(spark):
    """'now' is special only for temporal types; a string constant that
    happens to be 'now' stays the literal word."""
    from tensei_agent_spark.functions import build as T

    df = spark.range(1)
    (v,) = df.select(
        T("overwrite", [], type="string", value="now")[0].alias("v")
    ).first()
    assert v == "now"
    (d,) = df.select(
        T("overwrite", [], type="date", value="now")[0].alias("v")
    ).first()
    import datetime

    assert isinstance(d, datetime.date)


def test_overwrite_non_string_value_stays_literal(spark):
    """A non-string value passed programmatically (numeric default) must
    not raise AttributeError on .lower() (ADVICE r9)."""
    from tensei_agent_spark.functions import build as T

    row = spark.range(1).select(
        T("overwrite", [], type="long", value=42)[0].alias("v"),
        T("overwrite", [], type="string", value="now")[0].alias("s"),
    ).first()
    assert row["v"] == 42
    assert row["s"] == "now"
