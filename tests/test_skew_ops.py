"""Skew-mitigation primitives (operators/skew.py): bit-identical
results to the plain formulations, deterministic salting, and the
expected plan shape (salt widens the shuffle key; the small side is
replicated by an explode, not a cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.operators.skew import (
    count_distinct_two_phase,
    salted_join,
)


def _skewed(spark):
    # one hot key (0) carrying 80% of the stream + a tail
    rows = [(i, i % 5 if i % 5 else 0, float(i)) for i in range(1000)]
    big = spark.createDataFrame(rows, "row_id int, k int, v double")
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(5)], "k int, label string"
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    big, small = _skewed(spark)
    plain = {
        (r["row_id"], r["label"])
        for r in big.join(small, "k").select("row_id", "label").collect()
    }
    salted = {
        (r["row_id"], r["label"])
        for r in salted_join(big, small, ["k"], salt_src="row_id", n_salt=4)
        .select("row_id", "label")
        .collect()
    }
    assert salted == plain and len(plain) == 1000


def test_salted_join_left_outer_keeps_unmatched(spark):
    big, small = _skewed(spark)
    small_missing = small.filter(F.col("k") != 0)
    out = salted_join(
        big, small_missing, ["k"], salt_src="row_id", n_salt=4, how="left"
    )
    assert out.count() == 1000
    assert out.filter(F.col("label").isNull()).count() == big.filter(
        F.col("k") == 0
    ).count()


def test_salted_join_spreads_hot_key(spark):
    big, small = _skewed(spark)
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(4)).cast("int")
    )
    per_salt = (
        salted.filter(F.col("k") == 0)
        .groupBy("_salt")
        .count()
        .collect()
    )
    # the hot key's rows land in ALL salt buckets, none holding >50%
    assert len(per_salt) == 4
    total = sum(r["count"] for r in per_salt)
    assert max(r["count"] for r in per_salt) < 0.5 * total


def test_salted_join_no_cartesian_in_plan(spark):
    big, small = _skewed(spark)
    plan = (
        salted_join(big, small, ["k"], salt_src="row_id", n_salt=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_count_distinct_two_phase_equals_builtin(spark):
    big, _ = _skewed(spark)
    df = big.withColumn("val", (F.col("row_id") % 37).cast("int"))
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.countDistinct("val").alias("n"))
        .collect()
    }
    got = {
        (r["k"], r["n_distinct"])
        for r in count_distinct_two_phase(df, ["k"], "val").collect()
    }
    assert got == want


def test_count_distinct_two_phase_null_parity(spark):
    """NULL handling must match countDistinct exactly: NULLs never
    count, and all-NULL groups still emit 0."""
    df = spark.createDataFrame(
        [(1, None), (1, 7), (2, None)], "k int, val int"
    )
    want = {
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.countDistinct("val").alias("n")).collect()
    }
    got = {
        (r["k"], r["n_distinct"])
        for r in count_distinct_two_phase(df, ["k"], "val").collect()
    }
    assert got == want == {(1, 1), (2, 0)}


def test_differential_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.skew import differential_join

    # 90% of big rows share key 1 (hot); keys 2..20 are cold.
    big = spark.createDataFrame(
        [(1 if i % 10 else (i // 10) % 19 + 2, i) for i in range(2000)],
        "k long, rid long",
    )
    small = spark.createDataFrame(
        [(k, f"v{k}") for k in range(1, 21)], "k long, v string"
    )
    plain = big.join(small, ["k"]).select("k", "rid", "v")
    diff = differential_join(
        big, small, ["k"], "rid", hot_share=0.05, sample_fraction=0.5
    ).select("k", "rid", "v")
    assert diff.exceptAll(plain).count() == 0
    assert plain.exceptAll(diff).count() == 0


def test_differential_join_left_keeps_unmatched(spark):
    from tensei_agent_spark.operators.skew import differential_join

    big = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(99, 0)], "k long, rid long"
    )
    small = spark.createDataFrame([(1, "x")], "k long, v string")
    out = differential_join(
        big, small, ["k"], "rid", how="left",
        hot_share=0.05, sample_fraction=1.0,
    )
    assert out.count() == 101
    assert out.filter("k = 99 AND v IS NULL").count() == 1


def test_detect_hot_keys_finds_the_heavy_key(spark):
    from tensei_agent_spark.operators.skew import detect_hot_keys

    big = spark.createDataFrame(
        [(7, i) for i in range(1000)] + [(i % 50 + 100, i) for i in range(500)],
        "k long, rid long",
    )
    hot = detect_hot_keys(big, ["k"], hot_share=0.2, sample_fraction=0.5)
    assert (7,) in hot
