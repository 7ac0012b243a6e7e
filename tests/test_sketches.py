"""Mergeable-sketch operators: MG heavy hitters exactness, HLL rollup
error bounds."""

import random

from pyspark.sql import functions as F

from tensei_agent_spark.operators.sketches import (
    distinct_rollup,
    heavy_hitters_exact,
    merge_rollup,
)


def _naive(items, k):
    total = items.count()
    thr = -(-total // k)
    return {
        (r["value"], r["cnt"])
        for r in items.groupBy(F.col("word").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    }


def test_heavy_hitters_match_naive_groupby_on_skewed_stream(spark):
    rng = random.Random(3)
    # zipf-ish: a few hot words + a long uniform tail, shuffled and
    # spread over many partitions so per-partition MG state matters
    words = (
        ["alpha"] * 900
        + ["beta"] * 400
        + ["gamma"] * 150
        + [f"w{rng.randrange(5000)}" for _ in range(8000)]
    )
    rng.shuffle(words)
    items = spark.createDataFrame(
        [(w,) for w in words], ["word"]
    ).repartition(16)

    for k in (10, 50, 200):
        got = {
            (r["value"], r["cnt"])
            for r in heavy_hitters_exact(items, "word", k=k).collect()
        }
        assert got == _naive(items, k), f"k={k} diverged from naive"


def test_heavy_hitters_null_and_validation(spark):
    items = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], ["word"]
    )
    got = {
        (r["value"], r["cnt"])
        for r in heavy_hitters_exact(items, "word", k=2).collect()
    }
    # N=3 non-null, ceil(3/2)=2: only 'a'
    assert got == {("a", 2)}
    try:
        heavy_hitters_exact(items, "word", k=1)
        raise AssertionError("k=1 must be rejected")
    except ValueError:
        pass


def test_hll_rollup_within_error_bound(spark):
    from tensei_agent_spark.catalog import load

    ev = load(spark, "/root/testdata/sf0.01", "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = distinct_rollup(ev, "day", "user_id")
    weekly = merge_rollup(
        daily.withColumn("week", F.date_trunc("week", "day")), "week"
    )
    exact = {
        r["week"]: r["n"]
        for r in ev.withColumn("week", F.date_trunc("week", "day"))
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {r["week"]: r["estimate"] for r in weekly.collect()}
    assert est.keys() == exact.keys()
    for wk, n in exact.items():
        rel = abs(est[wk] - n) / max(n, 1)
        assert rel < 0.05, f"week {wk}: est {est[wk]} vs exact {n}"

    # merging dailies must estimate the same distinct set as a direct
    # weekly sketch (union-of-sketches correctness, not just accuracy)
    direct = distinct_rollup(
        ev.withColumn("week", F.date_trunc("week", "day")), "week", "user_id"
    )
    d = {r["week"]: r["estimate"] for r in direct.collect()}
    for wk in d:
        assert abs(d[wk] - est[wk]) / max(d[wk], 1) < 0.02
