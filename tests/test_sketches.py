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


# --- fd_audit -------------------------------------------------------------


def test_fd_audit_holding_and_violating(spark):
    from tensei_agent_spark.operators.stats import fd_audit

    rows = [
        (1, "a", "x"),
        (2, "a", "x"),
        (3, "b", "y"),
        (3, "b", "y"),  # duplicate row must not create a violation
        (4, "b", "z"),
    ]
    df = spark.createDataFrame(rows, "id int, g string, v string")
    got = {r["fd"]: r for r in fd_audit(df, [(["id"], "v"), (["g"], "v")]).collect()}
    assert got["id -> v"]["holds"] is True
    assert got["id -> v"]["n_lhs"] == 4
    assert got["id -> v"]["n_violating_lhs"] == 0
    g = got["g -> v"]
    assert g["holds"] is False
    assert g["n_lhs"] == 2 and g["n_violating_lhs"] == 1
    assert g["max_rhs_per_lhs"] == 2


def test_fd_audit_null_rhs_counts_as_value(spark):
    from tensei_agent_spark.operators.stats import fd_audit

    rows = [(1, "x"), (1, None), (2, None)]
    df = spark.createDataFrame(rows, "k int, v string")
    got = fd_audit(df, [(["k"], "v")]).collect()[0]
    # k=1 maps to {x, NULL} → a determinism violation; k=2 only NULL
    assert got["holds"] is False
    assert got["n_violating_lhs"] == 1
    assert got["n_lhs"] == 2


def test_fd_audit_composite_lhs(spark):
    from tensei_agent_spark.operators.stats import fd_audit

    rows = [(1, 1, "x"), (1, 2, "y"), (2, 1, "x")]
    df = spark.createDataFrame(rows, "a int, b int, v string")
    got = fd_audit(df, [(["a", "b"], "v")]).collect()[0]
    assert got["fd"] == "a,b -> v"
    assert got["holds"] is True and got["n_lhs"] == 3


def test_welch_t_matches_closed_form(spark):
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.stats import welch_t

    a = [10.0, 12.0, 11.0, 13.0, 9.0]
    b = [20.0, 22.0, 19.0, 21.0]
    rows = [("g", "A", v) for v in a] + [("g", "B", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, arm string, v double")
    got = welch_t(
        df, ["grp"], F.col("arm") == "A", F.col("arm") == "B", "v"
    ).collect()
    assert len(got) == 1
    r = got[0]
    import statistics

    ma, mb = statistics.fmean(a), statistics.fmean(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / se2**0.5
    dfw = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert r["n_a"] == 5 and r["n_b"] == 4
    assert abs(r["t_stat"] - t) < 1e-8
    assert abs(r["df_welch"] - dfw) < 1e-7
    # One-sided sanity: B is clearly larger.
    assert r["t_stat"] < -5


def test_welch_t_drops_underpowered_groups(spark):
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.stats import welch_t

    df = spark.createDataFrame(
        [("g1", "A", 1.0), ("g1", "B", 2.0), ("g1", "B", 3.0),
         ("g2", "A", 1.0), ("g2", "A", 2.0), ("g2", "B", 4.0), ("g2", "B", 5.0)],
        "grp string, arm string, v double",
    )
    got = welch_t(
        df, ["grp"], F.col("arm") == "A", F.col("arm") == "B", "v"
    ).collect()
    assert [r["grp"] for r in got] == ["g2"]  # g1: n_a = 1 -> dropped


def test_welch_t_constant_arms_yield_null_not_abort(spark):
    """Both arms constant → zero standard error → t/df undefined: the
    group must emit NULL, not abort the whole job with ANSI
    DIVIDE_BY_ZERO (Hypothesis-found in round 7; same contract as the
    acf/ccf zero-variance guard)."""
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.stats import welch_t

    df = spark.createDataFrame(
        [("g", "A", 5.0), ("g", "A", 5.0), ("g", "B", 7.0), ("g", "B", 7.0),
         ("h", "A", 1.0), ("h", "A", 2.0), ("h", "B", 4.0), ("h", "B", 6.0)],
        "grp string, arm string, v double",
    )
    got = {
        r["grp"]: r
        for r in welch_t(
            df, ["grp"], F.col("arm") == "A", F.col("arm") == "B", "v"
        ).collect()
    }
    assert got["g"]["t_stat"] is None and got["g"]["df_welch"] is None
    assert got["g"]["mean_a"] == 5.0 and got["g"]["mean_b"] == 7.0
    assert got["h"]["t_stat"] is not None  # healthy group unaffected


def test_cms_never_undercounts_and_merges(spark):
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.sketches import cms_build, cms_estimate

    items = [(f"k{i % 50}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(items, "key string")
    sk = cms_build(df, "key", depth=4, width=64)
    probes = spark.createDataFrame(
        [("hot",), ("k0",), ("absent",)], "key string"
    )
    got = {r["key"]: r["est"] for r in cms_estimate(sk, probes, "key", width=64).collect()}
    assert got["hot"] >= 500
    assert got["k0"] >= 40
    # Overcount bound: eps = e/width, N = 2500 -> < ~107 w.h.p.
    assert got["hot"] - 500 <= 300
    # Mergeability: sketch(A) + sketch(B) cell-wise == sketch(A ∪ B).
    a, b = df.randomSplit([0.5, 0.5], seed=7)
    merged = (
        cms_build(a, "key", width=64)
        .unionByName(cms_build(b, "key", width=64))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(a.unionByName(b), "key", width=64)
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )


def test_t_closeness_identical_and_skewed_groups(spark):
    from tensei_agent_spark.operators.stats import t_closeness

    # Group A mirrors the global distribution -> EMD 0 only if it IS
    # the global; here A and B skew opposite ways.
    rows = (
        [("A", "low")] * 8 + [("A", "high")] * 2
        + [("B", "low")] * 2 + [("B", "high")] * 8
    )
    df = spark.createDataFrame(rows, "grp string, sens string")
    got = {r["grp"]: r for r in t_closeness(df, ["grp"], "sens").collect()}
    # Global: 10 low, 10 high. Ordered domain (high, low), m=2.
    # r_high(A) = 2*20 - 10*10 = -60 -> |r| = 60; emd = 60/(10*20*1) = 0.3
    assert got["A"]["emd"] == 0.3
    assert got["B"]["emd"] == 0.3
    assert got["A"]["n_rows"] == 10

    # A group matching the global distribution has EMD exactly 0.
    balanced = spark.createDataFrame(
        [("A", "low"), ("A", "high"), ("B", "low"), ("B", "high")],
        "grp string, sens string",
    )
    for r in t_closeness(balanced, ["grp"], "sens").collect():
        assert r["emd"] == 0.0


def test_kll_rollup_merge_law_and_accuracy(spark):
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.sketches import (
        merge_quantile_rollup,
        quantile_rollup,
    )

    rows = [("a", i % 10, float(i % 1000)) for i in range(20000)]
    df = spark.createDataFrame(rows, "k string, part int, v double")
    per_part = quantile_rollup(df, ["k", "part"], "v")
    got = merge_quantile_rollup(per_part, ["k"]).collect()[0]
    assert got["n"] == 20000.0
    # Exact p50/p95 of 0..999 uniform: ~500 / ~950. KLL(k=200) error
    # is ~1% of rank.
    assert abs(got["q_500"] - 500) < 30
    assert abs(got["q_950"] - 950) < 30
    # Merge law: sketching whole == merging partition sketches (same
    # estimates within the sketch's own error).
    whole = merge_quantile_rollup(
        quantile_rollup(df, ["k"], "v"), ["k"]
    ).collect()[0]
    assert abs(got["q_500"] - whole["q_500"]) < 30


def test_theta_overlap_tracks_exact_sets(spark):
    from tensei_agent_spark.operators.sketches import audience_overlap

    rows = [("view", u) for u in range(1000)]
    rows += [("purchase", u) for u in range(600, 1400)]
    df = spark.createDataFrame(rows, "seg string, uid long")
    got = audience_overlap(df, "seg", "uid", ("view", "purchase")).collect()[0]
    # Exact: |A|=1000, |B|=800, |A∩B|=400, |A\B|=600. Theta default
    # accuracy at these sizes is exact or near-exact.
    assert abs(got["n_a"] - 1000) <= 20
    assert abs(got["n_b"] - 800) <= 16
    assert abs(got["n_intersection"] - 400) <= 20
    assert abs(got["n_only_a"] - 600) <= 25


def test_kaplan_meier_matches_closed_form(spark):
    from tensei_agent_spark.operators.stats import kaplan_meier

    # Classic toy: events at t=1 (2 of 10), t=3 (1 of 7, after 1
    # censored at t=2), censored at t=2 and t=4.
    rows = (
        [(1, 1)] * 2 + [(2, 0)] * 1 + [(3, 1)] * 1 + [(4, 0)] * 1
        + [(5, 1)] * 5
    )
    df = spark.createDataFrame(rows, "t long, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert got[1]["n_risk"] == 10 and got[1]["d_events"] == 2
    s1 = 1.0 * (1 - 2 / 10)
    assert got[1]["survival"] == s1
    # t=2: censoring only — survival unchanged, risk set shrinks.
    s2 = s1 * (1 - 0 / 8)
    assert got[2]["survival"] == s2 and got[2]["n_risk"] == 8
    s3 = s2 * (1 - 1 / 7)
    assert got[3]["survival"] == s3
    # Monotone non-increasing.
    ts = sorted(got)
    surv = [got[t]["survival"] for t in ts]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
