"""Structured Streaming tests: the streaming rollup must equal its batch
twin on the same data (the unification contract), and the stateful
sessionizer must produce gap-consistent sessions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tensei_agent_spark.catalog import load
from tensei_agent_spark.streaming import (
    hourly_rollup,
    read_event_stream,
    run_to_completion,
    sessionize,
    sliding_counts,
    stream_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Stage events as a streamable parquet dir (µs timestamps — the
    raw testdata file is TIMESTAMP(NANOS) which file streams reject)."""
    spark_dir = str(tmp_path_factory.mktemp("events_stream"))
    return spark_dir


def _stage(spark, events_dir):
    load(spark, SF, "events").coalesce(2).write.mode("overwrite").parquet(events_dir)


def test_stream_rollup_equals_batch(spark, events_dir):
    _stage(spark, events_dir)
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    run_to_completion(hourly_rollup(stream), "rollup_sink", "complete")

    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
        for r in spark.table("rollup_sink").collect()
    }
    batch = (
        load(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("s"))
        .select(F.col("w.start").alias("b"), "event_type", "n", "s")
    )
    want = {
        (r["b"], r["event_type"]): (r["n"], round(r["s"], 2)) for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_sliding_window_counts(spark, events_dir):
    _stage(spark, events_dir)
    stream = read_event_stream(spark, events_dir)
    run_to_completion(sliding_counts(stream), "sliding_sink", "complete")
    rows = spark.table("sliding_sink").collect()
    assert len(rows) > 0
    # every event lands in window/slide = 4 overlapping windows: total
    # sliding count = 4 × event count
    total_events = load(spark, SF, "events").count()
    assert sum(r["n_events"] for r in rows) == 4 * total_events


def test_stream_dedup_within_watermark(spark, events_dir, tmp_path_factory):
    """Duplicated input events collapse to one row per event_id."""
    dup_dir = str(tmp_path_factory.mktemp("events_dup"))
    ev = load(spark, SF, "events").limit(500)
    ev.unionByName(ev).coalesce(2).write.mode("overwrite").parquet(dup_dir)
    stream = read_event_stream(spark, dup_dir)
    run_to_completion(stream_dedup(stream), "dedup_sink", "append")
    out = spark.table("dedup_sink")
    assert out.count() == 500
    assert out.select("event_id").distinct().count() == 500


def test_sessionize_stateful(spark, events_dir):
    _stage(spark, events_dir)
    stream = read_event_stream(spark, events_dir)
    run_to_completion(sessionize(stream), "session_sink", "append")
    sessions = spark.table("session_sink").collect()
    assert len(sessions) > 0
    for s in sessions:
        assert s["session_end"] >= s["session_start"]
        assert s["n_events"] >= 1
    # sessions for one user never overlap and respect the 30-min gap
    by_user: dict = {}
    for s in sessions:
        by_user.setdefault(s["user_id"], []).append(s)
    some_user = max(by_user, key=lambda u: len(by_user[u]))
    spans = sorted(
        (s["session_start"], s["session_end"]) for s in by_user[some_user]
    )
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert (s2 - e1).total_seconds() > 30 * 60


def test_enrich_with_dim_equals_batch_join(spark, events_dir):
    from tensei_agent_spark.streaming import enrich_with_dim

    _stage(spark, events_dir)
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert")],
        "event_type string, category string",
    )
    stream = read_event_stream(spark, events_dir)
    enriched = enrich_with_dim(stream, dim, on="event_type").groupBy(
        "category"
    ).agg(F.count(F.lit(1)).alias("n"))
    run_to_completion(enriched, "enriched_counts")
    got = {
        r["category"]: r["n"]
        for r in spark.table("enriched_counts").collect()
    }
    batch = load(spark, SF, "events").join(dim, "event_type", "left").groupBy(
        "category"
    ).agg(F.count(F.lit(1)).alias("n"))
    want = {r["category"]: r["n"] for r in batch.collect()}
    assert got == want


def test_stream_upsert_to_db_idempotent(spark, events_dir):
    """foreachBatch upsert: draining the same input twice (a replay)
    must leave the same keyed rows, not duplicates."""
    import duckdb

    from tensei_agent_spark.sinks.jdbc import dialect_for
    from tensei_agent_spark.streaming import stream_upsert_to_db

    _stage(spark, events_dir)
    con = duckdb.connect()
    connect = lambda: con.cursor()  # noqa: E731 - child conn per call, closable
    dialect = dialect_for("jdbc:duckdb:mem")

    def drain():
        stream = read_event_stream(spark, events_dir).select(
            "event_id", "user_id", "value"
        )
        q = stream_upsert_to_db(
            stream, connect, "events_sink", dialect, key_cols=["event_id"]
        )
        q.awaitTermination()

    drain()
    n1 = con.execute("SELECT count(*) FROM events_sink").fetchone()[0]
    drain()  # replay of identical input
    n2 = con.execute("SELECT count(*) FROM events_sink").fetchone()[0]
    assert n1 == n2 > 0
    n_src = load(spark, SF, "events").count()
    assert n1 == n_src


def test_stream_stream_attribution_equals_batch(spark, events_dir):
    from tensei_agent_spark.streaming import attribute_purchases

    _stage(spark, events_dir)
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    run_to_completion(
        attribute_purchases(views, purchases), "attrib_sink", "append"
    )
    got = {
        (r["view_id"], r["purchase_id"])
        for r in spark.table("attrib_sink").collect()
    }

    ev = load(spark, SF, "events")
    batch = attribute_purchases(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    want = {(r["view_id"], r["purchase_id"]) for r in batch.collect()}
    assert got == want
    assert len(got) > 0


def test_checkpoint_resume_processes_only_increment(spark, tmp_path):
    """Checkpointed restart: after a drain, appending one new file and
    restarting from the SAME checkpoint must process only the new rows
    (offset tracking), not re-deliver history — the exactly-once resume
    contract a production pipeline depends on."""
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    seen = []

    ev = load(spark, SF, "events").select("event_id", "user_id", "value")
    ev.limit(100).coalesce(1).write.mode("overwrite").parquet(src)

    def drain():
        stream = (
            spark.readStream.schema(ev.schema).parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda batch, _id: seen.append(batch.count())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert sum(seen) == 100
    # append an increment and resume from the same checkpoint
    ev.limit(130).subtract(ev.limit(100)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    assert sum(seen) == 130  # only the 30 new rows, no re-delivery


def test_stream_left_outer_attribution(spark, events_dir):
    """left_outer stream-stream join: unmatched views emit with null
    purchase columns once the watermark passes — total view count must
    equal the batch view count (no view lost, no view duplicated
    as null + matched... nulls only for truly unmatched views)."""
    from tensei_agent_spark.streaming import attribute_purchases

    _stage(spark, events_dir)
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    run_to_completion(
        attribute_purchases(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
            how="left_outer",
        ),
        "attrib_outer_sink",
        "append",
    )
    out = spark.table("attrib_outer_sink")
    matched = out.filter(F.col("purchase_id").isNotNull())
    unmatched = out.filter(F.col("purchase_id").isNull())
    views = load(spark, SF, "events").filter(F.col("event_type") == "view")
    n_views = views.count()
    # Views whose join window had not passed the final watermark when
    # the query stopped are correctly WITHHELD in state (watermark 2h +
    # window 1h from the max event time), so account for that horizon.
    max_ts = views.agg(F.max("ts")).collect()[0][0]
    withholdable = views.filter(
        F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 3 HOURS")
    ).count()
    accounted = matched.select("view_id").distinct().count() + unmatched.count()
    assert n_views - withholdable <= accounted <= n_views
    assert unmatched.count() > 0


def test_transform_with_state_anomalies(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: per-user running mean/std
    anomaly detection. A user with a stable history and one spike must
    alert exactly on the spike; the stable user never alerts."""
    import datetime as dt

    from tensei_agent_spark.streaming import user_value_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: ten 10.0s, then a 1000.0 spike, then ten more 10.0s
    vals = [10.0] * 10 + [1000.0] + [10.0] * 10
    for i, v in enumerate(vals):
        rows.append((100 + i, base + dt.timedelta(minutes=i), 1, "m", v, "{}"))
    # user 2: steady ramp well inside 3 sigma of a constant? constant stream
    for i in range(15):
        rows.append((200 + i, base + dt.timedelta(minutes=i), 2, "m", 5.0, "{}"))
    src = tmp_path / "stream_src"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    ).coalesce(1).write.parquet(str(src))

    from tensei_agent_spark.streaming import read_event_stream, run_to_completion

    stream = read_event_stream(spark, str(src))
    out = user_value_anomalies(stream, threshold_sigma=3.0, min_history=5)
    run_to_completion(out, "anomaly_sink", "append")
    got = spark.table("anomaly_sink").collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["value"] == 1000.0 and abs(r["mean"] - 10.0) < 1e-9


def test_anomaly_tws_gate():
    """The transformWithStateInPandas engine must raise its documented
    gate (not crash mid-query) when protobuf is absent."""
    from tensei_agent_spark.streaming.pipeline import _tws_available, user_value_anomalies

    if _tws_available():
        pytest.skip("protobuf present — tws path covered by the main test")
    with pytest.raises(NotImplementedError, match="protobuf"):
        user_value_anomalies(None, api="tws")


def test_native_session_window_stream_equals_batch(spark, events_dir):
    """The built-in session_window aggregate runs identically as a
    watermarked stream and as the registered batch query
    (session_window_native) — the operator's whole point is one code
    path for both."""
    _stage(spark, events_dir)
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    sessions = (
        stream.withWatermark("ts", "10 days")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    run_to_completion(sessions, "native_session_sink", "complete")
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 2),
        )
        for r in spark.sql("SELECT * FROM native_session_sink").collect()
    }
    from tensei_agent_spark.queries import REGISTRY

    want = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 2),
        )
        for r in REGISTRY["session_window_native"].build(spark, SF).collect()
    }
    assert got == want


def test_serve_ann_stream_equals_batch(spark, tmp_path_factory):
    """Streamed query vectors scored against the static PQ index must
    produce exactly the batch pq_adc_topk results (one code path, two
    execution modes) — including across multiple micro-batches."""
    from tensei_agent_spark.operators.pq import pq_adc_topk, pq_train
    from tensei_agent_spark.streaming.pipeline import serve_ann_stream

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    codebooks = pq_train(emb, m=8, ksub=16, dim=64, max_iter=2)
    queries = emb.filter(F.col("vec_id") < 6)

    qdir = str(tmp_path_factory.mktemp("ann_queries"))
    # several small files → several micro-batches with maxFilesPerTrigger
    queries.repartition(3).write.mode("overwrite").parquet(qdir)
    qstream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )
    q = serve_ann_stream(
        spark, emb, codebooks, qstream, k=5, sink_table="ann_stream_sink"
    )
    q.awaitTermination()

    got = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["score"])
        for r in spark.table("ann_stream_sink").collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["score"])
        for r in pq_adc_topk(emb, queries, codebooks, k=5).collect()
    }
    assert got == want
    assert len({r["batch_id"] for r in spark.table("ann_stream_sink").collect()}) >= 2


def test_scd2_stream_equals_batch_window(spark, tmp_path_factory):
    """Streaming SCD2 maintenance must converge to EXACTLY the one-shot
    batch window construction (registry ``user_event_history_scd2``) —
    including with micro-batches that arrive out of time order (the
    repartition below scatters events across files arbitrarily)."""
    from tensei_agent_spark.queries import REGISTRY
    from tensei_agent_spark.streaming.pipeline import scd2_stream

    changes = (
        load(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("value").cast("decimal(14,2)").cast("double").alias("value"),
            F.col("ts").alias("valid_from"),
        )
    )
    cdir = str(tmp_path_factory.mktemp("scd2_changes"))
    # several files -> several unordered micro-batches
    changes.repartition(4).write.mode("overwrite").parquet(cdir)
    cstream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    snap_dir = str(tmp_path_factory.mktemp("scd2_snapshot")) + "/dim"
    q = scd2_stream(
        spark,
        cstream,
        snap_dir,
        key_cols=["user_id"],
        order_cols=["valid_from", "event_id"],
        n_buckets=8,
    )
    q.awaitTermination()

    got = {
        r["event_id"]: (r["user_id"], r["value"], r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(snap_dir).drop("_bucket").collect()
    }
    want = {
        r["event_id"]: (r["user_id"], r["value"], r["valid_from"], r["valid_to"])
        for r in REGISTRY["user_event_history_scd2"].build(spark, SF).collect()
    }
    assert got == want


def test_scd2_merge_out_of_order_batches(spark):
    """Late-arriving versions splice into the middle of an existing
    key's history: the kernel recomputes intervals, never patches."""
    from tensei_agent_spark.operators.incremental import scd2_merge

    schema = "k int, v string, valid_from int"
    b1 = spark.createDataFrame([(1, "a", 10), (1, "c", 30)], schema)
    snap1 = scd2_merge(None, b1, ["k"], ["valid_from"])
    # late event lands BETWEEN the two existing versions
    b2 = spark.createDataFrame([(1, "b", 20), (2, "x", 5)], schema)
    snap2 = scd2_merge(snap1, b2, ["k"], ["valid_from"])
    got = {
        (r["k"], r["v"]): (r["valid_from"], r["valid_to"])
        for r in snap2.collect()
    }
    assert got == {
        (1, "a"): (10, 20),
        (1, "b"): (20, 30),
        (1, "c"): (30, None),
        (2, "x"): (5, None),
    }


def test_scd2_merge_replay_is_idempotent(spark):
    """At-least-once delivery: re-merging an already-applied batch must
    leave the snapshot bit-identical (no phantom zero-length
    intervals from duplicated versions)."""
    from tensei_agent_spark.operators.incremental import scd2_merge

    schema = "k int, v string, valid_from int"
    b1 = spark.createDataFrame([(1, "a", 10), (1, "b", 20)], schema)
    snap = scd2_merge(None, b1, ["k"], ["valid_from"])
    replayed = scd2_merge(snap, b1, ["k"], ["valid_from"])
    want = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in snap.collect()
    }
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in replayed.collect()
    }
    assert got == want == {(1, "a", 10, 20), (1, "b", 20, None)}


def test_scd2_merge_untouched_keys_pass_through(spark):
    from tensei_agent_spark.operators.incremental import scd2_merge

    schema = "k int, v string, valid_from int"
    snap = scd2_merge(
        None,
        spark.createDataFrame([(1, "a", 10), (2, "x", 5)], schema),
        ["k"],
        ["valid_from"],
    )
    out = scd2_merge(
        snap,
        spark.createDataFrame([(2, "y", 8)], schema),
        ["k"],
        ["valid_from"],
    )
    got = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert got == {
        (1, "a"): (10, None),  # untouched key: version unchanged
        (2, "x"): (5, 8),  # closed by the late-arriving y
        (2, "y"): (8, None),
    }


def test_linkage_stream_union_equals_full_batch(spark, tmp_path_factory):
    """Streaming entity resolution: the union of every micro-batch's
    incremental pairs must be EXACTLY the one-shot blocked_pairs over
    the full corpus — each unordered pair emitted once, by the batch
    that completes it."""
    from tensei_agent_spark.operators.linkage import blocked_pairs
    from tensei_agent_spark.streaming.pipeline import linkage_stream

    cust = load(spark, SF, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    cdir = str(tmp_path_factory.mktemp("linkage_records"))
    cust.repartition(3).write.mode("overwrite").parquet(cdir)
    cstream = (
        spark.readStream.schema(cust.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    idx = str(tmp_path_factory.mktemp("linkage_index")) + "/corpus"
    got: set[frozenset] = set()
    batches = []

    def writer(pairs_df, batch_id):
        batches.append(batch_id)
        for r in pairs_df.collect():
            p = frozenset((r["id_a"], r["id_b"]))
            assert p not in got, f"pair {p} emitted twice"
            got.add(p)

    q = linkage_stream(
        spark,
        cstream,
        idx,
        blockers=[["c_nationkey", "c_mktsegment"]],
        id_col="c_custkey",
        compare_cols=["c_name"],
        pair_writer=writer,
    )
    q.awaitTermination()

    want = {
        frozenset((r["id_a"], r["id_b"]))
        for r in blocked_pairs(
            cust,
            None,
            [["c_nationkey", "c_mktsegment"]],
            "c_custkey",
            ["c_name"],
        ).collect()
    }
    assert len(batches) >= 2
    assert got == want


def test_linkage_stream_batch_replay_idempotent(spark, tmp_path_factory):
    """Re-delivering an already-applied batch (the at-least-once
    failure mode) must emit exactly the original pair set — no
    self-pairs against the batch's own index rows, no duplicates from
    the doubled index append."""
    from tensei_agent_spark.streaming.pipeline import linkage_stream

    cust = (
        load(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id")
        .limit(50)
    )
    cdir = str(tmp_path_factory.mktemp("replay_records"))
    cust.coalesce(1).write.mode("overwrite").parquet(cdir)
    idx = str(tmp_path_factory.mktemp("replay_index")) + "/corpus"

    def run_once():
        got = []
        stream = (
            spark.readStream.schema(cust.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(cdir)
        )
        q = linkage_stream(
            spark,
            stream,
            idx,
            blockers=["user_id"],
            id_col="event_id",
            compare_cols=[],
            pair_writer=lambda pairs, bid: got.extend(
                (r["id_a"], r["id_b"]) for r in pairs.collect()
            ),
        )
        q.awaitTermination()
        return sorted(got)

    first = run_once()
    assert first  # the single batch emits its self-linkage pairs
    replay = run_once()  # fresh checkpoint-less stream = same batch again
    assert replay == first
    assert not any(a == b for a, b in replay)  # no self-pairs


def test_serve_ann_stream_writer_callback(spark, tmp_path_factory):
    """The production sink hook: results flow through ``writer`` per
    micro-batch (no temp-view accumulation, no O(B²) re-union) and
    still equal the batch pq_adc_topk output."""
    from tensei_agent_spark.operators.pq import pq_adc_topk, pq_train
    from tensei_agent_spark.streaming.pipeline import serve_ann_stream

    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    codebooks = pq_train(emb, m=8, ksub=16, dim=64, max_iter=2)
    queries = emb.filter(F.col("vec_id") < 6)

    qdir = str(tmp_path_factory.mktemp("ann_queries_writer"))
    queries.repartition(2).write.mode("overwrite").parquet(qdir)
    qstream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )
    rows, batches = [], []

    def sink(topk_df, batch_id):
        batches.append(batch_id)
        rows.extend(topk_df.collect())

    q = serve_ann_stream(
        spark,
        emb,
        codebooks,
        qstream,
        k=5,
        sink_table="ann_writer_never_created",
        writer=sink,
    )
    q.awaitTermination()

    assert len(batches) >= 2
    assert not any(
        t.name == "ann_writer_never_created"
        for t in spark.catalog.listTables()
    )
    got = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["score"]) for r in rows
    }
    want = {
        (r["query_id"], r["rank"]): (r["cand_id"], r["score"])
        for r in pq_adc_topk(emb, queries, codebooks, k=5).collect()
    }
    assert got == want


# --- decayed heavy hitters -------------------------------------------------


def _hh_batch_weights(rows, half_life_s):
    """Closed-form per-key weights Σ 2^(−(T−t)/hl), decayed to the
    global max ts — the exact result when capacity ≥ #distinct keys."""
    t1 = max(int(t.timestamp() * 1000) for t, _, _ in rows)
    hl_ms = half_life_s * 1000.0
    out = {}
    for t, etype, uid in rows:
        tm = int(t.timestamp() * 1000)
        out.setdefault(etype, {}).setdefault(uid, 0.0)
        out[etype][uid] += 2.0 ** (-(t1 - tm) / hl_ms)
    return out


def test_decayed_heavy_hitters_exact_under_capacity(spark, tmp_path):
    import datetime as dt

    from tensei_agent_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        decayed_heavy_hitters,
    )

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    raw = []
    eid = 0
    for h, uid, n in [(0, 1, 5), (1, 2, 3), (2, 1, 1), (2, 3, 2)]:
        for i in range(n):
            eid += 1
            raw.append(
                (eid, base + dt.timedelta(hours=h, seconds=i), uid, "view", 1.0, "{}")
            )
    df = spark.createDataFrame(raw, EVENT_SCHEMA)
    src = str(tmp_path / "hh_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        decayed_heavy_hitters(stream, capacity=16, half_life_s=3600.0)
        .writeStream.format("memory")
        .queryName("hh_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_rows = spark.table("hh_sink").collect()
    latest = max(r["seq"] for r in got_rows)
    got = {
        r["user_id"]: r["weight"] for r in got_rows if r["seq"] == latest
    }
    want = _hh_batch_weights(
        [(r[1], r[3], r[2]) for r in raw], 3600.0
    )["view"]
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-12)
    # decay ordering: u1 ≈ 5·2^-2 + 1 = 2.25, u3 ≈ 2·2^0 = 2,
    # u2 ≈ 3·2^-1 = 1.5 — recency discounts the old burst
    assert got[1] > got[3] > got[2]


def test_decayed_heavy_hitters_state_bounded_and_multibatch(spark, tmp_path):
    import datetime as dt

    from tensei_agent_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        decayed_heavy_hitters,
    )

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    src = str(tmp_path / "hh_src2")
    # batch 1: users 1..6 once each; batch 2 (1h later): user 7 twice
    b1 = [
        (i, base + dt.timedelta(seconds=i), i, "view", 1.0, "{}")
        for i in range(1, 7)
    ]
    b2 = [
        (10 + i, base + dt.timedelta(hours=1, seconds=i), 7, "view", 1.0, "{}")
        for i in range(2)
    ]
    # exactly one file per logical batch → maxFilesPerTrigger=1 gives
    # two micro-batches in write order (file source orders by mod time)
    spark.createDataFrame(b1, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(b2, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        decayed_heavy_hitters(stream, capacity=4, half_life_s=3600.0)
        .writeStream.format("memory")
        .queryName("hh_sink2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("hh_sink2").collect()
    latest = max(r["seq"] for r in rows)
    final = [r for r in rows if r["seq"] == latest]
    # state (and emission) is capacity-bounded despite 7 distinct users
    assert len(final) == 4
    got = {r["user_id"]: r["weight"] for r in final}
    # the fresh user must be present; its weight is its own mass PLUS
    # the evicted minimum (the Space-Saving overcount guarantee):
    # own ≈ 2^0 + 2^(-1s/1h) ≈ 2.0, evicted min ≈ one hour-decayed
    # batch-1 event ≈ 0.5
    assert 7 in got
    assert got[7] > 1.99  # strictly above its own mass alone
    assert got[7] < 2.6  # bounded by own mass + evicted minimum


def test_decayed_heavy_hitters_late_batch_distinct_seq(spark, tmp_path):
    """A batch whose events all sit at or before the stored epoch
    re-emits the SAME epoch_ms — seq must still distinguish the two
    snapshots (the latest-snapshot key is max seq, not max epoch)."""
    import datetime as dt

    from tensei_agent_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        decayed_heavy_hitters,
    )

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    src = str(tmp_path / "hh_src3")
    b1 = [(1, base + dt.timedelta(hours=1), 1, "view", 1.0, "{}")]
    # batch 2: only LATE events, strictly before batch 1's timestamp
    b2 = [(2, base, 2, "view", 1.0, "{}")]
    spark.createDataFrame(b1, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(b2, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        decayed_heavy_hitters(stream, capacity=4, half_life_s=3600.0)
        .writeStream.format("memory")
        .queryName("hh_sink3")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("hh_sink3").collect()
    # Both snapshots carry the batch-1 epoch; seq disambiguates.
    assert len({r["epoch_ms"] for r in rows}) == 1
    assert sorted({r["seq"] for r in rows}) == [1, 2]
    final = {r["user_id"]: r["weight"] for r in rows if r["seq"] == 2}
    # the late event decays from its own ts to the (unchanged) epoch
    assert final[2] == pytest.approx(0.5, rel=1e-12)
    assert final[1] == pytest.approx(1.0, rel=1e-12)


def test_bottomk_stream_equals_batch_under_any_split(spark, tmp_path):
    import datetime as dt

    from tensei_agent_spark.operators.sampling import bottomk_sample
    from tensei_agent_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        bottomk_sample_stream,
    )

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (
            eid,
            base + dt.timedelta(seconds=eid),
            eid % 7,
            "view" if eid % 3 else "purchase",
            1.0,
            "{}",
        )
        for eid in range(1, 201)
    ]
    # Replayed duplicates: at-least-once delivery must not change the sample.
    rows += rows[:25]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)

    want = {
        (r["event_type"], r["event_id"], r["prio"])
        for r in bottomk_sample(
            df.dropDuplicates(["event_id"]), ["event_type"], "event_id", k=8
        )
        .select("event_type", "event_id", "prio")
        .collect()
    }

    for split, nfiles in (("one", 1), ("many", 5)):
        src = str(tmp_path / f"bk_src_{split}")
        df.repartition(nfiles).write.parquet(src)
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sink = f"bk_sink_{split}"
        q = (
            bottomk_sample_stream(stream, k=8)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(sink).collect()
        latest: dict[str, int] = {}
        for r in out:
            latest[r["event_type"]] = max(
                latest.get(r["event_type"], 0), r["seq"]
            )
        got = {
            (r["event_type"], r["event_id"], r["prio"])
            for r in out
            if r["seq"] == latest[r["event_type"]]
        }
        assert got == want, f"split={split}"


def test_cms_stream_equals_batch_sketch(spark, tmp_path):
    from tensei_agent_spark.operators.sketches import cms_build
    from tensei_agent_spark.streaming.pipeline import cms_read, cms_stream

    rows = [(f"k{i % 37}",) for i in range(3000)] + [("hot",)] * 400
    df = spark.createDataFrame(rows, "key string")
    src = str(tmp_path / "cms_src")
    df.repartition(6).write.parquet(src)

    idx = str(tmp_path / "cms_index")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = cms_stream(stream, idx, "key", depth=4, width=64)
    q.awaitTermination()

    got = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_read(spark, idx).collect()
    }
    want = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_build(df, "key", depth=4, width=64).collect()
    }
    assert got == want


def test_pointintime_stream_matches_batch_window(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tensei_agent_spark.streaming.pipeline import (
        pointintime_features_stream,
    )

    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    rows = []
    for eid in range(1, 121):
        rows.append(
            (
                eid % 5,  # user
                base + dt.timedelta(minutes=eid),
                eid,
                "view" if eid % 3 else "purchase",
                (eid % 7) * 25,  # exact cents
            )
        )
    schema = (
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value_cents long"
    )
    df = spark.createDataFrame(rows, schema)

    # Batch reference: cumulative window minus current row.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    want = {
        (r["user_id"], r["event_id"]): (
            r["n"], r["nv"], r["cents"]
        )
        for r in df.select(
            "user_id",
            "event_id",
            (F.count(F.lit(1)).over(w) - 1).alias("n"),
            (F.sum(is_view).over(w) - is_view).alias("nv"),
            (F.sum("value_cents").over(w) - F.col("value_cents")).alias(
                "cents"
            ),
        ).collect()
    }

    # Cross-batch state: run availableNow TWICE over a shared
    # checkpoint — first the early half, then the late half (the
    # log-ingestion contract: time-ordered per user ACROSS batches;
    # within a run the handler sorts). File-listing order inside one
    # directory is NOT guaranteed, so ordered delivery is modeled as
    # ordered arrival, not file naming.
    src = str(tmp_path / "pit_src")
    ckpt = str(tmp_path / "pit_ckpt")
    sink = str(tmp_path / "pit_out")
    early = df.filter("event_id <= 60")
    late = df.filter("event_id > 60")

    def run_once(batch_df):
        batch_df.coalesce(1).write.mode("append").parquet(src)
        q = (
            pointintime_features_stream(
                spark.readStream.schema(df.schema).parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(early)
    run_once(late)
    got = {
        (r["user_id"], r["event_id"]): (
            r["n_prior_events"], r["n_prior_views"], r["prior_value_cents"]
        )
        for r in spark.read.parquet(sink).collect()
    }
    assert got == want
