"""Streaming pipelines over the events stream.

Design notes for scale:

- **Watermarks bound state.** Every stateful op declares how late data
  may arrive; Spark drops state older than the watermark, so state size
  is O(active windows × keys), not O(history).
- **The window agg is partial-aggregated map-side** exactly like the
  batch twin; the shuffle key is (window, event_type) — low cardinality,
  no skew.
- **Sessionization** uses ``applyInPandasWithState`` — the custom
  stateful escape hatch (per-key state, Arrow-batched). State is one
  small tuple per user; timeouts expire idle users so state can't grow
  unboundedly.
- Sinks in tests are in-memory; production would be a parquet/Delta
  sink with checkpointing — the query shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory (schema pinned —
    streaming sources cannot infer)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h rollup — the streaming twin of
    ``queries.events_hourly_rollup`` (same expression, same results)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value"
        )
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts per type (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, end long, n long, total double"


def _session_fn(key, pdf_iter, state: GroupState):
    """Per-user session assembly: events within `gap` of each other
    belong to one session; a timeout flushes the final session."""
    import pandas as pd

    gap_ms = 30 * 60 * 1000
    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(end, unit="ms")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
        return

    ts_list, val_list = [], []
    for pdf in pdf_iter:
        ts_list.extend(int(t.value // 1_000_000) for t in pdf["ts"])
        val_list.extend(float(v) for v in pdf["value"])
    order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
    closed = []
    cur = list(state.get) if state.exists else None
    for i in order:
        t, v = ts_list[i], val_list[i]
        if cur is None:
            cur = [t, t, 1, v]
        elif t - cur[1] <= gap_ms:
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += v
        else:
            closed.append(tuple(cur))
            cur = [t, t, 1, v]
    if cur is not None:
        state.update(tuple(cur))
        # Expire via event time: once the watermark passes session_end +
        # gap no new event can extend this session, so it flushes.
        state.setTimeoutTimestamp(cur[1] + gap_ms)
    if closed:
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="ms") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed],
            }
        )


def sessionize(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState:
    30-minute-gap sessions per user, idle state expired by timeout."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup bounded by the watermark:
    ``dropDuplicatesWithinWatermark`` keeps state only for the watermark
    horizon, so dedup state cannot grow with the stream (the unbounded
    variant would OOM on an infinite stream). Batch twin: dropDuplicates."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def run_to_completion(
    stream_df: DataFrame, sink_table: str, output_mode: str = "complete"
) -> None:
    """Drain all available input into an in-memory sink (tests / local
    verification; production uses parquet + checkpoint)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join.

    The static side is re-evaluated per micro-batch (Spark's
    stream-static join semantics), so a dim refreshed in place is picked
    up automatically. Small dims broadcast (no shuffle of the stream);
    a dim that scales with data should pass ``broadcast_dim=False`` and
    rely on AQE inside each micro-batch.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_upsert_to_db(
    stream: DataFrame,
    connect,
    table: str,
    dialect,
    key_cols: list[str],
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Streaming → database upsert via ``foreachBatch`` + the batch JDBC
    sink (one code path for batch and streaming writes, like the
    reference's single DatabaseWriterActor).

    Upsert is idempotent per key, so micro-batch replays after failure
    re-apply the same keyed rows instead of duplicating them — the
    standard exactly-once-effect recipe for non-transactional sinks.
    Returns the started StreamingQuery.
    """
    from ..plans.spec import Field
    from ..sinks.jdbc import dbapi_write

    # the conflict target must be backed by a UNIQUE/PK constraint in
    # the generated DDL, so mark every key column unique
    fields = tuple(Field(c, unique=True) for c in key_cols)

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        dbapi_write(
            batch_df, connect, table, dialect,
            fields=fields, mode="upsert", key_cols=key_cols,
        )

    writer = stream.writeStream.foreachBatch(_write_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: each purchase pairs with the same
    user's views in the preceding ``attribution_window``.

    Both sides carry watermarks and the join condition bounds view_ts
    inside [purchase_ts - window, purchase_ts]; Spark derives the state
    retention from exactly these two constraints, so buffered rows
    expire at watermark + window instead of accumulating forever — the
    required shape for an unbounded stream-stream join. ``how='left_outer'``
    emits unmatched views after their join window expires (abandonment
    analysis); outer results arrive only once the watermark passes. The equi-key is
    user_id (hash shuffle both sides); the range predicate is evaluated
    post-match. Batch twin: ``queries.view_purchase_attribution``.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        how,
    )


def _make_stats_processor(threshold_sigma: float, min_history: int):
    """Build the StatefulProcessor for ``user_value_anomalies`` —
    defined lazily because the base-class import requires the Spark 4
    transformWithState API."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class P(StatefulProcessor):
        def init(self, handle) -> None:
            # One (n, sum, sum_sq) triple per user — O(keys) state, no
            # per-event history retained.
            self._agg = handle.getValueState(
                "agg", "n long, s double, s2 double"
            )

        def handleInputRows(self, key, rows, timer_values):
            st = self._agg.get()
            n, s, s2 = (st[0], st[1], st[2]) if st else (0, 0.0, 0.0)
            out = []
            # Deterministic within a micro-batch: a large group arrives
            # as SEVERAL Arrow chunks, so the event-time sort must run
            # over the concatenated group — a per-chunk sort would
            # still process chunks in arrival order.
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                whole = pd.concat(chunks).sort_values("ts")
                for ts, v in zip(whole["ts"], whole["value"]):
                    v = float(v)
                    if n >= min_history:
                        mean = s / n
                        var = max(s2 / n - mean * mean, 0.0)
                        if abs(v - mean) > threshold_sigma * var ** 0.5:
                            out.append((key[0], ts, v, mean, var ** 0.5))
                    n, s, s2 = n + 1, s + v, s2 + v * v
            self._agg.update((n, s, s2))
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "ts", "value", "mean", "std"]
                )

        def close(self) -> None:
            pass

    return P()


ANOMALY_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("mean", DoubleType()),
        StructField("std", DoubleType()),
    ]
)


_ANOMALY_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("s2", DoubleType()),
    ]
)


def _tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf Python package for
    its state-server wire format; it is not bundled here."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_anomaly_fn(threshold_sigma: float, min_history: int):
    """applyInPandasWithState twin of the StatefulProcessor — identical
    per-event logic, GroupState instead of a state handle."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
        out = []
        # Sort over the CONCATENATED group, not per chunk (see the
        # StatefulProcessor twin).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks).sort_values("ts")
            for ts, v in zip(whole["ts"], whole["value"]):
                v = float(v)
                if n >= min_history:
                    mean = s / n
                    var = max(s2 / n - mean * mean, 0.0)
                    if abs(v - mean) > threshold_sigma * var ** 0.5:
                        out.append((key[0], ts, v, mean, var ** 0.5))
                n, s, s2 = n + 1, s + v, s2 + v * v
        state.update((n, s, s2))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "ts", "value", "mean", "std"]
            )

    return fn


def user_value_anomalies(
    events: DataFrame,
    threshold_sigma: float = 3.0,
    min_history: int = 5,
    api: str = "auto",
) -> DataFrame:
    """Per-user running anomaly detection: each user's value stream is
    scored against the running mean/std of that user's OWN history so
    far; values more than ``threshold_sigma`` standard deviations out
    (after ``min_history`` observations) emit an alert row.

    State is a single (n, sum, sum_sq) triple per user (constant-size —
    no history buffer), hash-partitioned by user_id exactly like a
    streaming aggregate.

    Two interchangeable engines producing identical output:
    ``api="tws"`` uses Spark 4's ``transformWithStateInPandas``
    arbitrary-state API (requires the protobuf Python package, which its
    state-server protocol imports; raises a clear gate error when
    absent); ``api="apis"`` uses ``applyInPandasWithState``.
    ``"auto"`` picks tws when protobuf is importable, else apis.
    """
    if api == "auto":
        api = "tws" if _tws_available() else "apis"
    if api == "tws":
        if not _tws_available():
            raise NotImplementedError(
                "transformWithStateInPandas requires the protobuf Python "
                "package (pyspark.sql.streaming.proto imports it); install "
                "protobuf or use api='apis'"
            )
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_make_stats_processor(
                threshold_sigma, min_history
            ),
            outputStructType=ANOMALY_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_anomaly_fn(threshold_sigma, min_history),
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def serve_ann_stream(
    spark,
    corpus: DataFrame,
    codebooks,
    query_stream: DataFrame,
    k: int = 10,
    sink_table: str = "ann_results",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    writer=None,
):
    """Online ANN serving: a stream of query vectors scored against a
    STATIC product-quantization index (operators/pq.py) — the
    batch-serving split every vector-search deployment has: the index
    is built once (codes persisted, 32× smaller than the vectors), the
    query stream rides ``foreachBatch``, and each micro-batch runs the
    UNCHANGED batch ``pq_adc_topk`` — one code path, two execution
    modes, like every other stream/batch twin in this module.

    ``foreachBatch`` rather than a streaming join because per-query
    top-k needs a rank window, which streaming DataFrames cannot
    express; inside the batch hook the window is ordinary.

    ``writer`` is the production sink hook: a callable
    ``(topk_df, batch_id) -> None`` invoked with each micro-batch's
    scored top-k DataFrame — append to parquet/JDBC/Kafka there, with
    per-batch work bounded by |batch queries| × k. When ``writer`` is
    None the results instead accumulate in the ``sink_table`` temp
    view, which is a TEST-ONLY sink: every batch collects to the
    driver and re-unions all prior rows (O(B²) cumulative over B
    batches), fine for the availableNow verification runs in
    tests/test_streaming.py and wrong for any long-running stream.

    Returns the started query; callers ``awaitTermination``.
    """
    from .. import cache
    from ..operators.pq import pq_adc_topk, pq_encode

    # cache.track, not a bare persist: the index is released by the
    # repo's standard lifecycle (next registry build / release_all)
    # instead of leaking for the session lifetime.
    codes = cache.track(pq_encode(corpus, codebooks, vec_col, id_col))

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        topk = pq_adc_topk(
            corpus, batch_df, codebooks, k, vec_col, id_col, codes=codes
        ).withColumn("batch_id", F.lit(batch_id))
        if writer is not None:
            # Production path: hand the scored batch to the caller's
            # sink; no driver collect, no cumulative re-union.
            writer(topk, batch_id)
            return
        # SESSION TRAP: foreachBatch runs in a CLONED SparkSession, and
        # createOrReplaceTempView registers in whichever session roots
        # the plan — a stream-rooted DataFrame would register the view
        # in the clone, invisible to the caller. Per-batch top-k is
        # bounded (|batch queries| × k rows), so collect and rebuild on
        # the CALLER's session explicitly; the accumulate view is then
        # unambiguously session-scoped to the caller.
        rows = topk.collect()
        if not rows:
            return
        batch_out = spark.createDataFrame(rows, topk.schema)
        existing = (
            spark.table(sink_table)
            if any(t.name == sink_table for t in spark.catalog.listTables())
            else None
        )
        out = batch_out if existing is None else existing.unionByName(batch_out)
        out.localCheckpoint().createOrReplaceTempView(sink_table)

    return (
        query_stream.writeStream.foreachBatch(score_batch)
        .trigger(availableNow=True)
        .start()
    )


def scd2_stream(
    spark,
    changes_stream: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    n_buckets: int = 16,
):
    """Streaming SCD-type-2 dimension maintenance: each micro-batch of
    change events MERGEs into a bucket-partitioned parquet snapshot via
    the batch :func:`~..operators.incremental.scd2_merge` kernel — one
    code path, two execution modes, like the other stream/batch twins
    here.

    Storage is plain parquet partitioned by ``_bucket =
    pmod(xxhash64(key), n_buckets)``; a batch

    1. reads ONLY the buckets its keys hash into (partition pruning —
       untouched buckets are neither read nor written),
    2. recomputes validity intervals for its touched keys
       (out-of-order safe — see the kernel docstring),
    3. rewrites exactly the touched buckets through
       ``maintenance.upsert_partitioned_parquet`` (dynamic partition
       overwrite).

    Per-batch cost is O(touched buckets' data), independent of the
    dimension's total size — the property that keeps a 100 TB slowly-
    changing dimension maintainable from a stream. At that scale
    ``n_buckets`` grows with the dimension (buckets ≈ dim size /
    executor-memory-sized slice) and hot keys stay confined to their
    bucket. foreachBatch-batch semantics give at-least-once delivery;
    replaying a batch re-merges the same events into the same versions
    (``dropDuplicates`` on the key+order columns below), so the sink
    is idempotent.

    Returns the started query; read the snapshot with
    ``spark.read.parquet(path)`` after ``awaitTermination``.
    """
    from ..operators.incremental import scd2_merge
    from ..operators.maintenance import upsert_partitioned_parquet

    def bucket_of():
        # pure Column expression over key_cols — frame-independent
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)
        ).cast("int")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        batch_df = batch_df.dropDuplicates([*key_cols, *order_cols])
        touched_buckets = [
            r[0]
            for r in batch_df.select(bucket_of().alias("_b"))
            .distinct()
            .collect()
        ]
        from pyspark.errors import AnalysisException

        try:
            existing = (
                spark.read.parquet(path)
                .filter(F.col("_bucket").isin(touched_buckets))
                .drop("_bucket")
            )
        except AnalysisException:  # first batch: no table yet
            existing = None
        merged = scd2_merge(
            existing,
            batch_df,
            key_cols,
            order_cols,
            valid_from,
            valid_to,
        )
        out = merged.withColumn("_bucket", bucket_of())
        upsert_partitioned_parquet(
            spark, out, path, key_cols=key_cols, partition_col="_bucket"
        )

    return (
        changes_stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )


def linkage_stream(
    spark,
    records_stream: DataFrame,
    index_path: str,
    blockers,
    id_col: str,
    compare_cols,
    pair_writer,
):
    """Streaming entity resolution: each micro-batch of new records is
    linked against everything seen before it (plus itself) via the
    batch :func:`~..operators.linkage.incremental_pairs`, then appended
    to the persisted blocking index — the linkage analogue of the
    ``MinHashIndex`` daily-crawl pattern, driven by foreachBatch.

    ``index_path`` holds the narrow corpus index (id + blocker +
    comparison columns only — parquet, append-only, object-store
    friendly). ``pair_writer(pairs_df, batch_id)`` receives each
    batch's candidate pairs (new×old ∪ new×new); feed them to
    ``agreement_vectors``/``score_pairs`` and a sink of your choice.

    Union of all batches' pairs == the one-shot ``blocked_pairs`` over
    the full corpus (each pair is emitted by exactly the batch that
    completes it) — asserted in tests/test_streaming.py. Per-batch
    cost: |batch| × matching blocks of the index, never index×index.
    At scale, partition the index parquet by a blocker column so the
    new×old join prunes.

    Delivery semantics: run with a checkpointLocation in production so
    each batch processes once; for the failure mode checkpointing
    still allows — the SAME batch re-delivered — emission is
    idempotent (the batch's ids are deduped out of the corpus side, so
    a replay emits exactly the original pair set; asserted in tests).
    A from-scratch re-run over an already-populated index is NOT
    exactly-once — wipe the index when you wipe the checkpoint.
    """
    from pyspark.errors import AnalysisException

    from ..operators.linkage import incremental_pairs

    def link_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        cols = [id_col, *dict.fromkeys([*_blk_flat(blockers), *compare_cols])]
        batch_narrow = batch_df.select(*cols).dropDuplicates([id_col])
        try:
            # Replay hardening (at-least-once delivery): a replayed
            # batch's records are ALREADY in the index — dedup the
            # index by id and anti-join the batch's own ids out of the
            # corpus side, so a replay emits exactly the original
            # batch's pair set (no self-pairs, no duplicates) and the
            # re-append below cannot compound.
            corpus = (
                spark.read.parquet(index_path)
                .dropDuplicates([id_col])
                .join(batch_narrow.select(id_col), id_col, "left_anti")
            )
        except AnalysisException:  # first batch: no index yet
            corpus = None
        pairs = incremental_pairs(
            batch_narrow, corpus, blockers, id_col, compare_cols
        )
        pair_writer(pairs, batch_id)
        # Append AFTER the pairs are handed off: the writer's action
        # must see the pre-batch index (localCheckpoint inside the
        # writer if it defers the action past this append).
        batch_narrow.write.mode("append").parquet(index_path)

    return (
        records_stream.writeStream.foreachBatch(link_batch)
        .trigger(availableNow=True)
        .start()
    )


def _blk_flat(blockers) -> list[str]:
    out: list[str] = []
    for blk in blockers:
        for c in [blk] if isinstance(blk, str) else blk:
            if c not in out:
                out.append(c)
    return out


# ---------------------------------------------------------------------------
# Decayed heavy hitters (round 5)
# ---------------------------------------------------------------------------

_HH_STATE_SCHEMA = "ids array<long>, ws array<double>, epoch long, seq long"
_HH_OUT_SCHEMA = (
    "event_type string, user_id long, weight double, epoch_ms long,"
    " seq long"
)


def _make_hh_fn(capacity: int, half_life_s: float):
    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (etype,) = key
        ids: list[int] = []
        ws: list[float] = []
        epoch = 0
        seq = 0
        if state.exists:
            s_ids, s_ws, s_epoch, s_seq = state.get
            ids, ws, epoch, seq = (
                list(s_ids), list(s_ws), int(s_epoch), int(s_seq),
            )

        ts_list: list[int] = []
        uid_list: list[int] = []
        for pdf in pdf_iter:
            ts_list.extend(int(t.value // 1_000_000) for t in pdf["ts"])
            uid_list.extend(int(u) for u in pdf["user_id"])
        if not ts_list:
            return
        t1 = max(max(ts_list), epoch)
        hl_ms = half_life_s * 1000.0
        # Decay existing counters from the state epoch to the new one.
        if epoch and t1 > epoch:
            d = 2.0 ** (-(t1 - epoch) / hl_ms)
            ws = [w * d for w in ws]
        idx = {u: i for i, u in enumerate(ids)}
        # Deterministic arrival order (ts, user) — makes Space-Saving
        # evictions reproducible regardless of batch row order.
        for t, u in sorted(zip(ts_list, uid_list)):
            c = 2.0 ** (-(t1 - t) / hl_ms)
            i = idx.get(u)
            if i is not None:
                ws[i] += c
            elif len(ids) < capacity:
                idx[u] = len(ids)
                ids.append(u)
                ws.append(c)
            else:
                # Space-Saving: the new key inherits the smallest
                # counter (its maximum possible undercount), evicting
                # it; ties break on the larger user id so the evictee
                # is unique.
                j = min(range(len(ws)), key=lambda k: (ws[k], -ids[k]))
                del idx[ids[j]]
                idx[u] = j
                ids[j] = u
                ws[j] = ws[j] + c
        # Monotonic per-group emission counter: a batch whose events all
        # sit at or before the stored epoch leaves t1 unchanged, so two
        # snapshots CAN share epoch_ms — seq is the unambiguous
        # latest-snapshot key (epoch_ms stays the decay timestamp).
        seq += 1
        state.update((ids, ws, t1, seq))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(ids),
                "user_id": ids,
                "weight": ws,
                "epoch_ms": [t1] * len(ids),
                "seq": [seq] * len(ids),
            }
        )

    return fn


def decayed_heavy_hitters(
    events: DataFrame, capacity: int = 64, half_life_s: float = 3600.0
) -> DataFrame:
    """Streaming decayed heavy hitters per event type: the
    Space-Saving sketch under exponential time decay, as an
    ``applyInPandasWithState`` operator.

    Each key's weight is Σ 2^(−(T−t_i)/half_life) over its events —
    recent activity dominates, stale keys fade and get evicted. State
    per group is EXACTLY ``capacity`` (ids, weights) pairs plus one
    decay epoch: bounded regardless of stream length or key
    cardinality, which is the whole point at 100 TB/day — an exact
    per-key count would hold every user ever seen. When the true
    distinct-key count ≤ capacity the sketch is exact (pinned in
    pytest against the closed-form batch weights); above capacity each
    reported weight overcounts by at most the evicted minimum, the
    standard Space-Saving guarantee, and decay keeps that error
    bounded by recency too.

    Emits the full counter table per micro-batch stamped with the
    decay epoch AND a per-group monotonic ``seq`` (update semantics:
    downstream takes the max-seq snapshot — epoch_ms alone is NOT a
    snapshot key, since a batch of late events at or before the stored
    epoch re-emits the same epoch_ms).
    """
    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            _make_hh_fn(int(capacity), float(half_life_s)),
            outputStructType=_HH_OUT_SCHEMA,
            stateStructType=_HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_BK_STATE_SCHEMA = "ids array<long>, prios array<long>, seq long"
_BK_OUT_SCHEMA = (
    "event_type string, event_id long, prio long, seq long"
)


def _make_bottomk_fn(k: int):
    def fn(key, pdf_iter, state: GroupState):
        import hashlib

        import pandas as pd

        (etype,) = key
        pairs: list[tuple[int, int]] = []  # (prio, id)
        seq = 0
        if state.exists:
            s_ids, s_prios, s_seq = state.get
            pairs = list(zip(s_prios, s_ids))
            seq = int(s_seq)
        new_ids: list[int] = []
        for pdf in pdf_iter:
            new_ids.extend(int(x) for x in pdf["event_id"])
        if not new_ids:
            return
        pairs.extend(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16),
                i,
            )
            for i in new_ids
        )
        # Mergeable bottom-k: keep the k smallest (prio, id). Exact
        # duplicates (replayed ids) collapse — replay-idempotent.
        pairs = sorted(set(pairs))[: k]
        seq += 1
        state.update(
            ([p[1] for p in pairs], [p[0] for p in pairs], seq)
        )
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(pairs),
                "event_id": [p[1] for p in pairs],
                "prio": [p[0] for p in pairs],
                "seq": [seq] * len(pairs),
            }
        )

    return fn


def bottomk_sample_stream(events: DataFrame, k: int = 32) -> DataFrame:
    """Streaming uniform reservoir per event type, as a bottom-k-by-
    hash sketch (``applyInPandasWithState``): keep the k event ids
    with the smallest md5 priority. Because bottom-k sets are
    MERGEABLE (bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ B)), the
    state after ANY micro-batch split is bit-identical to the batch
    twin ``operators/sampling.bottomk_sample`` over the same rows —
    the parity pytest shuffles the split to prove it. Unlike a
    classic random reservoir, the sample is deterministic and
    replay-idempotent (an id re-delivered at-least-once collapses
    into the same (prio, id) pair), which is what checkpoint-recovery
    semantics want. State per group is exactly k (id, prio) pairs +
    one sequence counter; emits the full sample per micro-batch in
    update mode (downstream keeps the max-seq snapshot)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _make_bottomk_fn(int(k)),
        outputStructType=_BK_OUT_SCHEMA,
        stateStructType=_BK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_stream(
    items: DataFrame,
    index_dir: str,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> "object":
    """Maintain a Count-Min sketch over a stream: each micro-batch is
    sketched (operators/sketches.cms_build — one partial-aggregated
    pass over the batch) and written as its OWN delta partition
    ``index_dir/batch=<id>/``; readers merge cell-wise via
    :func:`cms_read`. Writing one overwrite-mode partition per
    batch_id makes the sink IDEMPOTENT under at-least-once foreachBatch
    replay: a re-delivered batch overwrites its own partition with the
    identical delta instead of double-counting into a running total
    (the scd2 sink's dedup plays the same role at line ~600). Because
    CMS cells are additive, the merged read is bit-identical to the
    batch sketch of all rows under ANY split (pinned in pytest), and
    the stored state is depth×width cells per batch — compact a long
    stream's deltas with one cms_read + rewrite when batch count grows.
    """
    from ..operators.sketches import cms_build

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = cms_build(batch_df, key_col, depth, width)
        delta.coalesce(1).write.mode("overwrite").parquet(
            f"{index_dir}/batch={batch_id}"
        )

    return (
        items.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", index_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )


def cms_read(spark: SparkSession, index_dir: str) -> DataFrame:
    """Merge a :func:`cms_stream` delta directory into the current
    (d, bucket, cnt) cell table — cell-wise sums over the constant
    cell space, cheap at any batch count."""
    return (
        spark.read.parquet(index_dir)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


_PIT_STATE_SCHEMA = "n long, nv long, cents long"
_PIT_OUT_SCHEMA = (
    "user_id long, event_id long, n_prior_events long, "
    "n_prior_views long, prior_value_cents long"
)


def _make_pit_fn():
    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (uid,) = key
        n, nv, cents = (state.get if state.exists else (0, 0, 0))
        rows = []
        events = []
        for pdf in pdf_iter:
            for t, eid, et, vc in zip(
                pdf["ts"], pdf["event_id"], pdf["event_type"],
                pdf["value_cents"],
            ):
                events.append((int(t.value), int(eid), str(et), int(vc)))
        if not events:
            return
        # Deterministic intra-batch order: (ts, event_id) — the same
        # total order the batch twin's window uses.
        for _, eid, et, vc in sorted(events):
            rows.append((uid, eid, n, nv, cents))  # features BEFORE update
            n += 1
            nv += 1 if et == "view" else 0
            cents += vc
        state.update((n, nv, cents))
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "event_id", "n_prior_events",
                "n_prior_views", "prior_value_cents",
            ],
        )

    return fn


def pointintime_features_stream(events: DataFrame) -> DataFrame:
    """Online feature store: the streaming twin of the
    ``pointintime_features`` batch query — per user, running
    (prior event count, prior view count, prior value) emitted for
    EVERY event using only strictly-earlier state, so a model served
    from this stream sees exactly what offline training saw
    (``applyInPandasWithState``; state = three counters per user).

    Correctness contract: events must arrive time-ordered per user
    ACROSS micro-batches (log ingestion's natural order — within a
    batch any order is fine, the handler sorts on (ts, event_id));
    ``value_cents`` carries money as exact integer cents so the
    running sum never touches float state. Parity with the batch
    window is pinned in pytest."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_pit_fn(),
        outputStructType=_PIT_OUT_SCHEMA,
        stateStructType=_PIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
