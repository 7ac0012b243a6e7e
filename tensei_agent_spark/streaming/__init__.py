"""Structured Streaming operators.

The reference has **no** streaming surface — ``ConnectionTypeStream``
raises ``???`` (``Parser.scala:503-508``, SURVEY.md §2.9). This package
is beyond-reference capability for the events-style tables: watermarked
tumbling/sliding window rollups and custom stateful sessionization,
designed so the same transformation runs identically in batch
(``queries.events_hourly_rollup``) and streaming — the Structured
Streaming unification contract.
"""

from .pipeline import (  # noqa: F401
    attribute_purchases,
    enrich_with_dim,
    hourly_rollup,
    read_event_stream,
    run_to_completion,
    sessionize,
    sliding_counts,
    stream_dedup,
    stream_upsert_to_db,
    user_value_anomalies,
)
