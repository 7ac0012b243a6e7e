"""As-of join unit tests: inclusive semantics, tie-breaks, no-match
nulls, and the all-columns-from-one-row guarantee."""

from __future__ import annotations

import datetime as dt

from tensei_agent_spark.operators.joins import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_as_of_join_semantics(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0, 9901),
            (1, _ts("2024-01-01T10:05:00"), 101.0, 9902),
            (1, _ts("2024-01-01T10:05:00"), 102.0, 9903),  # tie on ts
            (2, _ts("2024-01-01T09:00:00"), 50.0, 9904),
        ],
        "k long, ts timestamp, px double, qid long",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:03:00"), 7.0, 1),   # after first quote
            (1, _ts("2024-01-01T10:05:00"), 8.0, 2),   # equal ts → inclusive
            (1, _ts("2024-01-01T09:59:00"), 9.0, 3),   # before any quote
            (2, _ts("2024-01-01T12:00:00"), 1.0, 4),
            (3, _ts("2024-01-01T12:00:00"), 2.0, 5),   # key with no quotes
        ],
        "k long, ts timestamp, qty double, tid long",
    )
    out = {
        r["tid"]: (r["right_px"], r["right_qid"])
        for r in as_of_join(
            trades, quotes, key="k", right_cols=["px", "qid"], tie_col="qid"
        ).collect()
    }
    assert out[1] == (100.0, 9901)      # latest quote ≤ 10:03
    assert out[2] == (102.0, 9903)      # equal-ts inclusive; max tie wins
    assert out[3] == (None, None)       # no earlier quote
    assert out[4] == (50.0, 9904)
    assert out[5] == (None, None)       # unseen key

    # columns always come from the SAME matched row (struct fill)
    assert all(
        (px is None) == (qid is None) for px, qid in out.values()
    )

def test_range_join_containment(spark):
    from tensei_agent_spark.operators.joins import range_join

    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"), 100),
            (1, _ts("2024-01-01T12:00:00"), _ts("2024-01-01T12:10:00"), 101),
            (2, _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), 102),
        ],
        "k long, start timestamp, end timestamp, iid long",
    )
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:30:00"), 1),  # inside first interval
            (1, _ts("2024-01-01T11:00:00"), 2),  # boundary end → inclusive
            (1, _ts("2024-01-01T11:30:00"), 3),  # gap → no match
            (1, _ts("2024-01-01T12:00:00"), 4),  # boundary start → inclusive
            (2, _ts("2024-01-01T18:00:00"), 5),  # long interval spans buckets
            (3, _ts("2024-01-01T10:30:00"), 6),  # unseen key
        ],
        "k long, ts timestamp, pid long",
    )
    out = {
        r["pid"]: r["iid"]
        for r in range_join(points, intervals, key="k").collect()
    }
    assert out == {1: 100, 2: 100, 4: 101, 5: 102}
