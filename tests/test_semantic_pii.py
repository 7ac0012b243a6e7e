"""Unit tests for SemDeDup-style pruning and PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.functions.transformers import build
from tensei_agent_spark.operators.similarity import semantic_dedup


def test_semantic_dedup_keeps_lowest_id(spark):
    # vec 1 ≈ vec 2 ≈ vec 3 (same cluster) → keep 1 only; vec 4 is
    # orthogonal in the same cluster; vec 5 identical to 1 but in
    # another cluster → blocked, survives.
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.001], 0),
        (3, [0.999, 0.01], 0),
        (4, [0.0, 1.0], 0),
        (5, [1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    kept = sorted(
        r["vec_id"] for r in semantic_dedup(df, "label", threshold=0.9).collect()
    )
    assert kept == [1, 4, 5]


def test_redact_pii_masks_email_and_phone(spark):
    df = spark.createDataFrame(
        [("write bob.smith+x@mail.example.org or call +1-555-123-4567 now",)],
        ["s"],
    )
    (red,) = build("redact_pii", [F.col("s")])
    out = df.select(red.alias("r")).collect()[0]["r"]
    assert out == "write [EMAIL] or call [PHONE] now"

    # selective: phone-only
    (phone_only,) = build("redact_pii", [F.col("s")], email=False)
    out2 = df.select(phone_only.alias("r")).collect()[0]["r"]
    assert "[EMAIL]" not in out2 and "[PHONE]" in out2
