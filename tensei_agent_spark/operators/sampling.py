"""Deterministic sampling / splitting operators for training pipelines.

A training corpus needs train/val/test membership that is (a) stable
across runs and engines, (b) a pure map over the rows — no shuffle, no
global state, so it scales to any corpus size — and (c) derived from a
*content key*, not row position, so re-partitioning or appending data
never moves an existing row between splits.

Membership is computed from an engine-portable 60-bit hash of the key
(md5 prefix — bit-identical in Spark and DuckDB, see
``operators/dedup.py``) taken modulo a bucket count. This is the Spark
rethink of sampled profiling in the reference
(`/root/reference/src/main/scala/com/wegtam/tensei/agent/Stats.scala:94-128`,
which samples a percentage of rows while streaming) generalized to
reproducible dataset splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from a 60-bit md5 prefix.

    Portable: DuckDB twin is
    ``CAST(concat('0x', substr(md5(key), 1, 15)) AS BIGINT) % buckets``.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15), 16, 10
    ).cast("long")
    return h % buckets


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the last split). Assignment is a chain of
    half-open bucket ranges, so each row lands in exactly one split and
    the assignment is identical on every engine and cluster layout.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    bucket = hash_bucket(F.col(key), salt=salt)
    names = list(weights)
    expr: Column | None = None
    edge = 0
    for name in names[:-1]:
        edge += int(weights[name] * BUCKETS)
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Content-keyed sample: keeps the same rows on every run/engine
    (unlike ``df.sample``, whose outcome depends on partitioning)."""
    edge = int(fraction * BUCKETS)
    return df.filter(hash_bucket(F.col(key), salt=salt) < edge)
