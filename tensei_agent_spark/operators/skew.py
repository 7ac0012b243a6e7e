"""Skew-mitigation join/aggregate primitives.

AQE (`spark.sql.adaptive.skewJoin`) splits oversized sort-merge
partitions at runtime and is the FIRST answer to join skew — these
operators are for the cases AQE does not reach:

- broadcast-ineligible hash joins where one key holds a large share of
  the stream (AQE splits partitions, but a single key is one
  partition's floor);
- high-cardinality-per-key aggregation (``collect_list``/``distinct``)
  where one group exceeds executor memory — partial aggregation
  doesn't shrink a distinct stream.

Both are deterministic rewrites with bit-identical results to the
plain formulation — asserted against plain-SQL oracles in the
registry (`salted_join_revenue`) and pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["count_distinct_two_phase", "salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src: str | Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys scattered across
    ``n_salt`` sub-keys and the small side replicated to match.

    ``salt_src`` names a column of ``big`` (or is an expression) whose
    hash spreads rows of the SAME join key across salts — use a unique
    id, never a join column (hashing the join key puts every row of a
    key in one salt again, which is exactly the skew). Deterministic:
    the salt is a pure function of the row, so retries and re-runs
    land rows in the same salt (no ``rand()`` — a task retry with a
    different salt would double/drop rows mid-shuffle).

    Cost model: the small side is materialized ``n_salt`` times
    through the shuffle (its replication IS the price of splitting the
    hot key); the big side shuffles once on (key, salt). Worth it when
    the hottest key's share × |big| ≫ |small| × n_salt. Result is
    bit-identical to the plain join: every (key, salt) bucket of the
    big side meets a full copy of its key's small rows exactly once.

    Only big-side-preserving join types are accepted: a right/full
    join would emit each unmatched REPLICATED row once per salt value.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    salt_col = (
        F.col(salt_src) if isinstance(salt_src, str) else salt_src
    )
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salt)).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")


def count_distinct_two_phase(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out: str = "n_distinct",
) -> DataFrame:
    """``groupBy(k).agg(countDistinct(v))`` with the distinct state
    sharded: phase 1 dedups (k, v) pairs — the shuffle key includes
    the VALUE, so a group with a billion distinct values spreads over
    the whole cluster instead of one task's hash set — and phase 2
    counts per key over the already-distinct stream with map-side
    partial combine.

    Spark's built-in ``countDistinct`` expands to a similar two-phase
    plan; this explicit form exists for composition (chain further
    per-(k,v) work between the phases) and as the documented pattern
    for the ``collect_set``-then-size shape that does NOT rewrite
    itself. NULL values are excluded before the distinct — matching
    ``countDistinct``, which never counts NULL (a bare ``distinct()``
    would keep one (k, NULL) row and over-count by one) — and groups
    whose values are ALL NULL still surface with a 0, exactly like the
    built-in."""
    keys = df.select(*group_cols).distinct()
    counts = (
        df.select(*group_cols, value_col)
        .filter(F.col(value_col).isNotNull())
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(out))
    )
    return keys.join(counts, list(group_cols), "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(0))
    )


def detect_hot_keys(
    big: DataFrame,
    on: list[str],
    hot_share: float = 0.01,
    sample_fraction: float = 0.05,
    max_hot: int = 100,
    seed: int = 7,
) -> list[tuple]:
    """Sampled hot-key detection for join planning: keys whose share
    of a ``sample_fraction`` Bernoulli sample exceeds ``hot_share``,
    capped at the ``max_hot`` heaviest (a TakeOrdered, never a sort).

    Returns driver-side key tuples (bounded by max_hot — this is plan
    metadata, not data). The sample only steers the PLAN: callers
    union a salted hot path with a plain cold path, and the result is
    bit-identical whichever keys land in the hot set, so sampling
    nondeterminism (partition-layout-sensitive seeds) cannot affect
    correctness — only how well the skew is split.
    """
    s = big.sample(fraction=float(sample_fraction), seed=seed)
    n = s.count()
    if n == 0:
        return []
    rows = (
        s.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= F.lit(max(1.0, hot_share * n)))
        .orderBy(F.col("_c").desc(), *on)
        .limit(int(max_hot))
        .collect()
    )
    return [tuple(r[c] for c in on) for r in rows]


def differential_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src: str | Column,
    n_salt: int = 8,
    how: str = "inner",
    hot_share: float = 0.01,
    sample_fraction: float = 0.05,
) -> DataFrame:
    """Skew-adaptive equi-join: detect hot keys from a sample, route
    their rows through :func:`salted_join` (small side replicated
    n_salt×, hot key scattered), and everything else through the plain
    join; union the two. This is AQE's skew-join split done at the
    logical level — usable where AQE can't see the skew (first-run
    pipelines, non-shuffle-stat sources) and portable to any join
    type salted_join accepts.

    Bit-identical to the plain join by construction: the hot/cold
    split partitions the big side on a key predicate, each partition
    joins completely, and inner/left joins distribute over the union.
    The only full-scan overhead is the one persisted tag pass over
    ``big`` (the sample is a cheap extra read of the key column).
    """
    from ..cache import track

    hot = detect_hot_keys(big, on, hot_share, sample_fraction)
    if not hot:
        return big.join(small, on, how)
    hot_df = F.broadcast(
        big.sparkSession.createDataFrame(hot, big.select(*on).schema)
        .withColumn("_hot", F.lit(1))
    )
    tagged = track(big.join(hot_df, on, "left"))
    big_hot = tagged.filter(F.col("_hot").isNotNull()).drop("_hot")
    big_cold = tagged.filter(F.col("_hot").isNull()).drop("_hot")
    small_hot = small.join(hot_df.drop("_hot"), on, "left_semi")
    out_hot = salted_join(big_hot, small_hot, on, salt_src, n_salt, how)
    out_cold = big_cold.join(small, on, how)
    return out_hot.unionByName(out_cold)
