"""Mergeable-sketch operators: exact heavy hitters via Misra-Gries
candidate generation, and HyperLogLog rollups for incremental distinct
counts.

Beyond-reference surface for 100 TB pipelines. The common thread is the
*mergeable summary* pattern: each partition computes a bounded-size
summary; summaries merge associatively; the full data stream never
shuffles.

- :func:`heavy_hitters_exact` — EXACT frequent items (freq ≥ φ·N) with
  exact counts, in two passes: a Misra-Gries summary per partition
  (bounded state, no shuffle of the item stream) proposes a candidate
  superset, then only the candidates are counted exactly. The full-
  shuffle twin (`word_counts_top100`-style groupBy over every token) is
  exact too but moves the whole token stream; here the shuffle carries
  ≤ partitions × ⌈1/φ⌉ candidate rows + one broadcast.
- :func:`distinct_rollup` — per-bucket HLL sketches (binary, storable)
  merged upward with ``hll_union_agg``: distinct-count rollups (daily →
  weekly → monthly) without recounting base data, the classic
  pre-aggregated-sketch warehouse pattern.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import track


def _mg_summaries(cap: int, value_col: str):
    """mapInPandas kernel: one Misra-Gries summary per PARTITION (the
    iterator spans all Arrow batches of the partition), emitted as
    (value, weight) rows. State is ≤ ``cap`` counters regardless of
    partition size — the whole point."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Vectorized mergeable-summary form (Agarwal et al.): each Arrow
        # batch contributes its EXACT value_counts (a zero-error
        # summary); the merge is counter addition; the compress step
        # subtracts the (cap+1)-th largest weight s from every counter
        # and drops the non-positive ones. Each compress removes ≥
        # s·(cap+1) total weight, so Σs ≤ n_p/(cap+1) — the classic MG
        # undercount bound — without a per-row Python loop.
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            col = pdf[value_col].dropna()
            n_part += len(col)
            for v, c in col.value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                s = sorted(counters.values(), reverse=True)[cap]
                counters = {k: w - s for k, w in counters.items() if w > s}
        # one NULL-valued sentinel row carries the partition's exact row
        # count, so the caller gets N from the summaries instead of a
        # third full scan of the item stream
        yield pd.DataFrame(
            {
                "value": list(counters) + [None],
                "weight": list(counters.values()) + [n_part],
            }
        )

    return fn


def heavy_hitters_exact(
    items: DataFrame,
    value_col: str,
    k: int,
    value_type: str = "string",
) -> DataFrame:
    """All values with frequency ≥ N/k, with EXACT counts.

    Output: (value, cnt), cnt ≥ ⌈N/k⌉, N = non-null row count. ``k`` is
    an integer share denominator (k=1000 ⇒ "at least 0.1% of the
    stream") so the threshold is exact integer arithmetic — a float phi
    would make ⌈phi·N⌉ ULP-dependent and engine-divergent.

    Pass 1 runs Misra-Gries with k counters per partition
    (`mapInPandas`; per-partition bounded imperative state is exactly
    the case the built-in aggregates cannot express). Merged MG
    summaries underestimate any item's true count by < N/(k+1) < N/k
    total across partitions, so every true heavy hitter survives pass 1
    — the candidate set is a guaranteed SUPERSET (with false
    positives). Pass 2 counts ONLY the candidates exactly (hash
    aggregate after a broadcast semi-join) and applies the threshold,
    which also evicts the false positives. Result is bit-identical to
    the naive full groupBy, but the only thing shuffled is ≤
    partitions × k summary rows plus the candidate counts.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    src = items.select(F.col(value_col).alias("value")).filter(
        F.col("value").isNotNull()
    )
    # Summaries are tiny (≤ partitions × (k+1) rows) — persist so the
    # candidate extraction and the N aggregation share ONE scan of the
    # item stream; pass 2 is the only other scan.
    summaries = track(
        src.mapInPandas(
            _mg_summaries(k, "value"),
            schema=f"value {value_type}, weight long",
        )
    )
    total = summaries.filter(F.col("value").isNull()).agg(
        F.sum("weight")
    ).collect()[0][0] or 0
    candidates = summaries.filter(F.col("value").isNotNull()).select(
        "value"
    ).distinct()
    counted = (
        src.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    threshold = -(-total // k)  # ceil(N/k), exact
    return counted.filter(F.col("cnt") >= threshold)


def distinct_rollup(
    df: DataFrame,
    bucket_col,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-bucket HLL sketches: (bucket, sketch, estimate).

    The binary ``sketch`` column is the storable/mergeable artifact —
    persist it per day and roll up months without touching base data.
    ``lg_k=12`` ⇒ ~1.6% standard error in ~4 KB per bucket.
    """
    return (
        df.groupBy(bucket_col)
        .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"))
        .withColumn("estimate", F.hll_sketch_estimate("sketch"))
    )


def merge_rollup(
    sketches: DataFrame,
    regroup_col,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge stored HLL sketches upward (e.g. day → week): one
    ``hll_union_agg`` over the tiny sketch table — no rescan, no
    re-shuffle of base data."""
    return (
        sketches.groupBy(regroup_col)
        .agg(F.hll_union_agg(sketch_col).alias("sketch"))
        .withColumn("estimate", F.hll_sketch_estimate("sketch"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_build(
    items: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms-v1",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of an item stream: (d, bucket, cnt) cells.

    Each row increments one bucket per depth — bucket_d(x) =
    md5("salt:d:" || x) % width, an independent hash family per row of
    the sketch. The build is explode(d) + ONE partial-aggregated
    groupBy over the depth×width cell space: the exchange is constant
    in stream size, the sketch is MERGEABLE (cell-wise sum — store
    daily sketches, merge ranges), and every count is an exact BIGINT
    → the whole structure is bit-reproducible in any engine.

    ``weight_col``: build from a PRE-AGGREGATED (key, count) table
    instead of the raw stream — cnt becomes SUM(weight). Bit-identical
    to sketching the raw stream (integer cell sums are associative),
    but the d×|input| md5 hashing runs over the vocabulary instead of
    every token occurrence — ~|stream|/|vocab| fewer hashes when a
    counts table already exists upstream.

    Size the error from the standard bound: estimates overcount by at
    most εN with ε = e/width at probability 1−e^−depth.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("d")
    keep = [F.col(key_col).cast("string").alias("_k"), d] + (
        [F.col(weight_col).alias("_wt")] if weight_col is not None else []
    )
    cells = items.select(*keep).select(
        "d",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(salt), F.col("d"), F.col("_k")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(int(width))
        )
        .cast("int")
        .alias("bucket"),
        *([F.col("_wt")] if weight_col is not None else []),
    )
    cnt = (
        F.sum("_wt").cast("long")
        if weight_col is not None
        else F.count(F.lit(1))
    )
    return cells.groupBy("d", "bucket").agg(cnt.alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-estimate probe keys against a built sketch: (key, est)
    with est = min over depths of the key's cell — the classic CM
    upper bound (never undercounts; overcount bounded by εN).

    Shape (r12, guide §2.4): the sketch is depth×width cells — a
    CONSTANT-size table by construction — so it pivots into a single
    map row (flat key d·width+bucket) that cross-joins onto the probe
    stream as a broadcast; est is then a pure map expression (least
    over depth of the key's cell lookups), no explode, no join, no
    per-key re-aggregation. The r11 shape exploded probes ×depth,
    equi-joined the broadcast cell table and groupBy-min'ed back — one
    probe-stream exchange and a join that this removes; output is
    bit-identical (same md5 buckets, same min-over-depth, missing
    cells still read 0). Duplicate probe keys collapse to one row per
    key exactly as the old groupBy did.
    """
    one = sketch.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (
                        F.col("d").cast("long") * F.lit(int(width))
                        + F.col("bucket")
                    ).alias("k"),
                    F.col("cnt").alias("v"),
                )
            )
        ).alias("_cells")
    )
    lookups = [
        F.coalesce(
            F.element_at(
                F.col("_cells"),
                F.lit(d * int(width))
                + (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.lit(salt),
                                    F.lit(d),
                                    F.col(key_col).cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(int(width))
                ),
            ),
            F.lit(0).cast("long"),
        )
        for d in range(int(depth))
    ]
    return (
        probes.select(key_col)
        .dropDuplicates([key_col])
        .crossJoin(F.broadcast(one))
        .select(F.col(key_col), F.least(*lookups).alias("est"))
    )


def quantile_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Per-group KLL quantile sketches (Karnin-Lang-Liberty FOCS'16,
    via Spark's Datasketches bindings): the STOREABLE/MERGEABLE twin
    of percentile_approx — store one sketch per (day, key) partition,
    answer any later quantile question over any key/time range by
    merging sketches instead of rescanning 100 TB.

    Returns group_cols + (kll binary). Pair with
    :func:`merge_quantile_rollup`."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(int(k))).alias(
            "kll"
        )
    )


def merge_quantile_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: list[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Merge per-partition KLL sketches up to ``group_cols`` and read
    out quantile estimates: (group_cols..., n, q_50, q_95, ...).
    Merging is the whole point — error bounds survive the union, so
    daily sketches answer monthly questions exactly as well."""
    merged = sketches.groupBy(*group_cols).agg(
        F.kll_merge_agg_double("kll").alias("kll")
    )
    cols = [
        # permille labels: q_500/q_950/q_990 — int(q*100) would
        # collide 0.125 with 0.12 and truncate 0.29 to q_28.
        F.kll_sketch_get_quantile_double("kll", F.lit(float(q))).alias(
            f"q_{round(q * 1000)}"
        )
        for q in quantiles
    ]
    return merged.select(
        *group_cols,
        F.kll_sketch_get_n_double("kll").alias("n"),
        *cols,
    )


def audience_overlap(
    df: DataFrame,
    segment_col: str,
    id_col: str,
    segments: tuple[str, str],
) -> DataFrame:
    """Set algebra on Theta sketches (Datasketches): estimated distinct
    ids in segment A, segment B, A∩B and A∖B — the audience-overlap /
    funnel-reach question HLL cannot answer (HLL unions only; Theta
    intersects and differences with bounded error).

    One pass builds both sketches (conditional aggregation), the set
    ops combine the two 4-KB summaries driver-free. Returns one row:
    (n_a, n_b, n_intersection, n_only_a)."""
    a, b = segments
    sk = df.agg(
        F.theta_sketch_agg(
            F.when(F.col(segment_col) == a, F.col(id_col))
        ).alias("sa"),
        F.theta_sketch_agg(
            F.when(F.col(segment_col) == b, F.col(id_col))
        ).alias("sb"),
    )
    return sk.select(
        F.round(F.theta_sketch_estimate("sa")).cast("long").alias("n_a"),
        F.round(F.theta_sketch_estimate("sb")).cast("long").alias("n_b"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
        )
        .cast("long")
        .alias("n_intersection"),
        F.round(
            F.theta_sketch_estimate(F.theta_difference("sa", "sb"))
        )
        .cast("long")
        .alias("n_only_a"),
    )
