"""Distributed substitutes for unpartitioned global windows.

A bare ``Window.orderBy(...)`` with no ``partitionBy`` funnels the
WHOLE input through one partition (Spark warns ``WindowExec: No
Partition Defined``) — correct, but dead at 100× scale. These helpers
compute the *bit-exact same result* distributed:

1. ``repartitionByRange`` on the order keys (range partitioner keeps
   global order across partitions),
2. run the window per range partition (hash-partitioned WindowExec,
   fully parallel),
3. shift each partition by the cumulative count/sum of its
   predecessors — a tiny O(num_partitions) table collected on the
   driver and broadcast back (same technique as
   ``operators/joins.with_row_index``).

Exactness contract:

- :func:`with_global_rank` equals ``row_number()`` for any TOTAL order
  (callers must tie-break; a non-total order makes row_number itself
  nondeterministic anyway).
- :func:`with_global_prefix_sum` equals a running ``sum() ROWS
  UNBOUNDED PRECEDING`` only for exact value types (DECIMAL / integer)
  — fixed-point addition is associative, float is not. It raises on
  float inputs rather than silently drifting.

Used by ``customer_balance_quartiles``, ``part_abc_classification``,
``user_activity_gini``, ``zipf_slope`` (VERDICT r2 item 4).
"""

from __future__ import annotations

from collections.abc import Sequence
from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    IntegerType,
    LongType,
    ShortType,
)


def _as_columns(order: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order]


def _range_partitioned(df: DataFrame, order: list[Column]) -> DataFrame:
    return (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
    )


def with_global_rank(
    df: DataFrame,
    order: Sequence[Column | str],
    out: str = "i",
) -> DataFrame:
    """Attach a 1-based global ``row_number()`` over *order*, distributed.

    *order* must be a total order (include a unique tie-break column).
    """
    order = _as_columns(order)
    part = _range_partitioned(df, order)
    w = Window.partitionBy("_pid").orderBy(*order)
    local = part.withColumn("_lrn", F.row_number().over(w))
    counts = sorted(
        (r["_pid"], r["n"])
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    )
    return (
        local.join(off_df, "_pid")
        .withColumn(out, F.col("_lrn") + F.col("_off"))
        .drop("_pid", "_lrn", "_off")
    )


def with_global_prefix_sum(
    df: DataFrame,
    order: Sequence[Column | str],
    value_col: str,
    out: str = "cum",
) -> DataFrame:
    """Attach the running ``sum(value_col) ROWS UNBOUNDED PRECEDING``
    over the global *order*, distributed.

    Only exact value types are accepted (DECIMAL / integer): the
    partition-wise regrouping of a float sum would not be bit-equal to
    the single-partition window.
    """
    vt = df.schema[value_col].dataType
    if not isinstance(vt, (DecimalType, LongType, IntegerType, ShortType, ByteType)):
        raise TypeError(
            f"with_global_prefix_sum needs an exact value type, got {vt}; "
            "cast to DECIMAL first (float addition is not associative)"
        )
    order = _as_columns(order)
    part = _range_partitioned(df, order)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lcum", F.sum(value_col).over(w))
    # Per-partition totals -> cumulative offsets. Python ints/Decimals
    # are arbitrary-precision, so the driver-side accumulation is exact.
    totals = sorted(
        (r["_pid"], r["t"])
        for r in local.groupBy("_pid").agg(F.sum(value_col).alias("t")).collect()
    )
    sum_type = local.schema["_lcum"].dataType  # sum() widens decimals
    zero = Decimal(0) if isinstance(sum_type, DecimalType) else 0
    offsets, acc = [], zero
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += t if t is not None else zero
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets,
            f"_pid int, _off {sum_type.simpleString()}",
        )
    )
    return (
        local.join(off_df, "_pid")
        .withColumn(out, (F.col("_lcum") + F.col("_off")).cast(sum_type))
        .drop("_pid", "_lcum", "_off")
    )


def ntile_from_rank(rank: Column, n_rows: Column, tiles: int) -> Column:
    """SQL ``ntile(tiles)`` from a 1-based global rank + total row count,
    in pure integer arithmetic (no division — exact beyond 2^53).

    ntile semantics: the first ``n_rows mod tiles`` buckets get
    ``floor(n/tiles)+1`` rows, the rest ``floor(n/tiles)``; bucket k's
    upper boundary is ``k*base + min(k, rem)``.
    """
    if tiles < 1:
        raise ValueError(f"ntile requires tiles >= 1, got {tiles}")
    if tiles & (tiles - 1) == 0:
        shift = tiles.bit_length() - 1
        base = F.shiftright(n_rows, shift)  # exact n DIV tiles
    else:
        # Exact n DIV tiles without float: subtract the remainder, then
        # divide in DECIMAL (exact when the numerator is divisible) —
        # a '/' double divide rounds above 2^53 and would silently
        # shift every bucket boundary.
        exact_num = (n_rows - F.pmod(n_rows, F.lit(tiles))).cast("decimal(38,0)")
        base = (exact_num / F.lit(tiles)).cast("long")
    rem = n_rows - base * tiles
    expr = F.lit(tiles)
    for k in range(tiles - 1, 0, -1):
        boundary = F.lit(k) * base + F.least(F.lit(k), rem)
        expr = F.when(rank <= boundary, F.lit(k)).otherwise(expr)
    return expr


def with_global_prefix_max(
    df: DataFrame,
    order: Sequence[Column | str],
    value_col: str,
    out: str = "runmax",
    exclusive: bool = False,
) -> DataFrame:
    """Attach the running ``max(value_col)`` over the global *order*,
    distributed (range-partition + local window + broadcast offsets —
    the same shape as ``with_global_prefix_sum``). Unlike the sum, max
    is order-insensitive and exact for every comparable type, so there
    is no exact-type restriction.

    ``exclusive=True`` computes the max over strictly-PRECEDING rows
    (NULL for the global first row) — the dominance test a skyline
    operator needs.

    *order* must be a TOTAL order (same contract as
    ``with_global_rank``): with ties, which tied row "precedes" the
    other is partition-sort luck, so exclusive results on tied keys
    vary run to run. ``skyline_2d`` satisfies this by pre-aggregating
    to one row per key; other callers must add a tie-break column.
    """
    order = _as_columns(order)
    part = _range_partitioned(df, order)
    end = -1 if exclusive else 0
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = part.withColumn("_lmax", F.max(value_col).over(w))
    totals = sorted(
        (r["_pid"], r["t"])
        for r in local.groupBy("_pid").agg(F.max(value_col).alias("t")).collect()
    )
    offsets, acc = [], None
    for pid, t in totals:
        offsets.append((pid, acc))
        if t is not None:
            acc = t if acc is None else max(acc, t)
    vt = df.schema[value_col].dataType.simpleString()
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, f"_pid int, _off {vt}")
    )
    return (
        local.join(off_df, "_pid")
        # greatest() skips NULLs: first-row-of-partition exclusive max
        # falls back to the previous partitions' offset (or NULL at the
        # global head).
        .withColumn(out, F.greatest(F.col("_lmax"), F.col("_off")))
        .drop("_pid", "_lmax", "_off")
    )
