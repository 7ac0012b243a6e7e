"""Named query registry — the driver-facing surface.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string (run by DuckDB on the same parquet tables). Column names
are aliased identically on both sides; every floating-point aggregate is
computed in exact DECIMAL arithmetic and cast to DOUBLE at the end so
the two engines produce bit-identical values.

Query groups:
- ``q*``        analytical benchmarks (TPC-H-shaped) — also the bench set
- ``copy_* / filter_* / row_align_* / mapping_key_* / union_* /
  dedup_unique_* / fk_*``  — reference-parity operators (SURVEY.md §2)
- ``t_*``       transformer-registry parity (SURVEY.md §2.7)
- ``stats_*``   profiling (SURVEY.md §2.5)
- ``dedup_* / ann_* / text_* / lang_* / tok_*`` — training-data pipeline
  operators (beyond-reference surface)
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load
from .operators import dedup as D
from .operators import joins as J
from .operators import stats as S

MONEY = "decimal(12,2)"


def _m(c: str):
    """Money column → exact decimal (both engines cast identically)."""
    return F.col(c).cast(MONEY)


@dataclass(frozen=True)
class Query:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, bench: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(fn, oracle, bench)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Analytical benchmarks (TPC-H-shaped on the driver tables)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 — flagship scan+agg. One map-side-combined shuffle on two
    low-cardinality keys; filter and 7-column projection push to parquet."""
    li = load(spark, sf, "lineitem")
    disc_price = _m("l_extendedprice") * (F.lit(1) - _m("l_discount"))
    charge = disc_price * (F.lit(1) + _m("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_m("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_m("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_m("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_m("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(_m("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 — join chain + agg + top-N. Customer (dim) broadcasts;
    orders↔lineitem is the only real shuffle; top-10 is a tiny TakeOrdered."""
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = _m("l_extendedprice") * (F.lit(1) - _m("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=True,
)
def q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 — 6-way join. All dims (region/nation/supplier/customer)
    broadcast; lineitem never shuffles until the final small agg."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    revenue = _m("l_extendedprice") * (F.lit(1) - _m("l_discount"))
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey) & (F.col("c_nationkey") == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) WHERE rk <= 3
    """,
    bench=True,
)
def topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-K per group — hash-partitioned window, no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    bench=True,
)
def events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window rollup (batch twin of the streaming pipeline in
    ``streaming/``): epoch-aligned 1h windows ≡ date_trunc('hour')."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Reference-parity operators (SURVEY.md §2.3/2.4/2.6)
# ---------------------------------------------------------------------------


@register(
    "copy_projection",
    """
    SELECT c_custkey AS id,
           upper(c_name) AS name_upper,
           concat(upper(substr(c_name, 1, 1)), substr(c_name, 2)) AS name_firstupper,
           lower(c_mktsegment) AS segment,
           coalesce(nullif(c_mktsegment, ''), 'NONE') AS segment_or_default,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
    FROM customer
    """,
)
def copy_projection(spark: SparkSession, sf: str) -> DataFrame:
    """CopyCSV parity: 1:1 column mapping + transformer chain
    (LowerOrUpper upper/firstupper/lower, default-value substitution —
    reference ``usecases/copy/CopyCSVTest.scala``; defaults per
    ``helpers/ProcessorHelpers.scala:124-139``)."""
    c = load(spark, sf, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.upper("c_name").alias("name_upper"),
        F.concat(
            F.upper(F.substring("c_name", 1, 1)), F.expr("substring(c_name, 2)")
        ).alias("name_firstupper"),
        F.lower("c_mktsegment").alias("segment"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("")), F.lit("NONE")
        ).alias("segment_or_default"),
        _m("c_acctbal").cast("double").alias("acctbal"),
    )


@register(
    "filter_limit",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 10 AND l_discount > 0.03
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def filter_limit(spark: SparkSession, sf: str) -> DataFrame:
    """`filter` attribute + `seq max` row cap (SURVEY §2.3). The ORDER BY
    makes the LIMIT set deterministic; both predicates push to parquet."""
    return (
        load(spark, sf, "lineitem")
        .filter((F.col("l_quantity") < 10) & (F.col("l_discount") > 0.03))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "row_align_merge",
    """
    WITH a AS (SELECT c_custkey, c_name,
                      row_number() OVER (ORDER BY c_custkey) - 1 AS rn FROM customer),
         b AS (SELECT s_suppkey, s_name,
                      row_number() OVER (ORDER BY s_suppkey) - 1 AS rn FROM supplier)
    SELECT a.rn AS rn, a.c_custkey AS c_custkey, a.c_name AS c_name,
           b.s_suppkey AS s_suppkey, b.s_name AS s_name
    FROM a JOIN b USING (rn)
    """,
)
def row_align(spark: SparkSession, sf: str) -> DataFrame:
    """Positional merge of two sources (reference RecipeWorker row loop,
    ``RecipeWorker.scala:332-394``): zip row i with row i, stop at the
    shorter side. Distributed row indexing — see joins.with_row_index."""
    cust = load(spark, sf, "customer").select("c_custkey", "c_name")
    supp = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    out = J.row_aligned_merge(cust, supp, ["c_custkey"], ["s_suppkey"], "rn")
    return out.select("rn", "c_custkey", "c_name", "s_suppkey", "s_name")


@register(
    "mapping_key_join",
    """
    SELECT o_orderkey, o_totalprice, c_name,
           coalesce(c_mktsegment, 'UNKNOWN') AS segment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
)
def key_join(spark: SparkSession, sf: str) -> DataFrame:
    """Mapping-key lookup ≡ equi left-join (reference
    ``MappingOneToOneWorker.scala:232-287``); lookup side broadcast."""
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer").withColumnRenamed("c_custkey", "o_custkey")
    return J.mapping_key_join(orders, cust, "o_custkey", broadcast_right=True).select(
        "o_orderkey",
        "o_totalprice",
        "c_name",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
    )


@register(
    "union_concat",
    """
    SELECT c_name AS name, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS src FROM supplier
    """,
)
def union_concat(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source concat into one target (reference multi-source
    recipes, e.g. ``usecases/merge/MergeTwoCSV.scala``)."""
    c = load(spark, sf, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("src")
    )
    s = load(spark, sf, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


@register(
    "dedup_unique_write",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS _rk
      FROM orders) WHERE _rk = 1
    """,
)
def dedup_unique(spark: SparkSession, sf: str) -> DataFrame:
    """Write-side unique-column dedup (reference
    ``BaseWriterFilterWorker.removeDuplicateRows``): first row per unique
    key survives, under an explicit deterministic order."""
    return D.dedup_exact(
        load(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        unique_cols=["o_custkey"],
        keep_order=["o_orderkey"],
    )


@register(
    "fk_key_remap",
    """
    WITH km AS (SELECT n_nationkey AS old_key,
                       1000 + row_number() OVER (ORDER BY n_nationkey) AS new_key
                FROM nation)
    SELECT c_custkey, c_name, km.new_key AS c_nationkey_new
    FROM customer LEFT JOIN km ON c_nationkey = km.old_key
    """,
)
def fk_remap(spark: SparkSession, sf: str) -> DataFrame:
    """Auto-increment FK remap (reference FetchForeignKeyValue +
    AutoIncrementValueBuffer): parent writes generate new keys; the
    (old→new) map is joined against the child's FK column. Here the
    'generated' key is 1000 + write-order row number."""
    nation = load(spark, sf, "nation").select("n_nationkey")
    km = J.with_row_index(nation, ["n_nationkey"], "rn").select(
        F.col("n_nationkey").alias("old_key"),
        (F.col("rn") + F.lit(1001)).alias("new_key"),
    )
    child = load(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    out = J.remap_foreign_keys(child, km, "c_nationkey")
    return out.select(
        "c_custkey", "c_name", F.col("c_nationkey").alias("c_nationkey_new")
    )


# ---------------------------------------------------------------------------
# Profiling (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


@register(
    "stats_numeric_profile",
    """
    SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS n,
           COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS n_null,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_quantity) AS mean_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(l_extendedprice),
           COUNT(CASE WHEN l_extendedprice IS NULL THEN 1 END),
           CAST(MIN(l_extendedprice) AS DOUBLE),
           CAST(MAX(l_extendedprice) AS DOUBLE),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(l_discount),
           COUNT(CASE WHEN l_discount IS NULL THEN 1 END),
           CAST(MIN(l_discount) AS DOUBLE),
           CAST(MAX(l_discount) AS DOUBLE),
           CAST(SUM(CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l_discount)
    FROM lineitem
    """,
)
def stats_numeric(spark: SparkSession, sf: str) -> DataFrame:
    """NumericAnalyzer parity (``analyzer/NumericAnalyzer.scala:48-103``):
    count/min/max/mean + null counter per column."""
    return S.numeric_profile(
        load(spark, sf, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


@register(
    "stats_string_profile",
    """
    SELECT 'c_name' AS col_name, COUNT(c_name) AS n,
           COUNT(CASE WHEN c_name IS NULL THEN 1 END) AS n_null,
           MIN(length(c_name)) AS min_len, MAX(length(c_name)) AS max_len,
           CAST(SUM(CAST(length(c_name) AS DECIMAL(20,0))) AS DOUBLE) / COUNT(c_name) AS mean_len
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(c_mktsegment),
           COUNT(CASE WHEN c_mktsegment IS NULL THEN 1 END),
           MIN(length(c_mktsegment)), MAX(length(c_mktsegment)),
           CAST(SUM(CAST(length(c_mktsegment) AS DECIMAL(20,0))) AS DOUBLE) / COUNT(c_mktsegment)
    FROM customer
    """,
)
def stats_string(spark: SparkSession, sf: str) -> DataFrame:
    """StringAnalyzer parity (``analyzer/StringAnalyzer.scala:44-100``):
    the numeric stats over string length."""
    return S.string_profile(load(spark, sf, "customer"), ["c_name", "c_mktsegment"])


# ---------------------------------------------------------------------------
# Training-data pipeline: dedup on documents
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    """
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash,
           COUNT(*) AS n_dups, MIN(doc_id) AS canonical_id
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Exact content dedup: md5 over normalized text, one group per
    distinct content, canonical = min doc_id. Cheapest 100 TB dedup pass."""
    docs = load(spark, sf, "documents")
    text = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        docs.select(F.md5(text).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("canonical_id"))
    )


@register(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 8) AS shingle
                FROM documents,
                     UNNEST(range(1, greatest(length(text) - 6, 2))) AS t(i)),
         sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS nc
                   FROM sh a JOIN sh b USING (shingle)
                   WHERE a.doc_id < b.doc_id
                   GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(CAST(nc AS DOUBLE) / (sa.n + sb.n - nc), 6) AS jaccard
    FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
    WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.6
    """,
)
def dedup_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by exact 8-char-shingle Jaccard ≥ 0.6 (inverted-
    index self-join; see operators/dedup.ngram_jaccard_pairs)."""
    return D.ngram_jaccard_pairs(
        load(spark, sf, "documents"), "text", "doc_id", k=8, threshold=0.6
    )
