"""LIVE executor-side JDBC round trips against Apache Derby embedded.

Spark ships ``derby-10.16.1.1.jar`` in its own jars directory, so the
real ``df.write.format("jdbc")`` / ``spark.read.jdbc`` path — the one
no test had ever executed before round 3 — runs here end-to-end:

- distributed append + read-back (``sinks/jdbc.py::write_jdbc``,
  ``sources/jdbc.py::read_jdbc``),
- overwrite semantics,
- staging-table + one set-wise MERGE upsert (the reference's per-row
  Insert/Update decision of ``DatabaseWriterActor.scala:269-348``,
  set-wise),
- generated-key harvest from a Derby identity column
  (≙ getGeneratedKeys + AutoIncrementValueBuffer,
  ``DatabaseWriterActor.scala:555-710``),
- a multi-partition parallel write (each partition opens its own
  embedded connection inside the shared JVM).

Derby is one of the reference's own integration dialects
(``src/it/scala/databases/derby``).

NOTE on identifier case: Derby uppercases unquoted identifiers and
Spark's JDBC writer passes ``dbtable`` unquoted, while our DDL quotes
it — so tests use UPPERCASE table names to make both spellings resolve
to the same table. Column names stay lowercase: Spark quotes those.
"""

from __future__ import annotations

import pytest

from tensei_agent_spark.plans.spec import Field, SourceSpec, TargetSpec
from tensei_agent_spark.sinks import write_target
from tensei_agent_spark.sinks.jdbc import DIALECTS, jvm_execute, jvm_query
from tensei_agent_spark.sources import read_source
from tensei_agent_spark.sources.jdbc import read_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby")
    # Keep derby.log inside the tmp dir, not the repo.
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    return f"jdbc:derby:{home}/testdb;create=true"


def _spec(url, table, mode, fields=(), **opts):
    return TargetSpec(
        table, "jdbc", url, mode=mode, fields=tuple(fields),
        options={"driver": DRIVER, **opts},
    )


def test_append_roundtrip_and_pk(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 7.25)],
        "id long, name string, bal double",
    )
    fields = (
        Field("id", "long", unique=True, nullable=False),
        Field("name", max_length=64),
        Field("bal", "double"),
    )
    write_target(df, _spec(derby_url, "LIVE_ACCOUNTS", "append", fields))

    back = read_source(
        spark,
        SourceSpec(
            "LIVE_ACCOUNTS", "jdbc", derby_url,
            options={"driver": DRIVER, "table": "LIVE_ACCOUNTS"},
        ),
    )
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "alice", 10.5), (2, "bob", 20.0), (3, "carol", 7.25),
    ]
    # Our DDL (not Spark's generic mapping) created the table: PK present.
    with pytest.raises(Exception, match="(?i)duplicate|constraint"):
        jvm_execute(
            spark, derby_url,
            ["INSERT INTO \"LIVE_ACCOUNTS\" (\"id\", \"name\", \"bal\") "
             "VALUES (1, 'dup', 0.0)"],
            DRIVER,
        )


def test_read_jdbc_filter_limit_pushdown(spark, derby_url):
    back = read_source(
        spark,
        SourceSpec(
            "LIVE_ACCOUNTS", "jdbc", derby_url,
            fields=(Field("id", "long"), Field("bal", "double")),
            options={
                "driver": DRIVER, "table": "LIVE_ACCOUNTS",
                "filter": "bal > 8.0", "limit": 10,
            },
        ),
    )
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == [(1, 10.5), (2, 20.0)]
    assert back.columns == ["id", "bal"]  # column pruning reached the DB


def test_overwrite_replaces(spark, derby_url):
    df = spark.createDataFrame([(9, "zoe", 1.0)], "id long, name string, bal double")
    fields = (Field("id", "long", unique=True), Field("name", max_length=64))
    write_target(df, _spec(derby_url, "LIVE_OVW", "append", fields))
    df2 = spark.createDataFrame([(10, "yan", 2.0)], "id long, name string, bal double")
    write_target(df2, _spec(derby_url, "LIVE_OVW", "overwrite", fields))
    rows = jvm_query(spark, derby_url, 'SELECT "id" FROM "LIVE_OVW"', DRIVER)
    assert [int(r[0]) for r in rows] == [10]


def test_upsert_staging_merge(spark, derby_url):
    """Distributed staging insert + ONE Derby MERGE: updates matched
    rows, inserts new ones — set-wise Insert/Update decision."""
    fields = (
        Field("id", "long", unique=True, nullable=False),
        Field("name", max_length=64),
        Field("bal", "double"),
    )
    initial = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "id long, name string, bal double"
    )
    write_target(initial, _spec(derby_url, "LIVE_UPS", "append", fields))
    delta = spark.createDataFrame(
        [(2, "bob2", 25.0), (3, "carol", 30.0)], "id long, name string, bal double"
    )
    write_target(delta, _spec(derby_url, "LIVE_UPS", "upsert", fields))

    rows = jvm_query(
        spark, derby_url,
        'SELECT "id", "name", "bal" FROM "LIVE_UPS" ORDER BY "id"', DRIVER,
    )
    assert [(int(i), str(n), float(b)) for i, n, b in rows] == [
        (1, "alice", 10.0), (2, "bob2", 25.0), (3, "carol", 30.0),
    ]
    # Staging table was dropped after the merge.
    with pytest.raises(Exception, match="(?i)does not exist|42X05"):
        jvm_query(spark, derby_url, 'SELECT 1 FROM "LIVE_UPS__stage"', DRIVER)


def test_generated_key_harvest(spark, derby_url):
    """Identity PK auto-fills on insert; read back (natural→generated)
    for the executor's FK remap join (AutoIncrementValueBuffer parity)."""
    jvm_execute(
        spark, derby_url,
        ['CREATE TABLE "LIVE_PEOPLE" ('
         '"pk" BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, '
         '"legacy_id" BIGINT, "name" VARCHAR(64))'],
        DRIVER,
    )
    df = spark.createDataFrame([(7, "ada"), (9, "alan")], "legacy_id long, name string")
    write_target(df, _spec(derby_url, "LIVE_PEOPLE", "append"))

    km = dict(
        (int(a), int(b))
        for a, b in jvm_query(
            spark, derby_url,
            'SELECT "legacy_id", "pk" FROM "LIVE_PEOPLE"', DRIVER,
        )
    )
    assert set(km) == {7, 9} and len(set(km.values())) == 2

    # And the Spark JDBC reader sees the generated keys too.
    back = read_table(spark, derby_url, "LIVE_PEOPLE", driver=DRIVER)
    assert {r["legacy_id"]: r["pk"] for r in back.collect()} == km


def test_parallel_partitioned_write(spark, derby_url):
    """8 partitions → 8 concurrent embedded connections in the shared
    JVM; row count and sum survive intact."""
    df = (
        spark.range(0, 5000)
        .selectExpr("id", "cast(id % 97 as double) w")
        .repartition(8)
    )
    write_target(
        df,
        _spec(
            derby_url, "LIVE_BULK", "append",
            (Field("id", "long", unique=True, nullable=False),),
            batchsize=500,
        ),
    )
    [(n, s)] = jvm_query(
        spark, derby_url, 'SELECT COUNT(*), SUM("id") FROM "LIVE_BULK"', DRIVER
    )
    assert int(n) == 5000 and int(s) == 5000 * 4999 // 2

    # Partitioned parallel read-back: 4 range-striped scans.
    back = read_source(
        spark,
        SourceSpec(
            "LIVE_BULK", "jdbc", derby_url,
            options={
                "driver": DRIVER, "table": "LIVE_BULK",
                "partitionColumn": "id", "lowerBound": 0,
                "upperBound": 5000, "numPartitions": 4,
            },
        ),
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 5000


def test_schema_extraction_from_metadata(spark, derby_url):
    """DatabaseSchemaExtractor parity over java.sql.DatabaseMetaData:
    columns + types + widths, PK → unique, identity → auto_increment,
    imported keys → the foreign_keys mapping."""
    from tensei_agent_spark.infer import infer_jdbc, list_tables_jdbc

    jvm_execute(
        spark, derby_url,
        ['CREATE TABLE "META_PARENT" ('
         '"pid" BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, '
         '"code" CHAR(3) NOT NULL, "label" VARCHAR(40), '
         '"price" DECIMAL(12,2), "created" TIMESTAMP)',
         'CREATE TABLE "META_CHILD" ('
         '"cid" BIGINT PRIMARY KEY, '
         '"parent_id" BIGINT REFERENCES "META_PARENT" ("pid"), '
         '"note" VARCHAR(100))'],
        DRIVER,
    )
    tables = list_tables_jdbc(spark, derby_url, DRIVER)
    assert {"META_PARENT", "META_CHILD"} <= set(tables)

    fields, fks = infer_jdbc(spark, derby_url, "META_PARENT", DRIVER)
    by = {f.name: f for f in fields}
    assert by["pid"].type == "long" and by["pid"].unique and by["pid"].auto_increment
    assert not by["pid"].nullable
    assert by["code"].type == "string" and by["code"].length == 3
    assert not by["code"].nullable and not by["code"].unique
    assert by["label"].max_length == 40 and by["label"].nullable
    assert by["price"].type == "decimal(12,2)"
    assert by["created"].type == "timestamp"
    assert fks == {}

    cfields, cfks = infer_jdbc(spark, derby_url, "META_CHILD", DRIVER)
    cby = {f.name: f for f in cfields}
    assert cby["cid"].unique and not cby["cid"].auto_increment
    assert cfks == {"parent_id": ("META_PARENT", "pid")}


def test_copy_between_databases_pipeline(spark, derby_url):
    """usecases/databases/CopyBetweenDatabases.scala, live: a full
    Pipeline whose SOURCE and TARGET are both JDBC tables — read via
    the jdbc source, recipe transformer applied, written to a second
    table through the jdbc sink; result read back and asserted."""
    from tensei_agent_spark.plans import (
        ColumnRef, Mapping, Pipeline, Recipe, run_pipeline,
    )

    src_df = spark.createDataFrame(
        [(1, "ada", "lovelace"), (2, "alan", "turing")],
        "id long, first string, last string",
    )
    write_target(
        src_df,
        _spec(
            derby_url, "LIVE_SRC_PEOPLE", "append",
            (Field("id", "long", unique=True, nullable=False),
             Field("first", max_length=32), Field("last", max_length=32)),
        ),
    )
    p = Pipeline(
        name="db-to-db",
        sources=(
            SourceSpec(
                "people", "jdbc", derby_url,
                options={"driver": DRIVER, "table": "LIVE_SRC_PEOPLE"},
            ),
        ),
        targets=(
            TargetSpec(
                "LIVE_DST_PEOPLE", "jdbc", derby_url,
                fields=(
                    Field("id", "long", unique=True, nullable=False),
                    Field("full_name", max_length=80),
                ),
                mode="append",
                options={"driver": DRIVER},
            ),
        ),
        recipes=(
            Recipe(
                "copy", "LIVE_DST_PEOPLE",
                mappings=(
                    Mapping((ColumnRef("people", "id"),), ("id",)),
                    Mapping(
                        (ColumnRef("people", "first"), ColumnRef("people", "last")),
                        ("full_name",),
                        mode="all_to_all",
                        transformers=(("concat", {"separator": " "}),),
                    ),
                ),
            ),
        ),
    )
    run_pipeline(spark, p)
    rows = jvm_query(
        spark, derby_url,
        'SELECT "id", "full_name" FROM "LIVE_DST_PEOPLE" ORDER BY "id"',
        DRIVER,
    )
    assert [(int(r[0]), r[1]) for r in rows] == [
        (1, "ada lovelace"), (2, "alan turing"),
    ]


def test_overwrite_drop_failure_propagates(spark, derby_url):
    """A DROP TABLE that fails for a reason OTHER than nonexistence
    (here: a dependent view) must propagate — swallowing it would turn
    overwrite into a silent append onto stale rows."""
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    fields = (Field("id", "long", unique=True), Field("name", max_length=32))
    write_target(df, _spec(derby_url, "LIVE_VIEWED", "append", fields))
    jvm_execute(
        spark, derby_url,
        ['CREATE VIEW "LIVE_VIEWED_V" AS SELECT "id" FROM "LIVE_VIEWED"'],
        DRIVER,
    )
    try:
        with pytest.raises(Exception, match="(?i)view|depend|X0Y23"):
            write_target(
                spark.createDataFrame([(2, "b")], "id long, name string"),
                _spec(derby_url, "LIVE_VIEWED", "overwrite", fields),
            )
        # the table kept its original content — no silent append
        rows = jvm_query(
            spark, derby_url, 'SELECT "id" FROM "LIVE_VIEWED"', DRIVER
        )
        assert [int(r[0]) for r in rows] == [1]
    finally:
        jvm_execute(spark, derby_url, ['DROP VIEW "LIVE_VIEWED_V"'], DRIVER)
