"""Full-stack migration e2e: CSV sources → run_pipeline → JDBC target
(DuckDB via the DB-API path) with DDL, upsert re-run, and FK ordering —
the shape of the reference's database use-case suite
(``src/it/scala/usecases/databases/*``)."""

from __future__ import annotations

import duckdb
import pytest

from tensei_agent_spark.plans import (
    ColumnRef,
    Field,
    Mapping,
    Pipeline,
    Recipe,
    SourceSpec,
    TargetSpec,
    run_pipeline,
)


@pytest.fixture
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _pipeline(src_path, con, mode):
    return Pipeline(
        "csv2db",
        sources=(
            SourceSpec(
                "people", "csv", src_path,
                (Field("id", "long"), Field("name"), Field("city")),
            ),
        ),
        targets=(
            TargetSpec(
                "persons", "jdbc", "jdbc:duckdb:mem",
                fields=(Field("id", "long", unique=True), Field("name"), Field("city")),
                options={"dbapi_connect": lambda: con.cursor(), "table": "persons"},
                mode=mode,
            ),
        ),
        recipes=(
            Recipe("load", "persons", mappings=(
                Mapping(
                    (ColumnRef("people", "id"), ColumnRef("people", "name"),
                     ColumnRef("people", "city")),
                    ("id", "name", "city"),
                ),
            )),
        ),
    )


def test_csv_to_jdbc_insert_then_upsert(spark, tmp_path, con):
    src = tmp_path / "people.csv"
    src.write_text("1,ada,london\n2,alan,cambridge\n")
    run_pipeline(spark, _pipeline(str(src), con, "overwrite"))
    assert con.execute("SELECT count(*) FROM persons").fetchone()[0] == 2

    # second batch: 2 updated, 3 new — the reference's Insert/Update path
    src2 = tmp_path / "people2.csv"
    src2.write_text("2,alan,manchester\n3,grace,washington\n")
    run_pipeline(spark, _pipeline(str(src2), con, "upsert"))
    rows = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute("SELECT id, name, city FROM persons ORDER BY id").fetchall()
    )
    assert rows == {
        1: ("ada", "london"),
        2: ("alan", "manchester"),
        3: ("grace", "washington"),
    }


def test_unique_filter_applies_before_jdbc_write(spark, tmp_path, con):
    """Duplicate unique-key rows in one batch are dropped pre-write
    (BaseWriterFilter), so the DB never sees a PK violation."""
    src = tmp_path / "dups.csv"
    src.write_text("1,ada,london\n1,ada2,paris\n2,alan,cambridge\n")
    run_pipeline(spark, _pipeline(str(src), con, "overwrite"))
    rows = con.execute("SELECT id, name FROM persons ORDER BY id").fetchall()
    assert [r[0] for r in rows] == [1, 2]
