"""Every registered query must match its DuckDB oracle exactly.

This mirrors the driver's t2 gate: same row count, same column names,
same values after sorting rows (order-insensitive compare). We compare
at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import math

import pytest

from tensei_agent_spark.catalog import TABLES
from tensei_agent_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _duck_views(duck, sf_dir):
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _normalize(df):
    """pandas frame -> column-name-sorted, row-sorted, plain python."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, float) and math.isnan(v):
                v = None
            elif v is not None and type(v).__name__ == "Decimal":
                v = str(v)
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                v = str([float(x) if isinstance(x, float) else x for x in v])
            row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return list(df.columns), rows


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    _duck_views(duck, SF_DIR)

    got = q.build(spark, SF_DIR).toPandas()
    want = duck.execute(q.oracle).fetchdf()

    got_cols, got_rows = _normalize(got)
    want_cols, want_rows = _normalize(want)

    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: {len(got_rows)} rows != oracle {len(want_rows)}"
    )
    mismatches = [
        (i, g, w) for i, (g, w) in enumerate(zip(got_rows, want_rows)) if g != w
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.build(spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None
