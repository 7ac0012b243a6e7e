"""Strict driver-sim correctness sweep (see .claude/skills/verify).

Runs every registered query at sf0.01 against its DuckDB oracle with
BIT-EXACT comparison (the driver value-hashes). Usage:

    python tools/verify_sweep.py [sf_dir] [name_filter ...]
"""

import sys
import time
import traceback

import duckdb
import numpy as np

sys.path.insert(0, ".")
import __spark_entry__ as e  # noqa: E402
from tensei_agent_spark.catalog import TABLES  # noqa: E402
from tensei_agent_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

spark = get_spark()
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

qs, osql = e.queries(), e.oracle_sql()


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:  # array cols -> strings so sort/compare work
        if len(df) and isinstance(df[c].iloc[0], (np.ndarray, list)):
            df[c] = df[c].map(lambda v: str([float(x) for x in v]))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


fails = []
t_all = time.time()
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        if name not in osql:
            n = fn(spark, SF).count()  # rows-only check
            print(f"  {name}: rows_only n={n} ({time.time()-t0:.1f}s)", flush=True)
            continue
        g = norm(fn(spark, SF).toPandas())
        w = norm(con.execute(osql[name]).fetchdf())
        assert list(g.columns) == list(w.columns), (
            f"cols {list(g.columns)} vs {list(w.columns)}"
        )
        assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
        for c in g.columns:
            a, b = g[c], w[c]
            try:  # bit-exact; equal_nan because NULLs surface as NaN
                assert np.array_equal(
                    a.astype("float64").values,
                    b.astype("float64").values,
                    equal_nan=True,
                ), f"col {c} values differ"
            except (ValueError, TypeError):
                assert a.astype(str).equals(b.astype(str)), f"col {c} str differ"
        print(f"  {name}: OK n={len(g)} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as ex:
        fails.append(name)
        print(f"  {name}: FAIL {ex!r} ({time.time()-t0:.1f}s)", flush=True)
        traceback.print_exc()

print(f"\n{len(qs) if not ONLY else len(ONLY)} queries, {len(fails)} failed "
      f"in {time.time()-t_all:.0f}s: {fails}")
sys.exit(1 if fails else 0)
