"""Strict driver-sim correctness sweep (see .claude/skills/verify).

Runs every registered query at sf0.01 against its DuckDB oracle with
BIT-EXACT comparison (the driver value-hashes). Usage:

    python tools/verify_sweep.py [sf_dir] [name_filter ...] [--out FILE]

``--out`` writes a machine-readable verdict (per-query status + timing)
— the round snapshot commits it as ``CORRECTNESS_LOCAL_r<N>.json``.

Comparison rules (ordered, strictest applicable wins):
- both integer dtypes → exact int64 compare (a float64 cast would
  silently equate distinct values above 2^53, e.g. 64-bit hash ids);
- any float involved  → bit-exact float64 compare (equal_nan: NULLs
  surface as NaN);
- everything else     → exact string compare.
"""

import json
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as e  # noqa: E402
from tools.sweep_compare import compare_col, norm  # noqa: E402
from tensei_agent_spark.catalog import TABLES  # noqa: E402
from tensei_agent_spark.session import get_spark  # noqa: E402

args = sys.argv[1:]
OUT = None
if "--out" in args:
    i = args.index("--out")
    OUT = args[i + 1]
    args = args[:i] + args[i + 2:]
SF = args[0] if args else "/root/testdata/sf0.01"
ONLY = set(args[1:])

spark = get_spark()
con = duckdb.connect()
# Route DuckDB's larger-than-memory spill files OUT of the repo: the
# default is a ./.tmp under the cwd, and a heavy oracle at a big SF can
# write tens of GB there (observed 31 GB from an all-pairs oracle at
# sf0.1) — which then wedges `git add -A`.
con.execute("SET temp_directory='/tmp/duckdb_sweep_spill'")
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

qs, osql = e.queries(), e.oracle_sql()

results = {}
fails = []
t_all = time.time()
# Warm the JVM + parquet footers before timing: otherwise the first
# query's recorded seconds absorb session startup (~5 s) and read as a
# false outlier in the committed artifact.
spark.read.parquet(f"{SF}/region.parquet").count()
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        if name not in osql:
            n = fn(spark, SF).count()  # rows-only check
            results[name] = {
                "status": "rows_only", "rows": n,
                "sec": round(time.time() - t0, 2),
            }
            print(f"  {name}: rows_only n={n} ({time.time()-t0:.1f}s)", flush=True)
            continue
        g = norm(fn(spark, SF).toPandas())
        w = norm(con.execute(osql[name]).fetchdf())
        assert list(g.columns) == list(w.columns), (
            f"cols {list(g.columns)} vs {list(w.columns)}"
        )
        assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
        for c in g.columns:
            compare_col(name, c, g[c], w[c])
        results[name] = {
            "status": "ok", "rows": len(g), "sec": round(time.time() - t0, 2),
        }
        print(f"  {name}: OK n={len(g)} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as ex:
        fails.append(name)
        results[name] = {
            "status": "fail", "err": repr(ex)[:500],
            "sec": round(time.time() - t0, 2),
        }
        print(f"  {name}: FAIL {ex!r} ({time.time()-t0:.1f}s)", flush=True)
        traceback.print_exc()
    if OUT:
        # Incremental checkpoint after EVERY query: a sweep killed
        # mid-run (an oracle that turns out intractable at a big SF)
        # keeps everything already verified instead of losing the run.
        with open(OUT + ".partial", "w") as fh:
            json.dump(results, fh, indent=1)

summary = {
    "sf_dir": SF,
    "total": len(results),
    "ok": sum(1 for r in results.values() if r["status"] == "ok"),
    "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
    "fail": len(fails),
    "total_sec": round(time.time() - t_all, 1),
    "queries": results,
}
if OUT:
    with open(OUT, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=False)
    print(f"wrote {OUT}")

print(f"\n{len(results)} queries, {len(fails)} failed "
      f"in {time.time()-t_all:.0f}s: {fails}")
sys.exit(1 if fails else 0)
