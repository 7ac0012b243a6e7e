"""Strict driver-sim correctness sweep (see .claude/skills/verify).

Runs every registered query at sf0.01 against its DuckDB oracle with
BIT-EXACT comparison (the driver value-hashes). Usage:

    python tools/verify_sweep.py [sf_dir] [name_filter ...] [--out FILE]

``--out`` writes a machine-readable verdict (per-query status + timing)
— the round snapshot commits it as ``CORRECTNESS_LOCAL_r<N>.json``.

For supplementary big-SF sweeps (CORRECTNESS_SF01_r<N>.json), set
``SPARK_GRAFT_SKIP_INTRACTABLE_ORACLES=1`` to skip the three DuckDB
oracles that are intractable at sf0.1 (their Spark side still runs,
against PINNED row counts that fail on drift). The skip engages only
when the flag is set AND the SF dir has calibrated pins — an sf0.1
path name alone can never weaken the gate, and a stale exported flag
is ignored at sf0.01 where those oracles are tractable.

Comparison rules (ordered, strictest applicable wins):
- both integer dtypes → exact int64 compare (a float64 cast would
  silently equate distinct values above 2^53, e.g. 64-bit hash ids);
- any float involved  → bit-exact float64 compare (equal_nan: NULLs
  surface as NaN);
- everything else     → exact string compare.
"""

import json
import os
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

# Queries whose DuckDB ORACLE (not the Spark plan) is intractable at
# sf0.1: each one feeds a corpus-wide shingle self-join into a
# recursive/iterative transitive closure, which DuckDB executes as a
# repeated all-pairs materialization — observed >80 GB of spill before
# ENOSPC at 600-760 s each (r9; r5 hit the same wall). At sf0.1 the
# SPARK side still runs and its row count is PINNED (ADVICE r9: an
# unvalidated count let a regression pass unnoticed until the sf0.01
# sweep) — drift from the pinned count fails the sweep; each query is
# additionally bit-exact against its oracle at sf0.01 in
# CORRECTNESS_LOCAL_r<N>.json. The exclusion requires an explicit flag
# (SPARK_GRAFT_SKIP_INTRACTABLE_ORACLES=1) AND an SF dir the pins are
# calibrated for; unset the flag to debug against the real
# (intractable) oracle.
ORACLE_INTRACTABLE_PINS = {
    "sf0.1": {
        "dedup_components": 477,
        "dedup_keep_best": 4756,
        "leakage_safe_split": 5000,
    },
}
# The skip needs BOTH the explicit flag AND an SF dir the pins were
# calibrated for (code review r10: a flag left exported in the shell
# must not weaken the bit-exact sf0.01 gate, where these oracles are
# tractable — there the flag is simply ignored).
_sf_pins = ORACLE_INTRACTABLE_PINS.get(os.path.basename(SF.rstrip("/")), {})
_skip_intractable = (
    os.environ.get("SPARK_GRAFT_SKIP_INTRACTABLE_ORACLES", "") == "1"
    and bool(_sf_pins)
)

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
        if _skip_intractable and name in _sf_pins:
            n = fn(spark, SF).count()  # Spark side still must run
            want = _sf_pins[name]
            if n != want:
                raise AssertionError(
                    f"pinned sf0.1 row count drifted: {n} != {want}"
                )
            results[name] = {
                "status": "rows_only_oracle_intractable", "rows": n,
                "pinned_rows": want,
                "sec": round(time.time() - t0, 2),
            }
            print(
                f"  {name}: rows_only (oracle intractable; pinned "
                f"n={n} ok) ({time.time()-t0:.1f}s)", flush=True,
            )
            continue
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

# --- ANN recall quantification (VERDICT r9 #4): the ann_* family is
# rows-only by construction (approximate membership / FP tie order),
# so quantify each against the exact brute-force baseline inside the
# gate. Floors are the sf0.01 MEASURED values minus a hair —
# deterministic seeds make recall exactly reproducible, so any drop is
# a real regression, not noise. LSH's low floor is honest: the
# synthetic embeddings are isotropic (no cluster structure), the
# hyperplane-LSH worst case — its quality envelope under controlled
# structure is pinned in tests/test_ann_recall.py instead.
# Floors are per-SF (recall is data-dependent); at an uncalibrated SF
# the recall is still computed and RECORDED in the artifact, just not
# asserted — computation never silently narrows, only the floor does.
ANN_RECALL_FLOORS = {
    "sf0.01": {
        "ann_cosine_topk_fast": 0.99,  # double vs decimal: tie order only
        "ann_int8_topk": 0.99,         # measured 1.000
        "ann_ivf_topk": 0.85,          # measured 0.880 (4/8 cells probed)
        "ann_ivf_pq_topk": 0.85,       # measured 0.880 (r11: refine 5→20)
        "ann_pq_topk": 0.95,           # measured 1.000 (r11: refine=20; pure ADC was 0.540)
        "ann_lsh_topk": 0.65,          # measured 0.720 (r11 cost-ordered multi-probe, 4x6 +8)
    },
    "sf0.1": {
        "ann_cosine_topk_fast": 0.99,  # measured 1.000
        "ann_int8_topk": 0.90,         # measured 0.940
        "ann_ivf_topk": 0.90,          # measured 0.940
        "ann_ivf_pq_topk": 0.85,       # measured 0.920 (r11: refine 5→20)
        "ann_pq_topk": 0.90,           # measured 0.980 (r11: refine=20; pure ADC was 0.440)
        "ann_lsh_topk": 0.65,          # measured 0.700 (r11 cost-ordered multi-probe)
    },
}
ANN_RECALL_QUERIES = sorted(ANN_RECALL_FLOORS["sf0.01"])


def _topk_sets(df):
    out: dict = {}
    for r in df.select("query_id", "cand_id").collect():
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


_sf_floors = ANN_RECALL_FLOORS.get(os.path.basename(SF.rstrip("/")), {})
_recall_names = [
    n for n in ANN_RECALL_QUERIES
    if n in results and results[n]["status"] != "fail"
]
if _recall_names:
    from tensei_agent_spark.cache import release_all  # noqa: E402

    # Guarded like the main loop (code review r10): one transient
    # failure during the recall re-executions must not crash the
    # script after every query already verified — the --out summary
    # would never be written and the whole sweep would be lost.
    try:
        exact_sets = _topk_sets(qs["ann_cosine_topk"](spark, SF))
        release_all()
        _tot = sum(len(v) for v in exact_sets.values())
    except Exception as ex:
        exact_sets, _tot = {}, 0
        print(f"  recall baseline FAILED: {ex!r}"[:300], flush=True)
    for name in _recall_names:
        try:
            if _tot == 0:
                raise RuntimeError("empty/failed exact baseline")
            hits = sum(
                len(exact_sets[q] & s)
                for q, s in _topk_sets(qs[name](spark, SF)).items()
                if q in exact_sets
            )
            release_all()
            rec = round(hits / _tot, 4)
        except Exception as ex:
            fails.append(name)
            results[name]["status"] = "fail"
            results[name]["err"] = f"recall computation failed: {ex!r}"[:500]
            print(f"  {name}: RECALL ERROR {ex!r}"[:200], flush=True)
            continue
        results[name]["recall_at_10"] = rec
        floor = _sf_floors.get(name)
        if floor is None:
            print(f"  {name}: recall@10 {rec} (no floor at this SF)",
                  flush=True)
        elif rec < floor:
            fails.append(name)
            results[name]["status"] = "fail"
            results[name]["err"] = (
                f"recall@10 {rec} below pinned floor {floor}"
            )
            print(f"  {name}: RECALL FAIL {rec} < {floor}", flush=True)
        else:
            print(f"  {name}: recall@10 {rec} (floor {floor})", flush=True)

summary = {
    "sf_dir": SF,
    "total": len(results),
    "ok": sum(1 for r in results.values() if r["status"] == "ok"),
    "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
    "fail": len(fails),
    "total_sec": round(time.time() - t_all, 1),
    "queries": results,
}
excluded = sorted(
    n for n, r in results.items()
    if r["status"] == "rows_only_oracle_intractable"
)
if excluded:
    summary["excluded_intractable_oracle"] = excluded
    summary["note"] = (
        "each excluded query's DuckDB ORACLE (not the Spark plan) is a "
        "corpus-wide shingle self-join feeding a transitive closure — "
        ">80 GB DuckDB spill then ENOSPC at sf0.1 (r9); the Spark side "
        "ran, its row count matched the pinned expectation (fails on "
        "drift), and each is bit-exact at sf0.01 in "
        "CORRECTNESS_LOCAL_r<N>.json"
    )
if OUT:
    with open(OUT, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=False)
    print(f"wrote {OUT}")

print(f"\n{len(results)} queries, {len(fails)} failed "
      f"in {time.time()-t_all:.0f}s: {fails}")
sys.exit(1 if fails else 0)
