"""Data-bound bench leg at a derived ~sf1 (VERDICT r11 next-round #2).

The driver's parquet stops at sf0.1, where 23/29 bench queries measure
scheduler latency, not the engine (the r11 scaling block: c8/c32 ≈ 1).
This tool derives a 10x corpus from sf0.1 — the same consistent
key-shift scheme as tools/scale_smoke.py's relational phase — and runs
the HEAVY bench queries against it at 32 and at 8 cores, with
loadavg/steal stamps, so optimization signal exceeds box noise and the
parallel-scaling ratio becomes meaningful.

Faithfulness of the derivation (differs from scale_smoke's dedup legs
ON PURPOSE — this is a bench, not a stress test):

- ``documents``: copy i shifts doc_id and applies a per-copy character
  substitution (``translate`` over a rotated alphabet) to the text, so
  copies share almost no shingles and the corpus-wide duplicate RATE
  stays at the base corpus's level — a real sf1 crawl has ~10x the
  docs, not every doc cloned 10 ways. (scale_smoke's near-dup-dense
  derivation is the deliberate hard case for the verify stages; both
  exist, labeled.)
- ``embeddings``: vec_id shift + a tiny per-copy, per-position
  deterministic offset so copies are not exact vector clones (exact
  clones would turn every top-k into a 10-way tie, which no real
  corpus does).
- relational tables: the scale_smoke shift scheme (keys + i*10^9,
  shared nation/region) — referentially intact 10x star schema.
- ``linkage_agreement_patterns`` is EXCLUDED: its equality-blocked
  census is quadratic in block size by design (documented curve in
  SCALE.md / scale_smoke x1-x4); at 10x it would re-measure that known
  curve for ~100x the pairs and dominate the leg's wall clock without
  adding scaling signal.

Protocol: per core count, fresh local[N] session, one warm pass of
each query at sf0.1 (same plan shapes -> JIT warm), then best-of-2
timed ``count()`` at the derived dir with the bench's inter-query
hygiene. Derived data is rebuilt per invocation unless the marker
matches (same invalidation convention as scale_smoke).

Usage:  python tools/bench_sf1.py            # writes BENCH_LOCAL_r12_sf1.json
        BENCH_SF1_OUT=... python tools/bench_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tensei_agent_spark.cache import release_all  # noqa: E402
from tensei_agent_spark.catalog import load  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.1"
SCALE = 10
OUT = os.environ.get("BENCH_SF1_OUT", "BENCH_LOCAL_r12_sf1.json")
DERIVED = f"/tmp/bench_sf1/sf0.1x{SCALE}"

# Heavy bench set: the 6 most expensive clean-box entries that are
# data-bound at 10x (see module docstring for the linkage exclusion).
QUERIES = [
    "dedup_ngram_jaccard_fast",
    "dedup_minhash_lsh_fast",
    "dedup_simhash_pairs",
    "hybrid_search_rrf",
    "salted_join_revenue",
    "q18_large_volume_customer",
]

_SHIFT = 1_000_000_000
_KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}

_ALPHA = "etaoinshrdlu"


def _rot(s: str, i: int) -> str:
    i %= len(s)
    return s[i:] + s[:i]


def _derive(spark) -> str:
    config = repr((SCALE, _SHIFT, sorted(_KEY_COLS.items()), _ALPHA, SF_DIR))
    marker = os.path.join(DERIVED, "_done")
    if os.path.exists(marker) and open(marker).read() == config:
        return DERIVED
    os.makedirs(DERIVED, exist_ok=True)
    for name in ("region", "nation"):
        load(spark, SF_DIR, name).write.mode("overwrite").parquet(
            os.path.join(DERIVED, f"{name}.parquet")
        )
    for name, keys in _KEY_COLS.items():
        base = load(spark, SF_DIR, name)
        parts = []
        for i in range(SCALE):
            p = base
            for kcol in keys:
                p = p.withColumn(kcol, F.col(kcol) + F.lit(i * _SHIFT))
            parts.append(p)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.write.mode("overwrite").parquet(
            os.path.join(DERIVED, f"{name}.parquet")
        )
    docs = load(spark, SF_DIR, "documents")
    dparts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * _SHIFT)).alias("doc_id"),
            F.translate(F.col("text"), _ALPHA, _rot(_ALPHA, i)).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        for i in range(SCALE)
    ]
    d = dparts[0]
    for p in dparts[1:]:
        d = d.unionAll(p)
    d.write.mode("overwrite").parquet(os.path.join(DERIVED, "documents.parquet"))
    emb = load(spark, SF_DIR, "embeddings")
    eparts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * _SHIFT)).alias("vec_id"),
            F.expr(
                f"transform(embedding, (x, p) -> x + {i} * 1.0e-4 * "
                "cast(pmod(p, 7) - 3 as double))"
            ).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        for i in range(SCALE)
    ]
    e = eparts[0]
    for p in eparts[1:]:
        e = e.unionAll(p)
    e.write.mode("overwrite").parquet(os.path.join(DERIVED, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write(config)
    return DERIVED


def _bench_at(cpus: int, derived: str) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from tensei_agent_spark.session import get_spark

    spark = get_spark(f"bench-sf1-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    from tensei_agent_spark.queries import REGISTRY

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _cpu_ticks, _steal_pct

    for name in QUERIES:  # warm: same plan shapes at sf0.1
        try:
            REGISTRY[name].build(spark, WARM_DIR).count()
        except Exception as exc:
            print(f"warm {name} failed: {exc!r}", flush=True)
        release_all()
        spark.catalog.clearCache()
    load0 = round(os.getloadavg()[0], 2)
    ticks0 = _cpu_ticks()
    timings: dict[str, float] = {}
    for name in QUERIES:
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                REGISTRY[name].build(spark, derived).count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 2)
        except Exception as exc:
            print(f"{name} c{cpus} FAILED: {exc!r}", flush=True)
            timings[name] = -1.0
        release_all()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        print(f"c{cpus} {name}: {timings[name]}s", flush=True)
    steal, busy = _steal_pct(ticks0, _cpu_ticks())
    stamp = {
        "loadavg": [load0, round(os.getloadavg()[0], 2)],
        "cpu_steal_pct": steal,
        "cpu_busy_pct": busy,
    }
    spark.stop()
    return {"queries": timings, **stamp}


def main() -> None:
    cpus_orig = os.environ.get("SPARK_GRAFT_CPUS")
    os.environ["SPARK_GRAFT_CPUS"] = "32"
    from tensei_agent_spark.session import get_spark

    spark = get_spark("bench-sf1-derive")
    spark.sparkContext.setLogLevel("ERROR")
    derived = _derive(spark)
    spark.stop()
    c32 = _bench_at(32, derived)
    c8 = _bench_at(8, derived)
    ratios = {
        n: round(c8["queries"][n] / c32["queries"][n], 2)
        for n in QUERIES
        if c32["queries"].get(n, -1) > 0 and c8["queries"].get(n, -1) > 0
    }
    payload = {
        "metric": "sf1_heavy_queries_sec",
        "derived_dir": derived,
        "scale": SCALE,
        "protocol": "fresh local[N] session per core count; warm pass at sf0.1; best-of-2 count() at the derived dir; bench inter-query hygiene",
        "c32": c32,
        "c8": c8,
        "c8_over_c32": ratios,
        "cpu_steal_pct_unit": "busy-relative",
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    if cpus_orig is None:
        os.environ.pop("SPARK_GRAFT_CPUS", None)
    else:
        os.environ["SPARK_GRAFT_CPUS"] = cpus_orig


if __name__ == "__main__":
    main()
