"""A/B measurement for the saturated-certified df-rank drop.

The flat-corpus side of the calibration (keep 0.5 wins: 133.6 s vs
95.3 s on the forced-cap x8 corpus) is recorded in SCALE.md; this tool
measures the OTHER side — a corpus with a genuine rankable head, where
the certified drop replaces the half-corpus df groupBy with a small
sampled one at identical output.

Corpus (generated JVM-side, no files): 300k docs x ~450 chars
(~134 MB of text) = a 192-char boilerplate prefix from a 60-template
bank (every template df = 5000 — an unambiguous hot head band of
~11k shingles) + a 256-char unique sha2-hex tail (df-1 shingles, plus
~650k birthday-collision df-2 shingles that saturate the table), and
1000 exact clone pairs as the true near-dup signal.

Shrunk constants emulate the at-scale ratios on a bench-sized corpus:
table cap 8192 (< the 11k hot band, so the whole cap window is real
head), byte target 1 MiB (rung-1 frac ~0.005 — certifies immediately:
5000 * 0.005 = 25 >= 8). Config A forces the uncertified branch
(head-share threshold 2.0 -> keep 0.5); config B is the shipped
behavior (certify -> drop). Runs are interleaved A/B/A/B so machine
drift hits both arms; pair sets are asserted identical.

Usage:  python tools/sat_drop_bench.py [n_docs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import tensei_agent_spark.operators.dedup as dedup_mod  # noqa: E402
from tensei_agent_spark.cache import release_all  # noqa: E402


def make_corpus(spark: SparkSession, n_docs: int):
    """300k-doc head-heavy corpus, fully JVM-generated (sha2 chains)."""
    tail_key = F.when(F.col("id") < 2000, (F.col("id") / 2).cast("long")).otherwise(
        F.col("id") + 1_000_000
    )
    # Template derived from tail_key (not id) so clone partners share
    # the full document, making the within-pair jaccard exactly 1.0.
    boiler = F.concat(
        *[
            F.sha2(F.concat(F.lit(f"b{j}-"), (tail_key % 60).cast("string")), 256)
            for j in range(3)
        ]
    )
    tail = F.concat(
        *[
            F.sha2(F.concat(F.lit(f"t{i}-"), tail_key.cast("string")), 256)
            for i in range(4)
        ]
    )
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), F.concat(boiler, tail).alias("text"))
    )


def _fresh_session() -> SparkSession:
    """One SparkContext per measured run: a long-lived local context
    retains every prior run's shuffle files until the JVM's
    ContextCleaner happens to GC them — five ~10 GB runs filled an
    80 GB disk. Stopping the context removes its shuffle dirs
    immediately; the py4j JVM (and its JIT state) survives across
    sessions, so per-run startup is seconds, not a cold JVM."""
    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("sat-drop-bench")
        .getOrCreate()
    )


def run_once(n_docs: int, size_hint: int) -> tuple[float, frozenset, dict]:
    spark = _fresh_session()
    spark.sparkContext.setLogLevel("ERROR")
    docs = make_corpus(spark, n_docs)
    stats: dict = {}
    t0 = time.time()
    # Production-shaped: the fast registry query passes the same cap.
    # Required here: the 60-template boiler band (~11k shingles at
    # df 5000) overflows the forced 8192-entry table — without the cap
    # (hence without the exact prefix fan-out valve) the ~2.9k
    # off-table hot shingles read df 0, land in every holder's
    # prefix, and the candidate join detonates (~3.6e10 rows, 80 GB
    # of spill — the failure that motivated the valve).
    pairs = dedup_mod.ngram_jaccard_pairs(
        docs, k=8, threshold=0.8, df_rank="sampled",
        max_shingle_df=2000, size_hint_bytes=size_hint, stats=stats,
    )
    rows = pairs.select("id_a", "id_b").collect()
    dt = time.time() - t0
    release_all()
    spark.stop()
    return dt, frozenset((r["id_a"], r["id_b"]) for r in rows), stats


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    size_hint = n_docs * 448  # exact text bytes
    old = (
        dedup_mod._DF_SAT_PROBE_BYTES,
        dedup_mod._DF_SAT_TARGET_BYTES,
        dedup_mod._DF_TABLE_CAP,
        dedup_mod._DF_SAT_HEAD_SHARE,
    )
    dedup_mod._DF_SAT_PROBE_BYTES = 1
    dedup_mod._DF_SAT_TARGET_BYTES = 1 << 20
    dedup_mod._DF_TABLE_CAP = 8192
    results: dict[str, list[float]] = {"keep05": [], "drop": []}
    pair_sets: dict[str, frozenset] = {}
    try:
        print(f"n_docs={n_docs} size_hint={size_hint/1e6:.0f} MB "
              f"loadavg={os.getloadavg()}", flush=True)
        # warm-up (JIT, codegen caches) — quarter-size, not recorded
        run_once(max(n_docs // 4, 20_000), size_hint // 4)
        for rep in range(2):
            for label, share in (("keep05", 2.0), ("drop", 0.3)):
                dedup_mod._DF_SAT_HEAD_SHARE = share
                dt, pairs, stats = run_once(n_docs, size_hint)
                results[label].append(dt)
                prev = pair_sets.setdefault(label, pairs)
                assert prev == pairs, "pair set drifted between reps"
                print(
                    f"rep{rep} {label}: {dt:.1f}s frac={stats['df_frac']:.4g} "
                    f"rounds={stats.get('df_probe_rounds')} "
                    f"head_share={stats.get('df_head_share'):.3f} "
                    f"pairs={len(pairs)}",
                    flush=True,
                )
        assert pair_sets["keep05"] == pair_sets["drop"], "A/B pair sets differ"
        print(
            f"RESULT keep05={min(results['keep05']):.1f}s "
            f"drop={min(results['drop']):.1f}s "
            f"pairs={len(pair_sets['drop'])} identical=True "
            f"loadavg={os.getloadavg()}",
            flush=True,
        )
        # Machine-readable last line (r12): tools/scale_smoke.py runs
        # this A/B as its forced-saturation leg and parses this line
        # into the committed smoke artifact.
        import json

        print(json.dumps({
            "keep05_sec": round(min(results["keep05"]), 1),
            "drop_sec": round(min(results["drop"]), 1),
            "pairs": len(pair_sets["drop"]),
            "identical": True,
            "n_docs": n_docs,
            "reps": 2,
        }), flush=True)
    finally:
        (
            dedup_mod._DF_SAT_PROBE_BYTES,
            dedup_mod._DF_SAT_TARGET_BYTES,
            dedup_mod._DF_TABLE_CAP,
            dedup_mod._DF_SAT_HEAD_SHARE,
        ) = old


if __name__ == "__main__":
    main()
