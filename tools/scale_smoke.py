"""Empirical scale-up smoke: measure key operators at 1x / 2x / 4x the
sf0.1 corpus and record how wall time grows.

The driver's parquet is fixed, so larger corpora are DERIVED: copy i
shifts ids by i*10_000_000 and appends ' v{i}' to the text, making
copies near-duplicates (J ~= 0.95 at k=8) rather than exact clones —
the realistic hard case for the dedup family (every base doc gains
S-1 true near-dup partners, so the verify stages carry a load that
grows with scale, unlike a trivially disjoint union).

This is a PERFORMANCE experiment only — correctness stays pinned by
the sf0.01 oracle sweep; derived data never feeds the oracle gate.

Run from the repo root (takes a few minutes):

    python tools/scale_smoke.py            # writes SCALE_SMOKE_r03.json

What the numbers evidence: near-linear growth for the hash-shuffle ops
(exact dedup, minhash signatures), and for candidate-based ops the
split between corpus-linear stages and output-bound verify stages.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from tensei_agent_spark.cache import release_all  # noqa: E402
from tensei_agent_spark.catalog import load  # noqa: E402
from tensei_agent_spark.operators import dedup as D  # noqa: E402
from tensei_agent_spark.operators import similarity as SIM  # noqa: E402
from tensei_agent_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = "SCALE_SMOKE_r03.json"


def scaled_docs(spark, s: int):
    base = load(spark, SF_DIR, "documents")
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" v{i}")).alias("text"),
        )
        for i in range(s)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def scaled_emb(spark, s: int):
    base = load(spark, SF_DIR, "embeddings")
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(s)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main() -> None:
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    for s in (1, 2, 4):
        docs = scaled_docs(spark, s)
        emb = scaled_emb(spark, s)
        n_docs = docs.count()
        ops = {
            "dedup_exact": lambda: D.exact_text_dups(
                docs, "text", "doc_id"
            ).count(),
            "minhash_lsh_fast": lambda: D.minhash_lsh_pairs(
                docs, "text", "doc_id",
                k=8, num_hashes=16, bands=4, hash_fn="xxhash64",
            ).count(),
            "ngram_jaccard_fast": lambda: D.ngram_jaccard_pairs(
                docs, "text", "doc_id", k=8, threshold=0.6, bit_screen=True
            ).count(),
            "simhash_fingerprints": lambda: D.simhash_fingerprints(
                docs, "text", "doc_id"
            ).count(),
            "ann_lsh_topk": lambda: SIM.lsh_bucket_topk(
                emb,
                emb.filter(F.col("vec_id") < 5),
                k=10, n_planes=6, n_tables=4,
            ).count(),
        }
        for name, run in ops.items():
            release_all()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                rows_out = run()
                sec = round(time.perf_counter() - t0, 2)
            except Exception as exc:  # record, keep going
                rows_out, sec = None, None
                print(f"{name} x{s} FAILED: {exc!r}", flush=True)
            results.setdefault(name, {})[f"x{s}"] = {
                "rows_in": n_docs,
                "rows_out": rows_out,
                "sec": sec,
            }
            print(f"{name} x{s}: {rows_out} rows in {sec}s", flush=True)

    with open(OUT, "w") as f:
        json.dump({"sf_dir": SF_DIR, "ops": results}, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
