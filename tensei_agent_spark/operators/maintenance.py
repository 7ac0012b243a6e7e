"""Table maintenance for file-backed datasets.

The 100 TB operational reality the reference never faced (it wrote one
file per target): incremental pipelines accrete many small parquet
files, and scan throughput collapses when file count >> core count
(driver-side listing, per-file open cost, tiny row groups). Compaction
rewrites a directory into size-targeted files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files.

    Sizes the output file count from the CURRENT on-disk bytes (the
    compressed truth — row counts mislead under compression), rewrites
    to a sibling temp dir, then atomically swaps via rename so readers
    never observe a half-written directory. Returns the new file count.

    On object stores rename is not atomic — there, compact into a new
    prefix and flip a manifest/catalog pointer instead; the sizing and
    rewrite logic is identical.
    """
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, round(total / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
