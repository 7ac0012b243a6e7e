"""Training-shard export: the corpus as N reproducibly-shuffled,
independently-streamable shard files.

The glue between :func:`~..operators.sampling.shuffle_shards` and a
data loader: every shard is ONE file (gzip JSONL or parquet) whose
internal row order is the shard's deterministic shuffle order, so an
epoch is "stream shards round-robin" with zero loader-side sorting, and
re-running the export bit-reproduces the same shards (epoch reshuffle =
new salt).

Scale shape: shard assignment is a pure map; the per-shard order
arrives via the range-partitioned global rank inside shuffle_shards;
the write is ``repartition(n_shards, shard)`` +
``sortWithinPartitions(pos)`` — one hash exchange, each output task
streams one shard to one file. No driver materialization at any size.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import shuffle_shards


def write_training_shards(
    df: DataFrame,
    key: str,
    path: str,
    n_shards: int,
    salt: str = "",
    fmt: str = "json",
    compression: str | None = "gzip",
) -> dict[int, list[str]]:
    """Export ``df`` as ``n_shards`` shard files under ``path``.

    Returns {shard id: file paths} with an entry for EVERY shard id in
    [0, n_shards) — an empty list marks a shard no row hashed into
    (possible for tiny/skewed corpora; ``partitionBy`` writes no
    directory for it). A positional list would silently shift loader
    indices across the gap. ``fmt``: "json" (JSONL, loader-friendly)
    or "parquet". The pos column is kept in the output — loaders use
    it to verify resume offsets; the shard id is the directory name.
    """
    if fmt not in ("json", "parquet"):
        raise ValueError(f"fmt must be json or parquet, got {fmt!r}")
    sharded = shuffle_shards(df, key, n_shards, salt=salt)
    writer = (
        # repartition BY SHARD VALUE into exactly n_shards tasks, each
        # sorted by pos: one file per shard, internally in epoch order
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    getattr(writer, fmt)(path)
    out: dict[int, list[str]] = {i: [] for i in range(n_shards)}
    for shard_dir in glob.glob(os.path.join(path, "shard=*")):
        shard_id = int(shard_dir.rsplit("=", 1)[1])
        out[shard_id] = sorted(
            p
            for p in glob.glob(os.path.join(shard_dir, "part-*"))
            if not p.endswith(".crc")
        )
    return out
