"""Parallelism spreading for CPU-heavy map stages on few-split inputs.

Parquet splits by *bytes* (``spark.sql.files.maxPartitionBytes``), so a
small-byte but CPU-expensive input — 5 k documents in one 7 MB file,
each about to pay ~1300 xxhash64 shingles + OPH folds, or an
explode(hashed unigram+bigram features) — lands in ONE task and
serializes the heaviest stage of the pipeline (measured at sf0.1: the
shingle map ran 3.7 s single-task, twice, out of a 7.5 s total; the
classifier feature map showed the same single-task pathology at 4.5 s).

A cluster reading many files already exceeds the target and passes
through untouched; the repartition only fires on few-split inputs,
where shuffling the raw rows is by construction cheap (they fit in few
splits). Shared by the dedup family (operators/dedup.py), the quality
classifier (operators/classifier.py), and any other Arrow/codegen map
whose cost is CPU-per-row rather than bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_for_cpu_map"]


def spread_for_cpu_map(df: DataFrame) -> DataFrame:
    """Give a CPU-heavy per-row map stage at least ``defaultParallelism``
    partitions.

    Partition-count probe safety (ADVICE r8): with AQE enabled
    (session.py), touching ``df.rdd`` on a plan that contains exchanges
    materializes upstream query stages EAGERLY — real shuffle jobs at
    graph-build time, recomputed again by the later action. So the
    probe first renders the physical plan (with AQE this is the
    ``AdaptiveSparkPlan isFinalPlan=false`` INITIAL plan — a pure
    planning step, never runs a job; ``sparkPlan()`` would not do,
    it predates EnsureRequirements and holds no exchanges yet) and
    bails out untouched when an Exchange or Subquery is present: such a frame's partitioning was already set by
    its shuffle (``spark.sql.shuffle.partitions`` / AQE coalescing) and
    needs no spreading. Only on exchange-free (scan/map-rooted) plans —
    where ``.rdd`` is a pure conversion with no stages to materialize —
    does it read the split count and repartition if below target.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan or "Subquery" in plan:
            return df
        current = df.rdd.getNumPartitions()  # exchange-free: no job
    except Exception:
        return df
    return df.repartition(target) if current < target else df
