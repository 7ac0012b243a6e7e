"""Parquet sink — the beyond-reference default for any pipeline whose
target does not need a legacy format. Columnar, splittable, and the only
sane interchange at 100 TB; partition columns come from the spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.spec import TargetSpec
from . import register


@register("parquet")
def write_parquet(df: DataFrame, spec: TargetSpec) -> None:
    writer = df.write.mode(spec.mode if spec.mode != "upsert" else "overwrite")
    partition_by = spec.options.get("partition_by")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if spec.options.get("bucket_by"):
        cols = spec.options["bucket_by"]
        n = int(spec.options.get("buckets", 32))
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
        writer.option("path", spec.uri).saveAsTable(spec.name)
        return
    writer.parquet(spec.uri)
