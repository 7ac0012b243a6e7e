"""ORC sink — columnar alternative to parquet with the same writer
surface (mode, partition columns). Beyond-reference; see
``sources/columnar.py`` for why columnar formats are first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.spec import TargetSpec
from . import register


@register("orc")
def write_orc(df: DataFrame, spec: TargetSpec) -> None:
    writer = df.write.mode(spec.mode if spec.mode != "upsert" else "overwrite")
    partition_by = spec.options.get("partition_by")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(spec.uri)
