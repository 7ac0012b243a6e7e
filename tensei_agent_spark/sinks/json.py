"""JSON sink with nested-structure rebuild (≙ writers/JsonFileWriterActor.scala).

The reference re-creates the nested JSON tree of the target DFASDL
(open/close markers + ``json-attribute-name``,
``JsonFileWriterActor.scala:313-618``). Spark-side the same result is a
projection: dotted target field names (``address.city``) are folded into
``struct()`` columns and written as JSON lines — the tree rebuild is a
pure expression, no driver work.

``single_file=true`` additionally wraps the lines into one JSON array
document (the reference writes one document per run).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.spec import TargetSpec
from . import register


def nest_columns(df: DataFrame, names: list[str]) -> DataFrame:
    """Fold dotted column names into nested structs.

    ``["id", "address.city", "address.zip"]`` →
    columns ``id``, ``address`` (struct<city,zip>). Input df must carry
    the dotted names as flat columns (the executor aliases them so).
    """
    tree: dict = {}
    for n in names:
        node = tree
        parts = n.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = n

    def build(node, prefix: str) -> Column:
        if isinstance(node, str):
            return F.col(f"`{node}`")
        fields = [build(child, f"{prefix}{k}.").alias(k) for k, child in node.items()]
        return F.struct(*fields)

    return df.select(*[build(child, f"{k}.").alias(k) if isinstance(child, dict)
                       else F.col(f"`{child}`").alias(k)
                       for k, child in tree.items()])


@register("json")
def write_json(df: DataFrame, spec: TargetSpec) -> None:
    names = [f.name for f in spec.fields] if spec.fields else df.columns
    out = nest_columns(df, names) if any("." in n for n in names) else df
    order_by = spec.options.get("order_by")
    single = str(spec.options.get("single_file", "")).lower() in ("1", "true", "yes")
    mode = spec.mode if spec.mode != "upsert" else "overwrite"
    if single:
        # See sinks/csv.py: local sort after coalesce(1), not a global
        # orderBy — avoids the range-sampling job re-executing upstream.
        out = out.coalesce(1)
        if order_by:
            out = out.sortWithinPartitions(*order_by)
        tmp = spec.uri + "._spark_tmp"
        out.write.mode(mode).json(tmp)
        part = glob.glob(os.path.join(tmp, "part-*"))[0]
        # one JSON array document, reference-style
        with open(part, encoding="utf-8") as fh:
            lines = [ln for ln in fh.read().splitlines() if ln]
        with open(spec.uri, "w", encoding="utf-8") as fh:
            fh.write("[" + ",".join(lines) + "]")
        shutil.rmtree(tmp)
    else:
        # Global orderBy for multi-file targets: range partitioning keeps the
        # concatenated part files globally sorted (the order_by contract);
        # see sinks/csv.py for why single_file uses a local sort instead.
        if order_by:
            out = out.orderBy(*order_by)
        out.write.mode(mode).json(spec.uri)
