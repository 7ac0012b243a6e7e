"""JSON source (≙ parsers/JsonFileParser.scala).

The reference walks a JSON document with a cursor, mapping DFASDL
``elem`` trees to objects and sequences to arrays
(``JsonFileParser.scala:179-345``). Spark: ``spark.read.json`` gives the
tree; an optional ``explode`` path flattens one array-of-records
sequence to rows (the reference's sequence-drives-rows semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.spec import SourceSpec
from . import register, to_struct_type


@register("json")
def read_json(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    opts = {
        # whole-document JSON (reference parses one doc), not JSON-lines,
        # unless the spec says otherwise.
        "multiLine": "true",
        **{k: str(v) for k, v in spec.options.items()},
    }
    explode_path = opts.pop("explodePath", None)
    reader = spark.read.options(**opts)
    if spec.fields is not None and explode_path is None:
        reader = reader.schema(to_struct_type(spec.fields))
    df = reader.json(spec.uri)
    if explode_path:
        # sequence ≙ JSON array: explode the array of records to rows,
        # then flatten the record struct to columns. An array of
        # SCALARS (FileParsers/JSON example's house.size) yields one
        # single-column row per element instead.
        from pyspark.sql.types import StructType

        df = df.select(F.explode(F.col(explode_path)).alias("_row"))
        if isinstance(df.schema["_row"].dataType, StructType):
            df = df.select("_row.*")
            if spec.fields is not None:
                df = df.select(
                    *[F.col(f.name).cast(f.type).alias(f.name) for f in spec.fields]
                )
        else:
            name = spec.fields[0].name if spec.fields else "value"
            typ = spec.fields[0].type if spec.fields else "string"
            df = df.select(F.col("_row").cast(typ).alias(name))
    return df
