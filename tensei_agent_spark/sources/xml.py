"""XML source (≙ parsers/XmlFileParser.scala).

The reference stream-parses XML mapping DFASDL ids to element/attribute
names via ``xml-element-name`` / ``xml-attribute-name``
(``XmlFileParser.scala:397-403``). Spark 4 ships a native XML data
source (SPARK-44265): ``rowTag`` selects the sequence element, columns
map by element name, attributes surface as ``_attr`` columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.spec import SourceSpec
from . import register


@register("xml")
def read_xml(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    opts = {
        "rowTag": "row",
        "attributePrefix": "_",
        **{k: str(v) for k, v in spec.options.items()},
    }
    df = spark.read.format("xml").options(**opts).load(spec.uri)
    if spec.fields is not None:
        # name-mapped projection + typed cast (attribute refs use the
        # option's attributePrefix, e.g. field name "_id").
        df = df.select(
            *[F.col(f.name).cast(f.type).alias(f.name.lstrip("_")) for f in spec.fields]
        )
    return df
