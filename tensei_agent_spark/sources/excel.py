"""Excel source (≙ helpers/ExcelToCSVConverter.scala).

The reference converts ``.xls/.xlsx`` to a temp CSV (separator ``~~~``)
with Apache POI before parsing (``ExcelToCSVConverter.scala:42-150``).
We follow the same stage-then-parse shape: convert the workbook to CSV
driver-side, then run the distributed CSV reader. The conversion backend
is ``openpyxl``/``pandas`` when available; neither is a baked-in
dependency here, so the converter is gated behind an import-try with the
Spark-side plumbing (spec → schema → reader) fully real.

Spec options: ``sheet`` (name or 0-based index, default first).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..plans.spec import SourceSpec
from . import register

# The reference's conversion separator, chosen to never collide with
# cell content (``ExcelToCSVConverter.scala`` / ``tensei.conf:78``).
SEPARATOR = "~~~"


def excel_to_csv(path: str, sheet: str | int = 0, out_dir: str | None = None) -> str:
    """Convert one workbook sheet to a SEPARATOR-delimited CSV file."""
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("excel conversion requires pandas") from e
    try:
        pdf = pd.read_excel(path, sheet_name=sheet, header=None, dtype=str)
    except ImportError as e:
        raise NotImplementedError(
            "excel conversion requires an engine (openpyxl for .xlsx, "
            "xlrd for legacy .xls); none is installed in this environment"
        ) from e
    d = out_dir or tempfile.mkdtemp(prefix="tensei_excel_")
    os.makedirs(d, exist_ok=True)
    dest = os.path.join(d, os.path.basename(path) + ".csv")
    pdf.to_csv(dest, sep="\x1f", index=False, header=False)
    # pandas refuses multi-char seps on write; post-process to SEPARATOR.
    with open(dest, encoding="utf-8") as fh:
        content = fh.read().replace("\x1f", SEPARATOR)
    with open(dest, "w", encoding="utf-8") as fh:
        fh.write(content)
    return dest


@register("excel")
def read_excel(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    opts = dict(spec.options)
    sheet = opts.pop("sheet", 0)
    staged = excel_to_csv(spec.uri, sheet=sheet)
    csv_spec = SourceSpec(
        name=spec.name,
        format="csv",
        uri=staged,
        fields=spec.fields,
        options={"sep": SEPARATOR, **opts},
    )
    from .csv import read_csv

    return read_csv(spark, csv_spec)
