"""Fast nested double-array literals.

Building a centroid/codebook literal as ``F.array(*[F.lit(x) …])``
constructs one Python Column object per scalar — measured ~1 s of
driver time for a 16×16×4 codebook, paid on EVERY plan build (each
Lloyd iteration, every query construction). Rendering the same value
as a SQL ``array(array(…))`` string and parsing it JVM-side is ~30×
faster and yields the identical literal (Java ``Double.parseDouble``
round-trips ``repr(float)`` exactly).

Used by the k-means / IVF / PQ / LSH operators wherever model
parameters (centroids, codebooks, hyperplanes) are embedded into
expressions as broadcast-by-literal constants.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def dlit(value) -> Column:
    """Nested list of floats → one array<…<double>> literal Column."""

    def render(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(render(x) for x in v) + ")"
        v = float(v)
        if not math.isfinite(v):
            raise ValueError(f"dlit: non-finite value {v}")
        return repr(v) + "D"

    return F.expr(render(value))


def md5_60bit(c):
    """First 15 md5 hex chars of a Column as a 60-bit non-negative
    BIGINT — the engine-portable hash (DuckDB twin:
    CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)). Shared so
    the expression and its oracle twin are documented once."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
