"""Session-scoped tracking of persisted DataFrames.

Operators that persist() large intermediates (edge lists, shingle sets,
fingerprint tables) register the handle here instead of calling
``.persist()`` directly. A long-lived session sweeping many queries
(the driver's correctness run, ``bench.py``) would otherwise accumulate
cached blocks indefinitely; ``release_all()`` drops every tracked cache
and is invoked automatically each time a new registry query is built,
bounding live caches to at most one query's working set.

``unpersist()`` is an optimization-only operation in Spark — dropping a
cache never changes results, only forces recomputation — so releasing
between build and collect of a *previous* query is always safe.

**Build-then-collect contract**: the registry's sweep/bench access
pattern is build query → execute it → build the next. Interleaving
(build A, build B, then execute A) stays CORRECT but recomputes A's
persisted intermediates, because building B released A's caches. The
tracked list is also not thread-safe: concurrent builds in one session
should each hold their own handles (call ``persist()`` directly) rather
than share this module-global registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK) and register it for release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked DataFrame (idempotent, exception-safe)."""
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
        except Exception:
            pass
