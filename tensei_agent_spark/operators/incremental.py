"""Incremental corpus processing: a parquet-backed ledger of processed
ids, so a recurring pipeline run touches only documents it has never
seen.

This extends the reference's within-run unique-value dedup
(`/root/reference/src/main/scala/com/wegtam/tensei/agent/writers/
BaseWriterFilter.scala:82-143`, which drops rows whose unique column was
already written *in this run*) across runs: the ledger IS the persisted
UniqueValueBuffer.

Scale notes: the ledger holds only the id column (narrow parquet,
splittable); membership is a left_anti equi-join — hash shuffle on the
id, broadcast when the increment is small, never a driver-side set.
Commit appends a new parquet file per run (object-store friendly:
append = add file, no rewrite); compaction is a periodic
``repartition`` rewrite. For exactly-once semantics pair `commit` with
the idempotent JDBC upsert sink — replays re-add the same ids and the
anti-join keeps the pipeline idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


class ParquetLedger:
    """Cross-run processed-id ledger at a parquet path."""

    def __init__(self, spark: SparkSession, path: str, id_col: str = "doc_id"):
        self.spark = spark
        self.path = path
        self.id_col = id_col

    def seen(self) -> DataFrame:
        """All ids processed by any prior run (empty frame if none)."""
        if not os.path.exists(self.path):
            return self.spark.createDataFrame(
                [], StructType([StructField(self.id_col, LongType())])
            )
        return self.spark.read.parquet(self.path).select(self.id_col).distinct()

    def filter_new(self, df: DataFrame) -> DataFrame:
        """Rows of ``df`` whose id has never been committed."""
        return df.join(self.seen(), self.id_col, "left_anti")

    def commit(self, df: DataFrame) -> None:
        """Record ids as processed (append-only; idempotent with
        ``filter_new`` because duplicates in the ledger are harmless —
        ``seen`` reads distinct)."""
        df.select(self.id_col).write.mode("append").parquet(self.path)


class MinHashIndex:
    """Persisted banded MinHash-LSH index for INCREMENTAL near-dup
    detection — the daily-crawl pattern: signatures of everything seen
    so far live as a narrow parquet table of (id, band, band_key); a
    new batch is banded once, joined against the stored bands
    (new × old) and self-bucketed (new × new), then appended. The
    historical corpus text is never re-scanned, its signatures never
    recomputed — per increment the cost is O(|batch|) + one equi-join
    against the index.

    Determinism contract: band keys are a pure function of the text
    (md5 base hash path), so incremental results are bit-identical to
    running :func:`~.dedup.minhash_lsh_pairs` over the full corpus and
    keeping the pairs that touch the new batch — asserted in
    tests/test_incremental.py.

    At 100 TB the index is ~|corpus| × bands rows of (long, int,
    32-char key) — partition the parquet by ``band`` so the new×old
    join prunes to matching band partitions and shuffles only band-key
    hashes.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        k: int = 8,
        num_hashes: int = 16,
        bands: int = 4,
        hash_fn: str = "md5",
    ):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.hash_fn = hash_fn

    def _params(self) -> dict:
        return {
            "id_col": self.id_col,
            "k": self.k,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "hash_fn": self.hash_fn,
        }

    def _meta_path(self) -> str:
        # SIBLING prefix (…/idx_params next to …/idx), so the band scan
        # of self.path never sees it and it works on any filesystem
        return self.path.rstrip("/") + "_params"

    def _read_params(self) -> dict | None:
        """Stored fingerprint, or None before the first commit. Probed
        through Spark's reader — like stored_bands, NOT the local
        filesystem, so the guard also fires on object-store URIs."""
        from pyspark.errors import AnalysisException

        try:
            row = self.spark.read.parquet(self._meta_path()).first()
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            return None
        return {k: row[k] for k in self._params()}

    def _check_params(self) -> None:
        """Band keys are only comparable under IDENTICAL signature
        parameters; an index opened with different (k, num_hashes,
        bands, hash_fn) would join incompatible digests and silently
        return garbage matches. The parameters are fingerprinted next
        to the data on first commit and validated on every use."""
        stored = self._read_params()
        if stored is not None and stored != self._params():
            raise ValueError(
                f"MinHashIndex at {self.path} was built with "
                f"{stored}; refusing to mix with {self._params()}"
            )

    def _write_params(self) -> None:
        if self._read_params() is None:
            self.spark.createDataFrame([self._params()]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(self._meta_path())

    def stored_bands(self, like: DataFrame | None = None) -> DataFrame:
        """The persisted index, or an empty frame before the first
        commit. Existence is probed through Spark's reader — NOT
        ``os.path.exists``, which is always False for object-store URIs
        and would silently drop every new-vs-old match. ``like``
        (a band frame, e.g. the new batch's) supplies the id column
        type for the empty frame so non-long doc ids work from the
        very first increment."""
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(self.path)
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            from pyspark.sql.types import IntegerType, StringType

            id_type = (
                like.schema[self.id_col].dataType
                if like is not None
                else LongType()
            )
            return self.spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField(self.id_col, id_type),
                        StructField("band", IntegerType()),
                        StructField("band_key", StringType()),
                    ]
                ),
            )

    def _band_signatures(self, docs: DataFrame, text_col: str) -> DataFrame:
        from .dedup import band_signatures

        return band_signatures(
            docs,
            text_col=text_col,
            id_col=self.id_col,
            k=self.k,
            num_hashes=self.num_hashes,
            bands=self.bands,
            hash_fn=self.hash_fn,
        )

    def match_new(
        self, new_docs: DataFrame, text_col: str = "text"
    ) -> tuple[DataFrame, DataFrame]:
        """(pairs, new_bands): near-dup candidate pairs touching the new
        batch, and the batch's band rows (localCheckpoint-ed — commit
        appends to the index path, which would otherwise invalidate the
        plan that produced them, exactly the hazard documented on
        :func:`process_increment`).

        ``pairs`` = new×old (equi-join on (band, band_key) against the
        stored index) ∪ new×new (in-bucket combinations), distinct,
        id_a < id_b.
        """
        from .dedup import bucket_pairs

        self._check_params()
        new_bands = self._band_signatures(new_docs, text_col).localCheckpoint(
            eager=True
        )
        old = self.stored_bands(like=new_bands)
        vs_old = (
            new_bands.join(
                old.withColumnRenamed(self.id_col, "_old_id"),
                ["band", "band_key"],
            )
            .filter(F.col(self.id_col) != F.col("_old_id"))
            .select(
                F.least(self.id_col, "_old_id").alias("id_a"),
                F.greatest(self.id_col, "_old_id").alias("id_b"),
            )
        )
        in_bucket = bucket_pairs(new_bands, self.id_col)
        return vs_old.union(in_bucket).distinct(), new_bands

    def commit(self, new_bands: DataFrame) -> None:
        """Append the batch's band rows to the index (append-only =
        add-file on object stores; band-partitioned for join pruning).
        The parameter fingerprint lands AFTER the data (an underscore-
        prefixed sidecar, invisible to the parquet reader) so a fresh
        path never looks like an empty-but-parameterized index."""
        self._check_params()
        new_bands.write.mode("append").partitionBy("band").parquet(self.path)
        self._write_params()


def process_increment(
    batch: DataFrame, ledger: ParquetLedger, process
) -> DataFrame:
    """Run ``process`` over only the never-seen rows of ``batch`` and
    commit their ids. Returns the processed frame.

    The result is eagerly ``localCheckpoint``-ed BEFORE the commit:
    appending to the ledger path invalidates any cache whose plan reads
    that path (Spark refreshes caches on write-to-read-path), so a
    merely-persisted result would silently recompute against the
    post-commit ledger and come back empty. Checkpointing cuts the
    lineage, making the returned frame independent of the ledger state.
    """
    fresh = ledger.filter_new(batch)
    out = process(fresh).localCheckpoint(eager=True)
    ledger.commit(out)
    return out


def scd2_merge(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD-type-2 MERGE kernel: fold a change batch into a version
    snapshot, recomputing validity intervals for ONLY the touched keys.

    ``snapshot`` rows carry ``valid_from``/``valid_to``; ``changes``
    rows carry the same payload columns plus ``valid_from`` (the change
    event time) and no ``valid_to``. Every change becomes a version —
    the version-per-event convention of the batch
    ``user_event_history_scd2`` query (extending the reference's
    keyed upsert, ``writers/DatabaseWriterActor.scala:269-348``, with
    history instead of overwrite).

    OUT-OF-ORDER SAFE by construction: intervals are never patched
    incrementally (a late event would have to split an already-closed
    interval — a maze of edge cases). Instead the invariant is
    recomputed: for a touched key, all versions (old ∪ new) get
    ``valid_to = lead(valid_from)`` under the key's window. Batches may
    arrive in any order; the final snapshot is always bit-identical to
    the one-shot batch window over the full history — asserted against
    the registry oracle query in tests/test_streaming.py.

    Scale shape: one window partitioned by key over ONLY the touched
    keys' versions (never global), one semi/anti join pair on the key
    (broadcast when the batch key set is small). Untouched keys pass
    through untouched — pair with bucket-partitioned storage (see
    ``streaming.pipeline.scd2_stream``) and they are not even read.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    new_rows = changes
    if snapshot is not None:
        touched = changes.select(*key_cols).distinct()
        old_touched = snapshot.join(touched, key_cols, "left_semi").drop(
            valid_to
        )
        untouched = snapshot.join(touched, key_cols, "left_anti")
        merged = old_touched.unionByName(new_rows)
    else:
        untouched = None
        merged = new_rows
    # REPLAY IDEMPOTENCE: an at-least-once stream re-delivers whole
    # batches; a replayed change is already IN the snapshot as a
    # version, and without this dedup the union would carry it twice
    # into the window (zero-length phantom intervals). (key, order)
    # identifies a version, so re-merging any already-applied batch is
    # a no-op — asserted in tests. Requires the change feed to be
    # deterministic per (key, order): two DIFFERENT payloads at the
    # same version key are a feed conflict and resolve arbitrarily.
    merged = merged.dropDuplicates([*key_cols, *order_cols])
    recomputed = merged.withColumn(
        valid_to, F.lead(valid_from).over(w)
    )
    if untouched is not None:
        recomputed = untouched.unionByName(
            recomputed.select(*untouched.columns)
        )
    return recomputed
