"""Model-based quality filtering: hashed linear text classifier.

The fastText / CCNet-style quality gate used in LLM data pipelines
(Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification";
Wenzek et al. 2020, CCNet): a document's quality logit is a linear
model over hashed unigram + bigram features. Production pipelines load
trained weights; here the weight table is derived deterministically
from the bucket id (a seeded md5 draw) so the *machinery* — feature
hashing, bucket weight lookup, per-doc aggregation, threshold gate —
is exercised end-to-end and stays bit-exact against a SQL oracle.

Scale shape (the part that matters at 100 TB):
- Feature extraction is one map pass (regex tokenize + zip-with-next
  bigrams), no shuffle.
- The weight "table" never materializes: weights are a pure function
  of the bucket id (md5 % 2001 - 1000), evaluated JVM-side inside
  codegen. A trained model would broadcast a ``n_buckets``-sized MAP
  literal instead — either way there is no join.
- The only exchange is the partial-aggregated groupBy(doc_id), which
  collapses map-side to one row per document before the shuffle.
- Scores stay exact: integer weight sums (BIGINT) plus ONE final
  division by the feature count — bit-reproducible across engines,
  unlike a sigmoid (exp is not a correctly-rounded libm call). The
  logit threshold is equivalent to a probability threshold through
  the monotone sigmoid.

Replaces nothing in the reference (tensei-agent has no classifier
surface); this is beyond-reference LLM-pipeline coverage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spread import spread_for_cpu_map

# Feature-hash space. 2^10 buckets keeps the demo collision rate
# realistic; production fastText uses 2^21-2^24 — the plan is identical.
N_BUCKETS = 1024

# Weight quantization: md5 % 2001 - 1000 → integer weight in
# [-1000, 1000], i.e. a fixed-point logit with 3 decimal digits.
_W_SPAN = 2001
_W_OFF = 1000

WORD_RE = "[a-z0-9]+"


def _md5_60bit(c: Column) -> Column:
    """First 15 md5 hex chars as a 60-bit non-negative BIGINT —
    bit-identical in Spark (conv) and DuckDB (0x-prefix cast)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hashed_features(text: Column) -> Column:
    """Array of feature strings: lowercase word unigrams + adjacent
    bigrams ("w1 w2"). Pure map-side expression."""
    ws = F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), F.lit(0))
    bigrams = F.transform(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(ws, i + 2)),
    )
    return F.concat(ws, bigrams)


def feature_bucket(feat: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hash a feature string into [0, n_buckets)."""
    return _md5_60bit(feat) % F.lit(int(n_buckets))


def bucket_weight(bucket: Column, salt: str) -> Column:
    """Deterministic integer weight in [-1000, 1000] for a bucket.

    Stands in for a trained coefficient; a real model swaps this pure
    function for an element_at on a broadcast MAP literal of the same
    shape (bucket -> int milli-logit)."""
    h = _md5_60bit(F.concat(F.lit(f"w{salt}:"), bucket.cast("string")))
    return (h % F.lit(_W_SPAN)) - F.lit(_W_OFF)


def score_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    salt: str = "quality-v1",
    threshold_milli: int = 0,
) -> DataFrame:
    """Per-document quality logit + keep gate.

    Returns (id, n_features, logit_sum, score, keep):
    - ``logit_sum``  exact BIGINT sum of milli-logit feature weights
    - ``score``      logit_sum / n_features (double; one division of
                     exact integers — bit-reproducible)
    - ``keep``       mean milli-logit >= ``threshold_milli``, decided
                     on the integer form (logit_sum >= t * n_features)
                     so the gate itself never touches a float.

    Documents with zero extractable features are kept out of the
    output (no features → no evidence); callers union them back with
    a policy default if needed.
    """
    # The tokenize + bigram + explode + md5-per-feature chain is the
    # most CPU-expensive non-dedup map stage in the bench; on a
    # few-split parquet it runs in as many tasks as splits (one, at
    # sf0.1) — spread it first, exactly like the dedup family
    # (measured: quality_classifier_scores 4.5 s → see BENCH_LOCAL_r09).
    feats = spread_for_cpu_map(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.explode(hashed_features(F.col(text_col))).alias("_f"),
    )
    w = bucket_weight(feature_bucket(F.col("_f"), n_buckets), salt)
    scored = (
        feats.select(F.col(id_col), w.alias("_w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("_w").alias("logit_sum"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_features",
        "logit_sum",
        (F.col("logit_sum").cast("double") / F.col("n_features")).alias(
            "score"
        ),
        (
            F.col("logit_sum")
            >= F.lit(int(threshold_milli)) * F.col("n_features")
        ).alias("keep"),
    )
