"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS'23): pick pretraining documents from a large raw pool whose
n-gram statistics look like a small target domain.

Importance weight of a pool document d:

    log w(d) = Σ_tokens  log p_target(tok) − log p_raw(tok)

with add-1-smoothed unigram LMs fitted on the target set and the raw
pool respectively. Documents are then chosen by weight (the paper
resamples ∝ w; the deterministic engine variant takes the top-k, which
is the zero-temperature limit and reproducible).

Scale shape: two token-count aggregations (one over the target, one
over the pool — partial-aggregated word-keyed shuffles), one
word-keyed join of the pool token stream against the vocab-sized
log-ratio table, one partial-aggregated groupBy(doc), and a
TakeOrdered top-k. Nothing driver-side, nothing quadratic; the vocab
table is corpus-vocabulary-sized (fits the exchange — it is the same
table word_counts / tf-idf already build).

log is a libm call (NOT correctly rounded, may differ at the ULP
between JVMs and other engines), so the registry exposes this as a
rows-only query; distribution-shift behavior is pinned in
test_dsir.py instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import track

WORD_RE = "[a-z0-9]+"


def _doc_words(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
            )
        ).alias("w"),
    )


def importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-pool-document DSIR log-importance weights.

    ``is_target`` marks the target-domain rows; every other row is the
    raw pool (the set being selected from). Returns
    (id, n_tokens, log_weight) for pool documents with >= 1 token.
    Out-of-vocabulary tokens on either side get the add-1 floor.
    """
    tagged = track(
        docs.select(F.col(id_col), F.col(text_col), is_target.alias("_t"))
    )
    words = _doc_words(tagged, text_col, id_col).join(
        tagged.select(id_col, "_t"), id_col
    )
    # Vocab = union of both sides; add-1 smoothing needs |V| and totals.
    counts = track(
        words.groupBy("w").agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("c_t"),
            F.sum(F.when(F.col("_t"), 0).otherwise(1)).alias("c_r"),
        )
    )
    totals = counts.agg(
        F.sum("c_t").alias("n_t"),
        F.sum("c_r").alias("n_r"),
        F.count(F.lit(1)).alias("v"),
    )
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "w",
        (
            F.log((F.col("c_t") + 1).cast("double"))
            - F.log((F.col("n_t") + F.col("v")).cast("double"))
            - F.log((F.col("c_r") + 1).cast("double"))
            + F.log((F.col("n_r") + F.col("v")).cast("double"))
        ).alias("_lr"),
    )
    pool_words = words.filter(~F.col("_t")).select(id_col, "w")
    return (
        pool_words.join(ratio, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_lr").alias("log_weight"),
        )
    )


def select_top_k(
    docs: DataFrame,
    is_target: Column,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic DSIR selection: top-k pool documents by
    (log_weight desc, id asc) — TakeOrdered, never a global sort.
    Length bias note: log-weights SUM over tokens, so long documents
    swing further in both directions; the paper normalizes via the
    resampling temperature, here the per-token mean is exposed too so
    callers can rank by either."""
    w = importance_weights(docs, is_target, text_col, id_col)
    return (
        w.select(
            id_col,
            "n_tokens",
            "log_weight",
            (F.col("log_weight") / F.col("n_tokens")).alias(
                "log_weight_per_token"
            ),
        )
        .orderBy(F.col("log_weight").desc(), F.col(id_col))
        .limit(int(k))
    )
