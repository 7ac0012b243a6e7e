"""BPE tokenizer induction over a document corpus.

The reference has no tokenizer surface; this is a beyond-reference
training-data operator (vocabulary induction for LLM pipelines). The
scale decomposition is the one production tokenizer trainers use:

1. **Distributed word counting** — the only corpus-sized pass. A
   regex word split + hash aggregate reduces 100 TB of text to a
   (word, count) table bounded by the corpus vocabulary.
2. **Vocabulary cap** — deterministic top-``max_vocab`` words by
   (count desc, word asc). This is the explicit scale guard for the
   driver step below; the tail it drops is reported by the caller via
   the returned coverage numbers, never silently.
3. **Driver-side merge loop** — classic byte-pair-encoding over the
   word-frequency dict (count symbol-pair frequencies weighted by word
   count, merge the argmax, repeat). O(n_merges · vocab); the corpus
   is never touched again.
4. **Distributed application** — segmentation runs per DISTINCT word
   (vocab-sized, Arrow-batched pandas UDF), then token counts are the
   word counts re-keyed through an explode — the corpus text is again
   read exactly once, and no per-document Python ever runs.

Determinism: merge ties break on the lexicographically smallest pair;
the vocabulary cap ties break on the word; segmentation is a pure
function of the merge ranks. Same corpus → same merges on any cluster
layout.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Word splitter shared by training and application: lowercased runs of
# letters (the simple normalizer used by the text_quality family).
_WORD_RE = r"[a-z]+"

END = "</w>"  # end-of-word marker, standard BPE


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_vocab: int | None = None
) -> DataFrame:
    """(word, count) over the corpus — the single corpus-sized pass.

    With ``max_vocab``, keeps the deterministic top-K by
    (count desc, word asc) via a TakeOrdered-shaped limit (the cap is
    vocab-sized, so the sort input is the aggregated word table, not
    the corpus).
    """
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("word")
    )
    freqs = words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    if max_vocab is not None:
        freqs = freqs.orderBy(F.col("count").desc(), F.col("word")).limit(
            int(max_vocab)
        )
    return freqs


def bpe_train(
    word_freqs: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, str, int]]:
    """Classic BPE merge learning over a (word, count) table.

    Returns up to ``n_merges`` rows (rank, left, right, merged_freq)
    in learned order. Pure driver-side function of the vocab-bounded
    word table; ties on pair frequency break lexicographically so the
    result is independent of dict iteration order.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in word_freqs:
        if word:
            vocab[tuple(word) + (END,)] = vocab.get(tuple(word) + (END,), 0) + int(cnt)
    merges: list[tuple[str, str, str, int]] = []
    for rank in range(int(n_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < 2:
            break  # nothing repeats — further merges are noise
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
        merges.append((rank, left, right, freq))
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with learned merges, lowest rank first — the
    standard BPE inference loop (apply the earliest-learned applicable
    merge until none applies)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Corpus token counts under a learned merge table → (token, count).

    Segmentation runs once per DISTINCT word over the vocab-sized word
    table (Arrow-batched pandas UDF, merge ranks broadcast in the
    closure); corpus-level counts come from re-keying the word counts
    through an explode — per-document Python never runs, and the text
    is scanned exactly once (the same scan word_frequencies does).
    """
    from pyspark.sql.types import ArrayType, StringType

    ranks = {(l, r): k for k, l, r, _ in merges}

    # Legacy-style pandas_udf (explicit return type, no type hints):
    # the module uses `from __future__ import annotations`, which makes
    # hint-based inference see bare strings.
    seg = F.pandas_udf(
        lambda words: words.map(lambda w: bpe_segment(w, ranks)),
        ArrayType(StringType()),
    )

    freqs = word_frequencies(docs, text_col)
    return (
        freqs.withColumn("_toks", seg(F.col("word")))
        .select(F.explode("_toks").alias("token"), "count")
        .groupBy("token")
        .agg(F.sum("count").cast("bigint").alias("count"))
    )
