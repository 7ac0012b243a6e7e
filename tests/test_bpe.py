"""BPE induction (operators/bpe.py) — pinned against a naive
pure-Python reference implementation, since the merge loop is the one
family the SQL oracle gate cannot express."""

from __future__ import annotations

import re
from collections import Counter

from tensei_agent_spark.operators.bpe import (
    END,
    bpe_segment,
    bpe_token_counts,
    bpe_train,
    word_frequencies,
)


def _naive_train(word_freqs, n_merges):
    """Textbook BPE, written independently of the operator (no shared
    helpers): symbol-tuple vocab, recount pairs every round."""
    vocab = Counter()
    for w, c in word_freqs:
        vocab[tuple(w) + (END,)] += c
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), f = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if f < 2:
            break
        new = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        vocab = new
        merges.append((rank, l, r, f))
    return merges


WORDS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("new", 2)]


def test_bpe_train_matches_naive_reference():
    got = bpe_train(WORDS, 10)
    want = _naive_train(WORDS, 10)
    assert got == want
    assert len(got) >= 5


def test_bpe_train_is_input_order_independent():
    assert bpe_train(list(reversed(WORDS)), 8) == bpe_train(WORDS, 8)


def test_bpe_train_stops_when_nothing_repeats():
    merges = bpe_train([("ab", 1), ("cd", 1)], 50)
    assert merges == []  # every pair occurs once → freq<2 stop


def test_bpe_segment_round_trips_and_respects_ranks():
    merges = bpe_train(WORDS, 10)
    ranks = {(l, r): k for k, l, r, _ in merges}
    for w, _ in WORDS:
        syms = bpe_segment(w, ranks)
        assert "".join(syms) == w + END  # lossless
    # a frequent training word should compress to few symbols
    assert len(bpe_segment("newest", ranks)) <= 3
    # unseen word still segments, falling back to characters
    syms = bpe_segment("zzq", ranks)
    assert "".join(syms) == "zzq" + END


def test_bpe_token_counts_matches_python_recount(spark):
    rows = [(i, " ".join(w for w, c in WORDS for _ in range(c)))
            for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    freqs = {
        r["word"]: r["count"]
        for r in word_frequencies(docs, "text").collect()
    }
    merges = bpe_train(sorted(freqs.items()), 10)
    got = {
        r["token"]: r["count"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    ranks = {(l, r): k for k, l, r, _ in merges}
    want = Counter()
    for w, c in freqs.items():
        for t in bpe_segment(w, ranks):
            want[t] += c
    assert got == dict(want)


def test_word_frequencies_cap_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb bb cc cc dd")], "doc_id int, text string"
    )
    top = word_frequencies(docs, "text", max_vocab=2).collect()
    # counts: bb=2, cc=2, aa=1, dd=1 → cap keeps (bb, cc): count desc,
    # then word asc breaks the tie
    assert sorted((r["word"], r["count"]) for r in top) == [("bb", 2), ("cc", 2)]


def test_word_frequencies_tokenizer_matches_regex(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, WORLD! hello-world 123")], "doc_id int, text string"
    )
    got = {r["word"]: r["count"] for r in word_frequencies(docs, "text").collect()}
    want = Counter(re.findall(r"[a-z]+", "Hello, WORLD! hello-world 123".lower()))
    assert got == dict(want)
