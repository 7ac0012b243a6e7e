"""Unit tests for repetition features and holdout decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensei_agent_spark.operators.dedup import shared_shingle_contamination
from tensei_agent_spark.operators.text import repetition_features


def test_repetition_features_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # 6 words, 3 distinct; bigrams: "a a","a b","b b","b a","a b"
            # → 4 distinct of 5 → dup_2gram_frac = 0.2; top word "a"/"b" 3/6
            (1, "a a b b a b"),
            # all distinct words and bigrams
            (2, "one two three four"),
            # single word → no bigrams
            (3, "solo"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 6
    assert abs(r1["distinct_word_frac"] - 2 / 6) < 1e-12
    assert abs(r1["dup_2gram_frac"] - 0.2) < 1e-12
    assert abs(r1["top_word_frac"] - 3 / 6) < 1e-12
    r2 = rows[2]
    assert r2["distinct_word_frac"] == 1.0
    assert r2["dup_2gram_frac"] == 0.0
    assert abs(r2["top_word_frac"] - 0.25) < 1e-12
    r3 = rows[3]
    assert r3["n_words"] == 1
    assert r3["dup_2gram_frac"] == 0.0  # guarded: no descending sequence
    assert r3["top_word_frac"] == 1.0


def test_shared_shingle_contamination_counts(spark):
    # 10-char shingles; corpus doc 10 copies holdout doc 100's text
    # exactly (many shared shingles), doc 11 is disjoint.
    contaminated = "the quick brown fox jumps over the lazy dog"
    corpus = spark.createDataFrame(
        [(10, contaminated), (11, "zzzz yyyy xxxx wwww vvvv uuuu tttt")],
        ["doc_id", "text"],
    )
    holdout = spark.createDataFrame([(100, contaminated)], ["doc_id", "text"])
    pairs = shared_shingle_contamination(
        corpus, holdout, k=10, min_shared=3
    ).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["doc_id"], p["holdout_id"]) == (10, 100)
    # identical text ⇒ shares every distinct shingle: len-k+1 positions
    assert p["n_shared"] == len(set(
        contaminated[i : i + 10] for i in range(len(contaminated) - 9)
    ))


def test_connected_components_multi_hop_chain(spark):
    from tensei_agent_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3 → needs >1 propagation round) + pair 10-11
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_operators_handle_empty_inputs(spark):
    """Edge hardening: empty frames flow through without error."""
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from tensei_agent_spark.operators.text import repetition_features

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert repetition_features(empty_docs).count() == 0
    assert ngram_jaccard_pairs(empty_docs).count() == 0

    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty_pairs).count() == 0

    # single-doc corpus: no pairs, features still computed
    one = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    assert ngram_jaccard_pairs(one).count() == 0
    assert repetition_features(one).count() == 1


def test_connected_components_distributed_path_matches_driver_path(spark):
    from tensei_agent_spark.operators.dedup import connected_components

    # chain + pair + triangle — force the distributed propagation loop
    # with driver_threshold=0 and require identical components to the
    # driver union-find fast path.
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    fast = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist
    assert dist == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_clean_text_entity_order_and_controls(spark):
    """&amp;lt; must decode to the literal '&lt;' (amp decodes LAST, no
    double-unescape); tags drop, control chars vanish, whitespace
    collapses."""
    from tensei_agent_spark.operators.text import clean_text

    df = spark.createDataFrame(
        [("<b>a</b>  &amp;lt; b\x07\tc &nbsp;d",)], "s string"
    )
    (got,) = df.select(clean_text(F.col("s")).alias("c")).first()
    assert got == "a &lt; b c d"


# --- collocations ---------------------------------------------------------


def test_collocations_lift_matches_python(spark):
    import pytest
    from collections import Counter

    from tensei_agent_spark.operators.text import collocations

    texts = [
        "new york is big and new york is busy",
        "the cat and the dog and the cat",
        "new york new york",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        (r["w1"], r["w2"]): (r["n_ab"], r["lift"])
        for r in collocations(docs, "text", min_count=2, top_k=10).collect()
    }
    words = [t.split() for t in texts]
    uni = Counter(w for ws in words for w in ws)
    big = Counter((a, b) for ws in words for a, b in zip(ws, ws[1:]))
    nw = sum(uni.values())
    nb = sum(len(ws) - 1 for ws in words)
    for (a, b), n_ab in big.items():
        if n_ab >= 2:
            assert got[(a, b)][0] == n_ab
            want = (n_ab * nw * nw) / (nb * uni[a] * uni[b])
            assert got[(a, b)][1] == pytest.approx(want, rel=1e-12)
    assert set(got) == {p for p, c in big.items() if c >= 2}
    # the fixed phrase must outrank the stopword-glued pair
    assert got[("new", "york")][1] > got[("and", "the")][1]


def test_collocations_min_count_and_topk(spark):
    from tensei_agent_spark.operators.text import collocations

    docs = spark.createDataFrame(
        [(1, "a b a b a b c d")], "doc_id int, text string"
    )
    rows = collocations(docs, "text", min_count=3, top_k=1).collect()
    assert len(rows) == 1
    assert (rows[0]["w1"], rows[0]["w2"]) == ("a", "b")
    assert rows[0]["n_ab"] == 3


def test_compression_ratio_discriminates(spark):
    from tensei_agent_spark.operators.text import compression_ratio

    rows = [
        (1, "spam " * 400),                      # highly repetitive
        (2, " ".join(f"w{i * 7919 % 5000}" for i in range(400))),  # varied
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert got[1]["ratio"] < 0.1               # template compresses hard
    assert got[2]["ratio"] > got[1]["ratio"] * 3
    assert got[1]["n_bytes"] == len("spam " * 400)
    # Deterministic across runs (fixed zlib level).
    again = {r["doc_id"]: r["ratio"] for r in compression_ratio(docs).collect()}
    assert again == {k: v["ratio"] for k, v in got.items()}


def test_compression_ratio_empty_doc_is_null(spark):
    from tensei_agent_spark.operators.text import compression_ratio

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "real words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert got[1]["ratio"] is None and got[2]["ratio"] is None
    assert got[3]["ratio"] is not None and got[3]["n_bytes"] > 0
