from __future__ import annotations

import math

from pyspark.sql import functions as F

from tensei_agent_spark.operators.dsir import importance_weights, select_top_k


def _corpus(spark):
    # Target docs speak "cat dog fish"; pool docs are either target-like
    # or speak "rock sand iron". lang='t' marks the target.
    rows = []
    for i in range(10):
        rows.append((i, "cat dog fish cat dog fish cat", "t"))
    for i in range(10, 16):
        rows.append((i, "cat dog fish dog cat fish fish", "p"))  # target-like
    for i in range(16, 22):
        rows.append((i, "rock sand iron rock sand iron rock", "p"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_importance_weights_shift_and_python_parity(spark):
    docs = _corpus(spark)
    got = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(docs, F.col("lang") == "t").collect()
    }
    assert set(got) == set(range(10, 22))
    like = [got[i] for i in range(10, 16)]
    unlike = [got[i] for i in range(16, 22)]
    assert min(like) > max(unlike)

    # Exact parity with a pure-Python model for one doc.
    target_tokens = ["cat", "dog", "fish"] * 10 * 2 + ["cat"] * 10  # 7 each doc
    from collections import Counter

    c_t = Counter()
    for _ in range(10):
        c_t.update(["cat", "dog", "fish", "cat", "dog", "fish", "cat"])
    c_r = Counter()
    for _ in range(6):
        c_r.update(["cat", "dog", "fish", "dog", "cat", "fish", "fish"])
    for _ in range(6):
        c_r.update(["rock", "sand", "iron", "rock", "sand", "iron", "rock"])
    vocab = set(c_t) | set(c_r)
    n_t, n_r, v = sum(c_t.values()), sum(c_r.values()), len(vocab)

    def lr(w):
        return (
            math.log(c_t[w] + 1)
            - math.log(n_t + v)
            - math.log(c_r[w] + 1)
            + math.log(n_r + v)
        )

    want_16 = sum(lr(w) for w in ["rock", "sand", "iron", "rock", "sand", "iron", "rock"])
    assert math.isclose(got[16], want_16, rel_tol=1e-12)


def test_select_top_k_deterministic_and_ordered(spark):
    docs = _corpus(spark)
    sel = select_top_k(docs, F.col("lang") == "t", k=6).collect()
    assert [r["doc_id"] for r in sel] == list(range(10, 16))
    ws = [r["log_weight"] for r in sel]
    assert ws == sorted(ws, reverse=True)
    again = select_top_k(docs, F.col("lang") == "t", k=6).collect()
    assert sel == again
