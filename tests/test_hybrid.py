from __future__ import annotations

import pytest

from tensei_agent_spark.operators.hybrid import rrf_fuse


def test_rrf_fuse_matches_python(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rank int"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([("a", a), ("b", b)]).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[3]["rrf"] == 1.0 / 63 + 1.0 / 61
    assert got[1]["rrf"] == 1.0 / 61
    assert got[4]["rrf"] == 1.0 / 62
    assert got[4]["rank_a"] is None and got[4]["rank_b"] == 2
    # Doc present in both arms outranks single-arm docs at same depth.
    assert got[3]["rrf"] > got[1]["rrf"]


def test_rrf_fuse_single_and_empty(spark):
    a = spark.createDataFrame([(7, 1)], "doc_id long, rank int")
    got = rrf_fuse([("only", a)]).collect()
    assert len(got) == 1 and got[0]["rrf"] == 1.0 / 61
    with pytest.raises(ValueError):
        rrf_fuse([])
