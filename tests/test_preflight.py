"""Preflight (access/checksum) validation + net staging tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tensei_agent_spark.functions import build as T
from tensei_agent_spark.plans import (
    ColumnRef,
    Field,
    Mapping,
    Pipeline,
    Recipe,
    SourceSpec,
    TargetSpec,
)
from tensei_agent_spark.preflight import (
    assert_preflight,
    check_access,
    sha256_of,
    validate_checksum,
)
from tensei_agent_spark.sources.net import push_file, stage_uri


def _pipeline(src_uri, tgt_uri, src_opts=None):
    return Pipeline(
        "p",
        sources=(SourceSpec("s", "csv", src_uri, (Field("a"),), src_opts or {}),),
        targets=(TargetSpec("t", "csv", tgt_uri),),
        recipes=(
            Recipe("r", "t", mappings=(Mapping((ColumnRef("s", "a"),), ("a",)),)),
        ),
    )


def test_access_ok_and_missing(tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("x\n")
    ok = check_access(_pipeline(str(src), str(tmp_path / "out.csv")))
    assert all(r.ok for r in ok)

    bad = check_access(_pipeline(str(tmp_path / "nope.csv"), str(tmp_path / "o")))
    assert any(not r.ok and "missing" in r.detail for r in bad)
    with pytest.raises(ValueError, match="preflight failed"):
        assert_preflight(_pipeline(str(tmp_path / "nope.csv"), str(tmp_path / "o")))


def test_checksum_validation(tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("hello\n")
    digest = hashlib.sha256(b"hello\n").hexdigest()
    assert sha256_of(str(src)) == digest
    good = SourceSpec("s", "csv", str(src), None, {"sha256": digest})
    assert validate_checksum(good)
    bad = SourceSpec("s", "csv", str(src), None, {"sha256": "0" * 64})
    assert not validate_checksum(bad)
    assert any(
        "sha256" in r.detail
        for r in check_access(_pipeline(str(src), "/tmp/o", {"sha256": "0" * 64}))
        if not r.ok
    )


def test_stage_uri_passthrough_and_reject(tmp_path):
    local = str(tmp_path / "x.csv")
    assert stage_uri(local) == local
    assert stage_uri("s3a://bucket/key.parquet") == "s3a://bucket/key.parquet"
    assert stage_uri("jdbc:derby:/tmp/db").startswith("jdbc:")  # passthrough
    with pytest.raises(ValueError, match="unsupported URI scheme"):
        stage_uri("gopher://host/file")
    # smb is a RECOGNIZED scheme (URIHelpers.scala:28-33) with a
    # documented capability gap — same contract as the sftp gate.
    with pytest.raises(NotImplementedError, match="SMB"):
        stage_uri("smb://host/share/file.csv")


def test_push_file_local_copy(tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("data")
    dest = tmp_path / "b.txt"
    push_file(str(src), f"file://{dest}")
    assert dest.read_text() == "data"
    with pytest.raises(ValueError, match="unsupported push scheme"):
        push_file(str(src), "gopher://host/file")


def test_box_data_into_list(spark):
    df = spark.range(1).select(
        T("box_data_into_list", [F.lit("a"), F.lit("b"), F.lit(3)])[0].alias("boxed")
    )
    assert df.first()["boxed"] == ["a", "b", "3"]
