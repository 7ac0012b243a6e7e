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


class _FakeSFTPClient:
    def __init__(self, files):
        self.files = files
        self.gets: list[tuple[str, str]] = []
        self.puts: list[tuple[str, str]] = []

    def get(self, remote, dest):
        self.gets.append((remote, dest))
        with open(dest, "wb") as fh:
            fh.write(self.files[remote])

    def put(self, local, remote):
        self.puts.append((local, remote))


def _install_fake_paramiko(monkeypatch, client):
    """Minimal paramiko stand-in covering the surface _stage_sftp and
    push_file touch: Transport(addr), .connect(username, password),
    SFTPClient.from_transport, .close()."""
    import sys
    import types

    mod = types.ModuleType("paramiko")
    state = {"addrs": [], "creds": [], "closed": 0}

    class Transport:
        def __init__(self, addr):
            state["addrs"].append(addr)

        def connect(self, username=None, password=None):
            state["creds"].append((username, password))

        def close(self):
            state["closed"] += 1

    class SFTPClient:
        @staticmethod
        def from_transport(transport):
            return client

    mod.Transport = Transport
    mod.SFTPClient = SFTPClient
    monkeypatch.setitem(sys.modules, "paramiko", mod)
    return state


def test_sftp_stage_contract(tmp_path, monkeypatch):
    """_stage_sftp through a mocked paramiko: address/credential
    parsing from the URI, remote path handed to get(), staged file
    named without the .gz suffix AND decompressed (the gzip-aware
    contract of NetworkFileParser.scala:214)."""
    import gzip

    from tensei_agent_spark.sources.net import stage_uri

    payload = b"id,name\n1,ada\n"
    client = _FakeSFTPClient(
        {"/data/in.csv": payload, "/data/in.csv.gz": gzip.compress(payload)}
    )
    state = _install_fake_paramiko(monkeypatch, client)

    dest = stage_uri("sftp://ada:pw@example.com:2222/data/in.csv", str(tmp_path))
    assert state["addrs"][-1] == ("example.com", 2222)
    assert state["creds"][-1] == ("ada", "pw")
    assert client.gets[-1][0] == "/data/in.csv"
    assert open(dest, "rb").read() == payload
    assert state["closed"] == 1

    # default port + gzip: staged name loses .gz and bytes decompress
    dest_gz = stage_uri("sftp://ada:pw@example.com/data/in.csv.gz", str(tmp_path))
    assert state["addrs"][-1] == ("example.com", 22)
    assert dest_gz.endswith("in.csv") and not dest_gz.endswith(".gz")
    assert open(dest_gz, "rb").read() == payload
    assert state["closed"] == 2


def test_sftp_push_contract(tmp_path, monkeypatch):
    """push_file over sftp: local path and remote target reach put(),
    transport is closed even on success."""
    from tensei_agent_spark.sources.net import push_file

    client = _FakeSFTPClient({})
    state = _install_fake_paramiko(monkeypatch, client)
    src = tmp_path / "out.csv"
    src.write_text("x")
    push_file(str(src), "sftp://u:p@host/up/out.csv")
    assert client.puts == [(str(src), "/up/out.csv")]
    assert state["creds"][-1] == ("u", "p")
    assert state["closed"] == 1


def test_ftps_stage_gunzips(tmp_path, monkeypatch):
    """FTPS staging of a .gz payload must decompress after the raw
    RETR (regression: the suffix was stripped but bytes stayed
    compressed)."""
    import ftplib
    import gzip

    from tensei_agent_spark.sources.net import stage_uri

    payload = b"a,b\n1,2\n"

    class FakeFTPS:
        def connect(self, host, port):
            assert (host, port) == ("h", 21)

        def login(self, user, pw):
            pass

        def prot_p(self):
            pass

        def retrbinary(self, cmd, sink):
            assert cmd == "RETR /d/f.csv.gz"
            sink(gzip.compress(payload))

        def quit(self):
            pass

    monkeypatch.setattr(ftplib, "FTP_TLS", FakeFTPS)
    dest = stage_uri("ftps://u:p@h/d/f.csv.gz", str(tmp_path))
    assert dest.endswith("f.csv")
    assert open(dest, "rb").read() == payload


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
