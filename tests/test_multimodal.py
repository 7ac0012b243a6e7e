"""Multimodal + SimHash operator tests: Spark-side plumbing must be
real (schema, Arrow batching, partition behavior) with the codec stubbed."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tensei_agent_spark.operators.dedup import (
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from tensei_agent_spark.operators.multimodal import (
    attach_asset_metadata,
    decode_stub,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture
def assets(spark):
    rows = [(i, f"payload-{i}".encode() * (i + 1)) for i in range(20)]
    return spark.createDataFrame(rows, "asset_id long, payload binary").repartition(4)


def test_metadata_is_jvm_side(spark, assets):
    out = attach_asset_metadata(assets, "payload", "image", "png")
    row = out.filter(F.col("asset_id") == 3).select("asset_meta.*").first()
    payload = b"payload-3" * 4
    assert row["n_bytes"] == len(payload)
    assert row["digest"] == hashlib.md5(payload).hexdigest()
    assert row["modality"] == "image" and row["format"] == "png"


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_stub(b"x", "image", deterministic_fake=False)
    w, h, dur, feat = decode_stub(b"x", "image", deterministic_fake=True)
    assert 16 <= w < 80 and 16 <= h < 80 and dur == 0.0 and len(feat) == 8
    # deterministic: same bytes → same features
    assert decode_stub(b"x", "image", True) == (w, h, dur, feat)


def test_extract_features_distributed(spark, assets):
    out = extract_features(assets, "payload", "asset_id", "image",
                           deterministic_fake=True)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 20
    payload = b"payload-7" * 8
    w, h, dur, feat = decode_stub(payload, "image", True)
    got = rows[7]
    assert (got["width"], got["height"]) == (w, h)
    assert got["digest"] == hashlib.md5(payload).hexdigest()
    assert list(got["feature"]) == pytest.approx(feat)
    # no shuffle introduced: partition count preserved through mapInPandas
    assert out.rdd.getNumPartitions() == assets.rdd.getNumPartitions()


def test_audio_duration_nonzero(spark, assets):
    out = extract_features(assets, "payload", "asset_id", "audio",
                           deterministic_fake=True)
    assert out.filter(F.col("duration_s") > 0).count() > 0


def test_frame_sample_plan(spark, assets):
    planned = frame_sample_plan(
        attach_asset_metadata(assets, "payload", "video", "mp4"),
        "asset_id",
    )
    rows = planned.collect()
    assert all(r["sample_ts_s"] == r["frame_idx"] * 1.0 for r in rows)
    assert planned.groupBy("asset_id").count().count() == 20


def test_simhash_identical_and_perturbed(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical → same fingerprint, hamming 0
            (3, base + " extra tail token"),  # near dup
            (4, "completely different content about database engines"),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert sig[1] == sig[2]
    assert bin(sig[1] ^ sig[3]).count("1") <= 4  # near dup: tiny hamming
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs


def test_extract_features_custom_decoder(spark, assets):
    """A user-supplied decoder callable must ship to the executors and
    run inside the mapInPandas batch loop (VERDICT r2 item 6). Defined
    locally so cloudpickle serializes it by VALUE — a module-level
    function in a test file pickles by reference and executors cannot
    import the test module (the same constraint a real user's notebook
    decoder has)."""

    def _toy_decoder(payload: bytes, modality: str):
        return (
            len(payload) % 100, 7, 1.5,
            [float(payload[0]), float(len(payload))],
        )

    out = extract_features(
        assets, "payload", "asset_id", modality="video", decoder=_toy_decoder
    ).collect()
    assert len(out) == 20
    by_id = {r["asset_id"]: r for r in out}
    for i in range(20):
        payload = f"payload-{i}".encode() * (i + 1)
        r = by_id[i]
        assert r["width"] == len(payload) % 100
        assert r["height"] == 7
        assert r["duration_s"] == 1.5
        assert r["feature"] == [float(payload[0]), float(len(payload))]
        assert r["digest"] == hashlib.md5(payload).hexdigest()


def test_decoder_closure_serializes(spark, assets):
    """Closures (captured state) must survive pickling to executors."""
    scale = 3.0
    out = extract_features(
        assets, "payload", "asset_id",
        decoder=lambda p, m: (1, 1, 0.0, [scale * len(p)]),
    )
    got = {r["asset_id"]: r["feature"][0] for r in out.collect()}
    assert got[4] == 3.0 * len(b"payload-4" * 5)


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile source → opaque payload column → extract_features:
    the realistic multimodal ingest path, with glob pushdown."""
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.multimodal import extract_features
    from tensei_agent_spark.plans.spec import Field, SourceSpec
    from tensei_agent_spark.sources import read_source

    (tmp_path / "a.png").write_bytes(b"\x89PNG fakedata A")
    (tmp_path / "b.png").write_bytes(b"\x89PNG fakedata BB")
    (tmp_path / "skip.txt").write_bytes(b"not an image")
    spec = SourceSpec(
        "imgs", "binary", str(tmp_path),
        (Field("path"), Field("length", "long"), Field("content", "binary")),
        {"pathGlobFilter": "*.png"},
    )
    df = read_source(spark, spec)
    assert df.count() == 2  # glob filter pruned the .txt
    feats = extract_features(
        df.select(F.col("path").alias("doc_id"), F.col("content").alias("payload")),
        "payload", "doc_id", modality="image", deterministic_fake=True,
    )
    rows = feats.collect()
    assert len(rows) == 2 and all(r["feature"] is not None for r in rows)


def test_transform_assets_roundtrip_and_gate(spark):
    """Payload->payload transform: fake kernel halves each asset through
    the distributed path; a custom kernel plugs in; no kernel raises the
    documented gate."""
    import pytest
    from pyspark.sql import functions as F

    from tensei_agent_spark.operators.multimodal import transform_assets

    df = spark.createDataFrame(
        [(1, bytearray(b"0123456789")), (2, bytearray(b"abcd"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in
           transform_assets(df, "payload", "doc_id",
                            deterministic_fake=True).collect()}
    assert bytes(out[1]["payload"]) == b"01234" and out[1]["n_bytes_out"] == 5
    assert out[2]["n_bytes_in"] == 4 and out[2]["n_bytes_out"] == 2

    rev = transform_assets(df, "payload", "doc_id", kernel=lambda b: b[::-1])
    got = {r["doc_id"]: bytes(r["payload"]) for r in rev.collect()}
    assert got[2] == b"dcba"

    with pytest.raises(NotImplementedError, match="kernel"):
        transform_assets(df, "payload", "doc_id")


def _wav_bytes(freq=440.0, rate=8000, seconds=0.5):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    n = int(rate * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(20000 * math.sin(2 * math.pi * freq * i / rate))
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


def _ppm_bytes(w, h, rgb):
    header = f"P6\n# test comment\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def _bmp_bytes(w, h, bgr):
    import struct

    row = bytes(bgr) * w
    pad = (-len(row)) % 4
    pixel = (row + b"\x00" * pad) * h
    off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", off + len(pixel), 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0
    )
    return header + pixel


def test_stdlib_wav_decoder_real_audio(spark):
    import pytest

    from tensei_agent_spark.operators.multimodal import (
        extract_features,
        stdlib_decoder,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(seconds=0.5)))], "doc_id long, payload binary"
    )
    r = extract_features(
        df, "payload", "doc_id", modality="audio", decoder=stdlib_decoder
    ).collect()[0]
    assert r["duration_s"] == pytest.approx(0.5, abs=1e-3)
    rms, zcr, peak, dc = r["feature"]
    # a full-scale-ish sine: rms ~ peak/sqrt(2), zcr ~ 2*440/8000, no DC
    assert rms == pytest.approx(peak / 2**0.5, rel=0.01)
    assert zcr == pytest.approx(2 * 440 / 8000, rel=0.05)
    assert abs(dc) < 1e-3


def test_stdlib_ppm_and_bmp_decoders(spark):
    import pytest

    from tensei_agent_spark.operators.multimodal import (
        extract_features,
        stdlib_decoder,
    )

    ppm = _ppm_bytes(4, 3, [255, 0, 128])
    bmp = _bmp_bytes(5, 2, [64, 128, 255])  # BGR on disk
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp))], "doc_id long, payload binary"
    )
    got = {
        r["asset_id"]: r
        for r in extract_features(
            df, "payload", "doc_id", modality="image", decoder=stdlib_decoder
        ).collect()
    }
    p = got[1]
    assert (p["width"], p["height"]) == (4, 3)
    assert p["feature"][:3] == pytest.approx([1.0, 0.0, 128 / 255], abs=1e-9)
    assert p["feature"][3:] == pytest.approx([0.0, 0.0, 0.0], abs=1e-9)  # flat
    b = got[2]
    assert (b["width"], b["height"]) == (5, 2)
    # stored BGR (64,128,255) → reported RGB means
    assert b["feature"] == pytest.approx(
        [255 / 255, 128 / 255, 64 / 255], abs=1e-9
    )


def test_stdlib_decoder_gates_unknown_formats():
    import pytest

    from tensei_agent_spark.operators.multimodal import stdlib_decoder

    with pytest.raises(NotImplementedError, match="no stdlib decoder"):
        stdlib_decoder(b"\x89PNG\r\n\x1a\n....", "image")


def test_ppm_16bit_maxval_gated():
    import pytest

    from tensei_agent_spark.operators.multimodal import decode_ppm

    payload = b"P6\n2 2\n65535\n" + b"\x00" * 24
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_ppm(payload)


def test_resize_ppm_kernel_through_transform_assets(spark):
    import numpy as np

    from tensei_agent_spark.operators.multimodal import (
        decode_ppm,
        resize_ppm_kernel,
        transform_assets,
    )

    # 4x4 image: left half red, right half blue.
    px = np.zeros((4, 4, 3), dtype="u1")
    px[:, :2, 0] = 255
    px[:, 2:, 2] = 255
    payload = b"P6\n4 4\n255\n" + px.tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "asset_id long, payload binary"
    )
    out = transform_assets(
        df, "payload", "asset_id", kernel=resize_ppm_kernel(2, 2)
    ).collect()[0]
    w, h, _, feats = decode_ppm(bytes(out["payload"]))
    assert (w, h) == (2, 2)
    # Means preserved by the symmetric downsample: half red, half blue.
    r_mean, g_mean, b_mean = feats[0], feats[1], feats[2]
    assert r_mean == 0.5 and g_mean == 0.0 and b_mean == 0.5
    assert out["n_bytes_out"] < out["n_bytes_in"]

    # Upscale round-trip keeps the palette exactly (nearest neighbor).
    up = transform_assets(
        df, "payload", "asset_id", kernel=resize_ppm_kernel(8, 8)
    ).collect()[0]
    w8, h8, _, feats8 = decode_ppm(bytes(up["payload"]))
    assert (w8, h8) == (8, 8)
    assert feats8[0] == 0.5 and feats8[2] == 0.5
