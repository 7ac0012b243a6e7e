"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference surface for training-data pipelines. The contract:

- a multimodal asset is a **binary column** plus a **metadata struct**
  (modality, format, width/height/duration, n_bytes, content digest);
- per-asset compute (decode, feature-extract, resize, frame-sample)
  runs as **Arrow-batched ``mapInPandas``** — the only sane shape at
  100 TB: binary stays columnar end-to-end, batches amortize Python
  crossing, partitioning is untouched (no shuffle), and each batch
  bounds memory regardless of corpus size.

External codecs (PIL/ffmpeg/soundfile) are NOT installed in this
environment. Formats decodable with the stdlib + numpy alone are
decoded FOR REAL — :func:`stdlib_decoder` handles PCM WAV audio and
uncompressed PPM/BMP images end-to-end through the distributed path
(pytest-asserted against constructed assets). Compressed formats
(jpeg/png/mp4) remain gated: ``decode_stub`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, whose
md5-seeded pseudo-features keep the plumbing — schema, batch shape,
partition behavior — testable. Swapping in a real codec changes ONE
inner function, nothing in the Spark plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_META_SCHEMA = StructType(
    [
        StructField("modality", StringType()),  # image | audio | video
        StructField("format", StringType()),  # png/jpeg/wav/mp4/...
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),  # md5 of the payload
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_asset_metadata(
    df: DataFrame,
    binary_col: str,
    modality: str,
    fmt: str,
    out_col: str = "asset_meta",
) -> DataFrame:
    """Typed metadata struct for a binary column — all JVM expressions
    (md5/length run in codegen; no Python for the cheap path)."""
    payload = F.col(binary_col)
    return df.withColumn(
        out_col,
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("digest"),
        ),
    )


def decode_stub(payload: bytes, modality: str, deterministic_fake: bool):
    """Decode kernel — REPLACE with a real codec (PIL/soundfile/ffmpeg).

    With ``deterministic_fake`` the 'decoded' dimensions/features are
    md5-derived from the bytes: stable across runs/partitions, so tests
    can assert exact values through the full distributed path.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "no image/audio codec installed in this environment; pass "
            "deterministic_fake=True or plug a real decoder into "
            "extract_features(decoder=...)"
        )
    d = hashlib.md5(payload).digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    duration = round(d[2] / 16.0, 3) if modality in ("audio", "video") else 0.0
    feature = [round(b / 255.0, 6) for b in d[:8]]
    return width, height, duration, feature


def extract_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    modality: str = "image",
    deterministic_fake: bool = False,
    batch_hint: int = 1024,
    decoder: Callable[[bytes, str], tuple] | None = None,
) -> DataFrame:
    """Decode + featurize every asset via mapInPandas.

    ``decoder`` is the pluggable decode kernel: a picklable callable
    ``(payload: bytes, modality: str) -> (width, height, duration_s,
    feature: list[float])`` shipped to the executors and applied inside
    the Arrow batch loop — wrap PIL/soundfile/ffmpeg here. When absent,
    :func:`decode_stub` is used (``deterministic_fake`` for the tested
    fake, else a clear capability error).

    Scale shape: narrow map over existing partitions (no shuffle, no
    driver traffic); each Arrow batch carries ≤ ``batch_hint`` assets so
    executor memory is bounded by batch × asset size, not partition
    size. Output follows FEATURE_SCHEMA.
    """
    kernel = decoder or (
        lambda payload, mod: decode_stub(payload, mod, deterministic_fake)
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "asset_id", "modality", "n_bytes", "digest",
                "width", "height", "duration_s", "feature",
            )}
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload)
                w, h, dur, feat = kernel(raw, modality)
                rows["asset_id"].append(asset_id)
                rows["modality"].append(modality)
                rows["n_bytes"].append(len(raw))
                rows["digest"].append(hashlib.md5(raw).hexdigest())
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_s"].append(dur)
                rows["feature"].append(feat)
            yield pd.DataFrame(rows)

    # asset_id keeps the INPUT id column's type (string paths from the
    # binaryFile source are ids too, not just numeric keys).
    id_type = df.schema[id_col].dataType
    schema = StructType(
        [StructField("asset_id", id_type)] + list(FEATURE_SCHEMA.fields[1:])
    )
    src = df.select(F.col(id_col), F.col(binary_col))
    return src.mapInPandas(
        run, schema, barrier=False
    ).withColumn("feature", F.col("feature").cast("array<double>"))


def frame_sample_plan(
    df: DataFrame,
    id_col: str,
    meta_col: str = "asset_meta",
    every_s: float = 1.0,
    max_frames: int = 16,
) -> DataFrame:
    """Frame-sampling plan for video assets: which timestamps to decode.

    Pure JVM expression (sequence + explode) — the expensive decode of
    the chosen frames then runs through :func:`extract_features`-style
    mapInPandas. Emitting the plan separately keeps the shuffle-free
    decode stage maximally parallel.
    """
    dur = F.col(f"{meta_col}.n_bytes") / F.lit(65536.0)  # stub duration proxy
    n = F.least(F.ceil(dur / every_s).cast("int"), F.lit(max_frames))
    # sequence is INCLUSIVE of both ends: 0..n-1 yields exactly n frames
    # (0..n would emit one frame over the max_frames cap).
    last = F.greatest(n - F.lit(1), F.lit(0))
    return (
        df.select(
            F.col(id_col), F.explode(F.sequence(F.lit(0), last)).alias("frame_idx")
        )
        .withColumn("sample_ts_s", F.col("frame_idx") * every_s)
    )


def transform_assets(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    kernel: "Callable[[bytes], bytes] | None" = None,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Payload → payload transform (resize / transcode / re-encode):
    the write-side twin of :func:`extract_features`, same Arrow-batched
    ``mapInPandas`` shape — binary in, binary out, partitioning
    untouched, no shuffle, memory bounded per batch.

    ``kernel`` is a picklable ``bytes -> bytes`` (wrap PIL resize or an
    ffmpeg transcode here). ``deterministic_fake=True`` installs a
    testable stand-in (truncate-to-half; min 1 byte for NON-empty
    input, empty stays empty — slicing b'' cannot produce a byte) so
    the distributed plumbing is exercised without codecs; with
    neither, a clear capability error is raised — not silence.

    Output: (id, <binary_col> transformed, n_bytes_in, n_bytes_out).
    """
    if kernel is None:
        if not deterministic_fake:
            raise NotImplementedError(
                "no transform kernel: pass kernel=(bytes -> bytes) "
                "wrapping your codec, or deterministic_fake=True for "
                "the test stand-in"
            )
        kernel = lambda b: b[: max(len(b) // 2, 1)]  # noqa: E731

    id_type = df.schema[id_col].dataType
    bin_type = df.schema[binary_col].dataType
    schema = StructType(
        [
            StructField(id_col, id_type),
            StructField(binary_col, bin_type),
            StructField("n_bytes_in", LongType()),
            StructField("n_bytes_out", LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_ids, out_bin, n_in, n_out = [], [], [], []
            for asset_id, payload in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(payload)
                new = kernel(raw)
                out_ids.append(asset_id)
                out_bin.append(new)
                n_in.append(len(raw))
                n_out.append(len(new))
            yield pd.DataFrame(
                {
                    id_col: out_ids, binary_col: out_bin,
                    "n_bytes_in": n_in, "n_bytes_out": n_out,
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema, barrier=False
    )


# --- Real decoders within stdlib reach ------------------------------------
#
# "No codecs installed" does not mean NO real decoding: WAV audio and
# uncompressed PPM/BMP images are decodable with the stdlib + numpy
# alone. These kernels make the decoder= path genuinely real for those
# formats — compressed formats (jpeg/png/mp4) still raise the
# capability error until a real codec is plugged in.


def decode_wav(payload: bytes) -> tuple[int, int, float, list[float]]:
    """PCM WAV via the stdlib ``wave`` module: (0, 0, duration_s,
    [rms, zero_crossing_rate, peak, dc_offset]) with amplitudes
    normalized to [-1, 1]. 8/16-bit PCM only (the wave module's own
    coverage)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        nframes = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        raw = w.readframes(nframes)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype="u1").astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    if x.size == 0:
        return 0, 0, 0.0, [0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return (
        0,
        0,
        nframes / float(rate),
        [rms, zcr, float(np.max(np.abs(x))), float(np.mean(x))],
    )


def decode_ppm(payload: bytes) -> tuple[int, int, float, list[float]]:
    """Binary PPM (P6): (width, height, 0.0, per-channel mean+std in
    [0,1]). Pure byte parsing — header tokens may be separated by any
    whitespace and ``#`` comments."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise NotImplementedError("not a binary PPM (P6) payload")
    # tokenize header: magic, width, height, maxval; comments run to EOL
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] not in (10, 13):
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(int(payload[start:i]))
    i += 1  # single whitespace after maxval, then raw data
    w, h, maxval = tokens
    if maxval > 255:
        # 16-bit-per-sample P6 stores 2 bytes/sample; parsing it as u1
        # would silently return garbage channel stats.
        raise NotImplementedError(
            f"PPM maxval {maxval} > 255 (16-bit samples) unsupported"
        )
    px = np.frombuffer(payload, dtype="u1", count=w * h * 3, offset=i)
    rgb = px.reshape(h, w, 3).astype(np.float64) / float(maxval)
    means = rgb.mean(axis=(0, 1))
    stds = rgb.std(axis=(0, 1))
    return w, h, 0.0, [*map(float, means), *map(float, stds)]


def decode_bmp(payload: bytes) -> tuple[int, int, float, list[float]]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): (width, height, 0.0,
    per-channel BGR→RGB means in [0,1]). Rows are 4-byte padded;
    negative biHeight means top-down (sign only affects row order,
    which channel means ignore)."""
    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise NotImplementedError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    height = abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype="u1", count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : w * 3]
    bgr = rows.reshape(height, w, 3).astype(np.float64) / 255.0
    means = bgr.mean(axis=(0, 1))[::-1]  # BGR storage → RGB report
    return w, height, 0.0, [float(m) for m in means]


def stdlib_decoder(payload: bytes, modality: str):
    """Magic-byte dispatching decode kernel for the formats decodable
    WITHOUT external codecs — plug straight into
    ``extract_features(decoder=stdlib_decoder)``. Anything else raises
    the capability error (jpeg/png/mp4 need PIL/ffmpeg)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        f"no stdlib decoder for this payload (modality={modality!r}, "
        f"magic={payload[:4]!r}); install/wrap a real codec via decoder="
    )


def _parse_ppm(payload: bytes) -> tuple[int, int, int, int]:
    """Header parse shared by decode/resize: returns (w, h, maxval,
    data_offset). Same whitespace/comment rules as :func:`decode_ppm`."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("not a binary PPM (P6) payload")
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] not in (10, 13):
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(int(payload[start:i]))
    i += 1
    w, h, maxval = tokens
    return w, h, maxval, i


def resize_ppm_kernel(target_w: int, target_h: int):
    """REAL image-resize kernel for binary PPM (P6): nearest-neighbor
    resample in numpy, re-encoded as P6 — a genuinely executable
    decode → transform → encode path with zero external codecs, the
    proof shape for :func:`transform_assets` (swap in a PIL/ffmpeg
    wrapper for jpeg/mp4; the Spark-side plumbing is identical).

    Nearest-neighbor site selection is the standard floor((i+0.5)·
    src/dst) center mapping — deterministic, no resampling filter
    floats. 8-bit samples only (same guard as decode_ppm)."""
    import numpy as np

    tw, th = int(target_w), int(target_h)
    if tw < 1 or th < 1:
        raise ValueError("target dims must be >= 1")

    def kernel(payload: bytes) -> bytes:
        w, h, maxval, off = _parse_ppm(payload)
        if maxval > 255:
            raise NotImplementedError("16-bit PPM unsupported")
        px = np.frombuffer(payload, dtype="u1", count=w * h * 3, offset=off)
        img = px.reshape(h, w, 3)
        rows = np.minimum((np.arange(th) + 0.5) * h / th, h - 1).astype(int)
        cols = np.minimum((np.arange(tw) + 0.5) * w / tw, w - 1).astype(int)
        out = img[rows][:, cols]
        header = f"P6\n{tw} {th}\n{maxval}\n".encode()
        return header + out.tobytes()

    return kernel
