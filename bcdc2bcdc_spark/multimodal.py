"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested. Decode status, honestly:

* **REAL decode for uncompressed containers**: RIFF/WAVE PCM audio
  (stdlib ``wave`` + numpy frombuffer — ``decode_wav``) and 24-bit
  uncompressed BMP images (struct header parse + numpy, including row
  padding and bottom-up row order — ``decode_bmp``), each with a
  matching encoder so the round trip exercises the actual byte format.
* **STUBBED for compressed codecs** (JPEG/PNG/MP3/H.264): PIL/ffmpeg
  are not in this container, so ``_fake_decode`` remains the documented
  deterministic stand-in on the generic path. Swap it for the real
  library at deploy time; nothing else changes.

Scale notes baked into the design:
* media bytes stay in ONE binary column → Parquet keeps them out of every
  scan that doesn't select the column (column pruning does the heavy
  lifting; metadata-only queries never touch pixels).
* decode runs in ``mapInPandas`` so each task streams Arrow batches —
  bound batch bytes with ``spark.sql.execution.arrow.maxRecordsPerBatch``
  against large blobs.
* repartition by size before decode: one giant video must not serialize a
  whole task's batch — ``partition_by_cost`` spreads rows by byte weight.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("data", T.BinaryType(), True),  # opaque payload
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from sha256
    streams (column-expression generated, then packed to binary)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.xxhash64(F.lit(seed), "id"), 3) + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64(F.lit(seed), "id", F.lit("w")), 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.lit(seed), "id", F.lit("h")), 1080) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.lit(seed), "id", F.lit("d")), 60000)).alias("duration_ms"),
        F.to_binary(
            F.repeat(F.sha2(F.concat(F.lit(seed), F.col("id")), 256), 4), F.lit("utf-8")
        ).alias("data"),
    )
    return df


def _fake_decode(data: bytes | None, kind: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: a dim-float
    feature derived from the payload digest. Replace with a real decoder
    (PIL image resize / audio frame sample) in production.

    NOTE deliberately deterministic so tests and replays converge."""
    if data is None:
        return [0.0] * dim
    h = hashlib.sha256(bytes(data) + kind.encode()).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(df: DataFrame, dim: int = 8, batch_limit: int | None = None) -> DataFrame:
    """Decode/feature-extract every media row via Arrow-batched mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda b: 0 if b is None else len(b)),
                    "sha256": pdf["data"].map(
                        lambda b: hashlib.sha256(b"" if b is None else bytes(b)).hexdigest()
                    ),
                    "feature": [
                        _fake_decode(d, k, dim)
                        for d, k in zip(pdf["data"], pdf["kind"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def partition_by_cost(df: DataFrame, bytes_col_expr=None, target_partition_bytes: int = 64 << 20) -> DataFrame:
    """Spread rows so each partition carries ~target bytes of media —
    range-partition on cumulative cost rank, cheap proxy: repartition by
    a hash salted with the byte size bucket so huge blobs scatter."""
    size = bytes_col_expr if bytes_col_expr is not None else F.octet_length("data")
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    bucket = F.pmod(
        F.xxhash64(F.col("media_id"), (size / F.lit(target_partition_bytes)).cast("long")),
        F.lit(n_parts),
    )
    return df.repartition(n_parts, bucket)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (real decoder would attach the frame). Pure column expressions:
    sequence + explode — demonstrates the fan-out shape without media libs."""
    ts = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(ts).alias("frame_ts_ms"))
    )


# ---------------------------------------------------------------------------
# REAL codecs for uncompressed containers (no external libs needed)
# ---------------------------------------------------------------------------

import io
import struct
import wave as _wave

import numpy as np

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sample_min", T.LongType(), False),
        T.StructField("sample_max", T.LongType(), False),
        T.StructField("sample_sum", T.LongType(), False),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
    ]
)


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """int16 mono PCM → a complete RIFF/WAVE file (stdlib writer)."""
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> dict:
    """REAL WAV decode: container parse via stdlib ``wave``, PCM samples
    via numpy. Integer features only (min/max/sum are exact — no float
    parity risk between engines)."""
    with _wave.open(io.BytesIO(bytes(data)), "rb") as w:
        n_channels = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got sampwidth={width}")
    samples = np.frombuffer(raw, dtype="<i2")
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        # FRAMES, not interleaved samples (identical for mono); min/max/
        # sum intentionally span all channels
        "n_samples": int(samples.size) // max(n_channels, 1),
        "sample_min": int(samples.min()) if samples.size else 0,
        "sample_max": int(samples.max()) if samples.size else 0,
        "sample_sum": int(samples.sum(dtype=np.int64)),
    }


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB array → a complete 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR byte order, rows padded to
    4 bytes, stored bottom-up — the actual on-disk format)."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * h
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1]  # RGB → BGR
        body += row.astype(np.uint8).tobytes() + b"\x00" * pad
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return bytes(header) + info + bytes(body)


def decode_bmp(data: bytes) -> dict:
    """REAL BMP decode: header fields parsed with struct, pixel rows
    (padded, bottom-up, BGR) recovered with numpy. Integer channel sums
    — exact, engine-portable."""
    data = bytes(data)
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    magic, _fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", data, 0)
    hsize, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})")
    # negative biHeight = valid top-down variant (rows stored top-first)
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if off + h * stride > len(data):
        raise ValueError(
            f"truncated BMP: need {off + h * stride} bytes, have {len(data)}"
        )
    rows = []
    for y in range(h):
        start = off + y * stride
        rows.append(np.frombuffer(data, dtype=np.uint8, count=row_bytes, offset=start).reshape(w, 3))
    # bottom-up storage (positive height): last stored row is the top row
    img = np.stack(rows if top_down else rows[::-1])  # (h, w, 3) in BGR
    return {
        "width": int(w),
        "height": int(h),
        "sum_r": int(img[:, :, 2].sum(dtype=np.int64)),
        "sum_g": int(img[:, :, 1].sum(dtype=np.int64)),
        "sum_b": int(img[:, :, 0].sum(dtype=np.int64)),
    }


def synth_wav_samples(media_id: int) -> "np.ndarray":
    """Deterministic int16 waveform for a media id — closed-form modular
    arithmetic so an independent engine can recompute every feature:
    n = 200 + id%800; s[i] = (id*7919 + i*104729) % 65521 - 32760."""
    n = 200 + media_id % 800
    i = np.arange(n, dtype=np.int64)
    return ((media_id * 7919 + i * 104729) % 65521 - 32760).astype(np.int16)


def synth_bmp_pixels(media_id: int) -> "np.ndarray":
    """Deterministic RGB image for a media id: w = 4 + id%29 (exercises
    row padding: w*3 is not a multiple of 4 for most ids), h = 3 + id%17,
    channel(x, y) closed-form mod-256."""
    w = 4 + media_id % 29
    h = 3 + media_id % 17
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (media_id * 11 + 2 * x + y) % 256
    g = (media_id * 5 + x + 2 * y) % 256
    b = (media_id + 3 * x + 7 * y) % 256
    return np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8)


def audio_features(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Arrow-batched REAL WAV decode over a binary column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[data_col]):
                d = decode_wav(blob)
                d["media_id"] = mid
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return df.mapInPandas(fn, schema=AUDIO_FEATURE_SCHEMA)


def image_features(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Arrow-batched REAL BMP decode over a binary column."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[data_col]):
                d = decode_bmp(blob)
                d["media_id"] = mid
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields])

    return df.mapInPandas(fn, schema=IMAGE_FEATURE_SCHEMA)


def synth_wav_table(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) → (media_id, data: REAL WAV bytes), built in mapInPandas so
    encoding scales with the data, never the driver."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "data": [
                        encode_wav(synth_wav_samples(int(m))) for m in pdf[id_col]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(fn, schema=schema)


def synth_bmp_table(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) → (media_id, data: REAL BMP bytes) via mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "data": [
                        encode_bmp(synth_bmp_pixels(int(m))) for m in pdf[id_col]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(fn, schema=schema)
