"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested; the actual media decode is STUBBED
(``decoder=None`` uses a deterministic fake; the image/audio libraries are
not in this container). Swap ``_fake_decode`` for PIL/ffmpeg at deploy
time; nothing else changes.

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
