"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched decode / feature-extract operators.

Training-data-pipeline addition (build brief). Media libraries (PIL,
ffmpeg, torchaudio...) are NOT in this container, so the decode kernels
are STUBS — either a clearly-marked NotImplementedError or a
deterministic fake feature — but the Spark-side plumbing is real and
tested: schema, mapInPandas batch shape, Arrow transfer, partition
sizing. Swapping a stub for a real decoder changes one pandas function
and nothing else.

Scale notes: media blobs ride as parquet binary; decode runs
mapInPandas so each task streams Arrow batches (bounded memory
regardless of partition size). Keep blobs out of shuffles — join
metadata first, decode last. ``spark.sql.files.maxPartitionBytes``
governs blob-scan task sizing.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = "media_id string, kind string, n_bytes int, feature array<float>"


def decode_image(payload: bytes) -> "object":
    """Real image decode requires PIL/cv2 — not in this container."""
    raise NotImplementedError(
        "image decode stub: install Pillow and replace decode_image; "
        "the Spark plumbing (extract_features/mapInPandas) is decoder-agnostic"
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature: unit-norm vector derived from the
    payload digest. Lets the distributed plumbing (batching, schema,
    joins downstream) be tested for real."""
    d = hashlib.sha256(payload or b"").digest()
    raw = [int.from_bytes(d[2 * i : 2 * i + 2], "big") - 32768 for i in range(dim)]
    n = math.sqrt(sum(x * x for x in raw)) or 1.0
    return [x / n for x in raw]


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    mapInPandas: each executor task receives an iterator of pandas
    batches (bounded by spark.sql.execution.arrow.maxRecordsPerBatch),
    applies the vectorized kernel, yields result batches — no per-row
    Python at the Spark level, no driver collect."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": b["payload"].map(_fake_feature),
                }
            )

    return df.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into the frame
    timestamps a decoder would extract — array algebra (sequence), the
    decode itself being the stubbed kernel. Demonstrates the fan-out
    shape (one row → duration/every_ms rows) without the codec dep."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * every_ms,
            )
        ).alias("frame_ts_ms"),
    )


def make_media_fixture(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload:"), F.md5(F.concat(F.col("id").cast("string"), F.lit(seed)))),
        "utf-8",
    )
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(5000)) + 500)
            .cast("int")
            .alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )
