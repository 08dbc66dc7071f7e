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
from pyspark.sql import Column, DataFrame
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


# ------------------------------------------------------- introspection
#
# Container-level media introspection needs NO media library — magic
# bytes and fixed-offset header fields are readable with plain binary
# slicing, so everything below is REAL (not stubbed) and, except for
# the JPEG marker walk, pure JVM column algebra inside whole-stage
# codegen: hex(substring(payload, pos, n)) against known constants.


def _hex_at(payload: "F.Column", pos: int, n: int) -> "F.Column":
    """Uppercase hex of n raw bytes at 1-based pos — substring works on
    BinaryType and stays JVM-side."""
    return F.hex(F.substring(payload, pos, n))


def _be_uint(payload: "F.Column", pos: int, n: int) -> "F.Column":
    """Big-endian unsigned int of n bytes at pos (conv hex→dec)."""
    return F.conv(_hex_at(payload, pos, n), 16, 10).cast("long")


def _le_uint(payload: "F.Column", pos: int, n: int) -> "F.Column":
    """Little-endian unsigned int: per-byte conv summed with powers of
    256 — n is tiny (2-4), so this unrolls to a few JVM expressions."""
    acc = F.lit(0).cast("long")
    for i in range(n):
        acc = acc + _be_uint(payload, pos + i, 1) * F.lit(256**i).cast("long")
    return acc


def sniff_mime(payload: "F.Column") -> "F.Column":
    """Magic-byte container detection on the raw binary column —
    first-match-wins over the standard signatures (PNG, JPEG, GIF87a/
    89a, WEBP, WAV, MP4 ftyp, Matroska/WebM, PDF). Unknown bytes →
    application/octet-stream."""
    return (
        F.when(_hex_at(payload, 1, 8) == "89504E470D0A1A0A", "image/png")
        .when(_hex_at(payload, 1, 3) == "FFD8FF", "image/jpeg")
        .when(
            _hex_at(payload, 1, 6).isin("474946383761", "474946383961"),
            "image/gif",
        )
        .when(
            (_hex_at(payload, 1, 4) == "52494646")
            & (_hex_at(payload, 9, 4) == "57454250"),
            "image/webp",
        )
        .when(
            (_hex_at(payload, 1, 4) == "52494646")
            & (_hex_at(payload, 9, 4) == "57415645"),
            "audio/wav",
        )
        .when(_hex_at(payload, 5, 4) == "66747970", "video/mp4")
        .when(_hex_at(payload, 1, 4) == "1A45DFA3", "video/webm")
        .when(_hex_at(payload, 1, 4) == "25504446", "application/pdf")
        .otherwise("application/octet-stream")
    )


def png_dimensions(payload: "F.Column") -> "F.Column":
    """(width, height) from the PNG IHDR chunk — fixed offsets 17/21,
    big-endian u32. Null for non-PNG bytes."""
    is_png = _hex_at(payload, 1, 8) == "89504E470D0A1A0A"
    return F.when(
        is_png,
        F.struct(
            _be_uint(payload, 17, 4).cast("int").alias("width"),
            _be_uint(payload, 21, 4).cast("int").alias("height"),
        ),
    )


def gif_dimensions(payload: "F.Column") -> "F.Column":
    """(width, height) from the GIF logical screen descriptor — offsets
    7/9, little-endian u16."""
    is_gif = _hex_at(payload, 1, 6).isin("474946383761", "474946383961")
    return F.when(
        is_gif,
        F.struct(
            _le_uint(payload, 7, 2).cast("int").alias("width"),
            _le_uint(payload, 9, 2).cast("int").alias("height"),
        ),
    )


def wav_sample_rate(payload: "F.Column") -> "F.Column":
    """Sample rate from a canonical RIFF/WAVE fmt chunk (offset 25,
    little-endian u32). Null for non-WAV bytes."""
    is_wav = (_hex_at(payload, 1, 4) == "52494646") & (
        _hex_at(payload, 9, 4) == "57415645"
    )
    return F.when(is_wav, _le_uint(payload, 25, 4).cast("int"))


def _jpeg_dims_py(payload) -> "list | None":
    """Stdlib JPEG SOF marker walk — runs inside the Arrow-batched
    kernel below (JPEG has no fixed-offset dimensions, so a scan is
    unavoidable; it touches only the header bytes, not the scan data)."""
    if not payload or payload[:3] != b"\xff\xd8\xff":
        return None
    i, n = 2, len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:
            # spec-legal 0xFF fill bytes before a marker: skip ONE pad
            # byte (not two) so the real marker that follows is read as
            # a marker, not as segment-length bytes
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            return [w, h]
        i += 2 + seg_len
    return None


def image_dimensions(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Adds ``mime`` and ``width``/``height`` for image payloads: PNG
    and GIF decode as pure column algebra; JPEG rows go through ONE
    Arrow-batched pandas kernel (mapInPandas) that walks only header
    markers. No media library anywhere."""
    p = F.col(payload_col)
    with_mime = df.withColumn("mime", sniff_mime(p)).withColumn(
        "__dims", F.coalesce(png_dimensions(p), gif_dimensions(p))
    )

    out_schema = T.StructType(
        with_mime.schema.fields
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    jpeg_idx = [f.name for f in with_mime.schema.fields].index("mime")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            dims = b["__dims"]
            jpeg = b["mime"] == "image/jpeg"
            wh = [
                _jpeg_dims_py(pl) if j else None
                for j, pl in zip(jpeg, b[payload_col])
            ]
            b = b.copy()
            b["width"] = [
                (d["width"] if isinstance(d, dict) else None)
                if not j
                else (x[0] if x else None)
                for j, d, x in zip(jpeg, dims, wh)
            ]
            b["height"] = [
                (d["height"] if isinstance(d, dict) else None)
                if not j
                else (x[1] if x else None)
                for j, d, x in zip(jpeg, dims, wh)
            ]
            yield b

    assert jpeg_idx >= 0
    return with_mime.mapInPandas(kernel, schema=out_schema).drop("__dims")


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


def _md5_u32(s: Column) -> Column:
    """First 8 md5 hex chars as an unsigned 32-bit integer — the
    engine's standard engine-replayable uniform source (any SQL engine
    can md5, unlike seeded xxhash64), matching operators/sampling.py."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def make_media_fixture(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA.

    kind and duration_ms derive from md5 (not xxhash64) so a DuckDB
    oracle can re-derive the exact same rows in SQL — this is what lets
    ``frame_sample_plan``'s driver row be value-checked instead of
    rows-only."""
    sid = F.col("id").cast("string")
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (_md5_u32(F.concat(sid, F.lit(f"|kind|{seed}"))) % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload:"), F.md5(F.concat(sid, F.lit(seed)))),
        "utf-8",
    )
    return spark.range(n).select(
        F.concat(F.lit("m"), sid).alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (_md5_u32(F.concat(sid, F.lit(f"|dur|{seed}"))) % 5000 + 500)
            .cast("int")
            .alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def media_dup_groups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    min_copies: int = 2,
) -> DataFrame:
    """Exact duplicate detection for BINARY media payloads — the
    multimodal sibling of the text family's ``exact_dup_groups``: the
    same image/audio bytes uploaded under ten media_ids is ten times
    the storage, ten times the decode compute, and a training-mix
    skew, and none of the text dedup operators see a binary column.
    Membership is content identity (md5 of the raw bytes, computed
    JVM-side on the binary — no base64 detour, no UDF); the canonical
    survivor is the MIN id, the survivorship convention the dedup
    family uses throughout.

    Output: one row per duplicated payload —
    ``content_md5, n_copies, n_bytes, canonical_id`` — never the
    payload itself (the report frame stays KB-sized regardless of
    media size). Join back on ``content_md5`` (or semi-join
    ``md5(payload)``) to enumerate or drop members; no collect_list
    anywhere, so a payload duplicated a million times is still a
    constant-size aggregation buffer.

    Scale shape: ONE groupBy on the 32-hex digest (uniform by
    construction — content hashing is self-salting, no skew possible
    beyond true duplicate mass, which is the signal), algebraic
    count/min aggregates with map-side combine. NULL payloads drop
    (a missing blob is a nullability finding, not a duplicate)."""
    if int(min_copies) < 2:
        raise ValueError(
            f"media_dup_groups: min_copies must be >= 2, got {min_copies}"
        )
    for c in (payload_col, id_col):
        if c not in df.columns:
            raise ValueError(f"media_dup_groups: column {c!r} missing")
    dtype = dict(df.dtypes)[payload_col]
    if dtype != "binary":
        raise ValueError(
            f"media_dup_groups: payload column {payload_col!r} is "
            f"{dtype!r}, expected binary"
        )
    return (
        df.where(F.col(payload_col).isNotNull())
        .select(
            F.md5(F.col(payload_col)).alias("content_md5"),
            F.length(F.col(payload_col)).cast("long").alias("__nb"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("__nb").alias("n_bytes"),
            F.min("__id").alias("canonical_id"),
        )
        .where(F.col("n_copies") >= int(min_copies))
    )
