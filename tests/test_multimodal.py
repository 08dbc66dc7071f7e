import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    frame_sample_plan,
    make_media_fixture,
)


def test_fixture_schema(spark):
    media = make_media_fixture(spark, 50)
    assert media.count() == 50
    f = {x.name: x.dataType.simpleString() for x in media.schema.fields}
    assert f["payload"] == "binary"
    assert f["meta"].startswith("struct<width:int")
    assert set(r["kind"] for r in media.select("kind").distinct().collect()) == {
        "image", "audio", "video",
    }


def test_extract_features_arrow_batched(spark):
    media = make_media_fixture(spark, 40)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 40
    for r in rows[:5]:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        n = sum(x * x for x in r["feature"]) ** 0.5
        assert abs(n - 1.0) < 1e-5  # unit-norm fake feature
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again[rows[0]["media_id"]] == rows[0]["feature"]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="decoder-agnostic"):
        decode_image(b"notanimage")


def test_frame_sample_plan(spark):
    media = make_media_fixture(spark, 30)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    vids = media.where(F.col("kind") == "video").select(
        "media_id", (F.greatest((F.col("meta.duration_ms") / 1000).cast("int"), F.lit(1))).alias("n")
    ).collect()
    expect = {r["media_id"]: r["n"] for r in vids}
    got = {}
    for r in rows:
        got[r["media_id"]] = got.get(r["media_id"], 0) + 1
    assert got == expect


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00" + b"\x00" * 8
    )


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _jpeg(w, h):
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"
    )


def _wav(rate):
    return (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + b"\x00" * 8
    )


def test_sniff_mime_and_dimensions(spark):
    """Container introspection on REAL header bytes — no media library:
    magic-byte mime, PNG/GIF dims as pure column algebra, JPEG dims
    via the Arrow-batched SOF walk, WAV sample rate."""
    from pyspark.sql import functions as F

    from pandera_forge_spark.operators.multimodal import (
        image_dimensions,
        sniff_mime,
        wav_sample_rate,
    )

    rows = [
        ("png", _png(640, 480)),
        ("gif", _gif(320, 200)),
        ("jpg", _jpeg(1024, 768)),
        ("wav", _wav(44100)),
        ("junk", b"\x00\x01\x02 random bytes"),
        ("empty", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")

    mimes = {
        r["media_id"]: r["mime"]
        for r in df.select("media_id", sniff_mime(F.col("payload")).alias("mime")).collect()
    }
    assert mimes["png"] == "image/png"
    assert mimes["gif"] == "image/gif"
    assert mimes["jpg"] == "image/jpeg"
    assert mimes["wav"] == "audio/wav"
    assert mimes["junk"] == "application/octet-stream"

    dims = {
        r["media_id"]: (r["width"], r["height"]) for r in image_dimensions(df).collect()
    }
    assert dims["png"] == (640, 480)
    assert dims["gif"] == (320, 200)
    assert dims["jpg"] == (1024, 768)
    assert dims["wav"] == (None, None)

    rates = {
        r["media_id"]: r["sr"]
        for r in df.select(
            "media_id", wav_sample_rate(F.col("payload")).alias("sr")
        ).collect()
    }
    assert rates["wav"] == 44100 and rates["png"] is None


def test_mime_sniff_stays_jvm_side(spark):
    """sniff_mime / png_dimensions must not introduce Python eval."""
    from pyspark.sql import functions as F

    from pandera_forge_spark.operators.multimodal import (
        png_dimensions,
        sniff_mime,
    )
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([("a", b"\x89PNG\r\n\x1a\n")], "id string, payload binary")
    out = df.select(
        sniff_mime(F.col("payload")).alias("m"),
        png_dimensions(F.col("payload")).alias("d"),
    )
    assert not has_python_udf(out)


def test_jpeg_fill_bytes_before_marker():
    """Spec-legal 0xFF padding before a marker must not desync the SOF
    walk (ADVICE r2: the pad byte was read as a marker and its bytes as
    a segment length, mis-advancing past the SOF)."""
    from pandera_forge_spark.operators.multimodal import _jpeg_dims_py

    plain = _jpeg(640, 480)
    assert _jpeg_dims_py(plain) == [640, 480]

    # insert two fill bytes before the SOF marker: ...\xff\xff\xff\xc0
    sof = plain.index(b"\xff\xc0")
    padded = plain[:sof] + b"\xff\xff" + plain[sof:]
    assert _jpeg_dims_py(padded) == [640, 480]

    # fill bytes before APP0 too (straight after SOI)
    padded2 = plain[:2] + b"\xff\xff\xff" + plain[2:]
    assert _jpeg_dims_py(padded2) == [640, 480]


# ------------------------------------------------------------ media_dup_groups


def test_media_dup_groups_finds_content_dups(spark):
    import hashlib

    from pandera_forge_spark.operators.multimodal import media_dup_groups

    rows = [
        ("m1", b"\x00\x01BYTES"),
        ("m2", b"\x00\x01BYTES"),   # exact dup of m1
        ("m3", b"other"),
        ("m4", b"\x00\x01BYTES"),   # third copy
        ("m5", None),                # null drops
        ("m6", b"other"),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["content_md5"]: r for r in media_dup_groups(df).collect()}
    h1 = hashlib.md5(b"\x00\x01BYTES").hexdigest()
    h2 = hashlib.md5(b"other").hexdigest()
    assert set(got) == {h1, h2}
    assert got[h1]["n_copies"] == 3
    assert got[h1]["canonical_id"] == "m1"
    assert got[h1]["n_bytes"] == 7
    assert got[h2]["n_copies"] == 2 and got[h2]["canonical_id"] == "m3"
    # min_copies raises the bar
    assert media_dup_groups(df, min_copies=3).count() == 1


def test_media_dup_groups_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.multimodal import media_dup_groups
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([("m1", b"x")], "media_id string, payload binary")
    assert not has_python_udf(media_dup_groups(df))
    with pytest.raises(ValueError, match="min_copies"):
        media_dup_groups(df, min_copies=1)
    with pytest.raises(ValueError, match="missing"):
        media_dup_groups(df, id_col="nope")
    s = spark.createDataFrame([("m1", "x")], "media_id string, payload string")
    with pytest.raises(ValueError, match="expected binary"):
        media_dup_groups(s)
