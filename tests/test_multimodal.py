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
