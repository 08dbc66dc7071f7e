"""Count-min frequency sketch (sketches.py cms_*)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.sketches import (
    cms_bucket,
    cms_estimate,
    cms_merge,
    cms_partition_sketch,
)


def _py_bucket(value, r, width, seed="cms"):
    h = hashlib.md5(f"{seed}:{r}:{value}".encode()).hexdigest()
    return int(h[:8], 16) % width


@pytest.fixture(scope="module")
def corpus(spark):
    # skewed frequencies: value i appears i+1 times, i in 0..19
    rows = [(f"v{i}",) for i in range(20) for _ in range(i + 1)]
    rows.append((None,))  # nulls are excluded, not hashed
    return spark.createDataFrame(rows, "s string").repartition(6)


def test_bucket_matches_python_md5(spark):
    df = spark.createDataFrame([("abc",), ("v7",), ("",)], "s string")
    got = df.select(
        "s", *[cms_bucket("s", r, 64).alias(f"b{r}") for r in range(3)]
    ).collect()
    for row in got:
        for r in range(3):
            assert row[f"b{r}"] == _py_bucket(row["s"], r, 64)


def test_estimate_is_exact_without_collisions(spark, corpus):
    # width >> distinct values: every estimate equals the true count
    sk = cms_merge(cms_partition_sketch(corpus, "s", width=2048))
    keys = spark.createDataFrame([(f"v{i}",) for i in range(20)], "s string")
    got = {r["s"]: r["est"] for r in cms_estimate(keys, sk, "s").collect()}
    assert got == {f"v{i}": i + 1 for i in range(20)}


def test_estimate_never_underestimates_under_collisions(spark, corpus):
    # width 4 forces collisions: est >= truth, and equals the brute-
    # force replay of the min rule
    d, w = 3, 4
    sk = cms_merge(cms_partition_sketch(corpus, "s", depth=d, width=w))
    keys = spark.createDataFrame([(f"v{i}",) for i in range(20)], "s string")
    got = {r["s"]: r["est"] for r in cms_estimate(keys, sk, "s").collect()}
    # python replay
    counters = [[0] * w for _ in range(d)]
    for i in range(20):
        for _ in range(i + 1):
            for r in range(d):
                counters[r][_py_bucket(f"v{i}", r, w)] += 1
    for i in range(20):
        expect = min(counters[r][_py_bucket(f"v{i}", r, w)] for r in range(d))
        assert got[f"v{i}"] == expect
        assert got[f"v{i}"] >= i + 1


def test_merge_equals_single_shot(spark, corpus):
    # per-group sketches merged cellwise == the one-shot sketch
    grouped = cms_partition_sketch(
        corpus.withColumn("part", F.crc32(F.coalesce(F.col("s"), F.lit(""))) % 3),
        "s",
        group_cols=["part"],
        width=256,
    )
    merged = cms_merge(grouped)
    single = cms_merge(cms_partition_sketch(corpus, "s", width=256))
    a = merged.select("__cms", "__cms_n").first()
    b = single.select("__cms", "__cms_n").first()
    assert a["__cms"] == b["__cms"] and a["__cms_n"] == b["__cms_n"]


def test_n_counts_nonnull_rows(corpus):
    sk = cms_merge(cms_partition_sketch(corpus, "s", width=256))
    assert sk.first()["__cms_n"] == sum(i + 1 for i in range(20))


def test_partition_independence(spark, corpus):
    a = cms_merge(cms_partition_sketch(corpus.repartition(13), "s", width=128))
    b = cms_merge(cms_partition_sketch(corpus.coalesce(1), "s", width=128))
    assert a.first()["__cms"] == b.first()["__cms"]


def test_mixed_params_fence_is_loud(spark, corpus):
    a = cms_partition_sketch(corpus, "s", width=128)
    b = cms_partition_sketch(corpus, "s", width=256)
    with pytest.raises(Exception, match="mixes CMS parameters"):
        cms_merge(a.unionByName(b)).select("__cms").collect()


def test_estimate_needs_one_row(spark, corpus):
    two = cms_partition_sketch(
        corpus.withColumn("g", F.lit(1)), "s", group_cols=["g"], width=128
    ).unionByName(
        cms_partition_sketch(
            corpus.withColumn("g", F.lit(2)), "s", group_cols=["g"], width=128
        )
    )
    keys = spark.createDataFrame([("v1",)], "s string")
    with pytest.raises(ValueError, match="ONE merged sketch row"):
        cms_estimate(keys, two.drop("g"), "s")


def test_nonpositive_params_are_loud(corpus):
    """review-found: a negative width built a garbage sketch whose
    estimates silently UNDERESTIMATED — the one CMS guarantee."""
    for d, w in ((0, 64), (-1, 64), (4, 0), (4, -64)):
        with pytest.raises(ValueError, match=">= 1"):
            cms_partition_sketch(corpus, "s", depth=d, width=w)


def test_depth_one_estimates(spark, corpus):
    sk = cms_merge(cms_partition_sketch(corpus, "s", depth=1, width=2048))
    keys = spark.createDataFrame([("v5",)], "s string")
    assert cms_estimate(keys, sk, "s").first()["est"] == 6


def test_empty_merged_frame_is_loud(spark, corpus):
    empty = cms_merge(
        cms_partition_sketch(corpus, "s", width=64).where(F.lit(False))
    )
    keys = spark.createDataFrame([("v5",)], "s string")
    with pytest.raises(ValueError, match="EMPTY merged sketch"):
        cms_estimate(keys, empty, "s")


def test_null_key_estimates_null(spark, corpus):
    sk = cms_merge(cms_partition_sketch(corpus, "s", width=256))
    keys = spark.createDataFrame([(None,), ("v3",)], "s string")
    got = {r["s"]: r["est"] for r in cms_estimate(keys, sk, "s").collect()}
    assert got[None] is None and got["v3"] == 4


def test_no_udf(spark, corpus):
    sk = cms_partition_sketch(corpus, "s", width=128)
    assert not has_python_udf(sk)
    merged = cms_merge(sk)
    keys = spark.createDataFrame([("v1",)], "s string")
    assert not has_python_udf(cms_estimate(keys, merged, "s"))
