"""Drift fixture F7: partition B (shifted) must drift, a second seeded
draw of A must not."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.drift import (
    baseline_summary,
    drift_by_partition,
    drift_verdicts,
    psi_of,
)


def _normal(spark, n, mean, std, seed, label):
    # deterministic N(mean, std) via seeded rand -> Box-Muller-ish: use
    # randn with fixed seed (stable for a fixed partitioning)
    return (
        spark.range(n)
        .repartition(4)
        .select(
            F.lit(label).alias("part"),
            (F.randn(seed) * std + mean).alias("x"),
        )
    )


@pytest.fixture(scope="module")
def data(spark):
    a = _normal(spark, 20000, 0.0, 1.0, 1, "A")
    a2 = _normal(spark, 20000, 0.0, 1.0, 2, "A2")
    b = _normal(spark, 20000, 0.5, 1.2, 3, "B")
    return a, a.unionByName(a2).unionByName(b)


def test_baseline_summary(spark, data):
    a, _ = data
    s = baseline_summary(a, "x", bins=10)
    assert len(s["edges"]) == 9
    assert abs(sum(s["props"]) - 1.0) < 1e-6
    # median of N(0,1) near 0
    assert abs(s["edges"][4]) < 0.1
    # each quantile bin holds ~10%
    assert all(0.05 < p < 0.15 for p in s["props"])


def test_drift_detected_only_for_shifted(spark, data):
    a, both = data
    s = baseline_summary(a, "x", bins=10)
    out = {r["part"]: r for r in drift_verdicts(both, "x", ["part"], s).collect()}
    assert not out["A"]["drifted"]  # identical data: zero drift
    assert not out["A2"]["drifted"]  # fresh draw of same dist: below threshold
    assert out["B"]["drifted"]  # shifted dist: above threshold
    assert out["B"]["psi"] > 0.2 and out["A2"]["psi"] < 0.05
    assert out["B"]["ks"] > 0.1 and out["A2"]["ks"] < 0.03
    assert out["A"]["psi"] < 1e-9 and out["A"]["ks"] < 1e-9


def test_nulls_excluded(spark):
    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    s = baseline_summary(base, "x", bins=5)
    withnulls = spark.range(1000).select(
        F.lit("p").alias("part"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 100).cast("double")).alias("x"),
    )
    row = drift_by_partition(withnulls, "x", ["part"], s).collect()[0]
    assert row["n"] == 500
    assert row["psi"] < 0.05


def test_psi_of_helper():
    assert psi_of([0.5, 0.5], [0.5, 0.5]) == 0.0
    assert psi_of([0.9, 0.1], [0.5, 0.5]) > 0.2
