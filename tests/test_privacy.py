"""k-anonymity / l-diversity audits (operators/privacy.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.privacy import (
    k_anonymity_summary,
    k_anonymity_violations,
    l_diversity_violations,
)
from pandera_forge_spark.plans.inspect import has_python_udf


@pytest.fixture(scope="module")
def people(spark):
    # (zip, age_band, diagnosis): group sizes 3 / 2 / 1 / 1-with-null-QI;
    # the size-3 group is sensitive-homogeneous (l-diversity violation).
    rows = [
        (1, "10001", "30-39", "flu"),
        (2, "10001", "30-39", "flu"),
        (3, "10001", "30-39", "flu"),
        (4, "10002", "40-49", "flu"),
        (5, "10002", "40-49", "cold"),
        (6, "10003", "20-29", "flu"),
        (7, None, "20-29", "cold"),
        (8, None, "20-29", None),
    ]
    return spark.createDataFrame(
        rows, "id long, zip string, age string, diagnosis string"
    )


def test_k_anonymity_violations(people):
    got = {
        (r["zip"], r["age"]): r["group_size"]
        for r in k_anonymity_violations(people, ["zip", "age"], k=3).collect()
    }
    # size-3 group is NOT a violation at k=3; null zips group together.
    assert got == {("10002", "40-49"): 2, ("10003", "20-29"): 1, (None, "20-29"): 2}


def test_k_anonymity_empty_when_satisfied(people):
    assert k_anonymity_violations(people, ["zip", "age"], k=1).count() == 0


def test_k_anonymity_summary(people):
    row = k_anonymity_summary(people, ["zip", "age"], k=3).collect()[0]
    assert row["n_rows"] == 8
    assert row["n_groups"] == 4
    assert row["k_anonymity"] == 1  # the singleton 10003 group
    assert row["risky_groups"] == 3
    assert row["risky_rows"] == 5
    assert row["risky_row_ratio"] == pytest.approx(5 / 8)


def test_k_anonymity_summary_empty_input(people):
    row = k_anonymity_summary(people.where("id < 0"), ["zip"], k=3).collect()[0]
    assert (
        row["n_rows"],
        row["n_groups"],
        row["k_anonymity"],
        row["risky_groups"],
        row["risky_rows"],
        row["risky_row_ratio"],
    ) == (0, 0, 0, 0, 0, 0.0)


def test_l_diversity_violations(people):
    got = {
        (r["zip"], r["age"]): (r["group_size"], r["distinct_sensitive"])
        for r in l_diversity_violations(
            people, ["zip", "age"], "diagnosis", l=2
        ).collect()
    }
    # 10001 group: 3 rows, all flu. 10003: singleton. NULL-zip group has
    # one non-null sensitive row (the NULL diagnosis is excluded first).
    assert got == {
        ("10001", "30-39"): (3, 1),
        ("10003", "20-29"): (1, 1),
        (None, "20-29"): (1, 1),
    }


def test_l_diversity_satisfied_group_absent(people):
    out = l_diversity_violations(people, ["zip", "age"], "diagnosis", l=2)
    assert ("10002", "40-49") not in {
        (r["zip"], r["age"]) for r in out.collect()
    }


def test_fences(people):
    with pytest.raises(ValueError, match="missing"):
        k_anonymity_violations(people, ["nope"], k=2)
    with pytest.raises(ValueError, match="at least one"):
        k_anonymity_summary(people, [], k=2)
    with pytest.raises(ValueError, match=">= 1"):
        k_anonymity_violations(people, ["zip"], k=0)
    with pytest.raises(ValueError, match=">= 1"):
        l_diversity_violations(people, ["zip"], "diagnosis", l=0)
    with pytest.raises(ValueError, match="sensitive column cannot"):
        l_diversity_violations(people, ["zip", "diagnosis"], "diagnosis", l=2)


def test_plans_udf_free_and_distinct_expand_free(people):
    """All three audits stay JVM-side, and l-diversity's two-stage
    distinct plans WITHOUT a countDistinct Expand node."""
    from pandera_forge_spark.plans.inspect import has_expand

    for df in (
        k_anonymity_violations(people, ["zip", "age"], k=3),
        k_anonymity_summary(people, ["zip", "age"], k=3),
        l_diversity_violations(people, ["zip", "age"], "diagnosis", l=2),
    ):
        assert not has_python_udf(df)
    assert not has_expand(
        l_diversity_violations(people, ["zip", "age"], "diagnosis", l=2)
    )


def test_generalization_level_via_projection(spark):
    """Coarsening the QI (the caller's projection) flips a table from
    risky to anonymous — the intended generalization workflow."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 50).alias("fine"), (F.col("id") % 2).alias("coarse")
    )
    assert k_anonymity_violations(df, ["fine"], k=3).count() == 50
    assert k_anonymity_violations(df, ["coarse"], k=3).count() == 0
