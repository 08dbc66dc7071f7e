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


# ------------------------------------------------------------ tokenize_columns


def test_tokenize_preserves_algebra_and_hides_values(spark):
    import hashlib

    from pandera_forge_spark.operators.privacy import tokenize_columns

    df = spark.createDataFrame(
        [(1, "a@x.com"), (2, "a@x.com"), (3, "b@y.org"), (4, None)],
        "id long, email string",
    )
    got = {r["id"]: r["email"] for r in tokenize_columns(df, ["email"], "s3cret").collect()}
    # equal in, equal out; unequal in, unequal out; NULL stays NULL
    assert got[1] == got[2] != got[3]
    assert got[4] is None
    assert "a@x.com" not in (got[1] or "")
    # exact keyed-hash replay
    expect = hashlib.sha256(b"s3cret:email:a@x.com").hexdigest()
    assert got[1] == expect


def test_tokenize_scope_and_fk_joinability(spark):
    from pandera_forge_spark.operators.privacy import tokenize_columns

    dim = spark.createDataFrame([(1,), (2,)], "k long")
    fact = spark.createDataFrame([(10, 1), (11, 2), (12, 1)], "id long, fk long")
    tdim = tokenize_columns(dim, ["k"], "s", scope="value")
    tfact = tokenize_columns(fact, ["fk"], "s", scope="value")
    joined = tfact.join(tdim, tfact.fk == tdim.k)
    assert joined.count() == 3  # RI algebra survives tokenization
    # scope='column' forks the tokens on purpose
    cdim = tokenize_columns(dim, ["k"], "s", scope="column")
    cfact = tokenize_columns(fact, ["fk"], "s", scope="column")
    assert cfact.join(cdim, cfact.fk == cdim.k).count() == 0


def test_tokenize_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.privacy import tokenize_columns
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = spark.createDataFrame([(1, "x")], "id long, v string")
    out = tokenize_columns(df, ["v"], "s", length=16)
    assert len(out.collect()[0]["v"]) == 16
    assert not has_python_udf(out)
    assert "Exchange" not in executed_plan(out)  # pure projection
    with pytest.raises(ValueError, match="non-empty"):
        tokenize_columns(df, [], "s")
    with pytest.raises(ValueError, match="salt"):
        tokenize_columns(df, ["v"], "")
    with pytest.raises(ValueError, match="scope"):
        tokenize_columns(df, ["v"], "s", scope="row")
    with pytest.raises(ValueError, match="length"):
        tokenize_columns(df, ["v"], "s", length=65)
    with pytest.raises(ValueError, match="lacks columns"):
        tokenize_columns(df, ["nope"], "s")
    f = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="float columns"):
        tokenize_columns(f, ["v"], "s")
