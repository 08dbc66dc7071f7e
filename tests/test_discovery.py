"""Join-key discovery (operators/discovery.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.discovery import (
    column_value_sets,
    join_key_candidates,
)
from pandera_forge_spark.plans.inspect import has_python_udf


@pytest.fixture(scope="module")
def catalog(spark):
    dim = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5), (3, "c", 2.5)],
        "dim_id long, name string, weight double",
    )
    fact = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 2), (14, 3), (15, None)],
        "fact_id long, fk int",
    )
    other = spark.createDataFrame(
        [(100, "x"), (101, "y")], "other_id long, tag string"
    )
    return {"dim": dim, "fact": fact, "other": other}


def test_fk_discovered_across_int_widths(catalog):
    out = {
        (r["table_a"], r["col_a"], r["table_b"], r["col_b"]): r
        for r in join_key_candidates(catalog, min_containment=0.9).collect()
    }
    # fk (int) ⊆ dim_id (bigint): containment 1.0 despite the width gap.
    key = ("dim", "dim_id", "fact", "fk")
    assert key in out
    r = out[key]
    assert (r["distinct_a"], r["distinct_b"], r["overlap"]) == (3, 3, 3)
    assert r["containment"] == 1.0
    assert r["jaccard"] == 1.0


def test_unrelated_columns_filtered(catalog):
    got = {
        (r["table_a"], r["col_a"], r["table_b"], r["col_b"])
        for r in join_key_candidates(catalog, min_containment=0.5).collect()
    }
    assert ("dim", "name", "other", "tag") not in got
    assert ("dim", "dim_id", "other", "other_id") not in got


def test_double_column_excluded_by_default(catalog):
    vals = column_value_sets(catalog)
    cols = {(r["tbl"], r["col"]) for r in vals.select("tbl", "col").distinct().collect()}
    assert ("dim", "weight") not in cols
    assert ("dim", "dim_id") in cols and ("fact", "fk") in cols


def test_explicit_cols_override(catalog):
    out = join_key_candidates(
        catalog,
        cols={"dim": ["dim_id"], "fact": ["fk"], "other": []},
        min_containment=0.9,
    ).collect()
    assert len(out) == 1
    assert (out[0]["table_a"], out[0]["col_a"]) == ("dim", "dim_id")


def test_nulls_are_not_key_values(catalog):
    vals = column_value_sets(catalog, cols={"fact": ["fk"], "dim": [], "other": []})
    assert vals.where(F.col("value").isNull()).count() == 0
    assert vals.count() == 3  # 1, 2, 3 — the NULL fk row contributes nothing


def test_within_table_pair_reported(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "emp_id long, manager_id long"
    )
    out = join_key_candidates({"emp": df}, min_containment=0.9).collect()
    assert len(out) == 1
    assert (out[0]["col_a"], out[0]["col_b"]) == ("emp_id", "manager_id")


def test_partial_containment_direction(spark):
    """Containment divides by the SMALLER distinct count — subset
    direction reads off which side that is."""
    parent = spark.createDataFrame([(i,) for i in range(10)], "pk long")
    child = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 99)], "fk long")
    out = join_key_candidates(
        {"parent": parent, "child": child}, min_containment=0.5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["distinct_a"], r["distinct_b"], r["overlap"]) == (5, 10, 4)
    assert r["containment"] == pytest.approx(4 / 5)
    assert r["jaccard"] == pytest.approx(4 / 11)


def test_fences(catalog, spark):
    with pytest.raises(ValueError, match="missing"):
        join_key_candidates(catalog, cols={"dim": ["nope"]})
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        join_key_candidates(catalog, min_containment=1.5)
    with pytest.raises(ValueError, match="at least one table"):
        join_key_candidates({})
    nested = spark.createDataFrame([(1, [1, 2])], "id long, xs array<long>")
    with pytest.raises(ValueError, match="nested"):
        join_key_candidates({"t": nested}, cols={"t": ["xs"]})


def test_plan_udf_free(catalog):
    # eager=False keeps the real operator plan visible (eager mode
    # returns a checkpointed frame whose plan is just the cached scan).
    lazy = join_key_candidates(catalog, min_containment=0.9, eager=False)
    assert not has_python_udf(lazy)


def test_eager_and_lazy_agree(catalog):
    key = lambda r: (r["table_a"], r["col_a"], r["table_b"], r["col_b"])
    eager = {key(r): r for r in join_key_candidates(catalog, min_containment=0.5).collect()}
    lazy = {
        key(r): r
        for r in join_key_candidates(
            catalog, min_containment=0.5, eager=False
        ).collect()
    }
    assert eager.keys() == lazy.keys()
    for k in eager:
        assert eager[k] == lazy[k]
