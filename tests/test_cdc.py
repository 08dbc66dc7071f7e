"""Changelog compaction and application (operators/cdc.py)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.cdc import apply_changelog, latest_by_key
from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf


@pytest.fixture(scope="module")
def changelog(spark):
    # (key, ts, seq, op, val): three generations for k1, delete for k2,
    # insert for k3, ts-tie broken by seq for k4, null-ts generation
    # loses for k5
    rows = [
        ("k1", 1.0, 1, "U", 10),
        ("k1", 3.0, 3, "U", 30),
        ("k1", 2.0, 2, "U", 20),
        ("k2", 5.0, 4, "D", None),
        ("k3", 1.0, 5, "U", 99),
        ("k4", 7.0, 6, "U", 70),
        ("k4", 7.0, 7, "U", 71),
        ("k5", None, 8, "U", -1),
        ("k5", 0.0, 9, "U", 50),
    ]
    return spark.createDataFrame(
        rows, "key string, ts double, seq int, op string, val int"
    )


def test_latest_by_key_picks_greatest_order(changelog):
    out = latest_by_key(changelog, ["key"], ["ts", "seq"])
    got = {r["key"]: (r["ts"], r["seq"], r["op"], r["val"]) for r in out.collect()}
    assert got["k1"] == (3.0, 3, "U", 30)
    assert got["k2"] == (5.0, 4, "D", None)
    assert got["k3"] == (1.0, 5, "U", 99)
    # ts tie -> seq breaks it
    assert got["k4"] == (7.0, 7, "U", 71)
    # NULL order value sorts lowest: the real timestamp wins
    assert got["k5"] == (0.0, 9, "U", 50)
    assert out.count() == 5


def test_latest_by_key_partition_independent(changelog):
    a = latest_by_key(changelog.repartition(7), ["key"], ["ts", "seq"])
    b = latest_by_key(changelog.coalesce(1), ["key"], ["ts", "seq"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_latest_by_key_explicit_payload(changelog):
    out = latest_by_key(changelog, ["key"], ["ts", "seq"], payload_cols=["val"])
    assert out.columns == ["key", "ts", "seq", "val"]


def test_latest_by_key_no_udf_no_sort(changelog):
    out = latest_by_key(changelog, ["key"], ["ts", "seq"])
    assert not has_python_udf(out)
    plan = executed_plan(out)
    # aggregate-shaped, not window-shaped: no per-key sort of all rows
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan or "SortAggregate" in plan


@pytest.fixture(scope="module")
def base(spark):
    rows = [("k1", 1), ("k2", 2), ("kx", 9), (None, 5)]
    return spark.createDataFrame(rows, "key string, val int")


def test_apply_changelog_upsert_delete_insert(base, changelog):
    out = apply_changelog(base, changelog, ["key"], ["ts", "seq"])
    got = {r["key"]: r["val"] for r in out.collect()}
    # k1 updated to its newest generation, k2 deleted, k3 inserted,
    # k4/k5 inserted, untouched kx and the null-key row pass through
    assert got == {"k1": 30, "k3": 99, "k4": 71, "k5": 50, "kx": 9, None: 5}


def test_apply_changelog_null_key_change(spark, base):
    changes = spark.createDataFrame(
        [(None, 1.0, 1, "U", 500)], "key string, ts double, seq int, op string, val int"
    )
    out = apply_changelog(base, changes, ["key"], ["ts", "seq"])
    got = {r["key"]: r["val"] for r in out.collect()}
    # null-safe: the NULL-key base row is REPLACED, not duplicated
    assert got[None] == 500
    assert out.where(F.col("key").isNull()).count() == 1


def test_apply_changelog_null_op_is_upsert(spark, base):
    changes = spark.createDataFrame(
        [("kx", 1.0, 1, None, 100)], "key string, ts double, seq int, op string, val int"
    )
    out = apply_changelog(base, changes, ["key"], ["ts", "seq"])
    assert {r["key"]: r["val"] for r in out.collect()}["kx"] == 100


def test_apply_changelog_delete_then_reinsert(spark, base):
    changes = spark.createDataFrame(
        [("kx", 1.0, 1, "D", None), ("kx", 2.0, 2, "U", 11)],
        "key string, ts double, seq int, op string, val int",
    )
    out = apply_changelog(base, changes, ["key"], ["ts", "seq"])
    assert {r["key"]: r["val"] for r in out.collect()}["kx"] == 11
    # and the reverse order of arrival deletes
    changes2 = spark.createDataFrame(
        [("kx", 2.0, 2, "D", None), ("kx", 1.0, 1, "U", 11)],
        "key string, ts double, seq int, op string, val int",
    )
    out2 = apply_changelog(base, changes2, ["key"], ["ts", "seq"])
    assert out2.where(F.col("key") == "kx").count() == 0


def test_apply_changelog_schema_and_guard(base, changelog, spark):
    out = apply_changelog(base, changelog, ["key"], ["ts", "seq"])
    assert out.columns == base.columns
    # a base column the changes can't rebuild is a loud error
    wider = base.withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="extra"):
        apply_changelog(wider, changelog, ["key"], ["ts", "seq"])


def test_apply_changelog_op_col_collision_is_loud(spark, changelog):
    """review-found: a base column named like op_col made the marker and
    the data column indistinguishable (and the old guard's suggested fix
    crashed on a duplicate struct field) — now a loud error up front."""
    base_with_op = spark.createDataFrame(
        [("k1", "keep", 1)], "key string, op string, val int"
    )
    with pytest.raises(ValueError, match="op_col"):
        apply_changelog(base_with_op, changelog, ["key"], ["ts", "seq"])


def test_apply_changelog_op_in_payload_cols_ok(base, changelog):
    # explicitly listing op_col in payload_cols must not duplicate the
    # struct field
    out = apply_changelog(
        base, changelog, ["key"], ["ts", "seq"], payload_cols=["val", "op"]
    )
    assert {r["key"]: r["val"] for r in out.collect()}["k1"] == 30


def test_apply_changelog_no_udf(base, changelog):
    out = apply_changelog(base, changelog, ["key"], ["ts", "seq"])
    assert not has_python_udf(out)


def test_latest_by_key_payload_overlap_is_loud(changelog):
    """review-found: a payload column that is also a key/order column
    would emit TWICE in the output (duplicate names, downstream
    crashes) — now a loud error."""
    with pytest.raises(ValueError, match="duplicate"):
        latest_by_key(changelog, ["key"], ["ts", "seq"], payload_cols=["ts", "val"])
    with pytest.raises(ValueError, match="duplicates"):
        latest_by_key(changelog, ["key"], ["ts", "seq"], payload_cols=["val", "val"])
