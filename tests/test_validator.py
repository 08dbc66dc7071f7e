from pyspark.sql import functions as F

from pandera_forge_spark.inference import infer_schema
from pandera_forge_spark.schema import Check, ColumnSpec, StringConstraints, TableSchema
from pandera_forge_spark.validator import (
    duplicate_keys,
    duplicate_rows,
    orphan_rows,
    validate_table,
    violation_rows,
)


def _schema():
    return TableSchema(
        name="T",
        columns=[
            ColumnSpec(
                name="id", sanitized_name="id", name_was_valid=True,
                spark_type="bigint", pandera_type="Int64",
                nullable=False, unique=True, ge=1, le=100,
            ),
            ColumnSpec(
                name="email", sanitized_name="email", name_was_valid=True,
                spark_type="string", pandera_type="String", nullable=False,
                string_constraints=StringConstraints(
                    pattern=r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",
                    pattern_name="email", min_length=5, max_length=50,
                ),
            ),
        ],
    )


def test_clean_table_passes(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co"), (2, "c@d.org"), (3, "e@f.net")], "id long, email string"
    )
    res = validate_table(df, _schema())
    assert res.ok
    assert res.error_message is None
    assert res.total_rows == 3
    assert all(v == 0 for v in res.counts.values())


def test_violations_counted_and_extracted(spark):
    df = spark.createDataFrame(
        [
            (1, "a@b.co"),
            (1, "dup-key-bad-email"),  # dup id + bad email
            (None, "c@d.org"),  # null id
            (500, "e@f.net"),  # out of range
        ],
        "id long, email string",
    )
    res = validate_table(df, _schema())
    assert not res.ok
    assert res.counts["id__not_null"] == 1
    assert res.counts["id__le"] == 1
    assert res.counts["id__ge"] == 0
    assert res.counts["id__unique"] == 2  # two rows share id=1
    assert res.counts["email__str_matches"] == 1
    assert "id__le: 1 violations" in res.error_message

    rows = violation_rows(df, _schema(), ["email"]).collect()
    got = {(r["check"], r["value"]) for r in rows}
    assert ("id__not_null", None) in got
    assert ("id__le", "500") in got
    assert ("email__str_matches", "dup-key-bad-email") in got


def test_per_partition_verdicts(spark):
    df = spark.createDataFrame(
        [("p1", 1), ("p1", 2), ("p2", -5), ("p2", 3)], "part string, v long"
    )
    schema = TableSchema(
        name="T",
        columns=[ColumnSpec(
            name="v", sanitized_name="v", name_was_valid=True,
            spark_type="bigint", pandera_type="Int64", nullable=False, ge=0,
        )],
    )
    res = validate_table(df, schema, partition_cols=["part"])
    verd = {r["part"]: r["v__ge"] for r in res.verdicts.collect()}
    assert verd == {"p1": 0, "p2": 1}
    assert res.counts["v__ge"] == 1
    assert not res.ok


def test_duplicate_keys_salted_matches_plain(spark):
    data = [("hot",)] * 50 + [("a",), ("b",), ("c",), ("c",)]
    df = spark.createDataFrame(data, "k string")
    plain = {(r["k"], r["dup_count"]) for r in duplicate_keys(df, ["k"]).collect()}
    salted = {(r["k"], r["dup_count"]) for r in duplicate_keys(df, ["k"], salt_buckets=8).collect()}
    assert plain == salted == {("hot", 50), ("c", 2)}
    assert duplicate_rows(df, ["k"]).count() == 52


def test_orphan_rows(spark):
    parent = spark.createDataFrame([("p1",), ("p2",)], "doc_id string")
    child = spark.createDataFrame(
        [("c1", "p1"), ("c2", "zz"), ("c3", None), ("c4", "p2"), ("c5", "yy")],
        "ref_id string, doc_id string",
    )
    got = sorted(r["ref_id"] for r in orphan_rows(child, parent, "doc_id", "doc_id", broadcast_parent=True).collect())
    assert got == ["c2", "c5"]  # null FK is not an orphan


def test_validation_matches_inferred_schema_roundtrip(spark):
    # schema inferred from a table must validate that same table cleanly
    df = spark.range(1, 50).select(
        F.col("id"),
        (F.col("id") % 3).alias("mod3"),
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@x.io")).alias("email"),
    )
    schema = infer_schema(df, "roundtrip")
    res = validate_table(df, schema)
    assert res.ok, res.error_message


def test_custom_sql_check(spark):
    from pandera_forge_spark.schema import Check, ColumnSpec, TableSchema
    from pandera_forge_spark.validator import validate_table

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 5.0)], "k long, v double"
    )
    schema = TableSchema(
        name="T",
        columns=[],
        extra_checks=[
            Check("v", "custom_sql", "v >= k * 4", label="v_at_least_4k")
        ],
    )
    res = validate_table(df, schema, check_unique=False)
    # row (3, 5.0): 5 < 12 -> one violation
    assert res.counts["v_at_least_4k"] == 1
    assert not res.ok


def test_custom_pandas_check(spark):
    from pandera_forge_spark.schema import Check, ColumnSpec, TableSchema
    from pandera_forge_spark.validator import validate_table, violation_rows

    def is_even(s):
        return s % 2 == 0

    df = spark.createDataFrame([(1,), (2,), (4,), (7,), (None,)], "v long")
    schema = TableSchema(
        name="T", columns=[], extra_checks=[Check("v", "custom_pandas", is_even)]
    )
    res = validate_table(df, schema, check_unique=False)
    # 1 and 7 fail; null passes (null semantics mirror value checks)
    assert res.counts["v__custom_pandas"] == 2
    bad = violation_rows(df, schema, ["v"])
    assert sorted(r["v"] for r in bad.collect()) == [1, 7]


def test_semantic_types_heuristic():
    from pandera_forge_spark.inference import infer_semantic_type

    # reference llm_enricher.py:217-250 parity, including precedence:
    # "id" wins over "date" for 'date_id'-style names
    assert infer_semantic_type("customer_id") == "identifier"
    assert infer_semantic_type("Email_Address") == "email"
    assert infer_semantic_type("signup_date") == "temporal"
    assert infer_semantic_type("total_price") == "monetary"
    assert infer_semantic_type("order_status") == "categorical"
    assert infer_semantic_type("is_active") == "boolean"
    assert infer_semantic_type("xyz") == "unknown"


def test_skew_report(spark):
    from pyspark.sql import functions as F

    from pandera_forge_spark.validator import skew_report

    # 1000 rows on a hot key + 100 uniform keys with 10 rows each
    df = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("key")
    )
    r = skew_report(df, ["key"]).collect()[0]
    assert r["n_rows"] == 2000 and r["n_keys"] == 101
    assert r["max_key_rows"] == 1000
    assert abs(r["top_share"] - 0.5) < 1e-6
    # avg key size = 2000/101 ~ 19.8 -> hot_ratio ~ 50.5
    assert 50 < r["hot_ratio"] < 51


def test_snapshot_diff_and_summary(spark):
    from pyspark.sql import functions as F

    from pandera_forge_spark.validator import snapshot_diff, snapshot_diff_summary

    old = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    new = (
        old.where(F.col("k") % 10 != 0)  # 10 removed
        .withColumn("v", F.when(F.col("k") % 7 == 0, F.col("v") + 1).otherwise(F.col("v")))
        .unionByName(
            spark.range(100, 105).select(
                F.col("id").alias("k"), F.lit(0).alias("v"), F.lit("new").alias("s")
            )
        )
    )
    d = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert all(d[k] == "removed" for k in range(0, 100, 10))
    # %7 changes, except keys also removed (%10) classify removed
    assert d[7] == "changed" and d[49] == "changed" and d[70] == "removed"
    assert all(d[k] == "added" for k in range(100, 105))

    s = snapshot_diff_summary(old, new, ["k"]).collect()[0]
    n_changed = len([k for k in range(0, 100, 7) if k % 10 != 0])
    assert (s["added"], s["removed"], s["changed"]) == (5, 10, n_changed)
    assert s["unchanged"] == 100 - 10 - n_changed


def test_quarantine_split_one_pass(spark, tmp_path):
    """Valid rows land under __valid=true, violations under
    __valid=false, counts come from the SAME job via observe (no
    second scan), and they match validate_table's verdicts."""
    from pandera_forge_spark.inference import infer_schema
    from pandera_forge_spark.validator import quarantine_split, validate_table

    clean = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    schema = infer_schema(clean, "Lineitem", detect_patterns=False)
    bad = clean.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 50 == 0, F.lit(-4.0)).otherwise(
            F.col("l_quantity")
        ),
    )
    root = str(tmp_path / "split")
    counts = quarantine_split(bad, schema, root)

    res = validate_table(bad, schema, check_unique=False)
    planted = bad.where(F.col("l_quantity") < 0).count()
    assert counts["quarantined"] == planted > 0
    assert counts["rows"] == bad.count()
    assert counts["valid"] == counts["rows"] - planted
    assert res.counts["l_quantity__ge"] == planted

    # the hive partition value reads back as a string ("true"/"false")
    ok_side = spark.read.parquet(root).where(F.col("__valid") == "true")
    bad_side = spark.read.parquet(root).where(F.col("__valid") == "false")
    assert ok_side.count() == counts["valid"]
    assert bad_side.count() == counts["quarantined"]
    assert bad_side.where(F.col("l_quantity") >= 0).count() == 0


# ------------------------------------------------------- functional deps

def test_fd_violations_found(spark):
    from pandera_forge_spark.validator import functional_dependency_violations

    rows = [
        ("o1", "c1"), ("o1", "c1"), ("o2", "c2"),
        ("o3", "c3"), ("o3", "c4"), ("o3", "c5"),  # violates o->c
        ("o4", None), ("o4", "c6"),  # null dependent not counted distinct-ly
    ]
    df = spark.createDataFrame(rows, "order_id string, cust string")
    out = functional_dependency_violations(df, ["order_id"], "cust").collect()
    assert len(out) == 1
    r = out[0]
    assert r["order_id"] == "o3"
    assert r["n_rows"] == 3 and r["n_dependent_values"] == 3
    assert r["min_value"] == "c3" and r["max_value"] == "c5"


def test_fd_violations_examples_opt_in(spark):
    from pandera_forge_spark.validator import functional_dependency_violations

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 9)]
    df = spark.createDataFrame(rows, "k string, v int")
    out = functional_dependency_violations(df, ["k"], "v", collect_examples=2).collect()
    assert len(out) == 1
    assert list(out[0]["example_values"]) == [1, 2]
    # min/max are guaranteed-distinct conflicting witnesses
    assert out[0]["min_value"] == 1 and out[0]["max_value"] == 3


def test_fd_holds_returns_empty(spark):
    from pandera_forge_spark.validator import functional_dependency_violations

    df = spark.createDataFrame(
        [("n1", "r1"), ("n1", "r1"), ("n2", "r1"), ("n3", "r2")],
        "nation string, region string",
    )
    assert functional_dependency_violations(df, ["nation"], "region").count() == 0


def test_fd_default_plan_has_no_unbounded_buffer(spark):
    from pandera_forge_spark.validator import functional_dependency_violations

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    plan = (
        functional_dependency_violations(df, ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_set" not in plan and "collect_list" not in plan


def test_outlier_rows_tukey_fence(spark):
    from pandera_forge_spark.validator import iqr_bounds, outlier_rows

    # 1..100 plus two planted anomalies
    rows = [(i, float(i)) for i in range(1, 101)] + [(900, 1000.0), (901, -500.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = outlier_rows(df, ["v"], ["id"], factor=1.5, exact=True).collect()
    assert {(r["id"], r["value"]) for r in got} == {(900, 1000.0), (901, -500.0)}
    # fences ride along and bracket the inliers
    r = got[0]
    assert r["lo"] < 1.0 and r["hi"] > 100.0 and r["hi"] < 1000.0
    # approximate mode finds the same planted anomalies here
    approx = outlier_rows(df, ["v"], ["id"], factor=1.5, exact=False).collect()
    assert {(r["id"], r["value"]) for r in approx} == {(900, 1000.0), (901, -500.0)}
    b = iqr_bounds(df, ["v"], exact=True)["v"]
    assert b["q1"] < b["q3"]


def test_outlier_rows_multi_column_and_empty(spark):
    from pandera_forge_spark.validator import outlier_rows

    rows = [(i, float(i % 10), 5.0) for i in range(50)] + [(99, 500.0, 500.0)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    got = outlier_rows(df, ["a", "b"], ["id"], exact=True).collect()
    # the planted row is an outlier in BOTH columns -> two rows
    assert sorted(r["column"] for r in got if r["id"] == 99) == ["a", "b"]
    empty = spark.createDataFrame([], "id long, a double")
    assert outlier_rows(empty, ["a"], ["id"], exact=True).count() == 0


def test_violation_examples_deterministic_k_per_check(spark):
    from pandera_forge_spark.schema import ColumnSpec, TableSchema
    from pandera_forge_spark.validator import violation_examples, violation_rows

    schema = TableSchema(
        name="T",
        columns=[
            ColumnSpec(
                name="v", sanitized_name="v", name_was_valid=True,
                spark_type="double", pandera_type="Float64", nullable=True,
                le=10.0,
            ),
            ColumnSpec(
                name="s", sanitized_name="s", name_was_valid=True,
                spark_type="string", pandera_type="String", nullable=False,
            ),
        ],
    )
    # 200 rows: 100 violate v<=10, 3 violate s not-null
    rows = [(i, float(i % 20), None if i in (5, 6, 7) else "x") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double, s string")
    got = violation_examples(df, schema, ["id"], k=4).collect()
    per = {}
    for r in got:
        per.setdefault(r["check"], []).append(r["id"])
    assert len(per["v__le"]) == 4          # capped
    assert sorted(per["s__not_null"]) == [5, 6, 7]  # fewer than k -> all
    # deterministic: identical on re-run
    again = violation_examples(df, schema, ["id"], k=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # the examples are a subset of the full violation set
    full = {(r["id"], r["check"]) for r in violation_rows(df, schema, ["id"]).collect()}
    assert {(r["id"], r["check"]) for r in got} <= full


def test_implies_check_conditional_contract(spark):
    from pandera_forge_spark.schema import Check, ColumnSpec, TableSchema
    from pandera_forge_spark.validator import validate_table

    # contract: kind='image' implies media_ref is not null
    rows = [
        (1, "image", "m://a"),   # ok
        (2, "image", None),      # VIOLATION
        (3, "text", None),       # vacuous pass (antecedent false)
        (4, None, None),         # vacuous pass (antecedent null)
    ]
    df = spark.createDataFrame(rows, "id long, kind string, media_ref string")
    schema = TableSchema(
        name="Spans",
        columns=[],
        extra_checks=[
            Check(
                column="media_ref",
                kind="implies",
                value={"when": "kind = 'image'", "then": "media_ref IS NOT NULL"},
                label="image_has_media_ref",
            )
        ],
    )
    res = validate_table(df, schema)
    assert res.counts == {"image_has_media_ref": 1}
    assert not res.ok

    # contract JSON round-trip preserves the implication
    again = TableSchema.from_json(schema.to_json())
    res2 = validate_table(df, again)
    assert res2.counts == {"image_has_media_ref": 1}


def test_grouped_outlier_rows_segment_relative(spark):
    from pandera_forge_spark.validator import grouped_outlier_rows, outlier_rows

    # group A ~ 1..100, group B ~ 10000..10100. The planted A-value 500
    # is a screaming outlier WITHIN A but inside the global range — the
    # case the global fences miss by construction.
    rows = (
        [(i, "A", float(1 + i % 100)) for i in range(300)]
        + [(i + 1000, "B", float(10000 + i % 100)) for i in range(300)]
        + [(9001, "A", 500.0), (9002, "B", 99999.0)]
    )
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = grouped_outlier_rows(df, ["v"], ["id"], ["g"], exact=True).collect()
    flagged = {(r["g"], r["id"]) for r in got}
    assert flagged == {("A", 9001), ("B", 9002)}
    # fences ride along per group
    for r in got:
        if r["g"] == "A":
            assert r["hi"] < 500.0
        else:
            assert r["lo"] > 500.0
    # the global variant (sanity): A's 500 is NOT a global outlier
    glob = outlier_rows(df, ["v"], ["id"], exact=True).collect()
    assert (9001 not in {r["id"] for r in glob})


def test_grouped_outlier_rows_broadcasts_fences(spark):
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf
    from pandera_forge_spark.validator import grouped_outlier_rows

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i)) for i in range(60)],
        "id long, g string, v double",
    )
    out = grouped_outlier_rows(df, ["v"], ["id"], ["g"], exact=True)
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert not has_python_udf(out)


def test_outlier_rows_empty_cols_contract(spark):
    from pandera_forge_spark.validator import grouped_outlier_rows, outlier_rows

    df = spark.createDataFrame([(1, "g", 1.0)], "id long, g string, v double")
    assert outlier_rows(df, [], ["id"]).count() == 0
    out = grouped_outlier_rows(df, [], ["id"], ["g"])
    assert out.count() == 0
    assert out.columns == ["g", "id", "column", "value", "lo", "hi"]


# ------------------------------------------------ sampled_violation_bound


import hashlib
import math

import pytest

from pandera_forge_spark.validator import WILSON_Z, sampled_violation_bound


def _frac(salt, key):
    """Python replay of the md5 prefix-fraction kernel."""
    h = hashlib.md5((salt + ("" if key is None else str(key))).encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


def _wilson_upper(k, n, z):
    p = float(k) / float(n)
    centre = p + (z * z) / (2.0 * n)
    rad = z * math.sqrt(p * (1.0 - p) / n + (z * z) / (4.0 * n * n))
    return min(1.0, (centre + rad) / (1.0 + (z * z) / n))


SVB_CHECKS = [
    Check(column="v", kind="ge", value=0),
    Check(column="v", kind="le", value=90),
    Check(column="v", kind="not_null"),
]


@pytest.fixture(scope="module")
def svb_df(spark):
    # v = i for most rows; planted: every 10th negative (ge violations),
    # i>90 gives le violations, every 25th NULL (not_null violations).
    rows = []
    for i in range(200):
        v = None if i % 25 == 0 else (-i if i % 10 == 5 else i)
        rows.append((i, "a" if i % 2 == 0 else "b", v))
    return spark.createDataFrame(rows, "id long, grp string, v long")


def test_svb_full_fraction_matches_exact_counts(svb_df):
    data = svb_df.collect()
    out = {
        r["check"]: r
        for r in sampled_violation_bound(
            svb_df, SVB_CHECKS, id_col="id", fraction=1.0, confidence=0.99
        ).collect()
    }
    n = len(data)
    expect = {
        "v__ge": sum(1 for r in data if r["v"] is not None and r["v"] < 0),
        "v__le": sum(1 for r in data if r["v"] is not None and r["v"] > 90),
        "v__not_null": sum(1 for r in data if r["v"] is None),
    }
    z = WILSON_Z[0.99]
    for name, k in expect.items():
        r = out[name]
        assert (r["n_sampled"], r["n_violations"]) == (n, k)
        assert r["violation_rate"] == k / n
        assert r["upper_bound"] == _wilson_upper(k, n, z)  # bit-exact tree
        assert r["violation_rate"] < r["upper_bound"] <= 1.0


def test_svb_sample_is_md5_deterministic(svb_df):
    data = svb_df.collect()
    ids = {r["id"] for r in data if _frac("s1", r["id"]) < 0.4}
    sampled_rows = [r for r in data if r["id"] in ids]
    out = {
        r["check"]: r
        for r in sampled_violation_bound(
            svb_df, SVB_CHECKS, id_col="id", fraction=0.4, salt="s1"
        ).collect()
    }
    assert out["v__ge"]["n_sampled"] == len(sampled_rows)
    assert out["v__ge"]["n_violations"] == sum(
        1 for r in sampled_rows if r["v"] is not None and r["v"] < 0
    )
    # a different salt samples a different subset
    other = sampled_violation_bound(
        svb_df, SVB_CHECKS, id_col="id", fraction=0.4, salt="s2"
    ).collect()[0]["n_sampled"]
    assert other != len(sampled_rows)


def test_svb_grouped_replay(svb_df):
    data = svb_df.collect()
    out = {
        (r["grp"], r["check"]): r
        for r in sampled_violation_bound(
            svb_df,
            SVB_CHECKS,
            id_col="id",
            fraction=1.0,
            confidence=0.95,
            group_by=["grp"],
        ).collect()
    }
    z = WILSON_Z[0.95]
    for g in ("a", "b"):
        rows = [r for r in data if r["grp"] == g]
        k = sum(1 for r in rows if r["v"] is None)
        r = out[(g, "v__not_null")]
        assert (r["n_sampled"], r["n_violations"]) == (len(rows), k)
        assert r["upper_bound"] == _wilson_upper(k, len(rows), z)


def test_svb_zero_violations_still_bounded(spark):
    df = spark.createDataFrame([(i, i) for i in range(50)], "id long, v long")
    r = sampled_violation_bound(
        df, [Check(column="v", kind="ge", value=0)], id_col="id", fraction=1.0
    ).collect()[0]
    assert r["n_violations"] == 0 and r["violation_rate"] == 0.0
    z = WILSON_Z[0.99]
    assert r["upper_bound"] == _wilson_upper(0, 50, z) > 0.0  # informative at k=0


def test_svb_empty_sample_certifies_nothing(spark):
    df = spark.createDataFrame([], "id long, v long")
    r = sampled_violation_bound(
        df, [Check(column="v", kind="ge", value=0)], id_col="id", fraction=0.5
    ).collect()[0]
    assert r["n_sampled"] == 0 and r["n_violations"] == 0
    assert r["violation_rate"] is None and r["upper_bound"] is None


def test_svb_fences(svb_df):
    with pytest.raises(ValueError, match="fraction"):
        sampled_violation_bound(svb_df, SVB_CHECKS, id_col="id", fraction=0.0)
    with pytest.raises(ValueError, match="confidence"):
        sampled_violation_bound(
            svb_df, SVB_CHECKS, id_col="id", fraction=0.5, confidence=0.97
        )
    with pytest.raises(ValueError, match="no row-level"):
        sampled_violation_bound(
            svb_df, [Check(column="id", kind="unique")], id_col="id", fraction=0.5
        )
    with pytest.raises(ValueError, match="id column"):
        sampled_violation_bound(svb_df, SVB_CHECKS, id_col="nope", fraction=0.5)
    with pytest.raises(ValueError, match="group columns"):
        sampled_violation_bound(
            svb_df, SVB_CHECKS, id_col="id", fraction=0.5, group_by=["nope"]
        )


def test_svb_partition_independent_and_udf_free(svb_df):
    from pandera_forge_spark.plans.inspect import has_python_udf

    key = lambda rows: sorted((r["check"], tuple(r)) for r in rows)
    a = sampled_violation_bound(
        svb_df.repartition(1), SVB_CHECKS, id_col="id", fraction=0.4
    ).collect()
    b = sampled_violation_bound(
        svb_df.repartition(7, "grp"), SVB_CHECKS, id_col="id", fraction=0.4
    ).collect()
    assert key(a) == key(b)
    assert not has_python_udf(
        sampled_violation_bound(svb_df, SVB_CHECKS, id_col="id", fraction=0.4)
    )


# ------------------------------------------------------- mad_outlier_rows


def _mad_replay(rows, c=3, min_points=5):
    """Exact Python replay of mad_outlier_rows' integer decision tree:
    micro-quantize, med2 = sum of the two middle value order stats,
    d2 = |2*vm - med2|, mad4 = sum of the two middle d2 order stats,
    flag iff 2*d2 > c*mad4."""
    import math
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, i, v in rows:
        if v is None:
            continue
        by_g[g].append((i, math.floor(v * 1000000.0)))
    out = set()
    for g, pts in by_g.items():
        n = len(pts)
        if n < min_points:
            continue
        vs = sorted(vm for _, vm in pts)
        med2 = vs[(n + 1) // 2 - 1] + vs[n // 2]
        d2s = sorted(abs(2 * vm - med2) for _, vm in pts)
        mad4 = d2s[(n + 1) // 2 - 1] + d2s[n // 2]
        for i, vm in pts:
            if 2 * abs(2 * vm - med2) > c * mad4:
                out.add((g, i))
    return out


def test_mad_outlier_rows_matches_python_replay(spark):
    import random

    from pandera_forge_spark.validator import mad_outlier_rows

    rng = random.Random(7)
    rows = []
    rid = 0
    for g in ("a", "b", "c"):
        for _ in range(80):
            rows.append((g, rid, rng.gauss(50.0, 3.0)))
            rid += 1
        # planted spikes
        rows.append((g, rid, 5000.0))
        rid += 1
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = mad_outlier_rows(df, "v", ["id"], ["g"], c=3)
    flagged = {(r["g"], r["id"]) for r in got.collect()}
    assert flagged == _mad_replay(rows, c=3)
    # every planted spike is in there
    assert all(any(i == x for g, x in flagged) for i in (80, 161, 242))


def test_mad_outlier_rows_survives_heavy_contamination(spark):
    """A third of group A is inflated 100x: Tukey fences stretch and
    can miss, the median/MAD verdict does not (50% breakdown point)."""
    from pandera_forge_spark.validator import mad_outlier_rows

    rows = []
    for i in range(90):
        base = 10.0 + (i % 9) * 0.25
        v = base * 100 if i % 3 == 0 else base
        rows.append(("A", i, v))
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = mad_outlier_rows(df, "v", ["id"], ["g"], c=3).collect()
    flagged = {r["id"] for r in got}
    assert flagged == {i for i in range(90) if i % 3 == 0}
    assert flagged == {g_i[1] for g_i in _mad_replay(rows, c=3)}


def test_mad_outlier_rows_constant_group_flags_every_spike(spark):
    from pandera_forge_spark.validator import mad_outlier_rows

    rows = [("p", i, 42.0) for i in range(20)] + [("p", 99, 42.5)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = mad_outlier_rows(df, "v", ["id"], ["g"]).collect()
    assert {r["id"] for r in got} == {99}
    assert got[0]["mad4_micro"] == 0


def test_mad_outlier_rows_min_points_and_nulls(spark):
    from pandera_forge_spark.validator import mad_outlier_rows

    rows = [("tiny", i, float(i) * 1000) for i in range(4)] + [
        ("big", i + 10, 1.0 if i else 900.0) for i in range(6)
    ]
    rows.append(("big", 999, None))
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = mad_outlier_rows(df, "v", ["id"], ["g"], min_points=5).collect()
    # tiny (4 points) emits nothing; big's null row neither counts
    # toward min_points nor appears in output
    assert {r["g"] for r in got} == {"big"}
    assert {r["id"] for r in got} == {10}


def test_mad_outlier_rows_contracts(spark):
    from pandera_forge_spark.validator import mad_outlier_rows

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, id long, v double")
    with pytest.raises(ValueError, match="group_cols"):
        mad_outlier_rows(df, "v", ["id"], [])
    with pytest.raises(ValueError, match="c must"):
        mad_outlier_rows(df, "v", ["id"], ["g"], c=0)
    with pytest.raises(ValueError, match="min_points"):
        mad_outlier_rows(df, "v", ["id"], ["g"], min_points=2)
    with pytest.raises(ValueError, match="lacks columns"):
        mad_outlier_rows(df, "v", ["id"], ["nope"])
    clash = df.withColumnRenamed("id", "__rn")
    with pytest.raises(ValueError, match="collide"):
        mad_outlier_rows(clash, "v", ["__rn"], ["g"])


def test_mad_outlier_rows_plan_shape(spark):
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf
    from pandera_forge_spark.validator import mad_outlier_rows

    df = spark.createDataFrame(
        [("g%d" % (i % 3), i, float(i % 11)) for i in range(120)],
        "g string, id long, v double",
    )
    out = mad_outlier_rows(df, "v", ["id"], ["g"])
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan, plan


# ------------------------------------------------------ violation_slices


def _chi2_replay(a, b, c, d):
    n = a + b + c + d
    den = (a + b) * (c + d) * (a + c) * (b + d)
    if den <= 0:
        return 0.0
    return n * (a * d - b * c) ** 2 / den


def test_violation_slices_concentrated_vs_uniform(spark):
    from pandera_forge_spark.validator import violation_slices

    # 600 rows: src 'bad' carries a 30% violation rate, 'ok-1'/'ok-2'
    # carry ~2%; day is independent of the verdict
    rows = []
    for i in range(600):
        src = "bad" if i % 3 == 0 else ("ok-1" if i % 3 == 1 else "ok-2")
        day = f"d{i % 4}"
        viol = (i % 10 < 3) if src == "bad" else (i % 50 == 7)
        rows.append((i, src, day, bool(viol)))
    df = spark.createDataFrame(rows, "id long, src string, day string, bad boolean")
    out = violation_slices(df, "bad", ["src", "day"], min_rows=10)
    got = {(r["slice_col"], r["slice_val"]): r for r in out.collect()}
    # every slice value surfaced
    assert set(got) == {("src", "bad"), ("src", "ok-1"), ("src", "ok-2")} | {
        ("day", f"d{k}") for k in range(4)
    }
    r = got[("src", "bad")]
    assert r["concentrated"], r
    # exact counts and python-replayed chi2
    a, brest = r["n_viol"], r["n_rows"] - r["n_viol"]
    c, d = r["n_viol_rest"], r["n_rows_rest"] - r["n_viol_rest"]
    assert round(_chi2_replay(a, brest, c, d), 6) == r["chi2"]
    # the under-rate slices are NOT flagged even though chi2 is large
    assert not got[("src", "ok-1")]["concentrated"]
    assert not got[("src", "ok-2")]["concentrated"]
    # the independent column never flags
    assert not any(got[("day", f"d{k}")]["concentrated"] for k in range(4))


def test_violation_slices_null_slice_and_min_rows(spark):
    from pandera_forge_spark.validator import violation_slices

    rows = [(i, None if i < 40 else "x", i < 30) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, src string, bad boolean")
    got = {
        r["slice_val"]: r
        for r in violation_slices(df, "bad", ["src"], min_rows=5).collect()
    }
    # NULL is its own slice — and here it concentrates ALL the failures
    assert got[None]["concentrated"] and got[None]["n_viol"] == 30
    assert not got["x"]["concentrated"]
    # min_rows drops small slices
    tiny = spark.createDataFrame(
        [(1, "solo", True)] + [(i, "big", False) for i in range(2, 60)],
        "id long, src string, bad boolean",
    )
    vals = {
        r["slice_val"]
        for r in violation_slices(tiny, "bad", ["src"], min_rows=30).collect()
    }
    assert vals == {"big"}


def test_violation_slices_contracts_and_plan(spark):
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf
    from pandera_forge_spark.validator import violation_slices

    df = spark.createDataFrame([(1, "a", True)], "id long, src string, bad boolean")
    with pytest.raises(ValueError, match="slice_cols"):
        violation_slices(df, "bad", [])
    with pytest.raises(ValueError, match="min_rows"):
        violation_slices(df, "bad", ["src"], min_rows=0)
    with pytest.raises(ValueError, match="lacks"):
        violation_slices(df, "bad", ["nope"])
    with pytest.raises(ValueError, match="must be boolean"):
        violation_slices(df, "src", ["src"])
    with pytest.raises(ValueError, match="collide"):
        violation_slices(
            df.withColumnRenamed("src", "slice_val"), "bad", ["slice_val"]
        )
    big = spark.createDataFrame(
        [(i, f"s{i % 3}", i % 7 == 0) for i in range(300)],
        "id long, src string, bad boolean",
    )
    out = violation_slices(big, "bad", ["src"], min_rows=10)
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "BroadcastNestedLoopJoin" in plan, plan


# ---------------------------------------------------- aggregate_reconcile


def test_aggregate_reconcile_four_statuses(spark):
    from pandera_forge_spark.validator import aggregate_reconcile

    child = spark.createDataFrame(
        [(1, 2.5), (1, 3.5), (2, 1.0), (2, None), (3, 4.0), (5, 7.0)],
        "k long, v double",
    )
    parent = spark.createDataFrame(
        [(1, 6.0), (2, 9.0), (3, 4.0), (4, 2.0)], "k long, total double"
    )
    got = {
        r["k"]: r
        for r in aggregate_reconcile(
            child, parent, ["k"], "v", "total", include_ok=True
        ).collect()
    }
    assert got[1]["status"] == "ok" and got[1]["diff_micro"] == 0
    assert got[1]["n_children"] == 2  # the NULL child value dropped... no:
    # k=1 has two non-null children; k=2's NULL row is excluded
    assert got[2]["status"] == "mismatch"
    assert got[2]["child_sum_micro"] == 1_000_000
    assert got[2]["diff_micro"] == 1_000_000 - 9_000_000
    assert got[3]["status"] == "ok"
    assert got[4]["status"] == "missing_child"
    assert got[4]["child_sum_micro"] is None and got[4]["n_children"] == 0
    assert got[5]["status"] == "missing_parent"
    assert got[5]["parent_micro"] is None and got[5]["diff_micro"] is None
    # default output drops ok rows
    work = aggregate_reconcile(child, parent, ["k"], "v", "total").collect()
    assert {r["k"] for r in work} == {2, 4, 5}


def test_aggregate_reconcile_tolerance_absorbs_quantize_slack(spark):
    from pandera_forge_spark.validator import aggregate_reconcile

    # parent = true float sum; per-row floor loses < 1 micro per row
    child = spark.createDataFrame(
        [(1, 0.1), (1, 0.2), (1, 0.3)], "k long, v double"
    )
    parent = spark.createDataFrame([(1, 0.6)], "k long, total double")
    strict = aggregate_reconcile(child, parent, ["k"], "v", "total").collect()
    loose = aggregate_reconcile(
        child, parent, ["k"], "v", "total", tol_micro=3
    ).collect()
    # 0.1+0.2+0.3 quantize-then-sum vs floor(0.6*1e6): within 3 micros
    assert loose == []
    assert len(strict) <= 1  # may or may not hit exactly; tol covers it


def test_aggregate_reconcile_contracts_and_plan(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf
    from pandera_forge_spark.validator import aggregate_reconcile

    child = spark.createDataFrame([(1, 1.0)], "k long, v double")
    parent = spark.createDataFrame([(1, 1.0)], "k long, total double")
    with pytest.raises(ValueError, match="keys"):
        aggregate_reconcile(child, parent, [], "v", "total")
    with pytest.raises(ValueError, match="quantize"):
        aggregate_reconcile(child, parent, ["k"], "v", "total", quantize=0)
    with pytest.raises(ValueError, match="tol_micro"):
        aggregate_reconcile(child, parent, ["k"], "v", "total", tol_micro=-1)
    with pytest.raises(ValueError, match="child frame lacks"):
        aggregate_reconcile(child, parent, ["k"], "nope", "total")
    with pytest.raises(ValueError, match="parent frame lacks"):
        aggregate_reconcile(child, parent, ["k"], "v", "nope")
    out = aggregate_reconcile(
        child, parent, ["k"], "v", "total", include_ok=True
    )
    assert not has_python_udf(out)


# ------------------------------------------------------- volume_anomalies


def test_volume_anomalies_flags_short_day(spark):
    from datetime import datetime, timedelta

    from pandera_forge_spark.validator import volume_anomalies

    t0 = datetime(2026, 3, 1)
    rows = []
    # source 's': 9 days of ~100 rows, day 4 arrives with 7 rows
    for d in range(9):
        n = 7 if d == 4 else 100 + (d % 3)
        for i in range(n):
            rows.append(("s", t0 + timedelta(days=d, seconds=i)))
    # source 'noisy': counts vary but no outage
    for d in range(9):
        for i in range(90 + 5 * (d % 4)):
            rows.append(("noisy", t0 + timedelta(days=d, seconds=i)))
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    got = volume_anomalies(df, "ts", ["src"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["src"] == "s" and r["n_rows"] == 7
    assert r["bucket_start"] == int(
        (t0 + timedelta(days=4)).timestamp()
    )


def test_volume_anomalies_median_survives_long_outage(spark):
    from datetime import datetime, timedelta

    from pandera_forge_spark.validator import volume_anomalies

    t0 = datetime(2026, 3, 1)
    rows = []
    # 11 days: 7 healthy at 50, 4 degraded at 5 — the degraded block
    # is flagged, the healthy days are NOT called anomalous
    for d in range(11):
        n = 5 if d in (3, 4, 5, 6) else 50
        for i in range(n):
            rows.append(("s", t0 + timedelta(days=d, seconds=i)))
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    flagged = {
        r["bucket_start"]
        for r in volume_anomalies(df, "ts", ["src"]).collect()
    }
    degraded = {
        int((t0 + timedelta(days=d)).timestamp()) for d in (3, 4, 5, 6)
    }
    assert flagged == degraded


def test_volume_anomalies_contracts(spark):
    from pandera_forge_spark.validator import volume_anomalies

    df = spark.createDataFrame([("s", 0.0)], "src string, ts double")
    with pytest.raises(ValueError, match="group_cols"):
        volume_anomalies(df, "ts", [])
    with pytest.raises(ValueError, match="bucket_seconds"):
        volume_anomalies(df, "ts", ["src"], bucket_seconds=0)
    with pytest.raises(ValueError, match="lacks"):
        volume_anomalies(df, "nope", ["src"])


# --------------------------------------------------------- heavy_changers


def test_heavy_changers_ranks_movers_exactly(spark):
    from pandera_forge_spark.validator import heavy_changers

    old = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 50 + [("gone",)] * 30 + [("flat",)] * 7,
        "k string",
    )
    new = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 55 + [("born",)] * 20 + [("flat",)] * 7,
        "k string",
    )
    got = heavy_changers(old, new, ["k"], k=10).collect()
    assert [(r["k"], r["n_old"], r["n_new"], r["delta"]) for r in got] == [
        ("a", 100, 40, -60),
        ("gone", 30, 0, -30),
        ("born", 0, 20, 20),
        ("b", 50, 55, 5),
    ]
    # flat (delta 0) dropped by min_delta; k truncates deterministically
    top2 = heavy_changers(old, new, ["k"], k=2).collect()
    assert [r["k"] for r in top2] == ["a", "gone"]


def test_heavy_changers_tie_break_and_contracts(spark):
    import pytest

    from pandera_forge_spark.validator import heavy_changers

    old = spark.createDataFrame([("z",), ("y",)], "k string")
    new = spark.createDataFrame(
        [("z",)] * 3 + [("y",)] * 3, "k string"
    )  # both +2: tie -> key ASC
    got = heavy_changers(old, new, ["k"], k=1).collect()
    assert got[0]["k"] == "y"
    with pytest.raises(ValueError, match="key_cols"):
        heavy_changers(old, new, [])
    with pytest.raises(ValueError, match="k must"):
        heavy_changers(old, new, ["k"], k=0)
    with pytest.raises(ValueError, match="min_delta"):
        heavy_changers(old, new, ["k"], min_delta=0)
    with pytest.raises(ValueError, match="new frame lacks"):
        heavy_changers(old, new.withColumnRenamed("k", "x"), ["k"])


def test_heavy_changers_plan_take_ordered(spark):
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf
    from pandera_forge_spark.validator import heavy_changers

    old = spark.createDataFrame([(i % 50,) for i in range(500)], "k long")
    new = spark.createDataFrame([(i % 40,) for i in range(500)], "k long")
    out = heavy_changers(old, new, ["k"], k=5)
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "TakeOrderedAndProject" in plan, plan


def test_mcnemar_verdicts_hand_computed(spark):
    """10 rows: 4 both-pass, 3 only-A, 1 only-B, 2 both-fail ->
    chi2 = (3-1)^2/4 = 1.0; NULL predicate counts as fail."""
    from pandera_forge_spark.validator import mcnemar_verdicts

    rows = (
        [(1, 1)] * 4 + [(1, 0)] * 3 + [(0, 1)] * 1 + [(0, 0)] * 1
        + [(0, None)]
    )
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_verdicts(
        df, F.col("a") == 1, F.col("b") == 1
    ).collect()[0]
    assert (r.both_pass, r.only_a, r.only_b, r.both_fail) == (4, 3, 1, 2)
    assert r.chi2 == 1.0
    # fully concordant -> NULL chi2, loudly
    conc = spark.createDataFrame([(1, 1), (0, 0)], "a int, b int")
    r2 = mcnemar_verdicts(conc, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert r2.chi2 is None
