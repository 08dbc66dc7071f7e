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


# ---------------------------------------------------------------- candidate_keys


from itertools import combinations as _combos

from pandera_forge_spark.operators.discovery import candidate_keys


@pytest.fixture(scope="module")
def keyed(spark):
    # id: a true key. pair (grp, seq): unique together but not alone.
    # grp: few values, duplicated. nully: unique where present, one NULL.
    rows = []
    for i in range(12):
        rows.append((i, i % 3, i // 3, None if i == 0 else 100 + i))
    return spark.createDataFrame(rows, "id long, grp int, seq int, nully long")


def _ck_replay(data, combo):
    """Row-at-a-time python replay of one combination's stats."""
    n_rows = len(data)
    tuples = [tuple(r[c] for c in combo) for r in data]
    nn = [t for t in tuples if all(v is not None for v in t)]
    from collections import Counter

    counts = Counter(nn)
    n_distinct = len(counts)
    n_dup = sum(c for c in counts.values() if c > 1)
    return {
        "n_rows": n_rows,
        "n_nonnull": len(nn),
        "n_distinct": n_distinct,
        "n_dup_rows": n_dup,
        "uniqueness": (n_distinct / len(nn)) if nn else None,
        "is_unique": n_dup == 0 and len(nn) > 0,
        "is_key": n_dup == 0 and 0 < len(nn) == n_rows,
    }


def test_candidate_keys_exact_replay(keyed):
    data = [r.asDict() for r in keyed.collect()]
    out = {r["key_cols"]: r.asDict() for r in candidate_keys(keyed).collect()}
    cols = ["id", "grp", "seq", "nully"]
    expect_combos = [c for a in (1, 2) for c in _combos(cols, a)]
    assert set(out) == {",".join(c) for c in expect_combos}
    for combo in expect_combos:
        got = out[",".join(combo)]
        want = _ck_replay(data, combo)
        for k, v in want.items():
            assert got[k] == v, (combo, k, got[k], v)
        assert got["arity"] == len(combo)


def test_candidate_keys_verdicts(keyed):
    out = {r["key_cols"]: r for r in candidate_keys(keyed).collect()}
    assert out["id"]["is_key"]
    assert not out["grp"]["is_unique"]
    # unique where present but one NULL: unique yes, key no.
    assert out["nully"]["is_unique"] and not out["nully"]["is_key"]
    # composite key that neither component is alone.
    assert out["grp,seq"]["is_key"]
    assert not out["grp"]["is_key"] and not out["seq"]["is_key"]


def test_candidate_keys_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "a long, b string")
    for r in candidate_keys(empty).collect():
        assert r["n_rows"] == 0 and r["n_nonnull"] == 0
        assert not r["is_unique"] and not r["is_key"]
        assert r["uniqueness"] is None
    allnull = spark.createDataFrame([(None,), (None,)], "a string")
    r = candidate_keys(allnull, max_arity=1).collect()[0]
    assert (r["n_rows"], r["n_nonnull"], r["n_distinct"]) == (2, 0, 0)
    assert not r["is_unique"] and not r["is_key"] and r["uniqueness"] is None


def test_candidate_keys_screen_prunes_hopeless(keyed):
    # grp has 3 distinct over 12 rows — pruned at screen=0.9; true keys
    # survive. Output equals the exact path restricted to survivors.
    exact = {r["key_cols"]: r for r in candidate_keys(keyed).collect()}
    screened = {
        r["key_cols"]: r for r in candidate_keys(keyed, screen=0.9).collect()
    }
    assert "grp" not in screened and "id" in screened and "grp,seq" in screened
    for k, r in screened.items():
        assert r == exact[k]
    with pytest.raises(ValueError, match="pruned every combination"):
        candidate_keys(keyed, cols=["grp"], max_arity=1, screen=0.9)


def test_candidate_keys_fences(keyed, spark):
    with pytest.raises(ValueError, match="columns \\['nope'\\] missing"):
        candidate_keys(keyed, cols=["nope"])
    with pytest.raises(ValueError, match="max_arity"):
        candidate_keys(keyed, max_arity=0)
    with pytest.raises(ValueError, match="exceed max_combos"):
        candidate_keys(keyed, max_combos=3)
    with pytest.raises(ValueError, match="duplicate columns"):
        candidate_keys(keyed, cols=["id", "id"])
    with pytest.raises(ValueError, match="screen must be"):
        candidate_keys(keyed, screen=1.5)
    nested = spark.createDataFrame([(1, [1])], "id long, xs array<long>")
    with pytest.raises(ValueError, match="nested"):
        candidate_keys(nested, cols=["xs"])


def test_candidate_keys_partition_independent(keyed):
    key = lambda rows: sorted(tuple(r) for r in rows)
    a = candidate_keys(keyed.repartition(1)).collect()
    b = candidate_keys(keyed.repartition(7, "grp")).collect()
    assert key(a) == key(b)


def test_candidate_keys_plan_udf_free(keyed):
    assert not has_python_udf(candidate_keys(keyed))


# ------------------------------------------------------- order_dependencies


@pytest.fixture(scope="module")
def ordered(spark):
    import datetime as dt

    d = dt.date
    rows = []
    for i in range(200):
        ship = d(2024, 1, 1) + dt.timedelta(days=i % 30)
        # receipt >= ship always; commit >= ship except 2 planted dirt rows
        receipt = ship + dt.timedelta(days=3)
        commit = ship + dt.timedelta(days=-1 if i in (7, 99) else 1)
        lo = float(i % 50)
        hi = lo + (0.0 if i % 10 == 0 else 5.0)
        rows.append((i, ship, commit, receipt, lo, hi, None if i % 4 == 0 else lo))
    return spark.createDataFrame(
        rows,
        "id long, ship date, commit date, receipt date, "
        "lo double, hi double, sparse double",
    )


def test_order_dependencies_finds_planted_invariants(ordered):
    from pandera_forge_spark.operators.discovery import order_dependencies

    got = {
        (r["lhs"], r["rhs"]): r
        for r in order_dependencies(ordered, min_support=50).collect()
    }
    assert ("ship", "receipt") in got  # exact invariant holds
    assert got[("ship", "receipt")]["n_violations"] == 0
    assert got[("ship", "receipt")]["n_both"] == 200
    assert ("receipt", "ship") not in got  # reverse direction rejected
    assert ("ship", "commit") not in got  # 2 dirt rows break exactness
    # lo <= hi holds with ties; n_eq counts the every-10th equal rows
    assert got[("lo", "hi")]["n_eq"] == 20


def test_order_dependencies_tolerance_and_rejected(ordered):
    from pandera_forge_spark.operators.discovery import order_dependencies

    tol = {
        (r["lhs"], r["rhs"]): r["verdict"]
        for r in order_dependencies(
            ordered, min_support=50, max_violation_ratio=0.02
        ).collect()
    }
    assert tol[("ship", "commit")] == "holds"  # 2/200 = 0.01 <= 0.02
    full = {
        (r["lhs"], r["rhs"]): r
        for r in order_dependencies(
            ordered, min_support=50, include_rejected=True
        ).collect()
    }
    assert full[("receipt", "ship")]["verdict"] == "rejected"
    assert full[("receipt", "ship")]["n_violations"] == 200
    # id vs sparse: both-non-null support = 150 rows (every 4th NULL)
    assert full[("id", "sparse")]["n_both"] == 150


def test_order_dependencies_no_support_and_fences(spark, ordered):
    from pandera_forge_spark.operators.discovery import order_dependencies

    full = {
        (r["lhs"], r["rhs"]): r["verdict"]
        for r in order_dependencies(
            ordered, min_support=1000, include_rejected=True
        ).collect()
    }
    assert set(full.values()) == {"no_support"}
    with pytest.raises(ValueError, match="exceed max_pairs"):
        order_dependencies(ordered, max_pairs=2)
    with pytest.raises(ValueError, match="min_support"):
        order_dependencies(ordered, min_support=0)
    with pytest.raises(ValueError, match="lacks columns"):
        order_dependencies(ordered, cols=["nope", "ship"])
    with pytest.raises(ValueError, match="non-orderable"):
        s = spark.createDataFrame([("a", "b")], "x string, y string")
        order_dependencies(s, cols=["x", "y"])
    with pytest.raises(ValueError, match="no comparable column pair"):
        # date and double never pair across families
        order_dependencies(ordered, cols=["ship", "lo"])


def test_order_dependencies_single_scan_udf_free(ordered):
    from pandera_forge_spark.operators.discovery import order_dependencies
    from pandera_forge_spark.plans.inspect import executed_plan

    out = order_dependencies(ordered, min_support=10)
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "Join" not in plan, plan  # one fused agg, no self-join


# ------------------------------------------------------------ overlap_census


def test_overlap_census_exact_venn(spark):
    from pandera_forge_spark.operators.discovery import overlap_census

    a = spark.createDataFrame([(i,) for i in range(0, 10)], "k long")
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "k long")
    c = spark.createDataFrame([(i,) for i in range(8, 12)], "k long")
    got = {
        r["sources"]: (r["n_sources"], r["n_values"])
        for r in overlap_census({"a": a, "b": b, "c": c}, col="k").collect()
    }
    # a only: 0-4 (5); b only: 12-14 (3); a&b: 5-7 (3);
    # a&b&c: 8-9 (2); b&c: 10-11 (2); c only: none
    assert got == {
        "a": (1, 5),
        "b": (1, 3),
        "a,b": (2, 3),
        "a,b,c": (3, 2),
        "b,c": (2, 2),
    }


def test_overlap_census_dedups_and_null_drops(spark):
    from pandera_forge_spark.operators.discovery import overlap_census

    a = spark.createDataFrame([(1,), (1,), (None,)], "k long")  # dups+null
    b = spark.createDataFrame([(1,), (2,)], "k long")
    got = {
        r["sources"]: r["n_values"]
        for r in overlap_census({"a": a, "b": b}, col="k").collect()
    }
    assert got == {"a,b": 1, "b": 1}


def test_overlap_census_cols_mapping_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.discovery import overlap_census
    from pandera_forge_spark.plans.inspect import has_python_udf

    a = spark.createDataFrame([(1,)], "x long")
    b = spark.createDataFrame([(1,)], "y long")
    got = overlap_census({"a": a, "b": b}, cols={"a": "x", "b": "y"}).collect()
    assert got[0]["sources"] == "a,b" and got[0]["n_values"] == 1
    assert not has_python_udf(overlap_census({"a": a, "b": b}, cols={"a": "x", "b": "y"}))
    with pytest.raises(ValueError, match="at least 2"):
        overlap_census({"a": a}, col="x")
    with pytest.raises(ValueError, match="exactly one of"):
        overlap_census({"a": a, "b": b})
    with pytest.raises(ValueError, match="lacks column"):
        overlap_census({"a": a, "b": b}, col="x")
    f = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="float equality"):
        overlap_census({"a": f, "b": f}, col="x")
    many = {f"s{i}": a for i in range(9)}
    with pytest.raises(ValueError, match="max_sources"):
        overlap_census(many, col="x")


def test_checks_from_order_dependencies_roundtrip(spark, ordered):
    from pandera_forge_spark.checks import compile_check
    from pandera_forge_spark.operators.discovery import (
        checks_from_order_dependencies,
        order_dependencies,
    )

    deps = order_dependencies(ordered, min_support=50)
    checks = checks_from_order_dependencies(deps)
    names = {c.name for c in checks}
    assert "ship__le__receipt" in names
    # the mined invariant validates clean data clean...
    ship_le = next(c for c in checks if c.name == "ship__le__receipt")
    pred = compile_check(ship_le)
    assert ordered.where(~pred).count() == 0
    # ...and counts planted violations when the invariant breaks
    import datetime as dt

    broken = ordered.withColumn(
        "receipt",
        F.when(F.col("id") % 50 == 0, dt.date(2020, 1, 1)).otherwise(
            F.col("receipt")
        ),
    )
    assert broken.where(~compile_check(ship_le)).count() == 4
    # null rows pass (not_null owns missingness)
    nulled = ordered.withColumn(
        "receipt", F.when(F.col("id") == 0, None).otherwise(F.col("receipt"))
    )
    assert nulled.where(~compile_check(ship_le)).count() == 0
    with pytest.raises(ValueError, match="lacks columns"):
        checks_from_order_dependencies(ordered)
