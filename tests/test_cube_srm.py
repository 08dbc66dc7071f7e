"""Grouping-set lattice profiles (profiler.cube_profile) and the
hash-split allocation audit (operators/sampling.split_balance_report)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.sampling import (
    split_balance_report,
    train_val_test_split,
)
from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf
from pandera_forge_spark.profiler import cube_profile


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # (src, lang, score): one real-NULL lang row to disambiguate
        ("web", "en", 1.0),
        ("web", "en", None),
        ("web", "de", 3.0),
        ("web", None, 7.0),
        ("book", "en", 5.0),
        ("book", "de", None),
    ]
    return spark.createDataFrame(rows, "src string, lang string, score double")


def _cells(out):
    return {
        (r["src"], r["lang"], r["src_grouped"], r["lang_grouped"]): (
            r["rows"], r["score_nulls"], r["score_min"], r["score_max"]
        )
        for r in out.collect()
    }


def test_cube_cells(frame):
    out = cube_profile(frame, ["src", "lang"], ["score"])
    got = _cells(out)
    # grand total
    assert got[(None, None, 1, 1)] == (6, 2, 1.0, 7.0)
    # by src
    assert got[("web", None, 0, 1)] == (4, 1, 1.0, 7.0)
    assert got[("book", None, 0, 1)] == (2, 1, 5.0, 5.0)
    # by lang — the real-NULL lang cell is distinct from aggregated-away
    assert got[(None, "en", 1, 0)] == (3, 1, 1.0, 5.0)
    assert got[(None, None, 1, 0)] == (1, 0, 7.0, 7.0)
    # full detail incl. the real-NULL lang under web
    assert got[("web", None, 0, 0)] == (1, 0, 7.0, 7.0)
    assert got[("web", "en", 0, 0)] == (2, 1, 1.0, 1.0)
    # 2^2 grouping sets over the populated combinations
    assert len(got) == 1 + 2 + 3 + 5


def test_rollup_cells(frame):
    out = cube_profile(frame, ["src", "lang"], ["score"], mode="rollup")
    got = _cells(out)
    # rollup drops the lang-only sets: grand total + by-src + detail
    assert len(got) == 1 + 2 + 5
    assert (None, "en", 1, 0) not in got
    assert got[("web", None, 0, 1)] == (4, 1, 1.0, 7.0)


def test_cube_distinct_cols(frame):
    out = cube_profile(frame, ["src"], ["score"], distinct_cols=["lang"])
    got = {(r["src"], r["src_grouped"]): r["lang_distinct"] for r in out.collect()}
    assert got[(None, 1)] == 2  # en, de (NULL not counted)
    assert got[("web", 0)] == 2
    assert got[("book", 0)] == 2


def test_cube_fences(frame):
    with pytest.raises(ValueError, match="non-empty"):
        cube_profile(frame, [], ["score"])
    with pytest.raises(ValueError, match="rollup"):
        cube_profile(frame, ["src"], ["score"], mode="flat")
    with pytest.raises(ValueError, match="2\\^7"):
        cube_profile(frame, [f"d{i}" for i in range(7)], [])
    with pytest.raises(ValueError, match="collide"):
        cube_profile(frame.withColumn("rows", F.lit(1)), ["src"], ["score"])


def test_cube_plan_is_expand_aggregate(frame):
    out = cube_profile(frame, ["src", "lang"], ["score"])
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "Expand" in plan
    assert "Window" not in plan


def test_cube_partition_independent(frame):
    a = cube_profile(frame.repartition(5), ["src", "lang"], ["score"])
    b = cube_profile(frame.coalesce(1), ["src", "lang"], ["score"])
    key = lambda r: tuple(repr(v) for v in r)  # None not orderable vs str
    assert sorted(map(tuple, a.collect()), key=key) == sorted(
        map(tuple, b.collect()), key=key
    )


# ------------------------------------------------- split_balance_report


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 3000).select(
        F.col("id"), (F.col("id") % 30).alias("grp")
    )


FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_balance_matches_split_counts(corpus):
    rep = split_balance_report(corpus, "id", FRACS, salt="s1")
    got = {r["split"]: r for r in rep.collect()}
    lab = train_val_test_split(corpus, "id", FRACS, salt="s1")
    counts = {r["__split"]: r["n"] for r in lab.groupBy("__split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == set(FRACS)
    for k, r in got.items():
        assert r["observed"] == counts.get(k, 0)
        assert r["total"] == 3000
        assert r["expected"] == pytest.approx(3000 * FRACS[k])
        assert r["chi2_term"] == pytest.approx(
            (r["observed"] - r["expected"]) ** 2 / r["expected"]
        )


def test_balance_healthy_split_small_chi2(corpus):
    rep = split_balance_report(corpus, "id", FRACS, salt="s1")
    chi2 = sum(r["chi2_term"] for r in rep.collect())
    # 2 dof; P(chi2 > 13.8) ~ 0.001 — a healthy md5 split sits far below
    assert chi2 < 13.8


def test_balance_pathological_key_flagged(corpus):
    # constant key: every row lands in ONE split — the audit must scream
    rep = split_balance_report(
        corpus.withColumn("const", F.lit("x")), "const", FRACS, salt="s1"
    )
    got = {r["split"]: r for r in rep.collect()}
    assert sorted(r["observed"] for r in got.values()) == [0, 0, 3000]
    chi2 = sum(r["chi2_term"] for r in rep.collect())
    assert chi2 > 100


def test_balance_zero_arm_present(corpus):
    rep = split_balance_report(corpus.limit(1), "id", FRACS, salt="s1")
    assert rep.count() == 3
    assert sum(r["observed"] for r in rep.collect()) == 1


def test_balance_group_mode_counts_groups(corpus):
    rep = split_balance_report(corpus, "id", FRACS, salt="s2", group_col="grp")
    got = {r["split"]: r for r in rep.collect()}
    # 30 groups total; observed counts are GROUP counts
    assert sum(r["observed"] for r in got.values()) == 30
    assert all(r["total"] == 30 for r in got.values())
    # group integrity: the audit agrees with distinct groups per split
    lab = train_val_test_split(corpus, "id", FRACS, salt="s2", group_col="grp")
    direct = {
        r["__split"]: r["n"]
        for r in lab.groupBy("__split")
        .agg(F.countDistinct("grp").alias("n"))
        .collect()
    }
    for k, r in got.items():
        assert r["observed"] == direct.get(k, 0)


def test_balance_no_python_udf(corpus):
    assert not has_python_udf(split_balance_report(corpus, "id", FRACS))
