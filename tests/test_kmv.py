"""KMV k-minimum-values distinct/overlap sketch (sketches.py kmv_*)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.sketches import (
    _KMV_SPACE,
    kmv_estimate,
    kmv_hash,
    kmv_merge,
    kmv_overlap,
    kmv_partition_sketch,
)


def _py_hash(value, seed="kmv"):
    return int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:12], 16)


def _py_est(hashes, k):
    """The estimator replayed in python doubles (== IEEE 64-bit)."""
    if len(hashes) < k:
        return float(len(hashes))
    return float(k - 1) * _KMV_SPACE / float(sorted(hashes)[k - 1])


@pytest.fixture(scope="module")
def corpus(spark):
    # 60 distinct values, each duplicated (dup count must not matter),
    # plus a NULL (excluded, never hashed)
    rows = [(f"v{i}",) for i in range(60) for _ in range(1 + i % 3)]
    rows.append((None,))
    return spark.createDataFrame(rows, "s string").repartition(7)


def test_hash_matches_python_md5(spark):
    df = spark.createDataFrame([("abc",), ("v7",), ("",)], "s string")
    for row in df.select("s", kmv_hash("s").alias("h")).collect():
        assert row["h"] == _py_hash(row["s"])


def test_under_k_sketch_is_the_exact_distinct_set(spark, corpus):
    sk = kmv_estimate(kmv_merge(kmv_partition_sketch(corpus, "s", k=128)))
    row = sk.first()
    assert row["__kmv"] == sorted(_py_hash(f"v{i}") for i in range(60))
    assert row["sketch_size"] == 60
    assert row["distinct_est"] == 60.0  # exact path: size < k


def test_estimate_path_matches_python_replay(spark, corpus):
    k = 16
    sk = kmv_estimate(kmv_merge(kmv_partition_sketch(corpus, "s", k=k)))
    row = sk.first()
    hashes = [_py_hash(f"v{i}") for i in range(60)]
    assert row["__kmv"] == sorted(hashes)[:k]
    assert row["distinct_est"] == _py_est(hashes, k)
    # sanity: the estimate is in the right ballpark of the truth (60)
    assert 30 <= row["distinct_est"] <= 120


def test_grouped_sketch_and_rank_limit_pushdown(spark, corpus):
    g = corpus.withColumn(
        "grp", (F.length(F.coalesce(F.col("s"), F.lit(""))) % 2).cast("int")
    )
    sk = kmv_partition_sketch(g, "s", group_cols=["grp"], k=8)
    # WindowGroupLimit: each map task forwards at most k rows per group
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    got = {r["grp"]: r["__kmv"] for r in sk.collect()}
    by_grp = {0: set(), 1: set()}
    for i in range(60):
        by_grp[len(f"v{i}") % 2].add(_py_hash(f"v{i}"))
    for grp, hashes in by_grp.items():
        assert got[grp] == sorted(hashes)[:8]


def test_merge_equals_single_shot(spark, corpus):
    halves = kmv_partition_sketch(
        corpus.withColumn(
            "part", F.crc32(F.coalesce(F.col("s"), F.lit(""))) % 3
        ),
        "s",
        group_cols=["part"],
        k=16,
    ).drop("part")
    merged = kmv_merge(halves).first()
    single = kmv_merge(kmv_partition_sketch(corpus, "s", k=16)).first()
    assert merged["__kmv"] == single["__kmv"]


def test_duplicates_do_not_change_the_sketch(spark, corpus):
    once = spark.createDataFrame([(f"v{i}",) for i in range(60)], "s string")
    a = kmv_merge(kmv_partition_sketch(corpus, "s", k=16)).first()["__kmv"]
    b = kmv_merge(kmv_partition_sketch(once, "s", k=16)).first()["__kmv"]
    assert a == b


def test_mixed_params_fence_is_loud(spark, corpus):
    a = kmv_partition_sketch(corpus, "s", k=16)
    b = kmv_partition_sketch(corpus, "s", k=32)
    with pytest.raises(Exception, match="mixes KMV parameters"):
        kmv_merge(a.unionByName(b)).select("__kmv").collect()


def test_k_below_two_is_loud(corpus):
    with pytest.raises(ValueError, match=">= 2"):
        kmv_partition_sketch(corpus, "s", k=1)


def test_missing_column_is_loud(corpus):
    with pytest.raises(ValueError, match="missing columns"):
        kmv_partition_sketch(corpus, "nope")


def test_estimate_of_zero_merged_rows_is_loud(spark, corpus):
    empty = kmv_merge(
        kmv_partition_sketch(corpus, "s", k=16).where(F.lit(False))
    )
    with pytest.raises(Exception, match="NULL sketch row"):
        kmv_estimate(empty).collect()


def test_overlap_exact_path_planted(spark):
    # A = 0..39, B = 20..59 -> |A∪B| = 60, |A∩B| = 20, J = 1/3
    a = spark.createDataFrame([(f"v{i}",) for i in range(40)], "s string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(20, 60)], "s string")
    row = kmv_overlap(
        kmv_partition_sketch(a, "s", k=128),
        kmv_partition_sketch(b, "s", k=128),
    ).first()
    assert (row["size_a"], row["size_b"], row["size_u"]) == (40, 40, 60)
    assert row["shared"] == 20
    assert row["est_a"] == 40.0 and row["est_b"] == 40.0
    assert row["union_est"] == 60.0
    assert row["jaccard_est"] == 20.0 / 60.0
    assert row["inter_est"] == (20.0 / 60.0) * 60.0


def test_overlap_estimate_path_matches_python_replay(spark):
    k = 16
    a_vals = [f"v{i}" for i in range(40)]
    b_vals = [f"v{i}" for i in range(20, 60)]
    a = spark.createDataFrame([(v,) for v in a_vals], "s string")
    b = spark.createDataFrame([(v,) for v in b_vals], "s string")
    row = kmv_overlap(
        kmv_partition_sketch(a, "s", k=k),
        kmv_partition_sketch(b, "s", k=k),
    ).first()
    ha = sorted(_py_hash(v) for v in a_vals)[:k]
    hb = sorted(_py_hash(v) for v in b_vals)[:k]
    hu = sorted(set(ha) | set(hb))[:k]
    shared = sum(1 for h in hu if h in set(ha) and h in set(hb))
    jac = shared / float(len(hu))
    assert row["shared"] == shared
    assert row["jaccard_est"] == jac
    union_hashes = [_py_hash(v) for v in set(a_vals) | set(b_vals)]
    assert row["union_est"] == _py_est(union_hashes, k)
    assert row["inter_est"] == jac * row["union_est"]


def test_overlap_param_mismatch_is_loud(spark):
    a = spark.createDataFrame([("x",)], "s string")
    sk1 = kmv_partition_sketch(a, "s", k=16)
    sk2 = kmv_partition_sketch(a, "s", k=32)
    with pytest.raises(Exception, match="parameter mismatch"):
        kmv_overlap(sk1, sk2).collect()
    sk3 = kmv_partition_sketch(a, "s", k=16, seed="other")
    with pytest.raises(Exception, match="parameter mismatch"):
        kmv_overlap(sk1, sk3).collect()


def test_overlap_of_empty_sets_is_null_not_zero(spark):
    e = spark.createDataFrame([], "s string")
    row = kmv_overlap(
        kmv_partition_sketch(e, "s", k=16),
        kmv_partition_sketch(e, "s", k=16),
    ).first()
    assert row["size_u"] == 0 and row["shared"] == 0
    assert row["jaccard_est"] is None and row["inter_est"] is None
    assert row["union_est"] == 0.0


def test_overlap_accepts_unmerged_partition_rows(spark, corpus):
    # per-group sketch rows go straight in — kmv_overlap merges
    g = corpus.withColumn(
        "grp", (F.length(F.coalesce(F.col("s"), F.lit(""))) % 2).cast("int")
    )
    parts = kmv_partition_sketch(g, "s", group_cols=["grp"], k=64).drop("grp")
    whole = kmv_partition_sketch(corpus, "s", k=64)
    row = kmv_overlap(parts, whole).first()
    assert row["jaccard_est"] == 1.0  # same underlying set
    assert row["shared"] == row["size_u"]


def test_no_udf(spark, corpus):
    sk = kmv_partition_sketch(corpus, "s", k=16)
    assert not has_python_udf(sk)
    assert not has_python_udf(kmv_estimate(kmv_merge(sk)))
    assert not has_python_udf(kmv_overlap(sk, sk))


def test_kmv_containment_subset_and_replay(spark):
    """A strictly contained in B: containment_a_in_b == 1.0 exactly
    (every union hash in A is also in B); python replay of the rest."""
    from pandera_forge_spark.sketches import (
        kmv_containment,
        kmv_partition_sketch,
    )

    a_vals = list(range(100))
    b_vals = list(range(400))  # superset
    dfa = spark.createDataFrame([(v,) for v in a_vals], "v long")
    dfb = spark.createDataFrame([(v,) for v in b_vals], "v long")
    sa = kmv_partition_sketch(dfa, "v", k=32)
    sb = kmv_partition_sketch(dfb, "v", k=32)
    row = kmv_containment(sa, sb).collect()[0]
    assert row["containment_a_in_b"] == 1.0
    assert 0.0 < row["containment_b_in_a"] < 1.0
    # replay: union sketch membership from python md5
    import hashlib

    def h(v):
        return int(
            hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:12], 16
        )

    ha = sorted({h(v) for v in a_vals})[:32]
    hb = sorted({h(v) for v in b_vals})[:32]
    u = sorted(set(ha) | set(hb))[:32]
    in_a = sum(1 for x in u if x in set(ha))
    in_b = sum(1 for x in u if x in set(hb))
    shared = sum(1 for x in u if x in set(ha) and x in set(hb))
    assert (row["in_a"], row["in_b"], row["shared"]) == (in_a, in_b, shared)
    assert row["containment_b_in_a"] == shared / in_b


def test_kmv_containment_param_mismatch_raises(spark):
    from pandera_forge_spark.sketches import (
        kmv_containment,
        kmv_partition_sketch,
    )

    df = spark.createDataFrame([(v,) for v in range(50)], "v long")
    sa = kmv_partition_sketch(df, "v", k=16)
    sb = kmv_partition_sketch(df, "v", k=32)
    import pytest as _pytest

    with _pytest.raises(Exception, match="parameter mismatch"):
        kmv_containment(sa, sb).collect()


def test_kmv_containment_disjoint_zero(spark):
    from pandera_forge_spark.sketches import (
        kmv_containment,
        kmv_partition_sketch,
    )

    dfa = spark.createDataFrame([(v,) for v in range(50)], "v long")
    dfb = spark.createDataFrame([(v,) for v in range(1000, 1050)], "v long")
    row = kmv_containment(
        kmv_partition_sketch(dfa, "v", k=64),
        kmv_partition_sketch(dfb, "v", k=64),
    ).collect()[0]
    assert row["shared"] == 0
    assert row["containment_a_in_b"] == 0.0
    assert row["containment_b_in_a"] == 0.0


# --------------------------------------------- rolling_distinct (r5)

def _days_df(spark, rows):
    # rows: (key, day_number, value) -> ts at day_number*86400 + 1
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "key string, d long, v string")
    return df.withColumn(
        "ts", F.timestamp_seconds(F.col("d") * 86400 + 1)
    ).drop("d")


def test_rolling_distinct_hand_computed(spark):
    from pandera_forge_spark.sketches import rolling_distinct_kmv

    rows = [
        # key a: day 0 {x,y}, day 1 {y,z}, day 3 {x}
        ("a", 0, "x"), ("a", 0, "y"),
        ("a", 1, "y"), ("a", 1, "z"),
        ("a", 3, "x"),
        # key b: one day only
        ("b", 0, "q"),
        # NULL key is a real key
        (None, 0, "n1"), (None, 2, "n1"),
    ]
    out = {
        (r["key"], r["day"]): r["distinct_exact"]
        for r in rolling_distinct_kmv(
            _days_df(spark, rows), ["key"], "ts", "v", window_days=2
        ).collect()
    }
    # window 2 days: day d covers {d-1, d}
    assert out == {
        ("a", 0): 2,            # {x,y}
        ("a", 1): 3,            # {x,y,z}
        ("a", 3): 1,            # day 2 silent -> {x} only
        ("b", 0): 1,
        (None, 0): 1,
        (None, 2): 1,           # day 1 silent, n1 again -> still 1
    }
    # silent days emit NO row
    assert ("a", 2) not in out and (None, 1) not in out


def test_rolling_distinct_window_one_is_per_day(spark):
    from pandera_forge_spark.sketches import rolling_distinct_kmv

    rows = [("a", 0, "x"), ("a", 0, "y"), ("a", 1, "x")]
    out = {
        (r["key"], r["day"]): r["distinct_exact"]
        for r in rolling_distinct_kmv(
            _days_df(spark, rows), ["key"], "ts", "v", window_days=1
        ).collect()
    }
    assert out == {("a", 0): 2, ("a", 1): 1}


def test_rolling_distinct_saturation_matches_merge_estimate(spark):
    from pandera_forge_spark.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_partition_sketch,
        rolling_distinct_kmv,
    )

    rows = [("a", d, f"v{d}_{i}") for d in range(2) for i in range(30)]
    df = _days_df(spark, rows)
    out = {
        r["day"]: r
        for r in rolling_distinct_kmv(
            df, ["key"], "ts", "v", window_days=2, k=8
        ).collect()
    }
    assert out[1]["distinct_exact"] is None  # 60 distinct > k=8
    # the day-1 trailing estimate equals merging the two days' sketches
    whole = kmv_estimate(
        kmv_merge(kmv_partition_sketch(df, "v", k=8))
    ).collect()[0]
    assert out[1]["distinct_est"] == whole["distinct_est"]
    assert out[1]["sketch_size"] == whole["sketch_size"]


def test_rolling_distinct_guards(spark):
    import pytest
    from pyspark.sql import functions as F
    from pandera_forge_spark.sketches import rolling_distinct_kmv

    df = _days_df(spark, [("a", 0, "x")])
    with pytest.raises(ValueError, match="lacks columns"):
        rolling_distinct_kmv(df, ["key"], "ts", "nope")
    with pytest.raises(ValueError, match="window_days"):
        rolling_distinct_kmv(df, ["key"], "ts", "v", window_days=0)
    with pytest.raises(ValueError, match="collide"):
        rolling_distinct_kmv(
            df.withColumn("__day", F.lit(1)), ["key"], "ts", "v"
        )


def test_rolling_distinct_no_python_udf(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf
    from pandera_forge_spark.sketches import rolling_distinct_kmv

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = rolling_distinct_kmv(ev, ["event_type"], "ts", "user_id")
    assert not has_python_udf(out)
