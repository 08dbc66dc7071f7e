"""Mergeable partition sketches: merged estimates track exact answers,
exact fields merge exactly, and incremental update == full reprofile."""

from pyspark.sql import functions as F

from pandera_forge_spark.sketches import (
    merge_sketches,
    partition_sketches,
    update_sketches,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 13).alias("part"),
        (F.col("id") % 2000).alias("key"),
        (F.col("id") % 500).cast("double").alias("price"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("u"), F.col("id") % 300))
        .alias("user"),
    )


def test_merged_sketches_track_exact(spark):
    df = _df(spark, 0, 20000)
    sk = partition_sketches(df, ["part"])
    assert sk.count() == 13

    row = merge_sketches(sk).collect()[0]
    assert row["__rows"] == 20000
    # exact algebraic fields merge exactly
    assert row["user__nulls"] == 2000
    assert row["price__min"] == 0.0 and row["price__max"] == 499.0
    # HLL estimates within published error (~2% at default lgk)
    assert abs(row["key__distinct_est"] - 2000) / 2000 < 0.05
    # id%10==0 nulls every u<k> with k%10==0 (10 divides 300), so the
    # non-null domain is exactly 270 values
    assert abs(row["user__distinct_est"] - 270) / 270 < 0.05
    # KLL median of uniform 0..499 ~ 249.5 (rank error ~2%)
    assert abs(row["price__q50"] - 249.5) < 25


def test_incremental_update_equals_full_reprofile(spark):
    """Sketch day-1, append day-2's sketch rows only (day-1 data is
    never rescanned), and the merged profile equals sketching the full
    table in one shot."""
    day1, day2 = _df(spark, 0, 10000), _df(spark, 10000, 20000)
    full = _df(spark, 0, 20000)

    sk1 = partition_sketches(day1, ["part"])
    incr = update_sketches(sk1, day2, ["part"])
    # duplicate partition rows coexist (13 parts x 2 arrivals)
    assert incr.count() == 26

    a = merge_sketches(incr).collect()[0]
    b = merge_sketches(partition_sketches(full, ["part"])).collect()[0]
    assert a["__rows"] == b["__rows"] == 20000
    assert a["user__nulls"] == b["user__nulls"]
    assert a["price__min"] == b["price__min"]
    assert a["price__max"] == b["price__max"]
    # HLL union is a register-wise max — order-independent, so the
    # estimate is IDENTICAL however the rows arrived
    assert a["key__distinct_est"] == b["key__distinct_est"]
    # KLL compaction depends on arrival grouping (26 small sketches vs
    # 13 larger ones), so quantiles agree within rank error, not bitwise
    assert abs(a["price__q50"] - b["price__q50"]) <= 500 * 0.02


def test_subset_merge(spark):
    """Any partition subset merges without touching data — the
    'profile last N days' query shape."""
    df = _df(spark, 0, 20000)
    sk = partition_sketches(df, ["part"])
    row = merge_sketches(sk.where(F.col("part") < 3)).collect()[0]
    exact = df.where(F.col("part") < 3)
    assert row["__rows"] == exact.count()
    nref = exact.where(F.col("user").isNull()).count()
    assert row["user__nulls"] == nref


def test_theta_new_key_estimate(spark):
    """Day-2 introduces exactly 500 unseen keys; the theta difference
    over stored sketch rows finds them without rescanning either day."""
    from pandera_forge_spark.sketches import new_key_estimate

    day1 = spark.range(0, 1000).select(F.lit("d1").alias("day"), F.col("id").alias("key"))
    day2 = spark.range(500, 1500).select(F.lit("d2").alias("day"), F.col("id").alias("key"))
    sk = partition_sketches(
        day1.unionByName(day2), ["day"], ["key"], theta=True
    )
    est = new_key_estimate(
        sk, "key", F.col("day") == "d2", F.col("day") == "d1"
    )
    assert abs(est - 500) / 500 < 0.05


def test_drift_baseline_from_kll(spark):
    """Drift scoring against a KLL-sketch baseline (no baseline
    rescan): identical distribution scores ~0, a shifted partition
    scores high — same verdicts as the scan-based baseline_summary."""
    from pandera_forge_spark.drift import drift_by_partition
    from pandera_forge_spark.sketches import baseline_from_kll

    base = spark.range(20000).select(
        (F.col("id") % 4).alias("part"), (F.col("id") % 1000).cast("double").alias("v")
    )
    sk = partition_sketches(base, ["part"], ["v"])
    b = baseline_from_kll(sk, "v", bins=10)
    assert len(b["edges"]) == 9 and len(b["props"]) == 10

    cur = spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, "same").otherwise("shifted").alias("grp"),
        F.when(
            F.col("id") % 2 == 0, (F.col("id") % 1000).cast("double")
        ).otherwise((F.col("id") % 100).cast("double")).alias("v"),
    )
    rows = {r["grp"]: r for r in drift_by_partition(cur, "v", ["grp"], b).collect()}
    assert rows["same"]["psi"] < 0.05 and rows["same"]["ks"] < 0.05
    assert rows["shifted"]["psi"] > 1.0 and rows["shifted"]["ks"] > 0.5


def test_incremental_sketch_store_resume(spark, tmp_path):
    """Sketch store: first call sketches every partition; after new
    partitions land only THEY are sketched (resume by _SUCCESS
    markers); the merged store equals a one-shot profile."""
    from pandera_forge_spark.runner import HivePartitionedParquet
    from pandera_forge_spark.sketches import (
        incremental_sketch_store,
        load_sketch_store,
    )

    root = str(tmp_path / "tbl")
    store = str(tmp_path / "sk")
    table = HivePartitionedParquet(spark, root, "part")

    day1 = _df(spark, 0, 8000).where(F.col("part") < 8)
    table.write(day1)
    new1 = incremental_sketch_store(spark, table, store)
    assert len(new1) == 8

    # second call with nothing new: pure no-op
    assert incremental_sketch_store(spark, table, store) == []

    # late data: 5 more partitions land
    day2 = _df(spark, 0, 8000).where(F.col("part") >= 8)
    day2.write.partitionBy("part").mode("append").parquet(root)
    new2 = incremental_sketch_store(spark, table, store)
    assert len(new2) == 5 and set(new2).isdisjoint(set(new1))

    merged = merge_sketches(load_sketch_store(spark, store)).collect()[0]
    full = merge_sketches(
        partition_sketches(_df(spark, 0, 8000), ["part"])
    ).collect()[0]
    assert merged["__rows"] == full["__rows"] == 8000
    assert merged["user__nulls"] == full["user__nulls"]
    assert merged["key__distinct_est"] == full["key__distinct_est"]


def test_merge_empty_sketch_frame(spark):
    """Selecting zero partitions (or a not-yet-populated store) merges
    to a null/zero row instead of an element_at index error."""
    df = _df(spark, 0, 100)
    sk = partition_sketches(df, ["part"])
    row = merge_sketches(sk.where(F.col("part") > 999)).collect()[0]
    assert row["__rows"] is None
    assert row["price__q50"] is None


def test_grouped_sketch_rollup(spark):
    """Daily sketch rows roll up per month without rescanning data;
    each group's exact fields match direct per-group computation."""
    df = _df(spark, 0, 10000).withColumn("month", F.col("part") % 3)
    sk = partition_sketches(df, ["month", "part"])
    rolled = {
        r["month"]: r
        for r in merge_sketches(sk, group_cols=["month"]).collect()
    }
    assert len(rolled) == 3
    for m, row in rolled.items():
        grp = df.where(F.col("month") == m)
        assert row["__rows"] == grp.count()
        assert row["user__nulls"] == grp.where(F.col("user").isNull()).count()
    assert sum(r["__rows"] for r in rolled.values()) == 10000


def test_update_sketches_infers_theta_from_store(spark):
    """A store built with theta=True must accept incremental appends
    without the caller re-stating theta: update_sketches infers it from
    the __theta columns, so the unionByName lines up and
    new_key_estimate keeps working on the appended store."""
    from pandera_forge_spark.sketches import new_key_estimate

    day1, day2 = _df(spark, 0, 4000), _df(spark, 4000, 8000)
    store = partition_sketches(day1, ["part"], ["key"], theta=True)
    appended = update_sketches(store, day2, ["part"], ["key"])
    assert any(c.endswith("__theta") for c in appended.columns)
    assert appended.count() == store.count() * 2
    # theta=False store stays theta-free under the same default
    plain = partition_sketches(day1, ["part"], ["key"])
    appended_plain = update_sketches(plain, day2, ["part"], ["key"])
    assert not any(c.endswith("__theta") for c in appended_plain.columns)


# --- table_checksum --------------------------------------------------------

import pytest

from pandera_forge_spark.sketches import merge_checksums, table_checksum


def _rowset(spark, rows):
    return spark.createDataFrame(rows, "grp string, k long, s string")


def test_checksum_order_and_partitioning_invariant(spark):
    rows = [("g", i, f"v{i}") for i in range(50)] + [("h", 1, None)]
    a = table_checksum(_rowset(spark, rows), cols=["k", "s"]).first()
    b = table_checksum(
        _rowset(spark, list(reversed(rows))).repartition(7), cols=["k", "s"]
    ).first()
    assert a == b and a["n_rows"] == 51


def test_checksum_detects_any_change(spark):
    base = [("g", i, f"v{i}") for i in range(20)]
    ref = table_checksum(_rowset(spark, base), cols=["k", "s"]).first()
    # one value changed
    mut = base[:10] + [("g", 10, "CHANGED")] + base[11:]
    got = table_checksum(_rowset(spark, mut), cols=["k", "s"]).first()
    assert got != ref
    # a duplicated row pair XORs to zero but sum_mod catches it
    dup = base + [base[0], base[0]]
    got2 = table_checksum(_rowset(spark, dup), cols=["k", "s"]).first()
    assert got2["xor_lo"] == ref["xor_lo"] and got2["xor_hi"] == ref["xor_hi"]
    assert got2["n_rows"] != ref["n_rows"] and got2["sum_mod"] != ref["sum_mod"]
    # NULL vs the string 'NULL' vs empty string all hash apart
    for variant in [("g", 0, None), ("g", 0, ""), ("g", 0, "\x1e")]:
        one = table_checksum(_rowset(spark, [variant]), cols=["k", "s"]).first()
        two = table_checksum(
            _rowset(spark, [("g", 0, "NULL")]), cols=["k", "s"]
        ).first()
        if variant[2] == "\x1e":
            continue  # documented marker collision, not fenced
        assert one != two


def test_checksum_field_shift_distinct(spark):
    # ('ab','c') must not collide with ('a','bc') — the separator test
    a = table_checksum(
        _rowset(spark, [("g", 1, "x")]).select(
            "grp", F.lit("ab").alias("k2"), F.lit("c").alias("s")
        ),
        cols=["k2", "s"],
    ).first()
    b = table_checksum(
        _rowset(spark, [("g", 1, "x")]).select(
            "grp", F.lit("a").alias("k2"), F.lit("bc").alias("s")
        ),
        cols=["k2", "s"],
    ).first()
    assert a != b


def test_checksum_groups_and_merge(spark):
    rows = [("g", i, "x") for i in range(10)] + [("h", i, "y") for i in range(5)]
    df = _rowset(spark, rows)
    per_group = table_checksum(df, cols=["k", "s"], group_cols=["grp"])
    assert per_group.count() == 2
    merged = merge_checksums(per_group).first()
    whole = table_checksum(df, cols=["k", "s"]).first()
    assert merged == whole


def test_checksum_type_fence(spark):
    df = spark.createDataFrame([(1.5, 1)], "d double, k long")
    with pytest.raises(ValueError, match="engine-dependent"):
        table_checksum(df, cols=["d", "k"])
    with pytest.raises(ValueError, match="missing"):
        table_checksum(df, cols=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        table_checksum(df.select("k"), cols=[], group_cols=[])


def test_checksum_diff_classifies_all_four(spark):
    from pandera_forge_spark.sketches import checksum_diff

    old_rows = (
        [("keep", i, f"v{i}") for i in range(10)]
        + [("mut", i, f"m{i}") for i in range(8)]
        + [("gone", i, "x") for i in range(3)]
    )
    new_rows = (
        [("keep", i, f"v{i}") for i in range(10)]
        + [("mut", i, "MUT" if i == 4 else f"m{i}") for i in range(8)]
        + [("born", i, "y") for i in range(2)]
    )
    o = table_checksum(_rowset(spark, old_rows), cols=["k", "s"], group_cols=["grp"])
    n = table_checksum(_rowset(spark, new_rows), cols=["k", "s"], group_cols=["grp"])
    full = {
        r["grp"]: r
        for r in checksum_diff(o, n, ["grp"], include_unchanged=True).collect()
    }
    assert full["keep"]["status"] == "unchanged"
    assert full["mut"]["status"] == "changed"
    assert full["mut"]["rows_delta"] == 0  # same count, different content
    assert full["gone"]["status"] == "removed"
    assert (full["gone"]["n_rows_new"], full["gone"]["rows_delta"]) == (None, -3)
    assert full["born"]["status"] == "added"
    assert (full["born"]["n_rows_old"], full["born"]["rows_delta"]) == (None, 2)
    # default drops unchanged — the incremental-revalidation work list
    work = checksum_diff(o, n, ["grp"]).collect()
    assert {r["grp"] for r in work} == {"mut", "gone", "born"}


def test_checksum_diff_duplicate_pair_not_blind(spark):
    from pandera_forge_spark.sketches import checksum_diff

    base = [("g", i, "x") for i in range(6)]
    o = table_checksum(_rowset(spark, base), cols=["k", "s"], group_cols=["grp"])
    n = table_checksum(
        _rowset(spark, base + [base[0], base[0]]),
        cols=["k", "s"],
        group_cols=["grp"],
    )
    got = checksum_diff(o, n, ["grp"]).collect()
    assert len(got) == 1 and got[0]["status"] == "changed"
    assert got[0]["rows_delta"] == 2


def test_checksum_diff_contracts_and_plan(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf
    from pandera_forge_spark.sketches import checksum_diff

    df = _rowset(spark, [("g", 1, "x")])
    cs = table_checksum(df, cols=["k", "s"], group_cols=["grp"])
    with pytest.raises(ValueError, match="group_cols"):
        checksum_diff(cs, cs, [])
    with pytest.raises(ValueError, match="old frame lacks"):
        checksum_diff(df, cs, ["grp"])
    with pytest.raises(ValueError, match="new frame lacks"):
        checksum_diff(cs, df, ["grp"])
    assert not has_python_udf(checksum_diff(cs, cs, ["grp"]))


# ---------------------------------------------------------------------------
# histogram sketch family
# ---------------------------------------------------------------------------

from pandera_forge_spark.plans.inspect import has_python_udf
from pandera_forge_spark.sketches import (
    drift_from_sketches,
    histogram_sketch,
    merge_histogram_sketches,
)

H_EDGES = [0.0, 10.0, 20.0, 50.0]


def _hdf(spark):
    rows = [
        ("p", float(v))
        for v in (-3, 0, 1, 10, 11, 19, 20, 30, 49, 50, 99, 200)
    ] + [("q", float(v)) for v in (5, 5, 15, 25, 60)] + [("q", None)]
    return spark.createDataFrame(rows, "g string, x double")


def test_histogram_sketch_exact_bins(spark):
    sk = {r["g"]: r for r in histogram_sketch(
        _hdf(spark), "x", H_EDGES, ["g"]).collect()}
    p = sk["p"]
    # bins: <=0 | (0,10] | (10,20] | (20,50] | >50
    # p values: {-3,0} {1,10} {11,19,20} {30,49,50} {99,200}
    assert (p["b0"], p["b1"], p["b2"], p["b3"], p["b4"]) == (2, 2, 3, 3, 2)
    assert p["n"] == 12
    q = sk["q"]
    assert (q["b0"], q["b1"], q["b2"], q["b3"], q["b4"]) == (0, 2, 1, 1, 1)
    assert q["n"] == 5  # NULL excluded
    assert not has_python_udf(histogram_sketch(_hdf(spark), "x", H_EDGES))


def test_histogram_merge_equals_full(spark):
    df = _hdf(spark)
    per_group = histogram_sketch(df, "x", H_EDGES, ["g"])
    merged = merge_histogram_sketches(per_group).collect()[0]
    full = histogram_sketch(df, "x", H_EDGES).collect()[0]
    assert tuple(merged) == tuple(full)
    # partition independence of the sketch itself
    a = sorted(map(tuple, histogram_sketch(df.repartition(7), "x", H_EDGES, ["g"]).collect()))
    b = sorted(map(tuple, histogram_sketch(df.coalesce(1), "x", H_EDGES, ["g"]).collect()))
    assert a == b


def test_drift_from_sketches_matches_wasserstein(spark):
    """Cross-operator differential: the sketch path reproduces the
    scan-side wasserstein_by_partition bit-for-bit, and the KS gap
    matches a python replay."""
    from pandera_forge_spark.drift import baseline_summary, wasserstein_by_partition

    df = _hdf(spark)
    cur = histogram_sketch(df, "x", H_EDGES, ["g"])
    base = merge_histogram_sketches(cur)
    got = {r["g"]: r for r in drift_from_sketches(cur, base, H_EDGES).collect()}
    want = {
        r["g"]: r
        for r in wasserstein_by_partition(
            df, "x", ["g"], baseline_summary(df, "x", edges=H_EDGES)
        ).collect()
    }
    for g in ("p", "q"):
        assert got[g]["w1"] == want[g]["w1"], g  # bit-identical
        assert got[g]["n"] == want[g]["n"]
    # python KS replay for group q: cums over planted bins
    P = [0, 2, 1, 1, 1]; Q = [2, 4, 4, 4, 3]; np_, nq = 5, 17
    cp = cq = 0; gaps = []
    for i in range(4):
        cp += P[i]; cq += Q[i]
        gaps.append(abs(cp * nq - cq * np_))
    assert got["q"]["ks"] == max(gaps) / (5.0 * 17.0)


def test_drift_from_sketches_fences(spark):
    df = _hdf(spark)
    cur = histogram_sketch(df, "x", H_EDGES, ["g"])
    base = merge_histogram_sketches(cur)
    with pytest.raises(ValueError, match="ONE sketch row"):
        drift_from_sketches(cur, cur, H_EDGES)
    with pytest.raises(ValueError, match="strictly increasing"):
        drift_from_sketches(cur, base, [1.0, 1.0])
    with pytest.raises(ValueError, match=">=2 edges"):
        histogram_sketch(df, "x", [1.0])
    with pytest.raises(ValueError, match="bins"):
        drift_from_sketches(cur, base, H_EDGES + [99.0])
    with pytest.raises(ValueError, match="b0..bk"):
        merge_histogram_sketches(cur.drop("b2"))
    with pytest.raises(ValueError, match="not in frame"):
        histogram_sketch(df, "nope", H_EDGES)
    # empty current row -> 0.0 drift, not NULL/crash
    empty = histogram_sketch(df.where("x > 1e9"), "x", H_EDGES)
    [r] = drift_from_sketches(empty, base, H_EDGES).collect()
    assert (r["n"], r["ks"], r["w1"]) == (0, 0.0, 0.0)


# --------------------------------------------------------- column_checksums


def test_column_checksums_localizes_the_changed_column(spark):
    from pandera_forge_spark.sketches import checksum_diff, column_checksums

    old = _rowset(spark, [("g", i, f"v{i}") for i in range(12)])
    # mutate ONE value in column s; k untouched
    new = _rowset(
        spark,
        [("g", i, "MUT" if i == 5 else f"v{i}") for i in range(12)],
    )
    oc = column_checksums(old, ["k", "s"], ["k"], group_cols=["grp"])
    nc = column_checksums(new, ["k", "s"], ["k"], group_cols=["grp"])
    # checksum_diff consumes the output unchanged, keyed by column
    work = checksum_diff(oc, nc, ["grp", "column"]).collect()
    assert [(r["grp"], r["column"], r["status"]) for r in work] == [
        ("g", "s", "changed")
    ]


def test_column_checksums_sees_values_moving_between_rows(spark):
    from pandera_forge_spark.sketches import column_checksums

    old = _rowset(spark, [("g", 1, "a"), ("g", 2, "b")])
    swapped = _rowset(spark, [("g", 1, "b"), ("g", 2, "a")])
    key = lambda frame: {
        r["column"]: (r["xor_lo"], r["xor_hi"], r["sum_mod"])
        for r in column_checksums(
            frame, ["s"], ["k"], group_cols=["grp"]
        ).collect()
    }
    # same multiset of values, different row assignment — must differ
    assert key(old)["s"] != key(swapped)["s"]


def test_column_checksums_contracts(spark):
    from pandera_forge_spark.sketches import column_checksums

    df = _rowset(spark, [("g", 1, "x")])
    with pytest.raises(ValueError, match="cols must"):
        column_checksums(df, [], ["k"])
    with pytest.raises(ValueError, match="id_cols"):
        column_checksums(df, ["s"], [])
    with pytest.raises(ValueError, match="missing"):
        column_checksums(df, ["nope"], ["k"])
    with pytest.raises(ValueError, match="engine-dependent"):
        column_checksums(
            df.withColumn("d", F.lit(1.5)), ["d"], ["k"]
        )
    with pytest.raises(ValueError, match="melt name"):
        column_checksums(
            df.withColumnRenamed("grp", "column"), ["s"], ["k"],
            group_cols=["column"],
        )
