"""Deterministic stratified sampling (operators/sampling.py)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from pandera_forge_spark.operators.sampling import (
    proportional_quotas,
    proportional_sample,
    stratified_take,
)


def _docs(spark):
    return spark.range(2000).selectExpr(
        "id as doc_id",
        "CASE WHEN id % 10 < 6 THEN 'en' WHEN id % 10 < 8 THEN 'de' "
        "WHEN id % 10 < 9 THEN 'fr' ELSE NULL END as lang",
        "concat('doc ', id) as text",
    )


def _exhaustive(df, strata, n, id_col):
    w = Window.partitionBy(*strata).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
        .drop("__rk")
    )


def test_stratified_take_matches_exhaustive_window(spark):
    """Prefiltered and exhaustive paths must return the SAME rows —
    the prefilter is a volume optimization, never a semantics change —
    and the null stratum is sampled like any other."""
    df = _docs(spark)
    want = {
        (r["doc_id"], r["lang"])
        for r in _exhaustive(df, ["lang"], 25, "doc_id").collect()
    }
    for pf in (True, False):
        got = {
            (r["doc_id"], r["lang"])
            for r in stratified_take(df, ["lang"], 25, "doc_id", prefilter=pf).collect()
        }
        assert got == want, f"prefilter={pf}"
    # 25 per stratum incl. the NULL lang stratum
    assert len(want) == 100
    assert sum(1 for _, lang in want if lang is None) == 25


def test_stratified_take_small_stratum_keeps_all(spark):
    """A stratum smaller than n yields all its rows."""
    df = _docs(spark).where((F.col("lang") == "fr") & (F.col("doc_id") < 200))
    assert df.count() == 20
    assert stratified_take(df, ["lang"], 50, "doc_id").count() == 20


def test_stratified_take_is_deterministic_across_partitioning(spark):
    """Same rows whatever the physical layout — the reproducibility
    contract random sampling can't give."""
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in stratified_take(df, ["lang"], 10, "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_take(df.repartition(17), ["lang"], 10, "doc_id").collect()
    )
    assert a == b


def test_proportional_quotas_largest_remainder(spark):
    df = _docs(spark)  # en 1200, de 400, fr 200, null 200
    q = proportional_quotas(df, ["lang"], 100)
    assert sum(q.values()) == 100
    assert q[("en",)] == 60 and q[("de",)] == 20
    assert q[("fr",)] == 10 and q[(None,)] == 10
    # quota never exceeds stratum size
    tiny = proportional_quotas(df.where(F.col("doc_id") < 20), ["lang"], 1000)
    assert sum(tiny.values()) == 20


def test_proportional_sample_counts(spark):
    df = _docs(spark)
    out = proportional_sample(df, ["lang"], 100, "doc_id")
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got == {"en": 60, "de": 20, "fr": 10, None: 10}


def test_prefilter_fallback_under_selection(spark, monkeypatch):
    """Force the threshold to under-select (SAFETY ~ 0) — the
    verification pass must detect every short stratum and fall back to
    its full row set, keeping the output byte-identical to the
    exhaustive window."""
    import pandera_forge_spark.operators.sampling as sampling

    df = _docs(spark)
    want = {
        (r["doc_id"], r["lang"])
        for r in _exhaustive(df, ["lang"], 15, "doc_id").collect()
    }
    monkeypatch.setattr(sampling, "SAFETY", 1e-9)
    got = {
        (r["doc_id"], r["lang"])
        for r in sampling.stratified_take(df, ["lang"], 15, "doc_id", prefilter=True).collect()
    }
    assert got == want


def test_prefilter_plan_shape(spark):
    """The prefilter's stratum-counts join must be a broadcast hash
    join (O(strata) build side), not a shuffle join."""
    from pandera_forge_spark.plans.inspect import executed_plan

    df = _docs(spark)
    out = stratified_take(df, ["lang"], 10, "doc_id", prefilter=True)
    out.collect()
    plan = executed_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_take_token_budget(spark):
    """Greedy per-stratum token budget in hash order: cumulative token
    sum <= budget, boundary row excluded, deterministic."""
    from pandera_forge_spark.operators.sampling import take_token_budget

    df = _docs(spark).withColumn("n_tokens", (F.col("doc_id") % 50) + 10)
    out = take_token_budget(df, ["lang"], 200, "doc_id", "n_tokens")
    rows = out.collect()
    # per-stratum sums never exceed the budget
    sums = {
        r["lang"]: r["s"]
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert sums and all(s <= 200 for s in sums.values())
    # greedy: adding the NEXT doc in hash order would cross the budget
    w_all = take_token_budget(df, ["lang"], 10**9, "doc_id", "n_tokens")
    assert w_all.count() == df.count()
    # determinism across partitioning
    again = {
        r["doc_id"]
        for r in take_token_budget(
            df.repartition(13), ["lang"], 200, "doc_id", "n_tokens"
        ).collect()
    }
    assert again == {r["doc_id"] for r in rows}


def test_compact_sketch_store_roundtrip(spark, tmp_path):
    """Compaction preserves binary sketches: the compacted store merges
    to the SAME profile as the epoch-accumulating store."""
    from pandera_forge_spark.sketches import (
        compact_sketch_store,
        merge_sketches,
        partition_sketches,
    )

    df1 = spark.range(0, 3000).selectExpr("id", "cast(id % 97 as double) v", "id % 4 p")
    df2 = spark.range(3000, 6000).selectExpr("id", "cast(id % 89 as double) v", "id % 4 p")
    src = str(tmp_path / "store")
    partition_sketches(df1, ["p"], ["v"]).write.parquet(f"{src}/__epoch=0")
    partition_sketches(df2, ["p"], ["v"]).write.parquet(f"{src}/__epoch=1")

    dest = str(tmp_path / "compacted")
    n = compact_sketch_store(spark, src, dest, ["p"])
    assert n == 4  # one row per partition, epochs folded

    a = merge_sketches(spark.read.parquet(f"{src}/*").drop("__epoch")).collect()[0]
    b = merge_sketches(spark.read.parquet(dest)).collect()[0]
    assert a["__rows"] == b["__rows"] == 6000
    assert a["v__nulls"] == b["v__nulls"]
    assert a["v__min"] == b["v__min"] and a["v__max"] == b["v__max"]
    assert a["v__distinct_est"] == b["v__distinct_est"]


# ------------------------------------------------------ deterministic shuffle

def test_deterministic_shuffle_stable_and_complete(spark):
    from pandera_forge_spark.operators.sampling import deterministic_shuffle

    df = _docs(spark)
    a = deterministic_shuffle(df, "doc_id", n_shards=8, salt="ep0")
    # repartitioning the INPUT differently must not change shard/order
    b = deterministic_shuffle(df.repartition(13), "doc_id", n_shards=8, salt="ep0")
    rows_a = sorted((r["doc_id"], r["__shard"], r["__order"]) for r in a.collect())
    rows_b = sorted((r["doc_id"], r["__shard"], r["__order"]) for r in b.collect())
    assert rows_a == rows_b
    assert len(rows_a) == df.count()
    shards = {s for _, s, _ in rows_a}
    assert shards == set(range(8))


def test_deterministic_shuffle_salt_changes_permutation(spark):
    from pandera_forge_spark.operators.sampling import deterministic_shuffle

    df = _docs(spark)
    a = deterministic_shuffle(df, "doc_id", 4, salt="ep0")
    b = deterministic_shuffle(df, "doc_id", 4, salt="ep1")
    oa = [r["doc_id"] for r in a.orderBy("__order").limit(50).collect()]
    ob = [r["doc_id"] for r in b.orderBy("__order").limit(50).collect()]
    assert oa != ob


def test_deterministic_shuffle_projection_only(spark):
    from pandera_forge_spark.operators.sampling import deterministic_shuffle

    df = _docs(spark)
    plan = (
        deterministic_shuffle(df, "doc_id", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # shard/order assignment itself adds no shuffle; the export's
    # repartition(__shard) is the single intended exchange
    assert "Exchange" not in plan


def test_pack_concat_split(spark):
    from pandera_forge_spark.operators.sampling import pack_concat_split

    df = spark.createDataFrame(
        [(i, 60) for i in range(10)], "id long, tok int"
    )
    m = pack_concat_split(df, "id", "tok", 100, n_shards=1).collect()
    rows = sorted(m, key=lambda r: r["start_offset"])
    # concatenated offsets are 0,60,120,... regardless of input order
    assert [r["start_offset"] for r in rows] == [60 * i for i in range(10)]
    # doc at offset 60 straddles packs 0 and 1 (60..119 vs capacity 100)
    assert (rows[1]["pack_first"], rows[1]["pack_last"]) == (0, 1)
    # total span: last doc ends at 600 -> pack_last floor(599/100)=5
    assert rows[-1]["pack_last"] == 5
    # determinism: same result under different input partitioning
    again = pack_concat_split(df.repartition(7), "id", "tok", 100, n_shards=1).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, m))


def test_pack_greedy(spark):
    from pandera_forge_spark.operators.sampling import pack_greedy

    # tokens chosen so greedy behavior is visible: capacity 100
    df = spark.createDataFrame(
        [(1, 70), (2, 40), (3, 30), (4, 150), (5, 10)], "id long, tok int"
    )
    m = {r["id"]: r for r in pack_greedy(df, "id", "tok", 100, n_shards=1).collect()}
    # no pack except oversized-doc packs exceeds capacity
    by_pack = {}
    for r in m.values():
        by_pack.setdefault(r["pack"], []).append(r)
    for rows in by_pack.values():
        total = sum(r["tokens"] for r in rows)
        assert total <= 100 or len(rows) == 1
    # the 150-token doc sits alone
    big = m[4]
    assert len(by_pack[big["pack"]]) == 1
    # positions are 0..k-1 within each pack (order by pos)
    for rows in by_pack.values():
        assert sorted(r["pos"] for r in rows) == list(range(len(rows)))
    # determinism across partitioning
    again = {r["id"]: (r["pack"], r["pos"])
             for r in pack_greedy(df.repartition(5), "id", "tok", 100, n_shards=1).collect()}
    assert again == {k: (r["pack"], r["pos"]) for k, r in m.items()}


def test_weighted_take_deterministic_and_biased(spark):
    from pandera_forge_spark.operators.sampling import weighted_take

    # 20 heavy rows (w=1000) among 200 light rows (w=0.01): a 30-row
    # weighted sample must contain essentially every heavy row
    rows = [(i, 1000.0 if i < 20 else 0.01) for i in range(220)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_take(df, 30, "id", "w")
    ids = sorted(r["id"] for r in got.collect())
    assert len(ids) == 30
    assert sum(1 for i in ids if i < 20) >= 19
    # deterministic: same call -> identical ids
    again = sorted(r["id"] for r in weighted_take(df, 30, "id", "w").collect())
    assert ids == again
    # different salt -> a different light-row tail (heavy core stable)
    other = sorted(
        r["id"] for r in weighted_take(df, 30, "id", "w", salt="epoch2").collect()
    )
    assert other != ids


def test_weighted_take_strata_and_bad_weights(spark):
    from pandera_forge_spark.operators.sampling import weighted_take

    rows = [(i, "g%d" % (i % 3), float(i % 5)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    got = weighted_take(df, 4, "id", "w", strata_cols=["g"]).collect()
    per = {}
    for r in got:
        per.setdefault(r["g"], []).append(r["id"])
    assert all(len(v) == 4 for v in per.values()) and len(per) == 3
    # rows with w==0 (i%5==0) can never be sampled
    assert all(r["w"] > 0 for r in got)


def test_weighted_take_rank_limit_pushdown(spark):
    """The per-stratum rank must trigger Spark's WindowGroupLimit
    pushdown: a Partial (map-side) top-n trim BEFORE the exchange, so
    a hot stratum never ships its whole row set through the shuffle."""
    from pandera_forge_spark.operators.sampling import weighted_take
    from pandera_forge_spark.plans.inspect import executed_plan

    rows = [(i, "hot" if i % 10 else "cold", float(1 + i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = weighted_take(df, 5, "id", "w", strata_cols=["g"])
    plan = executed_plan(out)
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_proportional_quotas_strata_fence(spark):
    """The O(strata) driver collect is loudly fenced: a per-key stratum
    column (accidental per-URL grouping) raises instead of pulling the
    corpus onto the driver; driver memory stays bounded by the limit
    even in the failing case."""
    import pytest

    from pandera_forge_spark.operators.sampling import proportional_quotas

    df = spark.range(100).withColumn("k", F.col("id") % 20)
    with pytest.raises(ValueError, match="strata"):
        proportional_quotas(df, ["k"], 10, max_strata=5)
    # normal cardinality unaffected
    q = proportional_quotas(df, ["k"], 10, max_strata=1000)
    assert sum(q.values()) == 10


def test_train_val_test_split_deterministic_and_proportional(spark):
    """Split labels are a pure function of (salt, id): identical across
    repartitionings, fractions land within tolerance on 6k rows, every
    row gets exactly one label, a different salt moves rows, and the
    plan stays a pure projection (no exchange, no UDF)."""
    import pytest as _pytest

    from pandera_forge_spark.operators.sampling import train_val_test_split
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.range(6000).select(F.col("id").cast("string").alias("doc_id"))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = train_val_test_split(df, "doc_id", fr, salt="s1")
    got = {r["doc_id"]: r["__split"] for r in out.collect()}
    assert len(got) == 6000 and set(got.values()) == {"train", "val", "test"}

    counts = {}
    for v in got.values():
        counts[v] = counts.get(v, 0) + 1
    for name, f in fr.items():
        assert abs(counts[name] / 6000 - f) < 0.02, (name, counts)

    # partitioning-independent
    re = {
        r["doc_id"]: r["__split"]
        for r in train_val_test_split(
            df.repartition(13), "doc_id", fr, salt="s1"
        ).collect()
    }
    assert re == got

    # independent assignment under a different salt
    other = {
        r["doc_id"]: r["__split"]
        for r in train_val_test_split(df, "doc_id", fr, salt="s2").collect()
    }
    moved = sum(1 for k in got if got[k] != other[k])
    assert moved > 1000  # ~32% expected; far from 0

    # pure narrow projection
    assert not has_python_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with _pytest.raises(ValueError):
        train_val_test_split(df, "doc_id", {})
    with _pytest.raises(ValueError):
        train_val_test_split(df, "doc_id", {"train": 0.5, "val": 0.4})
    with _pytest.raises(ValueError):
        train_val_test_split(df, "doc_id", {"train": 1.5, "val": -0.5})


def test_train_val_test_split_group_integrity(spark):
    """group_col keeps every row of a group in ONE split (the near-dup
    leak defense), and NULL group keys land together deterministically."""
    from pandera_forge_spark.operators.sampling import train_val_test_split

    rows = [(f"d{i}", f"g{i % 200}" if i % 17 else None) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id string, cluster string")
    out = train_val_test_split(
        df, "doc_id", {"train": 0.7, "val": 0.3}, group_col="cluster"
    )
    per_group = (
        out.groupBy("cluster")
        .agg(F.countDistinct("__split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_group)
    null_splits = {
        r["__split"] for r in out.where(F.col("cluster").isNull()).collect()
    }
    assert len(null_splits) == 1


# ---------------------------------------------------------------------------
# target-mixture sampling
# ---------------------------------------------------------------------------


def test_mixture_quotas_feasible_max(spark):
    from pandera_forge_spark.operators.sampling import mixture_quotas

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # sf0.001 lang sizes: en 193, de 71, fr 82 (es/zh unweighted)
    q = mixture_quotas(docs, ["lang"], {"en": 0.5, "de": 0.3, "fr": 0.2})
    # T = min(193/.5, 71/.3, 82/.2) = 236; largest-remainder fill
    assert q == {("en",): 118, ("de",): 71, ("fr",): 47}
    assert sum(q.values()) == 236


def test_mixture_quotas_explicit_total(spark):
    from pandera_forge_spark.operators.sampling import mixture_quotas

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = mixture_quotas(docs, ["lang"], {"en": 0.5, "de": 0.3, "fr": 0.2}, 50)
    assert q == {("en",): 25, ("de",): 15, ("fr",): 10}
    # weights need not be pre-normalized
    q2 = mixture_quotas(docs, ["lang"], {"en": 5, "de": 3, "fr": 2}, 50)
    assert q2 == q


def test_mixture_quotas_loud_fences(spark):
    import pytest

    from pandera_forge_spark.operators.sampling import mixture_quotas

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="feasible ceiling"):
        mixture_quotas(docs, ["lang"], {"en": 0.5, "de": 0.3, "fr": 0.2}, 10_000)
    with pytest.raises(ValueError, match="absent from the corpus"):
        mixture_quotas(docs, ["lang"], {"en": 0.5, "klingon": 0.5})
    with pytest.raises(ValueError, match="positive"):
        mixture_quotas(docs, ["lang"], {"en": 0.5, "de": -0.5})
    assert mixture_quotas(docs, ["lang"], {}) == {}


def test_mixture_sample_selection(spark):
    from pyspark.sql import functions as F

    from pandera_forge_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = mixture_sample(docs, ["lang"], {"en": 0.5, "de": 0.3, "fr": 0.2},
                         "doc_id", total_n=50)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 25, "de": 15, "fr": 10}
    # the en picks are exactly the 25 smallest md5(doc_id) among en docs
    expect = {
        r["doc_id"]
        for r in docs.where(F.col("lang") == "en")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(25)
        .collect()
    }
    got = {r["doc_id"] for r in out.where(F.col("lang") == "en").collect()}
    assert got == expect
    # partitioning-independent
    again = mixture_sample(docs.repartition(13), ["lang"],
                           {"en": 0.5, "de": 0.3, "fr": 0.2}, "doc_id", 50)
    assert {r["doc_id"] for r in again.collect()} == {
        r["doc_id"] for r in out.collect()
    }


def test_mixture_sample_multi_col_strata(spark):
    from pyspark.sql import functions as F

    from pandera_forge_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    two = docs.withColumn("half", (F.col("doc_id") % 2).cast("int"))
    out = mixture_sample(
        two, ["lang", "half"],
        {("en", 0): 0.5, ("de", 1): 0.5}, "doc_id", total_n=20,
    )
    counts = {(r["lang"], r["half"]): r["n"] for r in
              out.groupBy("lang", "half").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {("en", 0): 10, ("de", 1): 10}


def test_mixture_sample_plan_clean(spark):
    from pandera_forge_spark.operators.sampling import mixture_sample
    from pandera_forge_spark.plans.inspect import has_python_udf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = mixture_sample(docs, ["lang"], {"en": 0.6, "de": 0.4}, "doc_id", 20)
    assert not has_python_udf(out)


# --- calibrate_scores -----------------------------------------------------

import pytest

from pandera_forge_spark.operators.sampling import calibrate_scores


def test_calibrate_midrank(spark):
    # group g: scores 0.1 x2, 0.2 x1, 0.9 x1 (n=4)
    rows = [
        ("g", 0.1), ("g", 0.1), ("g", 0.2), ("g", 0.9),
        ("h", 5.0),
        ("i", None),
    ]
    df = spark.createDataFrame(rows, "src string, score double")
    got = [
        (r["src"], r["score"], r["score_pct"])
        for r in calibrate_scores(df, "src", "score").collect()
    ]
    by = {}
    for s, sc, p in got:
        by.setdefault((s, sc), []).append(p)
    # midrank: (2*below + in_bucket) / (2*n)
    assert by[("g", 0.1)] == [2 / 8, 2 / 8]
    assert by[("g", 0.2)] == [5 / 8]
    assert by[("g", 0.9)] == [7 / 8]
    assert by[("h", 5.0)] == [1 / 2]  # single row: midrank 0.5
    assert by[("i", None)] == [None]  # NULL score calibrates to NULL
    assert len(got) == 6  # no rows lost


def test_calibrate_grid_resolution(spark):
    # scores 0.1001 and 0.1002 share a grid-1000 cell -> same pct;
    # at grid=10000 they separate
    rows = [("g", 0.1001), ("g", 0.1002), ("g", 0.5)]
    df = spark.createDataFrame(rows, "src string, score double")
    coarse = sorted(
        r["score_pct"] for r in calibrate_scores(df, "src", "score").collect()
    )
    assert coarse[0] == coarse[1]
    fine = sorted(
        r["score_pct"]
        for r in calibrate_scores(df, "src", "score", grid=10000).collect()
    )
    assert fine[0] < fine[1] < fine[2]


def test_calibrate_nonfinite_raises_inband(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", float("nan"))], "src string, score double"
    )
    with pytest.raises(Exception, match="non-finite"):
        calibrate_scores(df, "src", "score").collect()
    with pytest.raises(ValueError, match="grid"):
        calibrate_scores(df, "src", "score", grid=0)
    with pytest.raises(ValueError, match="reserved|exists"):
        calibrate_scores(df.withColumn("score_pct", F.lit(0)), "src", "score")


# ------------------------------------------------------- neyman_allocation


def test_neyman_allocates_by_size_times_spread(spark):
    from pandera_forge_spark.operators.sampling import neyman_allocation

    rows = (
        # big + wild stratum: 100 rows, values 0..99
        [("wild", float(i)) for i in range(100)]
        # big + constant stratum: 100 rows, zero spread
        + [("flat", 5.0)] * 100
        # small + moderate stratum
        + [("small", float(i % 10)) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {r["grp"]: r for r in neyman_allocation(df, ["grp"], "v", 90).collect()}
    assert sum(r["alloc"] for r in got.values()) == 90
    assert got["flat"]["alloc"] == 0  # zero spread -> zero budget
    assert got["wild"]["alloc"] > got["small"]["alloc"] > 0
    assert got["flat"]["std_value"] == 0.0
    assert got["wild"]["n_rows"] == 100
    # weights ~ N*S: wild 100*28.86, small 20*2.87 -> ~98%/2% of 90
    assert got["wild"]["alloc"] >= 85


def test_neyman_exact_total_and_python_replay(spark):
    import math

    from pandera_forge_spark.operators.sampling import neyman_allocation

    rows = [(f"s{i % 7}", float((i * 37) % 101) / 3.0) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = sorted(
        neyman_allocation(df, ["grp"], "v", 123).collect(),
        key=lambda r: r["grp"],
    )
    assert sum(r["alloc"] for r in got) == 123
    # full python replay of the exact-integer + fixed-IEEE pipeline
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0, 0])  # n, sum_micro, sumsq_micro
    for g, v in rows:
        m = math.floor(v * 1000000.0)
        a = acc[g]
        a[0] += 1
        a[1] += m
        a[2] += m * m
    weights = {}
    for g, (n, sm, sq) in acc.items():
        var = max((n * float(sq) - float(sm) * float(sm)) / (n * float(n)), 0.0)
        weights[g] = math.floor(n * math.sqrt(var))
    sw = sum(weights.values())
    qs = {g: 123.0 * w / sw for g, w in weights.items()}
    floors = {g: math.floor(q) for g, q in qs.items()}
    deficit = 123 - sum(floors.values())
    order = sorted(qs, key=lambda g: (-(qs[g] - floors[g]), g))
    expect = dict(floors)
    for g in order[: max(deficit, 0)]:
        expect[g] += 1
    assert {r["grp"]: r["alloc"] for r in got} == expect


def test_neyman_null_values_fallback_and_cap(spark):
    from pandera_forge_spark.operators.sampling import neyman_allocation

    # every value NULL -> zero total weight -> proportional fallback
    df = spark.createDataFrame(
        [("a", None)] * 30 + [("b", None)] * 10,
        "grp string, v double",
    )
    got = {r["grp"]: r for r in neyman_allocation(df, ["grp"], "v", 20).collect()}
    assert got["a"]["alloc"] == 15 and got["b"]["alloc"] == 5
    assert got["a"]["mean_value"] is None and got["a"]["std_value"] is None
    # cap_at_stratum clamps to stratum size (total then undershoots)
    small = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("b", 2.0), ("b", 8.0)], "grp string, v double"
    )
    capped = {
        r["grp"]: r["alloc"]
        for r in neyman_allocation(
            small, ["grp"], "v", 10, cap_at_stratum=True
        ).collect()
    }
    assert all(v <= 2 for v in capped.values())


def test_neyman_partition_independent_and_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.sampling import neyman_allocation
    from pandera_forge_spark.plans.inspect import has_python_udf

    rows = [(f"s{i % 5}", float(i % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, v double")
    key = lambda rs: sorted((r["grp"], r["alloc"]) for r in rs)
    a = key(neyman_allocation(df.repartition(1), ["grp"], "v", 50).collect())
    b = key(neyman_allocation(df.repartition(11, "v"), ["grp"], "v", 50).collect())
    assert a == b
    assert not has_python_udf(neyman_allocation(df, ["grp"], "v", 50))
    with pytest.raises(ValueError, match="missing"):
        neyman_allocation(df, ["nope"], "v", 10)
    with pytest.raises(ValueError, match="total_n"):
        neyman_allocation(df, ["grp"], "v", -1)
    with pytest.raises(ValueError, match="non-empty"):
        neyman_allocation(df, [], "v", 10)
    with pytest.raises(Exception, match="micro-long envelope"):
        bad = spark.createDataFrame([("a", 1e10)], "grp string, v double")
        neyman_allocation(bad, ["grp"], "v", 5).collect()


def test_neyman_sample_takes_designed_quotas(spark):
    from pandera_forge_spark.operators.sampling import (
        neyman_allocation,
        neyman_sample,
    )

    rows = [
        (i, f"s{i % 3}", float((i * 17) % 50) * (1.0 if i % 3 else 0.1))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = neyman_sample(df, ["grp"], "v", 60, "id").collect()
    alloc = {
        r["grp"]: r["alloc"]
        for r in neyman_allocation(
            df, ["grp"], "v", 60, cap_at_stratum=True
        ).collect()
    }
    from collections import Counter

    taken = Counter(r["grp"] for r in got)
    assert dict(taken) == {g: n for g, n in alloc.items() if n > 0}
    # deterministic: same rows at any partitioning
    again = neyman_sample(df.repartition(13, "v"), ["grp"], "v", 60, "id")
    assert sorted(r["id"] for r in got) == sorted(
        r["id"] for r in again.collect()
    )
    # md5-order: each stratum's take is its n lowest md5(id) keys
    import hashlib

    by_grp = {}
    for i, g, _ in rows:
        by_grp.setdefault(g, []).append(
            (hashlib.md5(str(i).encode()).hexdigest(), str(i), i)
        )
    for g, n in alloc.items():
        expect = {t[2] for t in sorted(by_grp[g])[:n]}
        assert {r["id"] for r in got if r["grp"] == g} == expect


# ----------------------------------------------------------------- dense_ids


def test_dense_ids_match_global_hash_order(spark):
    import hashlib

    from pandera_forge_spark.operators.sampling import dense_ids

    ids = [f"doc{i}" for i in range(500)]
    df = spark.createDataFrame([(x,) for x in ids], "id string")
    got = {r["id"]: r["dense_id"] for r in dense_ids(df, "id").collect()}
    order = sorted(ids, key=lambda x: (hashlib.md5(x.encode()).hexdigest(), x))
    expect = {x: i for i, x in enumerate(order)}
    assert got == expect
    # dense and gap-free
    assert sorted(got.values()) == list(range(500))


def test_dense_ids_partition_and_bucket_independent(spark):
    from pandera_forge_spark.operators.sampling import dense_ids

    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    a = {r["id"]: r["dense_id"] for r in dense_ids(df.repartition(1), "id").collect()}
    b = {
        r["id"]: r["dense_id"]
        for r in dense_ids(df.repartition(17), "id", n_buckets=8).collect()
    }
    assert a == b


def test_dense_ids_no_single_partition_window(spark):
    from pandera_forge_spark.operators.sampling import dense_ids
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    out = dense_ids(df, "id", n_buckets=16)
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "SinglePartition" not in plan, plan


def test_dense_ids_contracts(spark):
    import pytest

    from pandera_forge_spark.operators.sampling import dense_ids

    df = spark.createDataFrame([(1,), (2,)], "id long")
    with pytest.raises(ValueError, match="missing"):
        dense_ids(df, "nope")
    with pytest.raises(ValueError, match="already exists"):
        dense_ids(df.withColumn("dense_id", F.lit(1)), "id")
    with pytest.raises(ValueError, match="n_buckets"):
        dense_ids(df, "id", n_buckets=0)
    with pytest.raises(Exception, match="NULL id"):
        bad = spark.createDataFrame([(1,), (None,)], "id long")
        dense_ids(bad, "id").collect()
    # duplicates get consecutive distinct dense ids
    dup = spark.createDataFrame([("a",), ("a",), ("b",)], "id string")
    got = dense_ids(dup, "id").collect()
    assert sorted(r["dense_id"] for r in got) == [0, 1, 2]


def test_numeric_balance_hand_computed(spark):
    """Split x: [1,2,3], split y: [11,12,13]: means 2/12, pop var 2/3
    each -> SMD = 10/sqrt(2/3); identical constants -> NULL smd."""
    import math

    from pandera_forge_spark.operators.sampling import numeric_balance

    rows = [("x", float(v), 5.0) for v in (1, 2, 3)] + [
        ("y", float(v), 5.0) for v in (11, 12, 13)
    ]
    df = spark.createDataFrame(rows, "split string, a double, c double")
    got = {r.column: r for r in numeric_balance(
        df, "split", ["a", "c"]
    ).collect()}
    ra = got["a"]
    assert (ra.split_a, ra.split_b, ra.n_a, ra.n_b) == ("x", "y", 3, 3)
    assert abs(ra.smd - 10.0 / math.sqrt(2.0 / 3.0)) < 1e-9
    assert got["c"].smd is None     # zero pooled variance -> loud NULL
    import pytest

    with pytest.raises(ValueError, match="value_cols"):
        numeric_balance(df, "split", [])
    with pytest.raises(ValueError, match="missing"):
        numeric_balance(df, "split", ["ghost"])


def test_cuped_summary_and_adjust_reference(spark):
    """y perfectly linear in x: theta = slope, adjusted variance 0,
    reduction 100%; a noisy case replayed against numpy moments; the
    adjusted column's mean equals the raw mean."""
    import numpy as np

    from pandera_forge_spark.operators.sampling import (
        cuped_adjust,
        cuped_summary,
    )

    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    ys = [2 * v + 1 for v in xs]
    df = spark.createDataFrame(list(zip(ys, xs)), "y double, x double")
    r = cuped_summary(df, "y", "x").collect()[0]
    assert abs(r.theta - 2.0) < 1e-9
    assert abs(r.var_adj) < 1e-9 and abs(r.reduction_pct - 100.0) < 1e-6

    ys2 = [3.0, 5.5, 6.0, 9.5, 10.0, 14.0]
    df2 = spark.createDataFrame(list(zip(ys2, xs)), "y double, x double")
    r2 = cuped_summary(df2, "y", "x").collect()[0]
    X, Y = np.array(xs), np.array(ys2)
    cov = ((X - X.mean()) * (Y - Y.mean())).mean()
    theta = cov / X.var()
    assert abs(r2.theta - theta) < 1e-9
    assert abs(r2.var_adj - (Y.var() - cov ** 2 / X.var())) < 1e-9
    adj = cuped_adjust(df2, "y", "x")
    rows = adj.collect()
    got_mean = sum(r["y_cuped"] for r in rows) / len(rows)
    assert abs(got_mean - Y.mean()) < 1e-9
    # adjusted values match the formula
    for r in rows:
        assert abs(r["y_cuped"] - (r["y"] - theta * (r["x"] - X.mean()))) < 1e-9


def test_cuped_degenerate_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.sampling import (
        cuped_adjust,
        cuped_summary,
    )

    const = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0)], "y double, x double"
    )
    r = cuped_summary(const, "y", "x").collect()[0]
    assert r.theta is None and r.reduction_pct is None
    adj = cuped_adjust(const, "y", "x").collect()
    assert [a["y_cuped"] for a in adj] == [1.0, 2.0]  # no-op, not a crash
    with pytest.raises(ValueError, match="missing"):
        cuped_summary(const, "ghost", "x")
    with pytest.raises(ValueError, match="already exists"):
        cuped_adjust(const, "y", "x", out_col="x")


def test_did_estimate_hand_computed(spark):
    """Control rises 1 -> 2; treated rises 10 -> 15 on top of its own
    level: DiD = (15-10) - (2-1) = 4 exactly; SE replayed from the
    four cell variances; an empty cell -> NULL, loudly."""
    import math

    from pandera_forge_spark.operators.sampling import did_estimate

    rows = []
    rows += [(1, 0, v) for v in (9.0, 10.0, 11.0)]     # treated pre
    rows += [(1, 1, v) for v in (14.0, 15.0, 16.0)]    # treated post
    rows += [(0, 0, v) for v in (0.5, 1.0, 1.5)]       # control pre
    rows += [(0, 1, v) for v in (1.5, 2.0, 2.5)]       # control post
    df = spark.createDataFrame(rows, "t int, p int, y double")
    r = did_estimate(
        df, F.col("t") == 1, F.col("p") == 1, "y"
    ).collect()[0]
    assert (r.n_tp, r.n_tc, r.n_cp, r.n_cc) == (3, 3, 3, 3)
    assert abs(r.did - 4.0) < 1e-12
    import statistics

    cells = {
        "tp": [14.0, 15.0, 16.0], "tc": [9.0, 10.0, 11.0],
        "cp": [1.5, 2.0, 2.5], "cc": [0.5, 1.0, 1.5],
    }
    se = math.sqrt(sum(statistics.pvariance(v) / 3 for v in cells.values()))
    assert abs(r.se - se) < 1e-12
    empty = df.where(~((F.col("t") == 1) & (F.col("p") == 1)))
    r2 = did_estimate(
        empty, F.col("t") == 1, F.col("p") == 1, "y"
    ).collect()[0]
    assert r2.did is None and r2.n_tp == 0


def test_aa_calibration_null_distribution_and_replay(spark):
    """On an honest fixture every placebo z is modest (no |z| > 4 in
    12 splits over 2000 units), and one split replays exactly in
    python: same md5 parity, same counts, same z."""
    import hashlib
    import math

    from pandera_forge_spark.operators.sampling import aa_calibration

    rows = [(u, 1 if (u * 2654435761) % 97 < 30 else 0)
            for u in range(2000)]
    df = spark.createDataFrame(rows, "unit long, ok int")
    out = {r.split: r for r in aa_calibration(
        df, "unit", F.col("ok") == 1, n_splits=12
    ).collect()}
    assert len(out) == 12
    assert all(r.z is not None and abs(r.z) < 4 for r in out.values())

    def treat(k, u):
        h = hashlib.md5(f"aa#{k}#{u}".encode()).hexdigest()
        return int(h[:8], 16) % 2 == 0

    k = 3
    nt = sum(1 for u, _ in rows if treat(k, u))
    xt = sum(ok for u, ok in rows if treat(k, u))
    nc = len(rows) - nt
    xc = sum(ok for _, ok in rows) - xt
    r = out[k]
    assert (r.n_t, r.x_t, r.n_c, r.x_c) == (nt, xt, nc, xc)
    pool = (xt + xc) / (nt + nc)
    z = (xt / nt - xc / nc) / math.sqrt(
        pool * (1 - pool) * (1 / nt + 1 / nc)
    )
    assert abs(r.z - z) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="n_splits"):
        aa_calibration(df, "unit", F.col("ok") == 1, n_splits=0)
    with pytest.raises(ValueError, match="missing"):
        aa_calibration(df, "ghost", F.col("ok") == 1)


def test_mde_report_hand_computed(spark):
    """Known variance slice replayed in python; planned-size override
    scales as 1/sqrt(n); degenerate zero-variance slice -> NULL."""
    import math
    import statistics

    from pandera_forge_spark.operators.sampling import (
        Z_ALPHA_2,
        Z_BETA,
        mde_report,
    )

    vals = [2.0, 4.0, 4.0, 6.0, 8.0, 10.0, 3.0, 5.0]
    rows = [("a", v) for v in vals] + [("c", 7.0)] * 4
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {r.grp: r for r in mde_report(df, "v", ["grp"]).collect()}
    var = statistics.pvariance(vals)
    arm = len(vals) // 2
    expect = (Z_ALPHA_2 + Z_BETA) * math.sqrt(2 * var / arm)
    assert abs(got["a"].mde_abs - expect) < 1e-12
    assert abs(got["a"].mde_rel - expect / statistics.mean(vals)) < 1e-12
    assert got["c"].mde_abs is None      # zero variance, loudly
    planned = {r.grp: r for r in mde_report(
        df, "v", ["grp"], n_per_arm=1000
    ).collect()}
    expect2 = (Z_ALPHA_2 + Z_BETA) * math.sqrt(2 * var / 1000)
    assert abs(planned["a"].mde_abs - expect2) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="n_per_arm"):
        mde_report(df, "v", ["grp"], n_per_arm=1)
    with pytest.raises(ValueError, match="group_cols"):
        mde_report(df, "v", [])
