"""Plan-shape discipline for the continuation-session operators: no
Python evaluation operator anywhere, no cartesian/nested-loop join in
any hot path (the only crossJoins are 1-row broadcast stats frames,
which compile to BroadcastNestedLoopJoin over ONE row — asserted
separately where used)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_prefix_join_plan_udf_free_no_cartesian(spark, docs):
    from pandera_forge_spark.operators.dedup import similarity_join_prefix

    out = similarity_join_prefix(
        docs.select("doc_id", "text").limit(300), "text", "doc_id", 0.8
    )
    assert not has_python_udf(out)
    plan = executed_plan(out)
    assert "CartesianProduct" not in plan


def test_census_family_plans_udf_free(spark, docs):
    from pandera_forge_spark.operators.text import (
        jsd_matrix,
        keyness_by_group,
        token_entropy,
        zipf_fit,
    )
    from pandera_forge_spark.profiler import chao1_estimate

    for out in (
        zipf_fit(docs, group_cols=["lang"], top_k=10),
        token_entropy(docs, group_cols=["lang"]),
        keyness_by_group(docs, "text", "lang", top_k=3, min_count=2),
        jsd_matrix(docs, "text", "source", vocab_k=20),
    ):
        assert not has_python_udf(out)
        assert "CartesianProduct" not in executed_plan(out)
    tok = docs.select(
        "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    assert not has_python_udf(chao1_estimate(tok, "tok", ["lang"]))


def test_rank_family_plans_udf_free(spark, events):
    from pandera_forge_spark.operators.labels import (
        auc_score,
        lift_table,
        pr_curve,
    )
    from pandera_forge_spark.profiler import (
        hill_tail_index,
        robust_stats,
        spearman_matrix,
    )

    y = F.col("user_id") % 3 == 0
    for out in (
        auc_score(events, "value", y, ["event_type"]),
        lift_table(events, "value", y, n_bins=5),
        pr_curve(events, "value", y, n_points=5),
        robust_stats(events, "value", ["event_type"], "event_id"),
        hill_tail_index(events, "value", ["event_type"], "event_id", k=10),
        spearman_matrix(
            events.select("value", (F.col("user_id") % 7).cast("double").alias("u")),
            ["value", "u"],
        ),
    ):
        assert not has_python_udf(out)
        assert "CartesianProduct" not in executed_plan(out)


def test_series_family_plans_udf_free(spark, events):
    from pandera_forge_spark.operators.temporal import (
        cross_correlation,
        runs_test,
        seasonal_strength,
        sprt_monitor,
    )

    for out in (
        cross_correlation(
            events, "ts", F.col("event_type") == "click",
            F.col("event_type") == "purchase", max_lag=3,
        ),
        runs_test(events, "ts", "value", ["event_type"]),
        seasonal_strength(events, "ts", ["event_type"]),
        sprt_monitor(
            events, "ts", ["event_type"], F.col("value") > 100,
            p0=0.1, p1=0.3,
        ),
    ):
        assert not has_python_udf(out)
        assert "CartesianProduct" not in executed_plan(out)


def test_stats_family_plans_udf_free(spark, events):
    from pandera_forge_spark.drift import (
        baseline_summary,
        bh_adjust,
        drift_by_partition,
        importance_weight_bins,
        ks_pvalue,
        quantile_normalize,
    )
    from pandera_forge_spark.profiler import bootstrap_ci
    from pandera_forge_spark.validator import mcnemar_verdicts

    base = baseline_summary(events, "value", edges=[10.0, 50.0])
    d = drift_by_partition(events, "value", ["event_type"], base)
    scored = d.withColumn("p", ks_pvalue(F.col("ks"), F.col("n"), F.lit(1000)))
    for out in (
        bh_adjust(scored, "p", tie_cols=["event_type"]),
        quantile_normalize(events, "value", ["event_type"], "event_id", grid=10),
        importance_weight_bins(events, "value", base),
        bootstrap_ci(events, "value", "event_id", ["event_type"], n_boot=5),
        mcnemar_verdicts(events, F.col("value") > 50, F.col("value") > 100),
    ):
        assert not has_python_udf(out)
        assert "CartesianProduct" not in executed_plan(out)
