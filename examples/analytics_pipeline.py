"""Event-analytics walkthrough — the temporal-operator trio on one
stream, runnable as-is against the driver testdata:

    python examples/analytics_pipeline.py [sf_dir]

Stages (100-TB shapes per SCALE.md):
  1. sessionize            session_stats (lag + running sum, one
                           shuffle; split_every for hot keys)
  2. conversion funnel     event_funnel (one shuffle + row-local fold)
  3. retention cohorts     retention_cohorts (dedup-first matrix)
  4. hourly rollup         time_rollup (partial-aggregated date_trunc)
Prints one JSON report per stage; returns the report dict when called
in-process (the pytest smoke does exactly that).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str) -> dict:
    from pandera_forge_spark.operators.temporal import (
        event_funnel,
        retention_cohorts,
        rolling_zscore,
        session_stats,
        time_rollup,
    )

    report: dict = {}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. sessions: 30-minute inactivity gap
    sess = session_stats(ev, "user_id", "ts", gap_seconds=1800.0)
    agg = sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 3).alias("avg_events"),
        F.round(F.avg("duration_secs"), 3).alias("avg_duration_s"),
    ).collect()[0]
    report["sessions"] = {k: float(agg[k]) for k in agg.asDict()}

    # 2. funnel: how far does each user get through view -> click ->
    #    purchase (strictly ordered)?
    funnel = event_funnel(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    dist = {
        int(r["steps_completed"]): int(r["count"])
        for r in funnel.groupBy("steps_completed").count().collect()
    }
    report["funnel"] = {f"completed_{k}": v for k, v in sorted(dist.items())}

    # 3. retention: daily cohort matrix, report the diagonal summary
    matrix = retention_cohorts(ev, "user_id", "ts", period_seconds=86400.0)
    report["retention"] = {
        "cells": matrix.count(),
        "day0_users": int(
            matrix.where(F.col("periods_since") == 0)
            .agg(F.sum("n_active"))
            .collect()[0][0]
        ),
    }

    # 4. rollup: events + value per hour, top hour by volume
    hourly = time_rollup(
        ev,
        "ts",
        "hour",
        [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        ],
    )
    top = hourly.orderBy(F.desc("n"), "bucket").first()
    report["rollup"] = {"hours": hourly.count(), "top_hour_events": int(top["n"])}

    # 5. anomalies: each event's value vs its event_type's trailing day
    flagged = rolling_zscore(
        ev, "event_type", "ts", "value", frame_seconds=86400, z_threshold=4.0
    )
    report["anomalies"] = {
        "n_flagged": flagged.where("is_anomaly").count(),
        "n_scored": flagged.where(F.col("z").isNotNull()).count(),
    }
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("analytics-pipeline-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        report = run(spark, sf_dir)
        print(json.dumps(report, indent=2))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
