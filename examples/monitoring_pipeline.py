"""Data-ops monitoring walkthrough — CDC ingest + timeline-integrity
validation on one feed, runnable as-is against the driver testdata:

    python examples/monitoring_pipeline.py [sf_dir]

The shape every warehouse ops loop converges on: apply today's change
stream onto the standing snapshot, then interrogate the feed's health
before anything downstream trusts it. Stages (100-TB shapes per
SCALE.md):
  1. changelog apply     latest_by_key + apply_changelog (struct-max
                         compaction, null-safe anti join)
  2. snapshot audit      snapshot_diff_summary (key+hash reduction)
  3. freshness holes     sequence_gaps (lag kernel, split_every-able)
  4. double-booking      interval_overlaps (running max, not lag)
  5. ordering invariant  monotonic_violations (per-user value resets)
  6. hot-value census    cms_partition_sketch -> cms_merge ->
                         cms_estimate (md5-replayable counters)
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
    from pandera_forge_spark.operators.cdc import apply_changelog
    from pandera_forge_spark.operators.temporal import (
        interval_overlaps,
        monotonic_violations,
        sequence_gaps,
    )
    from pandera_forge_spark.sketches import (
        cms_estimate,
        cms_merge,
        cms_partition_sketch,
    )
    from pandera_forge_spark.validator import snapshot_diff_summary

    report: dict = {}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. CDC: yesterday's snapshot = even event_ids; today's changelog
    #    updates every %5 key (deleting the %20s)
    base = ev.where(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", "value"
    )
    changes = ev.where(F.col("event_id") % 5 == 0).select(
        "event_id",
        F.lit(1).alias("gen"),
        F.when(F.col("event_id") % 20 == 0, "D").otherwise("U").alias("op"),
        "event_type",
        (F.col("value") + 100.0).alias("value"),
    )
    snapshot = apply_changelog(base, changes, ["event_id"], ["gen"])
    report["cdc"] = {"base": base.count(), "next_snapshot": snapshot.count()}

    # 2. what actually changed between the two snapshots?
    diff = snapshot_diff_summary(base, snapshot, ["event_id"]).first()
    report["snapshot_diff"] = {
        k: int(diff[k]) for k in ("added", "removed", "changed", "unchanged")
    }

    # 3. freshness: users whose feed went dark for > 12 h
    gaps = sequence_gaps(
        ev, ["user_id"], "ts", 43200.0, order_cols=["ts", "event_id"]
    )
    worst = gaps.orderBy(F.desc("gap_seconds")).first()
    report["freshness"] = {
        "holes": gaps.count(),
        "worst_gap_s": float(worst["gap_seconds"]) if worst else 0.0,
    }

    # 4. double-booking: events as [ts, ts + value-minutes] intervals
    sec = F.col("ts").cast("timestamp_ltz").cast("double")
    iv = ev.select(
        "user_id",
        "event_id",
        sec.alias("i_start"),
        (sec + F.col("value") * 60.0).alias("i_end"),
    )
    overlaps = interval_overlaps(
        iv, ["user_id"], "i_start", "i_end",
        order_cols=["i_start", "i_end", "event_id"],
    )
    report["double_booking"] = {"violations": overlaps.count()}

    # 5. ordering: per-user value regressions in event order
    mono = monotonic_violations(
        ev.select("user_id", "event_id", "value"),
        ["user_id"],
        ["event_id"],
        "value",
    )
    report["ordering"] = {"regressions": mono.count()}

    # 6. hot values: estimated per-user event counts from one mergeable
    #    sketch row (persist: estimate materializes it for the params)
    sk = cms_merge(cms_partition_sketch(ev, "user_id", width=512)).persist()
    top_users = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(3)
    )
    est = cms_estimate(top_users.select("user_id"), sk, "user_id")
    report["hot_values"] = {
        str(r["user_id"]): int(r["est"]) for r in est.collect()
    }
    sk.unpersist()
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("monitoring-pipeline-example")
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
