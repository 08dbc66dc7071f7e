"""Data-quality triage walkthrough — the round-5 census family on one
pass over the driver testdata, runnable as-is:

    python examples/triage_pipeline.py [sf_dir]

The triage question order a data steward actually asks, each stage one
scan (100-TB shapes per SCALE.md):
  1. what formats does this column HAVE?     shape_census
  2. which columns go missing TOGETHER?      null_pattern_census
  3. which columns are redundant copies?     duplicate_column_report
  4. is the JSON payload column healthy?     json_health_report +
                                             json_key_census (one-scan
                                             n_objects= mode)
  5. is anyone spoofing identifiers?         script_mixing_report
  6. which feeds are stuck / metronomic?     constancy_runs +
                                             cadence_profile
  7. what watermark would this stream need?  lateness_census
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
        cadence_profile,
        constancy_runs,
        lateness_census,
    )
    from pandera_forge_spark.profiler import (
        duplicate_column_report,
        json_health_report,
        json_key_census,
        null_pattern_census,
        script_mixing_report,
        shape_census,
    )

    report: dict = {}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    # 1. inductive format census: how many shapes does the column have?
    shapes = shape_census(orders, "o_orderpriority").orderBy(
        F.desc("n_rows")
    ).collect()
    report["shapes"] = [
        {"shape": r["shape"], "n": r["n_rows"], "example": r["example"]}
        for r in shapes
    ]

    # 2. missingness fingerprints (planted: drop o_totalprice at %97)
    dirty = orders.select(
        F.when(F.col("o_orderkey") % 97 != 0, F.col("o_totalprice")).alias(
            "o_totalprice"
        ),
        "o_orderstatus",
    )
    pats = null_pattern_census(dirty, ["o_totalprice", "o_orderstatus"])
    report["null_patterns"] = {
        r["null_cols"] or "(complete)": r["n_rows"] for r in pats.collect()
    }

    # 3. redundant columns (planted copy)
    dup = duplicate_column_report(
        orders.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderstatus").alias("status_legacy"),
            F.col("o_orderpriority").alias("prio"),
        )
    )
    report["duplicate_columns"] = [
        f"{r['col_a']}=={r['col_b']}" for r in dup.collect() if r["identical"]
    ]

    # 4. JSON payload health + key census, one scan each
    [h] = json_health_report(events, "props").collect()
    report["json_health"] = {k: int(v) for k, v in h.asDict().items()}
    keys = json_key_census(
        events, "props", n_objects=report["json_health"]["n_objects"]
    )
    report["json_keys"] = {
        r["key"]: round(r["share"], 4) for r in keys.collect()
    }

    # 5. identifier spoofing census
    [spoof] = script_mixing_report(customer, ["c_name"]).collect()
    report["script_mixing"] = {
        "mixed": int(spoof["n_mixed_script"]),
        "zero_width": int(spoof["n_zero_width"]),
        "bidi": int(spoof["n_bidi"]),
    }

    # 6. stuck feeds and metronomes
    stuck = constancy_runs(
        events.select(
            "user_id", "ts", "event_id",
            (F.col("event_id") % 5).alias("v"),
        ),
        ["user_id"], "ts", "v", min_run=4, order_cols=["event_id"],
    )
    report["stuck_keys"] = int(stuck.count())
    cad = cadence_profile(events, ["user_id"], "ts", min_gaps=5)
    metronomes = cad.where(F.col("cv_gap") < 0.05)
    report["metronome_keys"] = int(metronomes.count())

    # 7. watermark design from history
    [late] = lateness_census(
        events, "ts", "event_id", thresholds=[60, 3600]
    ).collect()
    report["watermark"] = {
        "events": int(late["n_events"]),
        "max_late_s": int(late["max_late_us"] // 1_000_000),
        "dropped_at_60s": int(late["late_60s"]),
        "dropped_at_1h": int(late["late_3600s"]),
    }
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("triage_pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        report = run(spark, sf_dir)
        for stage, payload in report.items():
            print(json.dumps({stage: payload}, default=str))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
