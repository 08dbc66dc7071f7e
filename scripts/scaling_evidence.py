"""Per-stage CPU-vs-wall evidence for the local[8] -> local[32] scaling
ceiling (north-rule follow-up: numbers, not argument).

For each parallelism leg this script runs the flagship validation
pipeline in a FRESH JVM, warms it to JIT steady state, then times one
final run while the Spark UI's REST API records per-stage metrics
(task occupancy, executor CPU time, GC time, shuffle volume). The two
legs' aggregates separate the competing explanations for sub-linear
8->32 scaling:

- **idle threads** (low task occupancy at 32 cores, CPU-seconds flat):
  too few partitions — an AQE-coalescing / scheduling artifact we can
  tune away;
- **busy-but-slower threads** (occupancy high, CPU-seconds per doc
  INFLATED at 32): every core is running but each retires less work
  per cycle — the single-socket memory-bandwidth / GC ceiling, which a
  real multi-executor cluster does not share (each executor brings its
  own memory subsystem).

Usage: python scripts/scaling_evidence.py [--worker CORES]
Writes SCALING_EVIDENCE.json at the repo root and prints the summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "4000000"))
UI_PORT = 4049  # off the default so a concurrent session never collides


def _rest(app_id: str, path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _parse_ts(s: str) -> float:
    # "2026-08-17T21:33:04.123GMT"
    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def worker(cores: int) -> None:
    # bench.build_spark disables the UI; clone its config with UI on
    from bench import run_flagship, warm_until_jit_settles
    from pyspark.sql import SparkSession

    import bench

    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    young_gb = max(1, int("".join(c for c in mem if c.isdigit()) or "48") // 3)
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-evidence-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.driver.memory", mem)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing "
            f"-Xmn{young_gb}g",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "2000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert bench  # imported for its sys.path side effect

    warm_until_jit_settles(
        spark, lambda: run_flagship(spark, DOCS), max_sec=600.0
    )
    app_id = spark.sparkContext.applicationId
    # GC is reported as the DELTA across the timed run — the REST
    # counter is cumulative since JVM start and would otherwise charge
    # the warm-up runs to the measurement
    gc_before = sum(
        e.get("totalGCTime", 0) for e in _rest(app_id, "executors")
    )
    t0 = time.time()
    wall = run_flagship(spark, DOCS)

    stages = [
        s
        for s in _rest(app_id, "stages?status=complete")
        if "submissionTime" in s and _parse_ts(s["submissionTime"]) >= t0
    ]
    execs = _rest(app_id, "executors")
    total_gc_ms = sum(e.get("totalGCTime", 0) for e in execs) - gc_before
    per_stage = [
        {
            "stage": s["stageId"],
            "name": s.get("name", "")[:60],
            "tasks": s.get("numCompleteTasks", s.get("numTasks", 0)),
            "task_time_s": round(s.get("executorRunTime", 0) / 1e3, 2),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        }
        for s in sorted(stages, key=lambda s: s["stageId"])
    ]
    task_time = sum(p["task_time_s"] for p in per_stage)
    cpu = sum(p["cpu_s"] for p in per_stage)
    out = {
        "cores": cores,
        "docs": DOCS,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(DOCS / wall, 1),
        "stages_run": len(per_stage),
        "task_time_s": round(task_time, 2),
        "cpu_s": round(cpu, 2),
        # fraction of the core-seconds that had a task occupying them
        "occupancy": round(task_time / (wall * cores), 3),
        # how much actual CPU each core-second of task time burned
        # (<1 means tasks sat in memory stalls the OS charges anyway,
        # GC pauses, or scheduler waits)
        "cpu_per_task_time": round(cpu / task_time, 3) if task_time else None,
        "cpu_us_per_doc": round(cpu * 1e6 / DOCS, 2),
        "gc_total_ms": total_gc_ms,
        "per_stage": per_stage,
    }
    spark.stop()
    print("EVIDENCE " + json.dumps(out))


def main() -> None:
    # a minority of JVMs settle into a sticky ~2-4x-slower steady state
    # on this pipeline (see BENCH.md); sample up to 3 fresh JVMs per
    # leg and stop early once a fast-mode instance is seen, so the
    # evidence reflects the mode a long-running job actually ships
    FAST_WALL = {2: 50.0, 8: 14.5, 32: 8.5}
    legs = {}
    for cores in (8, 32):
        best = None
        for _ in range(3):
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", str(cores)],
                capture_output=True, text=True, timeout=1800,
            )
            lines = [
                l for l in proc.stdout.splitlines() if l.startswith("EVIDENCE ")
            ]
            if not lines:
                print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"worker {cores} produced no evidence line")
            leg = json.loads(lines[-1][len("EVIDENCE "):])
            if best is None or leg["wall_s"] < best["wall_s"]:
                best = leg
            if best["wall_s"] <= FAST_WALL.get(cores, 0.0):
                break
        legs[cores] = best
        print(json.dumps({k: v for k, v in best.items() if k != "per_stage"}))

    e8, e32 = legs[8], legs[32]
    summary = {
        "speedup_8_to_32": round(e8["wall_s"] / e32["wall_s"], 3),
        "efficiency_8_to_32": round(e8["wall_s"] / e32["wall_s"] / 4.0, 3),
        "occupancy_8": e8["occupancy"],
        "occupancy_32": e32["occupancy"],
        "cpu_us_per_doc_8": e8["cpu_us_per_doc"],
        "cpu_us_per_doc_32": e32["cpu_us_per_doc"],
        "cpu_inflation_32_over_8": round(
            e32["cpu_us_per_doc"] / e8["cpu_us_per_doc"], 3
        ),
        "diagnosis": None,
    }
    if summary["occupancy_32"] < 0.6 and summary["cpu_inflation_32_over_8"] < 1.3:
        summary["diagnosis"] = (
            "idle-threads: low occupancy at 32 cores with flat CPU/doc -> "
            "partition-count/scheduling artifact (tune AQE advisory size)"
        )
    elif summary["cpu_inflation_32_over_8"] >= 1.3:
        summary["diagnosis"] = (
            "busy-but-slower: CPU-seconds per doc inflate at 32 cores -> "
            "shared-socket memory bandwidth / GC ceiling, not a plan defect"
        )
    else:
        summary["diagnosis"] = "mixed: see per-stage rows"
    out = {"legs": legs, "summary": summary}
    (REPO / "SCALING_EVIDENCE.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
