"""Checkpointed, resumable partition-manifest runner with an audit sink.

North-rule mandate: "resumable from a checkpointed partition-manifest
with per-partition lineage and metrics rows written to an Iceberg audit
table". Absent from the reference (SURVEY.md §2.1 S10) — the reference
is a one-shot library call.

This sandbox has no Iceberg catalog jar, so the runner is written
against a minimal storage interface (``list_partitions /
read_partition / audit``) with a Hive-partitioned-parquet
implementation (SURVEY.md §7 build plan step 8). On a real cluster the
same interface binds to Iceberg: ``list_partitions`` reads the
``<table>.partitions`` metadata table, ``read_partition`` is a
partition-pruned ``spark.read.table``, and the audit sink is
``df.writeTo(audit).overwritePartitions()`` — all snapshot-atomic.

Resume semantics: a partition is DONE iff its audit rows are fully
committed (parquet _SUCCESS marker / Iceberg snapshot). Work restarts
skip done partitions (anti-join of manifest against the audit table);
per-partition writes are overwrite-idempotent, so a partition killed
mid-write is simply redone with identical results — no double count.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIT_SCHEMA = (
    "partition string, status string, rows long, violations long, "
    "checks string, started double, finished double, engine string"
)


class HivePartitionedParquet:
    """Partition-manifest + pruned reads over a hive-layout parquet dir
    (``<root>/<col>=<val>/...``)."""

    def __init__(self, spark: SparkSession, root: str, partition_col: str):
        self.spark = spark
        self.root = root
        self.partition_col = partition_col

    def list_partitions(self) -> list[str]:
        """The partition manifest. Directory listing — O(partitions),
        no data scan (Iceberg equivalent: the `partitions` metadata
        table)."""
        p = Path(self.root)
        vals = sorted(
            d.name.split("=", 1)[1]
            for d in p.iterdir()
            if d.is_dir() and d.name.startswith(f"{self.partition_col}=")
        )
        return vals

    def read_partition(self, value: str) -> DataFrame:
        """Partition-pruned read: the filter on the partition column is
        resolved at planning time against the hive layout — only that
        directory is scanned (verify via PartitionFilters in explain)."""
        df = self.spark.read.option("basePath", self.root).parquet(self.root)
        return df.where(F.col(self.partition_col) == value)

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        df.write.partitionBy(self.partition_col).mode(mode).parquet(self.root)


class AuditLog:
    """Per-partition lineage + metrics rows, committed atomically per
    partition (idempotent overwrite into ``audit/partition=<val>``)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def completed_partitions(self) -> set[str]:
        p = Path(self.root)
        if not p.exists():
            return set()
        done = set()
        for d in p.iterdir():
            if d.is_dir() and d.name.startswith("partition=") and (d / "_SUCCESS").exists():
                done.add(d.name.split("=", 1)[1])
        return done

    def commit(self, partition: str, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    partition,
                    r.get("status", "ok"),
                    r.get("rows", 0),
                    r.get("violations", 0),
                    json.dumps(r.get("checks", {}), sort_keys=True),
                    r.get("started", 0.0),
                    r.get("finished", 0.0),
                    "pandera_forge_spark",
                )
                for r in rows
            ],
            AUDIT_SCHEMA,
        )
        (df.coalesce(1).write.mode("overwrite").parquet(f"{self.root}/partition={partition}"))

    def read(self) -> DataFrame:
        return self.spark.read.schema(AUDIT_SCHEMA).parquet(f"{self.root}/partition=*")


@dataclass
class RunReport:
    processed: list[str]
    skipped: list[str]
    failed_partitions: list[str]

    @property
    def ok(self) -> bool:
        return not self.failed_partitions


def run_partitions(
    table: HivePartitionedParquet,
    audit: AuditLog,
    process: Callable[[DataFrame, str], dict],
    max_partitions: Optional[int] = None,
    fail_fast: bool = False,
) -> RunReport:
    """The resumable driver loop: manifest minus completed → process
    each remaining partition distributed → commit its audit rows.

    ``process(df, partition) -> {"rows": n, "violations": n,
    "checks": {...}}`` runs whatever validation bundle the caller wants
    (validate_table / drift / span checks); the runner owns only
    manifest, checkpoint and lineage.
    """
    manifest = table.list_partitions()
    done = audit.completed_partitions()
    todo = [p for p in manifest if p not in done]
    if max_partitions is not None:
        todo = todo[:max_partitions]

    processed, failed = [], []
    for part in todo:
        started = time.time()
        df = table.read_partition(part)
        try:
            metrics = process(df, part)
            status = "ok" if metrics.get("violations", 0) == 0 else "violations"
        except Exception as e:  # noqa: BLE001 — record, don't lose lineage
            metrics = {"rows": 0, "violations": -1, "checks": {"error": str(e)}}
            status = "error"
        metrics.update(status=status, started=started, finished=time.time())
        audit.commit(part, [metrics])
        (failed if status == "error" else processed).append(part)
        if failed and fail_fast:
            break

    return RunReport(
        processed=processed,
        skipped=sorted(done & set(manifest)),
        failed_partitions=failed,
    )
