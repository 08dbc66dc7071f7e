"""Checkpoint/resume runner (FIXTURES.md F1 resume test): kill after K
partitions, restart, assert nothing is recomputed and verdicts match."""

from pyspark.sql import functions as F

from pandera_forge_spark.fixtures import make_documents
from pandera_forge_spark.runner import AuditLog, HivePartitionedParquet, run_partitions
from pandera_forge_spark.spans import span_order_violations


def _process(df, part):
    rows = df.count()
    bad = span_order_violations(df).count()
    return {"rows": rows, "violations": bad, "checks": {"span_order": bad}}


def test_resume_skips_completed(spark, tmp_path):
    docs = make_documents(spark, 400, seed=42, n_buckets=6)
    root = str(tmp_path / "docs")
    audit_root = str(tmp_path / "audit")

    table = HivePartitionedParquet(spark, root, "bucket")
    table.write(docs)
    audit = AuditLog(spark, audit_root)

    manifest = table.list_partitions()
    assert len(manifest) == 6

    # first run "killed" after 2 partitions
    r1 = run_partitions(table, audit, _process, max_partitions=2)
    assert len(r1.processed) == 2 and not r1.skipped

    # resume: the 2 completed partitions are skipped, 4 processed
    r2 = run_partitions(table, audit, _process)
    assert sorted(r2.skipped) == sorted(r1.processed)
    assert len(r2.processed) == 4
    assert set(r2.processed) | set(r2.skipped) == set(manifest)

    # audit has exactly one row per partition; totals match the table
    audit_df = audit.read()
    assert audit_df.count() == 6
    total = audit_df.agg(F.sum("rows")).collect()[0][0]
    assert total == 400
    assert audit_df.where(F.col("status") != "ok").count() == 0

    # a third run is a no-op (idempotent)
    r3 = run_partitions(table, audit, _process)
    assert not r3.processed and len(r3.skipped) == 6


def test_partition_pruning(spark, tmp_path):
    docs = make_documents(spark, 100, seed=1, n_buckets=4)
    root = str(tmp_path / "pp")
    table = HivePartitionedParquet(spark, root, "bucket")
    table.write(docs)
    df = table.read_partition(table.list_partitions()[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters: [isnotnull(bucket" in plan or "PartitionFilters: [(bucket" in plan


def test_error_partitions_recorded(spark, tmp_path):
    docs = make_documents(spark, 50, seed=2, n_buckets=2)
    root = str(tmp_path / "err")
    table = HivePartitionedParquet(spark, root, "bucket")
    table.write(docs)
    audit = AuditLog(spark, str(tmp_path / "erraudit"))

    def boom(df, part):
        raise RuntimeError("kaboom")

    r = run_partitions(table, audit, boom)
    assert len(r.failed_partitions) == 2
    assert not r.ok
    bad = audit.read().where(F.col("status") == "error")
    assert bad.count() == 2
