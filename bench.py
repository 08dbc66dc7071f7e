"""Benchmark harness for pandera_forge_spark.

Default mode (what the driver runs): executes the headline operator
queries at ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``)
on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1, "docs_per_sec": N, ...}

The flagship query is the north-rule validation pipeline — span-order +
kind-consistency + span-sequence-equality + duplicate-id checks with
per-bucket verdicts — over a deterministically synthesized interleaved
text+media documents table (``fixtures.make_documents``; seeded,
skewed, no external data), so the headline ``docs_per_sec`` measures
validated documents/sec per BASELINE.json.

Scaling mode (north-rule two-cluster-size evidence)::

    python bench.py --scaling

runs the SAME flagship job on the SAME input at local[8] and local[32]
in fresh JVMs (one subprocess each; Spark master is fixed per JVM),
prints both throughputs plus scaling efficiency
``(tp_4N / tp_N) / 4`` and rewrites BENCH.md with the numbers.

All timed jobs are forced with a ``noop``-format write (full
computation on executors, zero driver collect) so what is measured is
the distributed plan, not Arrow transfer.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# flagship fixture size: ~570k spans/100k docs; at the default 300k docs
# the local[8] leg runs long enough (>30 s) to amortize job startup.
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))


def build_spark(cores: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"pandera-forge-spark-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(int(cores) * 2, 8)))
        .config("spark.default.parallelism", str(int(cores)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _force(df) -> None:
    """Run the full distributed plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


# ----------------------------------------------------------------------
# flagship: north-rule validation pipeline over synthesized interleaved
# documents (doc_id, spans:array<struct<kind,text,media_ref,offset>>)
# ----------------------------------------------------------------------

def flagship_validate(spark, n_docs: int):
    """Build clean + mutated interleaved tables and run the full
    single-pass validation pipeline: per-bucket verdict rows (docs,
    order violations, consistency violations, sequence mismatches,
    duplicate ids). See pandera_forge_spark/pipeline.py for the
    shuffle-minimal design."""
    from pandera_forge_spark.fixtures import make_documents, mutate_documents
    from pandera_forge_spark.pipeline import interleaved_verdicts

    clean = make_documents(spark, n_docs)
    actual = mutate_documents(clean)
    return interleaved_verdicts(actual, clean)


def run_flagship(spark, n_docs: int) -> float:
    t0 = time.perf_counter()
    _force(flagship_validate(spark, n_docs))
    return time.perf_counter() - t0


# ----------------------------------------------------------------------
# headline operator queries at $SPARK_GRAFT_SF_DIR
# ----------------------------------------------------------------------

def headline_queries(spark, sf_dir: str, flagship_docs: int = BENCH_DOCS):
    """(name, thunk) pairs; each thunk returns a DataFrame to force."""
    from pyspark.sql import functions as F

    from pandera_forge_spark.drift import baseline_summary, drift_by_partition
    from pandera_forge_spark.inference import infer_schema
    from pandera_forge_spark.operators.dedup import near_duplicates_minhash
    from pandera_forge_spark.operators.similarity import cosine_topk
    from pandera_forge_spark.operators.text import char_count, fingerprint, token_count
    from pandera_forge_spark.patterns import NAMED_PATTERNS, match_ratio_expr
    from pandera_forge_spark.profiler import stat_exprs
    from pandera_forge_spark.sources.readers import read_parquet
    from pandera_forge_spark.validator import duplicate_keys, orphan_rows, validate_table

    n_par = spark.sparkContext.defaultParallelism

    def t(name):
        return read_parquet(spark, f"{sf_dir}/{name}.parquet", min_partitions=n_par)

    def q_profile_lineitem_all():
        li = t("lineitem")
        return li.agg(*stat_exprs(li, li.columns, False, True))

    def q_infer_validate_lineitem():
        li = t("lineitem")
        schema = infer_schema(li, "Lineitem", detect_patterns=False)
        return validate_table(
            li, schema, partition_cols=["l_returnflag"], check_unique=False
        ).verdicts

    def q_duplicates_salted():
        return duplicate_keys(t("orders"), ["o_custkey"], salt_buckets=16)

    def q_ri_antijoin():
        return orphan_rows(t("lineitem"), t("orders"), "l_orderkey", "o_orderkey")

    def q_drift():
        o = t("orders")
        base = baseline_summary(o, "o_totalprice", bins=16)
        return drift_by_partition(o, "o_totalprice", ["o_orderpriority"], base)

    def q_pattern_ratios():
        ev = t("events")
        exprs = [
            match_ratio_expr(F.col("props"), pat).alias(name)
            for name, pat in list(NAMED_PATTERNS.items())[:8]
        ]
        return ev.agg(*exprs)

    def q_near_dup_minhash():
        return near_duplicates_minhash(t("documents"), "text", "doc_id", threshold=0.6)

    def q_text_metrics():
        d = t("documents")
        c = F.col("text")
        return d.select(
            "doc_id",
            token_count(c).alias("n_tokens"),
            char_count(c).alias("n_chars"),
            fingerprint(c).alias("fp"),
        )

    def q_cosine_topk():
        emb = t("embeddings").withColumn("embedding", F.col("embedding").cast("array<double>"))
        qv = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
        return cosine_topk(emb, qv, k=10)

    return [
        ("flagship_validate_docs", lambda: flagship_validate(spark, flagship_docs)),
        ("profile_lineitem_all_columns", q_profile_lineitem_all),
        ("infer_validate_lineitem", q_infer_validate_lineitem),
        ("duplicate_keys_salted", q_duplicates_salted),
        ("ri_antijoin_lineitem_orders", q_ri_antijoin),
        ("drift_orders_psi_ks", q_drift),
        ("pattern_ratios_events", q_pattern_ratios),
        ("near_dup_minhash_documents", q_near_dup_minhash),
        ("text_metrics_documents", q_text_metrics),
        ("cosine_topk_embeddings", q_cosine_topk),
    ]


def main_default() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = None
    tail = Path(sf_dir).name
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = None

    spark = build_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: run every query SHAPE once at the smallest SF so janino
    # codegen compilation + JVM JIT happen outside the timed runs (the
    # generated classes depend on plan shape, not data volume; cold
    # first-runs measured 3-6x steady state at this tiny scale, pure
    # compile noise that 100 TB inputs would amortize away).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for _, thunk in headline_queries(spark, warm_dir, flagship_docs=5000):
            _force(thunk())

    timings: dict[str, float] = {}
    flagship_sec = None
    for name, thunk in headline_queries(spark, sf_dir):
        t0 = time.perf_counter()
        _force(thunk())
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        if name == "flagship_validate_docs":
            flagship_sec = dt
    spark.stop()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "validated_documents_throughput_and_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "flagship_docs": BENCH_DOCS,
        "docs_per_sec": round(BENCH_DOCS / flagship_sec, 1) if flagship_sec else None,
        "cores": int(cores),
    }
    print(json.dumps(out))


# ----------------------------------------------------------------------
# scaling mode: same job, two parallelism levels, fresh JVM each
# ----------------------------------------------------------------------

def scaling_worker(cores: str, n_docs: int) -> None:
    spark = build_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    run_flagship(spark, n_docs)  # warm-up: JIT + codegen + class loading
    sec = min(run_flagship(spark, n_docs) for _ in range(2))
    spark.stop()
    print(json.dumps({"cores": int(cores), "docs": n_docs, "sec": round(sec, 3),
                      "docs_per_sec": round(n_docs / sec, 1)}))


def main_scaling() -> None:
    results = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-worker", str(cores), str(SCALING_DOCS)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)
    tp8, tp32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = round((tp32 / tp8) / 4.0, 3)
    summary = {
        "metric": "scaling_efficiency_local8_vs_local32",
        "docs": SCALING_DOCS,
        "throughput_local8_docs_per_sec": tp8,
        "throughput_local32_docs_per_sec": tp32,
        "speedup_4x_cores": round(tp32 / tp8, 3),
        "scaling_efficiency": eff,
        "target": 0.8,
    }
    print(json.dumps(summary))
    write_bench_md(results, summary)


def write_bench_md(results: dict, summary: dict) -> None:
    md = f"""# BENCH — two-parallelism scaling evidence (north rule)

The north rule requires throughput scaling efficiency >= 0.8 between N
and 4N executors. No real cluster exists in this sandbox, so per the
driver instructions the evidence is the SAME flagship job (full
interleaved-document validation: span-order + kind-consistency +
span-sequence-equality + duplicate-id checks with per-bucket verdicts
over a {summary["docs"]:,}-doc deterministic fixture,
`fixtures.make_documents` seed=42) run at two parallelism levels in
fresh JVMs, forced with a noop write (no driver collect). Each leg is
best-of-2 after one warm-up run.

| parallelism | wall sec | validated docs/sec |
|---|---|---|
| local[8]  (N cores)  | {results[8]["sec"]} | {results[8]["docs_per_sec"]:,} |
| local[32] (4N cores) | {results[32]["sec"]} | {results[32]["docs_per_sec"]:,} |

- speedup at 4x cores: **{summary["speedup_4x_cores"]}x**
- scaling efficiency (speedup / 4): **{summary["scaling_efficiency"]}** (target >= 0.8)

Why it scales: the pipeline is a single-pass per-doc flag computation
(higher-order array functions, whole-stage codegen, zero Python UDFs)
plus hash aggregations with map-side partial agg, one sort-merge join
on `doc_id` for sequence equality (AQE-managed, salted duplicate-key
agg for the skewed `hot-` prefix), all on `spark.range`-parallel input
— no driver-side loops, no collect, no broadcast of large sides.

Reproduce: `python bench.py --scaling`
(`SPARK_GRAFT_BENCH_DOCS` overrides the fixture size).
"""
    (REPO / "BENCH.md").write_text(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-worker":
        scaling_worker(sys.argv[2], int(sys.argv[3]))
    else:
        main_default()
