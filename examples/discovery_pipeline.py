"""Constraint-discovery walkthrough — from "here is a table" to an
ENFORCED check suite nobody hand-wrote, runnable as-is against the
driver testdata:

    python examples/discovery_pipeline.py [sf_dir]

Stages (100-TB shapes per SCALE.md):
  1. per-column inference    infer_schema (the reference's rules, one
                             fused profile pass)
  2. enum-safety gate        unseen_mass (Good-Turing: keep isin
                             checks only where the hapax mass says the
                             domain is actually closed)
  3. cross-column mining     order_dependencies (one fused counter
                             aggregate) -> checks_from_order_dependencies
  4. key discovery           candidate_keys (screened lattice walk)
  5. enforcement             validate_table with the merged suite —
                             the mined invariants count their own
                             violations like any hand-written check
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
    from pandera_forge_spark.inference import infer_schema
    from pandera_forge_spark.operators.discovery import (
        candidate_keys,
        checks_from_order_dependencies,
        order_dependencies,
    )
    from pandera_forge_spark.profiler import unseen_mass
    from pandera_forge_spark.validator import validate_table

    report: dict = {}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # 1. the reference's per-column inference
    schema = infer_schema(li, "lineitem")
    report["inferred"] = {
        "columns": len(schema.columns),
        "checks": len(schema.checks()),
    }

    # 2. Good-Turing gate: which inferred isin checks deserve to live?
    isin_cols = sorted(
        spec.name for spec in schema.columns if spec.isin is not None
    )
    gate = {
        r["column"]: r["verdict"]
        for r in unseen_mass(li, isin_cols).collect()
    }
    kept, dropped = [], []
    for spec in schema.columns:
        if spec.isin is not None and gate.get(spec.name) != "enum_safe":
            spec.isin = None  # open-world domain: drop the frozen enum
    for c, v in sorted(gate.items()):
        (kept if v == "enum_safe" else dropped).append(c)
    report["enum_gate"] = {"kept": kept, "dropped": dropped}

    # 3. cross-column order dependencies over the join, bridged to checks
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "o_totalprice"
    )
    deps = order_dependencies(j, min_support=100)
    mined = checks_from_order_dependencies(deps)
    report["order_deps"] = {
        "held": deps.count(),
        "checks": sorted(c.name for c in mined),
    }

    # 4. which columns could key this table?
    keys = candidate_keys(li, cols=["l_orderkey", "l_linenumber"], max_arity=2)
    report["keys"] = {
        r["key_cols"]: bool(r["is_key"]) for r in keys.collect()
    }

    # 5. enforce: the schema's surviving checks + the mined invariants
    # (mined over the join projection, so enforce the l_* ones on li)
    li_cols = set(li.columns)
    enforceable = [
        ch for ch in mined
        if {p for p in ch.value.split("`")[1::2]} <= li_cols
    ]
    schema.extra_checks.extend(enforceable)
    report["order_deps"]["enforced_on_lineitem"] = sorted(
        c.name for c in enforceable
    )
    res = validate_table(li, schema)
    report["validation"] = {
        "ok": bool(res.ok),
        "n_checks": len(res.counts),
        "violations": int(sum(res.counts.values())),
    }
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("discovery_pipeline")
        .getOrCreate()
    )
    out = run(spark, sf)
    for stage, payload in out.items():
        print(json.dumps({stage: payload}))
