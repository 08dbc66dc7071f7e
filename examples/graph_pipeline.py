"""Web-graph curation walkthrough — the graph-operator trio plus the
retrieval evaluator, runnable as-is against the driver testdata:

    python examples/graph_pipeline.py [sf_dir]

A crawl-curation pipeline sees the web as a LINK GRAPH before it sees
any page's bytes. The driver testdata has no real link table, so the
example projects a deterministic directed graph out of `orders`
(src = o_custkey % K, dst = o_orderkey % 2K — cycles, hubs, and
dangling nodes, the shapes that matter) and runs the three lenses:

  1. flow    pagerank        — who accumulates rank (keep their pages)
  2. role    hits            — authorities (content) vs hubs (link
                               lists, often boilerplate to drop)
  3. shape   triangle_count  — clustering coefficient (organic
                               neighborhoods cluster; spam farms are
                               stars with lcc ~ 0)
  4. overlap kmv sketches    — how much do the top-rank and
                               top-authority node sets overlap?
                               (two 1-row sketches, no rescan)

All four are exact-integer/quantized (SCALE.md: per-iteration join +
map-side-combinable sums, O(nodes) state, lineage truncated per
round), so every number below is reproducible bit-for-bit. Prints one
JSON report; returns the dict when called in-process (the pytest smoke
does exactly that).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, k_nodes: int = 200) -> dict:
    from pandera_forge_spark.operators.graph import (
        hits,
        pagerank,
        triangle_count,
    )
    from pandera_forge_spark.sketches import (
        kmv_overlap,
        kmv_partition_sketch,
    )

    report: dict = {}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = o.select(
        (F.col("o_custkey") % k_nodes).alias("src"),
        (F.col("o_orderkey") % (2 * k_nodes)).alias("dst"),
    ).distinct()

    # 1. flow: PageRank (integer micro-units of a 10^12 mass)
    pr = pagerank(edges, iters=4)
    top_pr = pr.orderBy(F.desc("rank"), "node").limit(20)
    first = top_pr.first()
    report["pagerank"] = {
        "nodes": pr.count(),
        "top_node": int(first["node"]),
        "top_rank_micro": int(first["rank"]),
    }

    # 2. role: HITS — authorities are in-link magnets
    hx = hits(edges, iters=3)
    top_auth = hx.orderBy(F.desc("authority"), "node").limit(20)
    a0 = top_auth.first()
    report["hits"] = {
        "top_authority_node": int(a0["node"]),
        "its_hub_score": int(a0["hub"]),
    }

    # 3. shape: clustering — star-like (spammy) vs clustered (organic)
    tc = triangle_count(edges)
    shape = tc.agg(
        F.round(F.avg("lcc"), 4).alias("avg_lcc"),
        F.sum("triangles").alias("corner_sum"),
    ).collect()[0]
    report["shape"] = {
        "avg_lcc": float(shape["avg_lcc"]),
        "triangles": int(shape["corner_sum"]) // 3,
    }

    # 4. overlap: do flow and role agree on the top set? KMV sketches
    #    of the two top-20 node sets — at 10^12 nodes these would be
    #    persisted per-partition sketch rows; the overlap math is the
    #    same two 1-row broadcasts either way.
    sk_pr = kmv_partition_sketch(top_pr.select("node"), "node", k=64)
    sk_au = kmv_partition_sketch(top_auth.select("node"), "node", k=64)
    ov = kmv_overlap(sk_pr, sk_au).collect()[0]
    report["overlap"] = {
        "shared_of_top20": int(ov["shared"]),
        "jaccard": round(float(ov["jaccard_est"]), 4)
        if ov["jaccard_est"] is not None
        else None,
    }
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graph-pipeline-example")
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
