"""Similarity search over embedding columns (array<float>).

Training-data-pipeline addition (build brief). Two paths:

- BRUTE FORCE (baseline): cosine against a broadcast query vector is a
  narrow projection (zip_with dot product, JVM-side) + TakeOrdered —
  no shuffle beyond the top-k reduce. For query SETS, a broadcast
  nested-loop join keeps the corpus stationary.
- LSH-BUCKETED (scale path): deterministic random-hyperplane signatures
  bucket the corpus; a query only scans its own bucket (plus optional
  multi-probe neighbors). At 10^12 vectors the bucket join replaces the
  full scan with a hash lookup; recall is tunable via bits/probes.

Everything is pyspark.sql.functions array algebra — no UDF in the hot
path. (An IVF variant would swap the hyperplane bucket for a k-means
cell id; the join shape is identical.)
"""

from __future__ import annotations

import math
import random
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by cosine against one query vector.

    Plan: scan → project(score) → TakeOrderedAndProject(k). The query
    is a literal array (constant-folded); per-partition top-k then a
    driver-side k-merge — no full sort, no shuffle of the corpus.
    Deterministic tie-break on id."""
    q = _lit_vec(query)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force k-NN join: every query gets its k nearest corpus
    vectors by cosine. The QUERY side is broadcast (queries << corpus);
    the corpus never shuffles. Top-k per query via window over the
    scored pairs."""
    from pyspark.sql import Window

    scored = corpus.crossJoin(
        F.broadcast(
            queries.select(
                F.col(query_id_col), F.col(vec_col).alias("__qvec")
            )
        )
    ).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit Gaussians, seeded)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id: bit b set iff vec · plane_b > 0."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        bit = F.when(dot(vec, _lit_vec(plane)) > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    query: Sequence[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probes: int = 2,
) -> DataFrame:
    """ANN top-k: score only corpus rows in the query's hyperplane
    bucket (plus its ``probes`` nearest Hamming-neighbor buckets).

    At scale the corpus is written bucketed/partitioned by
    ``__bucket``, so this filter becomes partition pruning and the
    query touches 1+probes partitions out of 2^bits. Approximate:
    recall < 1 by design (the brute-force path is the correctness
    baseline)."""
    dim = len(query)
    planes = hyperplanes(dim, bits, seed)
    qbits = 0
    for b, plane in enumerate(planes):
        if sum(qi * pi for qi, pi in zip(query, plane)) > 0:
            qbits |= 1 << b
    # multi-probe: flip the lowest-|projection| bits first
    margins = sorted(
        range(bits),
        key=lambda b: abs(sum(qi * pi for qi, pi in zip(query, planes[b]))),
    )
    targets = [qbits] + [qbits ^ (1 << margins[i]) for i in range(min(probes, bits))]

    bucketed = corpus.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    near = bucketed.where(F.col("__bucket").isin(targets))
    return cosine_topk(near, query, k, vec_col, id_col)
