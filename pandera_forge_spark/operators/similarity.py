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


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector integer quantization of an embedding column
    — the memory lever for ANN at corpus scale: int8 cuts a float32
    embedding store 4× (a 100 TB vector corpus becomes 25 TB of
    signatures plus one double per vector), which is the difference
    between an executor-cached index and a disk-bound one.

    Each vector quantizes independently: ``scale = max(|x|) / L`` with
    ``L = 2^(bits-1) - 1`` (127 for int8), ``q_i = floor(x_i / scale +
    0.5)`` (round-half-up; values land in [-L, L]). Because cosine is
    invariant to per-vector positive scaling, quantized cosine needs NO
    rescale — ``cosine(qa, qb)`` approximates ``cosine(a, b)`` directly,
    and since the quantized components are small exact integers, dot
    products and norms are exact in double arithmetic in ANY summation
    order: quantized scores are bit-identical across engines and
    partitionings (the float-sum-order caveat of exact cosine vanishes).
    ``knn_join``/``cosine_topk`` run unchanged on the quantized column
    (cast to ``array<double>``); reconstruction when needed is
    ``q_i * scale`` with per-component error ≤ ``scale/2``.

    Engineering shape: the per-vector scale is pushed into the
    elementwise pass with ``array_repeat`` + ``zip_with`` — NOT
    captured inside a ``transform`` lambda, where the ``array_max``
    subtree would be re-evaluated per element (no CSE across
    higher-order functions; see ``dedup.shingles``). One narrow
    projection, O(dim) per row, no shuffle, no UDF. All-zero vectors
    quantize to zeros with scale 0 (exactly reconstructable).

    Two subnormal-range guards (both hypothesis-found, both only
    reachable when max|x| is within ~200 ulps of zero):
    - the guard is on the SCALE, not on max|x|: for max|x| ≈ 5e-324
      the division ``max|x| / L`` underflows to 0.0 even though
      ``max|x| > 0``, and an unguarded ``x / scale`` would be
      Infinity → ANSI cast crash; such vectors quantize to zeros with
      scale 0, like true zero vectors;
    - codes are CLAMPED to ``[-L, L]`` after rounding: when the scale
      is subnormal-but-nonzero its relative rounding error is huge, so
      ``x / scale`` can exceed L by orders of magnitude (max|x| =
      190·5e-324 → scale rounds to 5e-324 → code 190). Clamped
      components trade the scale/2 reconstruction bound for staying in
      the advertised integer range — the standard quantizer contract.

    Returns ``df`` plus ``qvec: array<int>`` and ``qscale: double``.
    """
    if not 2 <= bits <= 32:
        raise ValueError("bits must be in [2, 32]")
    levels = float((1 << (bits - 1)) - 1)
    v = F.col(vec_col)
    ma = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (ma / F.lit(levels)).cast("double")
    scale_arr = F.array_repeat(scale, F.size(v))
    lo, hi = F.lit(-int(levels)), F.lit(int(levels))
    qvec = F.zip_with(
        v,
        scale_arr,
        lambda x, s: F.when(
            s > 0,
            F.greatest(
                lo, F.least(hi, F.floor(x / s + F.lit(0.5)))
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return df.withColumn(qvec_col, qvec).withColumn(scale_col, scale)


def centroid_exprs(vec_col: str, dim: int) -> list[Column]:
    """Per-dimension mean expressions for a fixed-width vector column —
    dim avg() aggregates, all algebraic (partial sums combine
    map-side), so a grouped centroid never explodes rows: the shuffle
    carries O(groups × dim) cells regardless of corpus size."""
    return [
        F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"c_{i}")
        for i in range(dim)
    ]


def centroid_drift(
    df: DataFrame, vec_col: str, group_col: str, dim: int
) -> DataFrame:
    """Embedding-space drift per slice: cosine similarity between each
    group's centroid and the global centroid (plus the group's row
    count). A slice whose centroid swings away from the corpus mean
    signals topical/distributional shift — the embedding analog of the
    PSI/KS drift checks (drift.py) for columns.

    Two aggregations (one grouped, one global — both single-pass
    algebraic), a broadcast 1-row cross join, then pure column
    arithmetic for the cosine over 3·dim terms. No explode, no UDF;
    scales to any corpus because only O(groups × dim) numbers ever
    move."""
    per = df.groupBy(F.col(group_col)).agg(
        *centroid_exprs(vec_col, dim), F.count(F.lit(1)).alias("n")
    )
    glob = df.agg(
        *[
            F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"g_{i}")
            for i in range(dim)
        ]
    )
    joined = per.crossJoin(F.broadcast(glob))
    dot_gg = sum(F.col(f"c_{i}") * F.col(f"g_{i}") for i in range(dim))
    n_c = F.sqrt(sum(F.col(f"c_{i}") * F.col(f"c_{i}") for i in range(dim)))
    n_g = F.sqrt(sum(F.col(f"g_{i}") * F.col(f"g_{i}") for i in range(dim)))
    return joined.select(
        F.col(group_col),
        F.col("n"),
        F.round(dot_gg / (n_c * n_g), 6).alias("cos_to_global"),
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


def probe_buckets(vec: Column, planes: list[list[float]], probes: int) -> Column:
    """Array of ``struct<b: long>`` probe buckets for one vector, as a
    pure column expression: the base sign-of-projection bucket plus the
    single-bit flips of the ``probes`` smallest-|projection| planes
    (margin-ranked multi-probe — the planes the vector is least
    confidently on one side of). Shared by the bucket self-join
    (near_duplicates_embedding) and the distributed probe routing of
    ``lsh_knn_join_partitioned``."""
    bits = len(planes)
    buckets = F.array(F.struct(lsh_bucket(vec, planes).alias("b")))
    if probes > 0:
        # margin-ranked probing needs per-plane projections; emit the
        # single-bit flips of the `probes` smallest |projection| planes
        projs = F.array(*[dot(vec, _lit_vec(p)) for p in planes])
        order = F.array_sort(
            F.array(
                *[
                    F.struct(F.abs(F.element_at(projs, b + 1)).alias("m"), F.lit(b).alias("b"))
                    for b in range(bits)
                ]
            )
        )
        base = lsh_bucket(vec, planes)
        # shift amount is a Column (pyspark shiftleft takes int shifts
        # only), so build the one-hot mask as 2^b — exact for bits<=52
        flips = F.array(
            *[
                F.struct(
                    base.bitwiseXOR(
                        F.pow(F.lit(2.0), F.element_at(order, i + 1)["b"].cast("double"))
                        .cast("long")
                    ).alias("b")
                )
                for i in range(min(probes, bits))
            ]
        )
        buckets = F.concat(buckets, flips)
    return buckets


TARGET_BUCKET_SIZE = 64  # mean bucket population the auto bits mode aims for


def auto_bits(n_rows: int, target_bucket: int = TARGET_BUCKET_SIZE) -> int:
    """Hyperplane count scaled to corpus size: enough buckets that the
    MEAN bucket holds ~target_bucket vectors (2^bits ≈ n/target), never
    fewer than 8 bits (256 buckets) nor more than 28. A fixed bits=8
    would leave ~n²/256 comparisons per bucket at 10^9+ vectors; this
    keeps per-bucket candidate work roughly constant as n grows."""
    if n_rows <= 0:
        return 8
    return max(8, min(28, math.ceil(math.log2(max(1, n_rows / target_bucket)))))


def near_duplicates_embedding(
    df: DataFrame,
    threshold: float = 0.95,
    bits: int | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probes: int = 1,
    max_bucket: int | None = 5000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine >= threshold and id_a < id_b.

    Same candidate-then-verify shape as MinHash-LSH text dedup: bucket
    on the sign-of-projection hyperplane signature (near-identical
    vectors collide with probability ~1 at high thresholds), self-join
    within buckets (plus each vector's ``probes`` lowest-margin
    single-bit-flip neighbor buckets, catching pairs that straddle a
    hyperplane), verify candidates with the exact cosine. Shuffle
    volume is O(n x (1+probes)) bucket rows, never the O(n²) cross
    join; recall is tunable via bits/probes and the brute-force
    ``knn_join`` is the correctness baseline.

    Two guards keep the bucket self-join bounded at corpus scale:

    - ``bits=None`` (default) scales the signature width with corpus
      size (``auto_bits``: 2^bits ≈ n/64, floor 8) so mean bucket
      population stays ~constant as n grows — the one extra count()
      action is noise next to the join it sizes.
    - ``max_bucket`` caps the pair expansion of pathological buckets
      (mass-duplicated embeddings all land in one signature): members
      of a bucket larger than ``max_bucket`` only pair with the
      bucket's min-id hub — O(size) pairs that still connect every
      member to the cluster representative — instead of O(size²).
      The cap is applied by filtering the build side BEFORE the join,
      so the bounded thing is the join fan-out itself, not a post-hoc
      filter. ``max_bucket=None`` disables the cap.
    """
    first = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:
        id_dt = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_dt}, id_b {id_dt}, cosine double"
        )
    dim = len(first[0])
    if bits is None:
        bits = auto_bits(df.count())
    planes = hyperplanes(dim, bits, seed)

    vec = F.col(vec_col)
    buckets = probe_buckets(vec, planes, probes)

    banded = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), vec.alias("__v"), F.explode(buckets).alias("__bk")
    ).select(id_col, "__v", F.col("__bk.b").alias("__bucket"))

    a = banded
    if max_bucket is not None:
        # per-bucket population + hub (min id); the aggregate is tiny
        # (O(distinct buckets)), AQE broadcasts it when it fits. Rows
        # in a hot bucket survive on the a-side only if they ARE the
        # hub, so the join's per-bucket fan-out is min(size, max_bucket)
        # x size, never size².
        sizes = banded.groupBy("__bucket").agg(
            F.count(F.lit(1)).alias("__bsz"), F.min(id_col).alias("__hub")
        )
        a = banded.join(sizes, "__bucket").where(
            (F.col("__bsz") <= max_bucket) | (F.col(id_col) == F.col("__hub"))
        )
    a = a.select(
        F.col("__bucket"), F.col(id_col).alias("id_a"), F.col("__v").alias("__va")
    )
    b = banded.select(
        F.col("__bucket"), F.col(id_col).alias("id_b"), F.col("__v").alias("__vb")
    )
    return (
        a.join(b, "__bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


# ----------------------------------------------------------------- IVF


def kmeans_centroids(
    df: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    sample_size: int = 10000,
    iters: int = 10,
) -> list[list[float]]:
    """Deterministic k-means centroids from a seeded sample (driver-side
    Lloyd's over <= sample_size vectors — the centroids are O(cells x
    dim) metadata, exactly the piece that SHOULD live on the driver;
    assignment of the 10^12-vector corpus stays distributed in
    ``ivf_assign``)."""
    total = df.count()
    s = df.select(vec_col)
    if total > sample_size:
        s = s.sample(False, sample_size / total, seed=seed)
    vecs = [list(r[0]) for r in s.collect() if r[0] is not None]
    if not vecs:
        raise ValueError("no vectors to cluster")
    try:
        import numpy as np
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("kmeans_centroids needs numpy") from e
    x = np.asarray(vecs, dtype="float64")
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        # matmul distance form (|x|^2 - 2xC^T + |c|^2), not pairwise
        # broadcasting: the naive (x[:,None,:]-cents)**2 tensor is
        # O(sample x cells x dim) memory — 5 TB at the cell counts the
        # scale guidance recommends; this form is two GEMMs
        d = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id as a column expression: argmin over the
    per-centroid squared distances (equivalently argmax of dot - |c|²/2
    — used here so each centroid costs ONE dot product). All literals;
    whole-stage codegen; at scale the corpus is written partitioned by
    this cell id so probing prunes partitions.

    A null vector assigns to a NULL cell (explicitly: its scores are
    all null, and the bare struct-max would otherwise fall through to
    the highest cell id — which also kept it inconsistent with the
    Arrow GEMM path in ``assign_cells``)."""
    scored = F.array(
        *[
            F.struct(
                (
                    dot(vec, _lit_vec(c))
                    - F.lit(sum(ci * ci for ci in c) / 2.0)
                ).alias("score"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.when(vec.isNotNull(), F.array_max(scored)["cell"])


ASSIGN_LITERAL_MAX_CELLS = 64


def _assign_cells_arrow(centroids: list[list[float]]):
    """Arrow-batched nearest-centroid assignment: one numpy GEMM per
    record batch against a closure-captured (cells x dim) matrix. The
    tie-break matches ``ivf_assign`` exactly (equal best score -> the
    HIGHER cell id, via argmax over the column-reversed score matrix).
    Null vectors assign to a null cell, like the literal path."""
    try:
        import numpy as np
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "large-cell-count assignment needs numpy/pandas"
        ) from e

    c = np.asarray(centroids, dtype="float64")
    half = (c * c).sum(axis=1) / 2.0
    k = c.shape[0]

    def _assign(batch):
        out = pd.Series([None] * len(batch), dtype="object")
        mask = batch.notna()
        if mask.any():
            x = np.stack(batch[mask].to_numpy()).astype("float64")
            scores = x @ c.T - half[None, :]
            best_rev = scores[:, ::-1].argmax(axis=1)
            out[mask] = (k - 1) - best_rev
        return out

    # explicit form, not type-hint inference: this module uses
    # `from __future__ import annotations`, which stringifies hints
    # pyspark then cannot resolve for locally-imported pandas
    return F.pandas_udf(_assign, "int")


def assign_cells(vec: Column, centroids: list[list[float]]) -> Column:
    """Cell assignment for ANY cell count: literal argmax algebra
    (whole-stage codegen, zero Python) up to
    ``ASSIGN_LITERAL_MAX_CELLS`` centroids; beyond that, the
    Arrow-batched GEMM path — a 10^5-centroid literal array would blow
    Catalyst plan/codegen limits, and a corpus x centroids join is
    O(N*k) rows, so the matmul UDF (vectorized, never per-row) is the
    honest scale path. The two paths share the argmax-ties-go-high
    rule; they may differ only where two cells' scores round
    differently in the last ulp (fold vs GEMM summation)."""
    if len(centroids) <= ASSIGN_LITERAL_MAX_CELLS:
        return ivf_assign(vec, centroids)
    return _assign_cells_arrow(centroids)(vec)


def _probe_cells(
    query: Sequence[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """The ``n_probe`` centroid cells nearest to the query (squared
    distance ascending, ties by cell id via the stable sort) — the ONE
    definition of probe ordering, shared by the in-memory and
    persisted IVF paths so their results can never drift apart.
    Rejects dimension mismatches instead of silently zip-truncating."""
    q = [float(v) for v in query]
    for c in centroids:
        if len(c) != len(q):
            raise ValueError(
                f"query dim {len(q)} != centroid dim {len(c)} — "
                "refusing to zip-truncate"
            )

    def sqd(c):
        return sum((a - b) ** 2 for a, b in zip(q, c))

    order = sorted(range(len(centroids)), key=lambda i: sqd(centroids[i]))
    return order[: max(1, n_probe)]


def ivf_topk(
    corpus: DataFrame,
    query: Sequence[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: score only the ``n_probe`` cells nearest to the
    query. Same plan shape as ``lsh_topk`` (filter -> brute force), the
    bucket function being a trained k-means cell instead of a random
    hyperplane signature — better recall per probe on clustered data."""
    q = [float(v) for v in query]
    probe = _probe_cells(q, centroids, n_probe)
    near = corpus.withColumn("__cell", ivf_assign(F.col(vec_col), centroids)).where(
        F.col("__cell").isin(probe)
    )
    return cosine_topk(near, q, k, vec_col, id_col)


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    n_cells: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Persist the corpus PARTITIONED BY its IVF cell — the trained-
    quantizer twin of :func:`write_lsh_partitioned`: k-means centroids
    from a seeded sample (or pass ``centroids`` to reuse a trained
    set), distributed ``ivf_assign``, one partitioned write, and an
    ``_ivf_meta.json`` sidecar holding the exact centroid doubles so a
    query session reconstructs bit-identical cell choices. Probing
    then reads ``n_probe`` DIRECTORIES out of ``n_cells`` — planning-
    time partition pruning, not a scan filter. Returns the centroids.

    The sidecar goes through the Hadoop FileSystem (DriverFS), so the
    path may be s3a://, hdfs:// or local alike."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    for col in (vec_col, id_col):
        if col not in df.columns:
            raise ValueError(
                f"column {col!r} missing from the corpus frame — "
                "checked before the expensive partitioned write"
            )
    if centroids is None:
        centroids = kmeans_centroids(
            df.where(F.col(vec_col).isNotNull()),
            n_cells=n_cells,
            seed=seed,
            vec_col=vec_col,
        )
    (
        df.where(F.col(vec_col).isNotNull())
        .withColumn("__cell", ivf_assign(F.col(vec_col), centroids))
        .write.partitionBy("__cell")
        .mode("overwrite")
        .parquet(path)
    )
    DriverFS(df.sparkSession).write_bytes(
        f"{path}/_ivf_meta.json",
        json.dumps({"centroids": centroids, "seed": seed}).encode(),
    )
    return centroids


def ivf_topk_partitioned(
    spark,
    path: str,
    query: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k against a :func:`write_ivf_partitioned` corpus:
    centroids come from the sidecar, the ``n_probe`` nearest cells are
    picked ON THE DRIVER (O(cells × dim) floats, squared distance, the
    same ordering as ``ivf_topk``), and only those cell DIRECTORIES
    are read — PartitionFilters in the scan, asserted in tests. The
    probed cells are then scored with the exact cosine."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    meta = json.loads(DriverFS(spark).read_bytes(f"{path}/_ivf_meta.json"))
    q = [float(v) for v in query]
    probe = _probe_cells(q, meta["centroids"], n_probe)
    # Explicit cast: with partitionColumnTypeInference disabled the hive
    # partition column reads back as string, and an int isin would
    # silently match nothing (same defense as dedup._with_epochs).
    corpus = spark.read.parquet(path).where(
        F.col("__cell").cast("int").isin([int(c) for c in probe])
    )
    return cosine_topk(corpus, q, k, vec_col, id_col)


def write_lsh_partitioned(
    df: DataFrame,
    path: str,
    bits: int | None = None,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Persist the corpus PARTITIONED BY its hyperplane bucket, plus a
    ``_lsh_meta.json`` sidecar (bits/seed/dim) so queries can rebuild
    the identical planes. This is what turns ``lsh_topk``'s bucket
    filter from a full-scan predicate into PARTITION PRUNING: a query
    then touches 1+probes directories out of 2^bits — the difference
    between scanning 10^12 vectors and scanning a few million
    (asserted via PartitionFilters in tests). Returns the bits used.

    The sidecar write goes through the Hadoop FileSystem (DriverFS), so
    the corpus path may be s3a://, hdfs:// or local alike."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    for col in (vec_col, id_col):
        if col not in df.columns:
            raise ValueError(
                f"column {col!r} missing from the corpus frame — "
                "checked before the expensive partitioned write"
            )
    first = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = len(first[0])
    if bits is None:
        bits = auto_bits(df.count())
    planes = hyperplanes(dim, bits, seed)
    (
        df.where(F.col(vec_col).isNotNull())
        .withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
        .write.partitionBy("__bucket")
        .mode("overwrite")
        .parquet(path)
    )
    DriverFS(df.sparkSession).write_bytes(
        f"{path}/_lsh_meta.json",
        json.dumps({"bits": bits, "seed": seed, "dim": dim}).encode(),
    )
    return bits


def _read_lsh_meta(spark, path: str) -> dict:
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    return json.loads(DriverFS(spark).read_bytes(f"{path}/_lsh_meta.json"))


def lsh_topk_partitioned(
    spark,
    path: str,
    query: Sequence[float],
    k: int = 10,
    probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k against a ``write_lsh_partitioned`` corpus: rebuild
    the planes from the sidecar, compute the query's bucket (+
    margin-ranked flip probes) ON THE DRIVER — O(bits x dim) floats —
    and read only those partitions (planning-time pruning, verified by
    PartitionFilters). The scan then scores just the probed buckets
    with the exact cosine."""
    meta = _read_lsh_meta(spark, path)
    bits, seed = meta["bits"], meta["seed"]
    planes = hyperplanes(meta["dim"], bits, seed)
    qbits = 0
    for b, plane in enumerate(planes):
        if sum(qi * pi for qi, pi in zip(query, plane)) > 0:
            qbits |= 1 << b
    margins = sorted(
        range(bits),
        key=lambda b: abs(sum(qi * pi for qi, pi in zip(query, planes[b]))),
    )
    targets = [qbits] + [qbits ^ (1 << margins[i]) for i in range(min(probes, bits))]
    corpus = spark.read.parquet(path).where(F.col("__bucket").isin(targets))
    return cosine_topk(corpus, query, k, vec_col, id_col)


def lsh_knn_join_partitioned(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    max_prune_buckets: int = 100_000,
) -> DataFrame:
    """Batched ANN k-NN join against a ``write_lsh_partitioned``
    corpus: every query gets its approximate top-k in ONE pass.

    Shape: each query's probe buckets (base signature + margin-ranked
    flips) are computed DISTRIBUTIVELY as column expressions on the
    queries frame (``probe_buckets`` — the same algebra the bucket
    self-join uses); the resulting (query_id, bucket, qvec) frame is
    broadcast into a join with the corpus scan. No query vector ever
    touches the driver — the only collect is the DISTINCT probe-bucket
    ids (at most min(|queries|·(1+probes), 2^bits) longs), which feed
    a static ``isin`` so the scan is partition-pruned at planning time
    (PartitionFilters). The broadcast join then routes each corpus row
    only to the queries probing ITS bucket — per-query candidate sets,
    never |queries| x |corpus|. Query count is bounded by what a
    broadcast holds (millions of (id, bucket, vec) rows), not by
    driver memory for Python row objects.

    If the distinct probe buckets exceed ``max_prune_buckets`` (a
    giant ``isin`` literal slows planning), the static prune is
    skipped — the broadcast hash join still routes rows correctly and
    Spark's dynamic partition pruning takes over on the partitioned
    ``__bucket`` column. Top-k per query via window over the scored
    candidates."""
    from pyspark.sql import Window

    meta = _read_lsh_meta(spark, path)
    bits, seed = meta["bits"], meta["seed"]
    planes = hyperplanes(meta["dim"], bits, seed)

    vec = F.col(vec_col)
    probe_df = (
        queries.where(vec.isNotNull())
        .select(
            F.col(query_id_col),
            vec.cast("array<double>").alias("__qvec"),
            F.explode(probe_buckets(vec, planes, probes)).alias("__bk"),
        )
        .select(query_id_col, "__qvec", F.col("__bk.b").alias("__bucket"))
        .dropDuplicates([query_id_col, "__bucket"])
    )

    # the ONLY collect: distinct bucket ids (longs, not vectors) for
    # planning-time pruning; capped so the isin literal stays sane
    bucket_rows = (
        probe_df.select("__bucket")
        .distinct()
        .limit(max_prune_buckets + 1)
        .collect()
    )
    corpus = spark.read.parquet(path)
    if len(bucket_rows) <= max_prune_buckets:
        corpus = corpus.where(
            F.col("__bucket").isin(sorted(r[0] for r in bucket_rows))
        )
    scored = corpus.join(F.broadcast(probe_df), "__bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .dropDuplicates([query_id_col, id_col])
    )


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


def dedup_near_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    bits: int | None = None,
    probes: int = 1,
    max_bucket: int | None = 5000,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end embedding near-dedup — the vector-space twin of
    ``dedup.dedup_near``: hyperplane-LSH candidate pairs (hub-capped
    under virality), connected-component clustering, min-id survivor
    anti-join. Returns ``(survivors, mapping)`` with the same contract
    (mapping covers every clustered id, survivors included)."""
    from pandera_forge_spark.operators.dedup import pairs_to_clusters

    pairs = near_duplicates_embedding(
        df,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        bits=bits,
        probes=probes,
        max_bucket=max_bucket,
    ).select("id_a", "id_b")
    mapping = pairs_to_clusters(pairs, checkpoint_dir=checkpoint_dir)
    losers = mapping.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    survivors = df.join(losers, id_col, "left_anti")
    return survivors, mapping


def embedding_health(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """One-row embedding-quality verdict: (n_rows, n_null, n_wrong_dim,
    n_nan, n_zero, n_ok, dim) — the sanity gate before any ANN /
    dedup / retrieval step, because one NaN vector silently poisons
    every cosine it touches and a dimension mismatch crashes the
    first dot product at hour six of the job.

    ``expected_dim=None`` derives the modal vector length in a first
    O(1)-row aggregate, then ONE scan computes all counters as
    conditional counts over higher-order functions (``exists`` /
    ``aggregate`` — JVM-side, no UDF). A row is n_ok when present,
    right-sized, finite, and not all-zero; the four failure counters
    classify each bad row by its FIRST failure in that order, so the
    counters always sum to n_rows."""
    vec = F.col(vec_col)
    if expected_dim is None:
        expected_dim = df.where(vec.isNotNull()).agg(
            F.mode(F.size(vec))
        ).collect()[0][0]
        if expected_dim is None:
            expected_dim = 0
    has_nan = F.exists(vec, lambda x: F.isnan(x) | x.isNull())
    is_zero = ~F.exists(vec, lambda x: x != 0.0)
    wrong_dim = F.size(vec) != F.lit(int(expected_dim))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(vec.isNull(), 1)).alias("n_null"),
        F.count(F.when(vec.isNotNull() & wrong_dim, 1)).alias("n_wrong_dim"),
        F.count(
            F.when(vec.isNotNull() & ~wrong_dim & has_nan, 1)
        ).alias("n_nan"),
        F.count(
            F.when(vec.isNotNull() & ~wrong_dim & ~has_nan & is_zero, 1)
        ).alias("n_zero"),
        F.count(
            F.when(vec.isNotNull() & ~wrong_dim & ~has_nan & ~is_zero, 1)
        ).alias("n_ok"),
        F.lit(int(expected_dim)).alias("dim"),
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_cells: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_cell: int | None = None,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public): assign every embedding to its nearest
    k-means cell, then within each cell drop any item that has a
    LOWER-id neighbor with cosine >= ``threshold``. Returns
    ``(survivors, dropped)`` where ``dropped`` is
    ``(id_col, kept_id, cell)`` and ``kept_id`` is the smallest such
    neighbor (deterministic, order-free rule — no iteration).

    Semantics note: this is the paper's one-pass greedy, NOT transitive
    closure — in a chain a-b-c with cos(a,b) and cos(b,c) above the
    bar but cos(a,c) below it, b and c are both dropped and a
    survives; ``dedup_near_embeddings`` is the connected-component
    variant when closure is wanted.

    Scale: candidate generation is blocked by cell, so the self-join
    shuffles BOTH sides on the cell id and evaluates sum(|cell|^2)/2
    cosines. Two consequences at 10^12 rows: (1) ``n_cells`` is the
    shuffle parallelism AND the blow-up bound — size it so the mean
    cell holds ~1-5k vectors (n_cells ~ N/2000; the paper uses ~10^5
    clusters for 10^8 docs), never the default 16; (2) ``max_cell``
    arms an in-band fence (per-cell counts are n_cells rows,
    broadcast-joined back, ``raise_error`` in the projection) so a
    degenerate centroid that swallows the corpus fails loudly instead
    of handing one task a quadratic task. Assignment goes through
    ``assign_cells`` — literal column algebra at small cell counts,
    the Arrow-batched GEMM path at the recommended large ones — and
    the assigned frame is persisted by default so the fence, the join
    build side, and the join probe side reuse ONE assignment pass
    (``persist=False`` opts out when the projected corpus exceeds
    cluster cache; assignment is then recomputed per consumer)."""
    if centroids is None:
        centroids = kmeans_centroids(
            df, n_cells=n_cells, seed=seed, vec_col=vec_col
        )
    vec = F.col(vec_col).cast("array<double>")
    assigned = df.select(
        F.col(id_col), vec.alias("__v"),
        assign_cells(vec, centroids).alias("__cell"),
    )
    if persist:
        assigned = assigned.persist()
    if max_cell is not None:
        counts = assigned.groupBy("__cell").agg(
            F.count(F.lit(1)).alias("__cn")
        )
        assigned = (
            assigned.join(F.broadcast(counts), "__cell")
            .withColumn(
                id_col,
                F.when(F.col("__cn") <= max_cell, F.col(id_col)).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"semantic_dedup cell exceeds max_cell="
                                f"{max_cell} (the within-cell join is "
                                "O(|cell|^2)) — raise n_cells or "
                                "max_cell deliberately; cell id: "
                            ),
                            F.col("__cell").cast("string"),
                        )
                    ).cast(dict(df.dtypes)[id_col]),
                ),
            )
            .drop("__cn")
        )
    a = assigned.select(
        F.col("__cell"),
        F.col(id_col).alias("__id_a"),
        F.col("__v").alias("__v_a"),
    )
    b = assigned.select(
        F.col("__cell"),
        F.col(id_col).alias("__id_b"),
        F.col("__v").alias("__v_b"),
    )
    close = (
        a.join(b, "__cell")
        .where(F.col("__id_a") < F.col("__id_b"))
        .where(cosine(F.col("__v_a"), F.col("__v_b")) >= threshold)
    )
    dropped = close.groupBy(F.col("__id_b").alias(id_col)).agg(
        F.min("__id_a").alias("kept_id"),
        F.first("__cell").alias("cell"),
    )
    survivors = df.join(dropped.select(id_col), id_col, "left_anti")
    return survivors, dropped


# ---------------------------------------------------------------------------
# Random projection (Johnson–Lindenstrauss) — deterministic, oracle-exact
# ---------------------------------------------------------------------------


def projection_signs(
    in_dim: int, out_dim: int, seed: str = "rp"
) -> list[list[int]]:
    """The ±1 (Rademacher/Achlioptas) projection matrix as a plain
    python list-of-rows, derived from md5 so that ANY engine re-derives
    the identical matrix from (seed, j, i) alone — no RNG state, no
    stored artifact to ship alongside the vectors.

    sign(j, i) = +1 if the first md5 hex byte of ``"{seed}:{j}:{i}"``
    is even else -1. Achlioptas (2003) shows ±1 entries satisfy the JL
    lemma with the same distortion bounds as Gaussian entries — and
    they keep the arithmetic in integers (below)."""
    import hashlib

    if in_dim < 1 or out_dim < 1:
        raise ValueError(
            f"projection_signs: dims must be >= 1, got {in_dim}x{out_dim}"
        )
    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:2], 16
            )
            % 2
            == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_cols: Sequence[str] = ("vec_id",),
    in_dim: int = 64,
    out_dim: int = 16,
    seed: str = "rp",
    quant: int = 10**6,
) -> DataFrame:
    """Project ``array<float>`` embeddings to ``out_dim`` dimensions
    with a deterministic ±1 JL matrix — the cheap-dimension-reduction
    step a 100 TB ANN pipeline runs BEFORE index build (a 64→16
    projection shrinks the index 4x and the distance math 4x, at a
    distortion the JL lemma bounds by ~1/sqrt(out_dim)).

    Output: ``id_cols..., proj`` where ``proj`` is ``array<bigint>`` of
    length ``out_dim`` and

        proj[j] = Σ_i floor(v_i · quant + 0.5) · sign(j, i)

    i.e. elements are micro-unit-quantized FIRST (one float→double cast
    + one multiply + floor, identical IEEE everywhere), then combined
    with ±1 weights under exact integer sums — so the projection is
    bit-identical on any engine and order-independent across partitions
    (driver row ``rp_embeddings``). Downstream cosine over ``proj``
    approximates cosine over the original vectors (JL preserves inner
    products); divide by ``quant`` to recover the float scale.

    Scale shape: ONE narrow projection — per row a zip_with against an
    ``out_dim × in_dim`` literal sign matrix (≤ a few KB shipped inside
    the plan), no shuffle, no UDF, whole-stage-codegen friendly. Rows
    whose vector is NULL project to NULL; a vector of the WRONG LENGTH
    or with NULL elements raises in-band (a silent zip_with against a
    mismatched literal would truncate and corrupt every downstream
    distance).
    """
    if quant < 1:
        raise ValueError(f"random_projection: quant must be >= 1, got {quant}")
    missing = [c for c in (*id_cols, vec_col) if c not in df.columns]
    if missing:
        raise ValueError(f"random_projection: frame lacks columns {missing}")
    signs = projection_signs(in_dim, out_dim, seed)
    v = F.col(vec_col)
    qvec = F.transform(
        v,
        lambda x: F.floor(x.cast("double") * F.lit(float(quant)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    good = (F.size(v) == in_dim) & ~F.exists(v, lambda x: x.isNull())
    checked = F.when(v.isNull(), F.lit(None)).otherwise(
        F.when(good, qvec).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"random_projection: vector must have exactly "
                        f"{in_dim} non-NULL elements, got length "
                    ),
                    F.size(v).cast("string"),
                )
            )
        )
    )
    out = df.withColumn("__q", checked)
    comps = [
        F.aggregate(
            F.zip_with(
                F.col("__q"),
                F.array(*[F.lit(s) for s in signs[j]]),
                lambda x, s: x * s.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for j in range(out_dim)
    ]
    proj = F.when(F.col("__q").isNotNull(), F.array(*comps))
    return out.select(*id_cols, proj.alias("proj"))


def alignment_outliers(
    df: DataFrame,
    vec_col: str,
    id_cols: Sequence[str],
    group_cols: Sequence[str],
    dim: int,
    c: int = 4,
    min_points: int = 20,
) -> DataFrame:
    """Embedding-space outliers by EXACT integer arithmetic: flag the
    vectors whose alignment with their group's centroid deviates from
    the group median by more than ``c`` MADs. A batch of zeroed,
    mis-normalized, wrong-model or garbage embeddings sits far from
    its language/source centroid; ANN retrieval then surfaces it for
    every query. ``embedding_health`` catches the structurally broken
    (NaN, wrong dim, all-zero); this catches the structurally VALID
    but semantically alien — and does it with a decision tree every
    engine replays bit-for-bit, where a float cosine + float
    threshold drifts in the last ulp.

    The whole tree is integers: components quantize to micro-longs
    (floor(x*1e6)); each group's centroid is the per-dimension
    floored MEAN of those micro components (one floored IEEE division
    of an exactly-representable long pair — deterministic); each
    vector's alignment is the exact long dot product of its micro
    components with the micro centroid, arithmetic-shifted 7 bits so
    the downstream micro-quantization (x1e6 inside the MAD tree)
    stays inside int64; verdicts come from
    :func:`pandera_forge_spark.validator.mad_outlier_rows` (robust:
    half a group can be garbage and the median centroid alignment
    still stands... the CENTROID itself is a mean and can be dragged —
    which is exactly why the deviation test must be MAD, not stddev).

    Envelope (fenced): components |x| < 1000, dim <= 256 — then
    |micro| < 1e9, |centroid_d| < 1e9, |dot| < 256e18 / 2^7 after the
    shift keeps every downstream product under 2^63 for unit-scale
    embeddings; real embedding spaces (|x| <= ~1) sit orders inside
    it. NULL vectors and wrong-length vectors raise in-band via the
    dimension fence.

    Scale shape: one narrow quantize projection, ONE (group) agg of
    dim long sums + count, an O(groups) broadcast join back, one dot
    projection, then the MAD tree's two same-key window passes. No
    UDF, no crossJoin beyond the O(groups) broadcast."""
    keys = list(group_cols)
    ids = list(id_cols)
    if not keys:
        raise ValueError("alignment_outliers: group_cols must be non-empty")
    if not ids:
        raise ValueError("alignment_outliers: id_cols must be non-empty")
    if not (1 <= int(dim) <= 256):
        raise ValueError(
            f"alignment_outliers: dim must be in 1..256, got {dim}"
        )
    missing = [x for x in keys + ids + [vec_col] if x not in df.columns]
    if missing:
        raise ValueError(f"alignment_outliers: frame lacks columns {missing}")
    d = int(dim)
    micro = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            F.abs(x) >= 1000.0,
            F.raise_error(
                F.lit("alignment_outliers: component outside |x|<1000 envelope")
            ).cast("double"),
        )
        .otherwise(x)
        .cast("double"),
    )
    micro = F.transform(
        micro, lambda x: F.floor(x * F.lit(1000000.0)).cast("long")
    )
    # the dimension fence lives INSIDE the used expression — a dead
    # side-column would be pruned by Catalyst and never raise
    guarded = F.when(
        F.size(F.col(vec_col)) != d,
        F.raise_error(
            F.concat(
                F.lit("alignment_outliers: vector of length "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(f" (expected {d})"),
            )
        ).cast("array<bigint>"),
    ).otherwise(micro)
    base = df.where(F.col(vec_col).isNotNull()).withColumn("__e", guarded)
    sums = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.element_at("__e", i + 1)).alias(f"__s{i}")
            for i in range(d)
        ],
    )
    cen = sums.select(
        *keys,
        F.array(
            *[
                F.floor(
                    F.col(f"__s{i}").cast("double")
                    / F.col("__n").cast("double")
                ).cast("long")
                for i in range(d)
            ]
        ).alias("__cen"),
    )
    with_dot = base.join(F.broadcast(cen), keys).withColumn(
        "__align",
        F.shiftright(
            F.aggregate(
                F.zip_with("__e", "__cen", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            7,
        ).cast("double"),
    )
    from pandera_forge_spark.validator import mad_outlier_rows

    out = mad_outlier_rows(
        with_dot.select(*keys, *ids, "__align"),
        "__align",
        ids,
        keys,
        c=c,
        min_points=min_points,
    )
    return out.withColumnRenamed("value", "align_128")
