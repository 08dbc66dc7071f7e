"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline additions (build brief); none exist in the
reference. Scale design notes per operator:

- EXACT: hash-groupBy on a 128-bit content fingerprint — one shuffle,
  map-side partial agg. Survivor selection is min(id) per group
  (deterministic), implemented as an aggregation + semi-join rather
  than a window so the hot path stays a hash aggregate.
- MINHASH+LSH: shingle → k minhashes → b bands; candidate generation is
  an explode + groupBy on (band, band_hash) — only docs sharing a band
  bucket ever meet, so the shuffle volume is O(docs × b), never the
  O(n²) cross join. Candidates are then verified with exact Jaccard on
  the hashed shingle sets (candidate-then-verify, same pattern as the
  HLL→exact uniqueness path).
- SIMHASH: 64-bit bit-majority over token hashes; computed with pure
  array algebra (explode-free per row), Hamming-band bucketing for
  candidates.
- NGRAM JACCARD: direct pairwise verification used by tests/oracles at
  small scale and by LSH verification at large scale.

All hashing uses xxhash64 — deterministic across executors and runs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandera_forge_spark.operators.text import fingerprint, tokens


# ---------------------------------------------------------------- exact

def exact_duplicate_groups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_ids: Optional[int] = None,
) -> DataFrame:
    """(fingerprint, n_docs, doc_ids) for every content group with >1
    doc — the INSPECTION form (test/oracle scale): collect_list holds
    O(group) ids in one aggregation buffer, so a content string
    duplicated 10^7 times is one giant buffer in a single task.
    ``max_ids`` slices the OUTPUT array (bounds result size for
    display; the aggregation buffer is still O(group)). The scale path
    for downstream dedup is ``exact_duplicate_pairs`` /
    ``dedup_exact``, which never materialize an id array."""
    fp = fingerprint(F.col(text_col)).alias("fingerprint")
    ids = F.sort_array(F.collect_list(id_col))
    if max_ids is not None:
        ids = F.slice(ids, 1, max_ids)
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ids.alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct content fingerprint.

    Aggregation + broadcast-able semi join on (fingerprint, min_id);
    avoids a row_number window (which would sort every group)."""
    with_fp = df.withColumn("__fp", fingerprint(F.col(text_col)))
    keep = with_fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (
        with_fp.join(keep, on=["__fp", id_col], how="left_semi").drop("__fp")
    )


# ------------------------------------------------------------- shingles

_SLICE_MAX = 1 << 30


def shingles(col: Column, n: int = 3) -> Column:
    """Token n-gram shingle set (distinct), as an array of strings.

    Built with ``zip_with`` over shifted slices of the token array —
    NOT with a ``transform(sequence(...), i -> slice(toks, i, n))``
    lambda: a captured subtree inside a higher-order-function lambda is
    re-evaluated PER ELEMENT (no CSE), which makes the lambda form
    O(tokens²) regex splits per document (measured ~10x slower on
    300-char docs). Here ``toks`` appears a constant ~n+2 times.

    Docs with fewer than n tokens yield one shingle of all tokens
    joined (the whole-doc fallback); empty/null text yields [""].
    """
    toks = tokens(col)
    acc = toks
    for j in range(1, n):
        # zip_with pads the shorter side with null; concat_ws skips
        # nulls, so tail entries are partial shingles — sliced off below
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, _SLICE_MAX),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    full = F.slice(acc, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.when(F.size(toks) > 0, full).otherwise(
        F.array(F.concat_ws(" ", toks))
    )
    return F.array_distinct(grams)


def hashed_shingles(col: Column, n: int = 3) -> Column:
    """Shingle set hashed to longs — the compact representation used
    for minhashing and for exact-Jaccard verification at scale."""
    return F.array_sort(
        F.array_distinct(F.transform(shingles(col, n), lambda s: F.xxhash64(s)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (JVM-side)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------- minhash/LSH

def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """k-permutation MinHash signatures as (id, mh_0..mh_{k-1}).

    Implemented as explode(shingle hashes) + groupBy(id) with k min()
    aggregates — one shuffle keyed on doc id, map-side partial mins.

    Why not per-row array algebra (array_min(transform(...)) × k)?
    Catalyst does NOT common-subexpression-eliminate nested
    higher-order functions: every one of the k transforms re-evaluates
    the whole tokenize→shingle→hash pipeline, and a downstream band
    explode multiplies that again (measured ~1000× recompute, 400 s for
    505 docs). The aggregate form evaluates the shingle pipeline ONCE
    per row; docs with null/empty text yield no shingles and drop out
    of dedup (they have no content to match)."""
    sh = df.select(
        F.col(id_col), hashed_shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    return _signatures_from_shingles(sh, id_col, num_hashes, seed)


def _signatures_from_shingles(
    sh: DataFrame, id_col: str, num_hashes: int, seed: int
) -> DataFrame:
    """Signatures from a prepared (id, __sh: array<long>) frame —
    lets callers shingle once and reuse the frame for verification."""
    exploded = sh.select(F.col(id_col), F.explode(F.col("__sh")).alias("__h"))
    aggs = [
        F.min(F.xxhash64(F.col("__h"), F.lit(seed * 1000 + i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


# Pair-emission cap per LSH bucket: buckets up to this size expand to
# all O(size²) pairs; larger ("viral") buckets fall back to O(size)
# star pairs around the bucket's min id (see _lsh_pairs_from_shingles).
DEFAULT_MAX_BUCKET = 200


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """MinHash-LSH candidate pairs: (id_a, id_b) with id_a < id_b that
    share at least one band bucket.

    rows/band = num_hashes/bands; two docs with Jaccard s collide in a
    band with prob s^rows, in any band with 1-(1-s^rows)^bands — at the
    defaults (r=4, b=16) the S-curve crosses 0.5 near s≈0.5.

    Shuffle plan: signatures (one shuffle) → explode to
    (band, band_hash, id) — O(docs × bands) rows — then a groupBy on
    the bucket key. Bucket skew (a viral duplicate cluster) is handled
    by AQE for the shuffle and by ``max_bucket`` for the pair
    expansion: a bucket larger than ``max_bucket`` emits STAR pairs
    (min-id hub → every other member, O(size) rows) instead of all
    O(size²) pairs — every member is still connected to the cluster
    representative, so duplicate-cluster recall survives while the
    output stays linear in the bucket. ``max_bucket=None`` disables
    the cap (exhaustive pairs, test scale only).
    """
    sh = df.select(
        F.col(id_col), hashed_shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    return _lsh_pairs_from_shingles(
        sh, id_col, num_hashes, bands, seed, max_bucket=max_bucket
    )


def _banded_from_shingles(
    sh: DataFrame, id_col: str, num_hashes: int, bands: int, seed: int
) -> DataFrame:
    """(id, band, bucket) LSH band-bucket rows from a prepared
    (id, __sh) shingle frame — O(docs × bands) rows, the index both the
    self-join and the incremental (new-vs-corpus) paths probe."""
    rows_per_band = num_hashes // bands
    sig_df = _signatures_from_shingles(sh, id_col, num_hashes, seed)
    return sig_df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"mh_{i}")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def _lsh_pairs_from_shingles(
    sh: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    seed: int,
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    banded = _banded_from_shingles(sh, id_col, num_hashes, bands, seed)

    grouped = banded.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_set(id_col)).alias("ids")
    ).where(F.size("ids") > 1)

    # emit pairs within each bucket — bucket sizes are tiny for honest
    # near-dup clusters. A viral bucket (mass-duplicated content hashes
    # every band to one bucket) would expand O(size²); past max_bucket
    # we emit the O(size) star around the min id instead: members stay
    # connected to the cluster representative (verify still confirms
    # each member against the hub), output stays linear. collect_set
    # itself holds O(bucket) ids in one aggregation buffer — linear,
    # which is what bounds memory; the cap removes the quadratic blowup.
    ids = F.col("ids")
    all_pairs = F.flatten(
        F.transform(
            ids,
            lambda a,: F.transform(
                F.filter(ids, lambda b: b > a),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    if max_bucket is None:
        pair_arr = all_pairs
    else:
        hub = F.element_at(ids, 1)
        star = F.transform(
            F.slice(ids, 2, _SLICE_MAX),
            lambda b: F.struct(hub.alias("id_a"), b.alias("id_b")),
        )
        pair_arr = F.when(F.size(ids) <= max_bucket, all_pairs).otherwise(star)
    pairs = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return pairs


def near_duplicates_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
    eager: bool = True,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard over hashed shingle
    sets: returns (id_a, id_b, jaccard) with jaccard >= threshold.

    The verify join brings each candidate's shingle-hash array to the
    pair — two hash joins keyed on doc id; candidate volume (not corpus
    size) drives the cost.

    The shingle frame is computed ONCE and persisted (MEMORY_AND_DISK):
    it feeds the signature path and BOTH sides of the verify join — an
    unpersisted plan would re-tokenize and re-hash the whole corpus
    three times. At warehouse scale the persisted frame is
    O(corpus text); MEMORY_AND_DISK spills rather than evicts. The
    result (small: only verified pairs) is materialized EAGERLY and
    itself persisted, so the corpus-sized shingle cache can be released
    in a ``finally`` before returning — it does NOT leak for the
    session lifetime. Callers owning very large pair outputs may
    ``unpersist()`` the returned frame when done; ``eager=False``
    returns the fully lazy plan and persists nothing (the caller
    accepts the 3x shingle recompute or persists upstream)."""
    from pyspark import StorageLevel

    sh = df.select(
        F.col(id_col), hashed_shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    if eager:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    cand = _lsh_pairs_from_shingles(
        sh, id_col, num_hashes, bands, seed, max_bucket=max_bucket
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("__sha"), F.col("__shb")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    if not eager:
        return out
    try:
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # force: materializes `out` while `sh` is cached
        return out
    finally:
        sh.unpersist()


def _hub_cap_corpus_bands(cb: DataFrame, max_bucket: Optional[int]) -> DataFrame:
    """Star-cap a corpus band frame (corpus_id, band, bucket): past
    ``max_bucket`` only the min-id hub of each (band, bucket) survives
    — shared by the raw-frame incremental path and the persisted-index
    probe so the cap semantics can never diverge between them."""
    if max_bucket is None:
        return cb
    sizes = cb.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("__n"), F.min("corpus_id").alias("__hub")
    )
    return (
        cb.join(sizes, ["band", "bucket"])
        .where(
            (F.col("__n") <= max_bucket) | (F.col("corpus_id") == F.col("__hub"))
        )
        .drop("__n", "__hub")
    )


def _verify_candidate_pairs(
    cand: DataFrame,
    new_sh: DataFrame,
    corpus_sh: DataFrame,
    id_col: str,
    corpus_id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of (new_id, corpus_id) candidates
    against the two shingle frames — the other half shared between the
    incremental path and the index probe."""
    a = new_sh.select(F.col(id_col).alias("new_id"), F.col("__sh").alias("__sha"))
    b = corpus_sh.select(
        F.col(corpus_id_col).alias("corpus_id"), F.col("__sh").alias("__shb")
    )
    return (
        cand.join(a, "new_id")
        .join(b, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.round(jaccard(F.col("__sha"), F.col("__shb")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def near_duplicates_incremental(
    corpus: DataFrame,
    new: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
    eager: bool = True,
) -> DataFrame:
    """Incremental near-dedup: verified MinHash-LSH matches of NEW
    documents against an EXISTING corpus — the daily-ingest shape. A
    10^12-doc corpus is never re-self-joined when a day's crawl lands;
    the day's docs probe the corpus band index and only (new × corpus)
    collisions are verified. Returns (new_id, corpus_id, jaccard >=
    threshold); new-vs-new duplication is a separate (much smaller)
    self-join via ``near_duplicates_minhash`` on the new frame.

    Shuffle plan: both sides band independently (each one id-keyed
    shuffle), then ONE equi-join on (band, bucket). Candidate pairs are
    verified with exact Jaccard over the persisted shingle frames. At
    warehouse scale the corpus band index and shingle frame are
    write-once artifacts (cf. ``write_lsh_partitioned`` for the
    embedding analog) — recomputed here only because this operator
    takes raw frames.

    Viral buckets: the CORPUS side of each (band, bucket) is
    hub-filtered past ``max_bucket`` (same star-cap semantics as the
    self-join path) — a new doc probing a mass-duplicated bucket meets
    its min-id representative instead of all O(size) members, keeping
    the join fan-out linear in the new side. ``max_bucket=None``
    disables (test scale only)."""
    from pyspark import StorageLevel

    corpus_sh = corpus.select(
        F.col(id_col), hashed_shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    new_sh = new.select(
        F.col(id_col), hashed_shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    if eager:
        corpus_sh = corpus_sh.persist(StorageLevel.MEMORY_AND_DISK)
        new_sh = new_sh.persist(StorageLevel.MEMORY_AND_DISK)
    cb = _banded_from_shingles(
        corpus_sh, id_col, num_hashes, bands, seed
    ).select(F.col(id_col).alias("corpus_id"), "band", "bucket")
    nb = _banded_from_shingles(
        new_sh, id_col, num_hashes, bands, seed
    ).select(F.col(id_col).alias("new_id"), "band", "bucket")
    cb = _hub_cap_corpus_bands(cb, max_bucket)
    cand = nb.join(cb, ["band", "bucket"]).select("new_id", "corpus_id").distinct()
    out = _verify_candidate_pairs(cand, new_sh, corpus_sh, id_col, id_col, threshold)
    if not eager:
        return out
    try:
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        return out
    finally:
        corpus_sh.unpersist()
        new_sh.unpersist()


def cross_group_duplicates(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Cross-slice duplicate overlap matrix: for every pair of groups
    (sources, crawls, snapshots…), how many normalized-text
    fingerprints occur in BOTH — the corpus-provenance diagnostic that
    tells you which feeds are re-crawling each other before you decide
    survivor policy.

    Shape: reduce to DISTINCT (fingerprint, group) rows (exact dedup's
    md5 normalization — one shuffle), self-equi-join on the
    fingerprint. Per-key fan-out is bounded by the number of groups
    (≤ #groups² pairs per fingerprint, and #groups is small by
    definition), so the join is linear in the corpus no matter how
    viral any single text is. Output is O(#groups²) rows."""
    from pandera_forge_spark.operators.text import fingerprint

    fp = df.select(
        fingerprint(F.col(text_col)).alias("__fp"),
        F.col(group_col).alias("__g"),
    ).distinct()
    a = fp.select("__fp", F.col("__g").alias("group_a"))
    b = fp.select("__fp", F.col("__g").alias("group_b"))
    return (
        a.join(b, "__fp")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# -------------------------------------------------------------- simhash

def simhash64(col: Column, seed: int = 42) -> Column:
    """64-bit SimHash of the token multiset, as pure column algebra:
    for each bit, majority vote of token-hash bits.

    NOTE: single-expression form, fine when used ONCE per row (e.g. a
    fingerprint projection). The pairing path uses
    ``simhash_signatures`` instead — referencing this expression k
    times multiplies its cost k-fold (no CSE across higher-order
    functions, see minhash_signatures)."""
    # bit masks are Python literals (unrolled) because Spark's shift
    # functions take int shift amounts, not columns; bit 63 is the
    # sign bit of a signed long
    masks = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
    tok_hashes = F.transform(tokens(col), lambda t: F.xxhash64(t, F.lit(seed)))
    votes = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(h.bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1).cast("long")
                    for m in masks
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    sim = F.lit(0).cast("long")
    for b, m in enumerate(masks):
        sim = sim.bitwiseOR(
            F.when(F.element_at(votes, b + 1) > 0, F.lit(m).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sim


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, seed: int = 42
) -> DataFrame:
    """(id, simhash) via explode(tokens) + groupBy with 64 per-bit vote
    sums — the scale path (each token hashed once, one shuffle)."""
    masks = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).withColumn("__h", F.xxhash64(F.col("__t"), F.lit(seed)))
    aggs = [
        F.sum(
            F.when(F.col("__h").bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b, m in enumerate(masks)
    ]
    g = toks.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for b, m in enumerate(masks):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v_{b}") > 0, F.lit(m).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return g.select(F.col(id_col), sim.alias("__sim"))


def near_duplicates_simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    seed: int = 42,
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """SimHash near-dup pairs: bucket on 4 x 16-bit bands (two sigs
    within Hamming distance 3 of each other must agree exactly on at
    least one band — pigeonhole), verify with bit_count. Same
    candidate-then-verify shape as MinHash-LSH.

    ``max_bucket`` bounds the band self-join under viral duplication
    (a mass-duplicated document agrees on ALL four bands, so an
    uncapped join emits ~4·size²/2 pairs): per-(band, key) population
    and hub (min id) are aggregated first, and a-side rows in a bucket
    larger than ``max_bucket`` survive only if they ARE the hub — the
    join fan-out per hot bucket is O(size) star pairs around the hub,
    every member stays connected to the cluster representative, and
    ``pairs_to_clusters`` recovers the full component. Same hub-filter
    the embedding path applies before its bucket join
    (similarity.near_duplicates_embedding). ``max_bucket=None``
    disables the cap (exhaustive pairs, test scale only)."""
    sh = simhash_signatures(df, text_col, id_col, seed)
    banded = sh.select(
        id_col,
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("__sim"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "__sim", "bb.band", "bb.key")
    a = banded
    if max_bucket is not None:
        # the aggregate is O(distinct buckets) rows; AQE broadcasts it
        # when it fits. Filtering the BUILD side before the join bounds
        # the fan-out itself, not a post-hoc pair filter.
        sizes = banded.groupBy("band", "key").agg(
            F.count(F.lit(1)).alias("__bsz"), F.min(id_col).alias("__hub")
        )
        a = banded.join(sizes, ["band", "key"]).where(
            (F.col("__bsz") <= max_bucket) | (F.col(id_col) == F.col("__hub"))
        )
    a = a.select(
        F.col("band"), F.col("key"), F.col(id_col).alias("id_a"), F.col("__sim").alias("__sa")
    )
    b = banded.select(
        F.col("band"), F.col("key"), F.col(id_col).alias("id_b"), F.col("__sim").alias("__sb")
    )
    pairs = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("__sa"), F.col("__sb")).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


# ------------------------------------------------------------ clustering

def pairs_to_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Connected components over near-dup pairs → (id, cluster_id),
    cluster_id = the component's min member id. This is the step a real
    dedup pipeline needs after pair generation: A~B and B~C must
    deduplicate as ONE group even when A~C was never emitted as a pair
    (LSH misses it, or the viral-bucket star cap only linked hubs).

    Algorithm: iterative min-label propagation — each round every
    vertex takes the min of its own label and its neighbors' labels
    (two hash joins + a min-aggregate per round, all map-side
    combinable). Rounds needed = graph diameter; duplicate clusters are
    near-cliques or hub stars (the cap guarantees stars), so diameter
    is tiny — convergence is checked each round (count of changed
    labels, an O(1)-row action) and iteration stops early.
    Lineage is truncated each round so plan size stays constant:
    ``localCheckpoint`` by default (blocks cached on executors — fast,
    but lost on executor death), or a RELIABLE ``checkpoint`` when
    ``checkpoint_dir`` is given (blocks written to that fault-tolerant
    directory — the warehouse-scale mode, where losing an executor
    mid-iteration must not restart the whole propagation). Both modes
    produce identical labels (asserted in tests). Raises if max_iter
    rounds don't converge (pathological topology) rather than
    returning partial components silently."""
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = _truncate(
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                F.col("id"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("__chg"),
            )
        )
        new_labels = _truncate(new_labels)
        changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"pairs_to_clusters did not converge in {max_iter} rounds — "
        "raise max_iter (graph diameter exceeds it)"
    )


def exact_duplicate_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Hub-star pairs (min_id → member) for every exact-duplicate
    content group — O(group) pairs, the same star shape the LSH viral
    cap emits; feed to ``pairs_to_clusters`` or use directly.

    Scale shape: NO id array is ever materialized — a count/min(id)
    aggregate (constant-size buffer, map-side combinable) finds each
    group's hub, then a hash join back to the fingerprinted rows
    STREAMS the (hub, member) pairs out. A content string duplicated
    10^7 times costs one tiny aggregate row and 10^7 streamed output
    rows, never a multi-hundred-MB collect_list buffer in one task."""
    with_fp = df.select(
        fingerprint(F.col(text_col)).alias("__fp"), F.col(id_col)
    )
    hubs = (
        with_fp.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__n"), F.min(id_col).alias("id_a"))
        .where(F.col("__n") > 1)
    )
    return (
        with_fp.join(hubs, "__fp")
        .where(F.col(id_col) != F.col("id_a"))
        .select("id_a", F.col(id_col).alias("id_b"))
    )


def dedup_near(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: Optional[float] = None,
    method: str = "minhash",
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
    checkpoint_dir: Optional[str] = None,
    **method_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end near-dedup — the single call an LLM-data pipeline
    makes: candidate pairs (``minhash`` Jaccard-verified or ``simhash``
    Hamming-verified), connected-component clustering (so A~B~C
    deduplicates as ONE group even when A~C was never a pair), then a
    min-id survivor per cluster.

    ``threshold`` is the minhash Jaccard cut (default 0.8) or, for
    ``method='winnow'``, the fingerprint containment cut (default 0.3
    — see ``text.fingerprint_overlap_pairs``); simhash similarity is
    Hamming-based — pass ``max_hamming`` via ``method_kwargs``
    instead. Passing ``threshold`` with ``method='simhash'`` raises
    rather than being silently ignored.

    ``method='winnow'`` pairs on shared rolling-hash winnowing
    fingerprints — the CHARACTER-level signal that catches copies with
    word-boundary edits token shingles fragment; its boilerplate bound
    is the stop-fingerprint ``max_df`` (method_kwargs), not
    ``max_bucket``.

    Returns ``(survivors, mapping)``: ``survivors`` is ``df`` minus
    every non-representative cluster member (an anti-join — original
    rows pass through untouched), ``mapping`` is (id, cluster_id) for
    every row that belonged to a cluster, survivors included, so
    lineage joins can re-attach dropped docs to their kept
    representative.

    Every stage is the capped scale path: banded candidate generation
    (never all-pairs), hub-star fallback past ``max_bucket``, label
    propagation with per-round lineage truncation (reliable
    ``checkpoint_dir`` at warehouse scale)."""
    if method == "minhash":
        pairs = near_duplicates_minhash(
            df, text_col, id_col,
            threshold=0.8 if threshold is None else threshold,
            max_bucket=max_bucket, **method_kwargs,
        ).select("id_a", "id_b")
    elif method == "winnow":
        from pandera_forge_spark.operators.text import fingerprint_overlap_pairs

        pairs = fingerprint_overlap_pairs(
            df, text_col, id_col,
            min_overlap=0.3 if threshold is None else threshold,
            **method_kwargs,
        ).select("id_a", "id_b")
    elif method == "simhash":
        if threshold is not None:
            raise ValueError(
                "threshold is a minhash Jaccard cut and does not apply to "
                "method='simhash' (Hamming-based); pass max_hamming via "
                "method_kwargs instead"
            )
        pairs = near_duplicates_simhash(
            df, text_col, id_col, max_bucket=max_bucket, **method_kwargs
        ).select("id_a", "id_b")
    else:
        raise ValueError(
            f"unknown method {method!r} (minhash | simhash | winnow)"
        )

    mapping = pairs_to_clusters(pairs, checkpoint_dir=checkpoint_dir)
    losers = mapping.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    survivors = df.join(losers, id_col, "left_anti")
    return survivors, mapping


# -------------------------------------------------- pairwise verification

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_rows: Optional[int] = 10000,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold — the small-scale oracle
    path (O(n²) cross join; guarded by max_rows so nobody runs it on
    100 TB; the scale path is near_duplicates_minhash)."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"ngram_jaccard_pairs is the O(n²) verification path "
                f"({n} rows > max_rows={max_rows}); use near_duplicates_minhash"
            )
    sh = df.select(F.col(id_col), hashed_shingles(F.col(text_col), shingle_n).alias("__sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("__sha"), F.col("__shb")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def write_band_index(
    df: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> None:
    """Persist the corpus MinHash band index + shingle frame ONCE —
    the write-once artifact ``near_duplicates_incremental``'s docstring
    promises: a 10^12-doc corpus is banded and shingled a single time,
    and every day's crawl thereafter probes the stored index instead of
    re-scanning 100 TB of text.

    Layout: ``<path>/bands`` (id, band, bucket — partitioned by band so
    a probe joining one band prunes to its directory),
    ``<path>/shingles`` (id, shingle-hash array for the exact-Jaccard
    verify), ``<path>/_band_meta.json`` (the exact hashing parameters —
    a probe MUST band with identical num_hashes/bands/shingle_n/seed or
    collisions are meaningless, so they are stored, not trusted to
    call-site discipline). Sidecar goes through DriverFS (s3a/hdfs/
    local alike)."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    from pyspark import StorageLevel

    sh = df.select(
        F.col(id_col), hashed_shingles(F.col(text_col), shingle_n).alias("__sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # persist across the two actions: without it both the bands
        # write and the shingles write re-scan and re-shingle the full
        # corpus — twice the cost of the one-time artifact at 100 TB
        banded = _banded_from_shingles(sh, id_col, num_hashes, bands, seed)
        banded.write.partitionBy("band").mode("overwrite").parquet(
            f"{path}/bands"
        )
        sh.write.mode("overwrite").parquet(f"{path}/shingles")
    finally:
        sh.unpersist()
    DriverFS(df.sparkSession).write_bytes(
        f"{path}/_band_meta.json",
        json.dumps(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_n": shingle_n,
                "seed": seed,
                "id_col": id_col,
            }
        ).encode(),
    )


def append_band_index_epoch(
    df: DataFrame,
    path: str,
    epoch_id: int,
    text_col: str,
    id_col: str,
    shingles: Optional[DataFrame] = None,
) -> None:
    """Append one ingest epoch's documents to a persisted band index:
    band + shingle rows land under ``<path>/bands_epochs/__epoch=<id>``
    and ``<path>/shingles_epochs/__epoch=<id>`` as per-epoch OVERWRITE
    writes, so a replayed epoch (foreachBatch retry, stream restart)
    replaces its own rows instead of duplicating them. Hashing
    parameters come from the index sidecar — an epoch can never band
    differently than the base index."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    from pyspark import StorageLevel

    meta = json.loads(
        DriverFS(df.sparkSession).read_bytes(f"{path}/_band_meta.json").decode()
    )
    corpus_id = meta["id_col"]
    if shingles is not None:
        # caller-provided (id_col, __sh) frame — the streaming twin
        # shingles each micro-batch ONCE and shares it with the probe
        sh = shingles.select(
            F.col(id_col).alias(corpus_id), "__sh"
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        sh = df.select(
            F.col(id_col).alias(corpus_id),
            hashed_shingles(F.col(text_col), meta["shingle_n"]).alias("__sh"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        banded = _banded_from_shingles(
            sh, corpus_id, meta["num_hashes"], meta["bands"], meta["seed"]
        )
        banded.write.mode("overwrite").parquet(
            f"{path}/bands_epochs/__epoch={int(epoch_id)}"
        )
        sh.write.mode("overwrite").parquet(
            f"{path}/shingles_epochs/__epoch={int(epoch_id)}"
        )
    finally:
        sh.unpersist()


def _with_epochs(spark, base: DataFrame, root: str, sub: str,
                 max_epoch: Optional[int]) -> DataFrame:
    """Union a base index frame with its appended epoch rows (epochs
    >= ``max_epoch`` excluded — a replayed epoch must not see its own
    partial writes). Partition pruning resolves the epoch filter at
    planning time; no epoch dirs -> the base frame unchanged."""
    from pandera_forge_spark.sources.fs import DriverFS

    edir = f"{root}/{sub}"
    fs = DriverFS(spark)
    if not fs.exists(edir):
        return base
    # committed dirs only: a torn append (crash mid-write, no _SUCCESS)
    # must not poison schema inference on replay — and skipping it is
    # correct, since the torn epoch is exactly the one being replayed
    all_dirs = [n for n in fs.listdir(edir) if n.startswith("__epoch=")]
    names = [n for n in all_dirs if fs.exists(f"{edir}/{n}/_SUCCESS")]
    if not names:
        # dirs exist but NONE is committed: distinguish the legitimate
        # case (only the replayed own/future epoch is torn, excluded by
        # max_epoch anyway) from success markers being disabled on this
        # filesystem — silently skipping EVERY epoch there would stop
        # matching cross-epoch duplicates with no error (review-found)
        suspicious = [
            n
            for n in all_dirs
            if max_epoch is None or int(n.split("=", 1)[1]) < int(max_epoch)
        ]
        if suspicious:
            raise RuntimeError(
                f"{edir}: epoch dirs {suspicious} exist below the probe "
                "epoch but none has a _SUCCESS marker — success markers "
                "disabled on this filesystem? Torn-write skipping relies "
                "on them"
            )
        return base
    ep = spark.read.option("basePath", edir).parquet(
        *[f"{edir}/{n}" for n in names]
    )
    if max_epoch is not None:
        # cast guards against partition-type inference being disabled
        # session-wide (the runner toggles it) — string '10' < 9 lies
        ep = ep.where(F.col("__epoch").cast("long") < int(max_epoch))
    return base.unionByName(ep.drop("__epoch"))


def probe_band_index(
    spark,
    path: str,
    new: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
    max_epoch: Optional[int] = None,
    new_shingles: Optional[DataFrame] = None,
) -> DataFrame:
    """Probe a persisted band index with the day's new documents:
    identical semantics to ``near_duplicates_incremental`` (hub-capped
    corpus buckets, exact-Jaccard verify, (new_id, corpus_id, jaccard)
    out) but the corpus side is the stored artifact — zero corpus text
    is re-read, only the O(docs×bands) band rows and the shingle rows
    of actual candidates. Hashing parameters come from the sidecar, so
    a probe can never silently band differently than the index.

    The corpus side includes every epoch appended via
    ``append_band_index_epoch`` whose id is < ``max_epoch`` (all of
    them when None) — the streaming twin passes the current epoch id so
    a replayed micro-batch never probes its own partial append."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    meta = json.loads(
        DriverFS(spark).read_bytes(f"{path}/_band_meta.json").decode()
    )
    corpus_id = meta["id_col"]
    owns_shingles = new_shingles is None
    if owns_shingles:
        new_sh = new.select(
            F.col(id_col),
            hashed_shingles(F.col(text_col), meta["shingle_n"]).alias("__sh"),
        ).persist()
    else:
        # caller-provided (id_col, __sh), shingled with the index's
        # parameters and persisted by the caller
        new_sh = new_shingles.select(F.col(id_col), "__sh")
    nb = _banded_from_shingles(
        new_sh, id_col, meta["num_hashes"], meta["bands"], meta["seed"]
    ).select(F.col(id_col).alias("new_id"), "band", "bucket")
    cb = _with_epochs(
        spark, spark.read.parquet(f"{path}/bands"), path, "bands_epochs",
        max_epoch,
    ).select(F.col(corpus_id).alias("corpus_id"), "band", "bucket")
    cb = _hub_cap_corpus_bands(cb, max_bucket)
    cand = nb.join(cb, ["band", "bucket"]).select("new_id", "corpus_id").distinct()
    out = _verify_candidate_pairs(
        cand,
        new_sh,
        _with_epochs(
            spark, spark.read.parquet(f"{path}/shingles"), path,
            "shingles_epochs", max_epoch,
        ),
        id_col,
        corpus_id,
        threshold,
    )
    try:
        out = out.persist()
        out.count()
        return out
    finally:
        if owns_shingles:
            new_sh.unpersist()


# ------------------------------------------- prefix-filter exact join

def similarity_join_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT-Jaccard set-similarity self-join via prefix filtering
    (the AllPairs / PPJoin family — Bayardo, Ma, Srikant, WWW'07;
    public literature). Emits precisely the pairs whose shingle-set
    Jaccard is >= ``threshold`` — the same contract as the O(n²)
    :func:`ngram_jaccard_pairs` verification path — but WITHOUT the
    cross join and WITHOUT LSH's false-negative band gamble: this is
    the scale path to use when the answer must be exact.

    Why the candidate set stays small: every record's shingle set is
    ordered by GLOBAL rarity — the ``(document_frequency ASC, hash
    ASC)`` tuple is itself the total order, so no global rank is ever
    materialised — and only the first ``|x| - ceil(t·|x|) + 1``
    entries (the "prefix") are exploded into the candidate join. Two
    records with Jaccard >= t must share at least one prefix entry
    under ANY shared total order (the prefix-filtering principle), so
    completeness is exact; because prefixes hold each record's RAREST
    shingles, a stopword-grade shingle shared by half the corpus
    almost never lands in anyone's prefix, and candidate fanout rides
    the df of rare tokens, not hubs. A symmetric length filter
    (``t·|a| <= |b|`` and ``t·|b| <= |a|``, implied by Jaccard >= t)
    prunes size-mismatched candidates inside the join condition before
    any verify work.

    Scale shape: one corpus-sized explode + hash groupBy for the df
    census; one shuffle join attaching df to each (id, shingle) row;
    one per-record collect back to a sorted array (record-sized state,
    never corpus-sized); a prefix-sized candidate explode (a ~(1-t)
    fraction of shingle volume); and a candidate-bounded verify join
    against the full hashed sets. Nothing is O(n²), nothing is
    driver-side, and every stage is a plain shuffle the optimizer can
    see. Float guard: prefix length uses ``ceil(t·|x| - 1e-9)`` so a
    3.0000000000000004-style double error can never SHORTEN the
    prefix and cost a pair.

    Output: ``id_a < id_b, jaccard`` (rounded to 6, same convention
    as :func:`ngram_jaccard_pairs`, so the two paths are
    row-for-row comparable in tests).
    """
    if not (0.0 < float(threshold) <= 1.0):
        raise ValueError(
            f"similarity_join_prefix: threshold must be in (0, 1], "
            f"got {threshold}"
        )
    for c in (text_col, id_col):
        if c not in df.columns:
            raise ValueError(f"similarity_join_prefix: column {c!r} missing")
    t = float(threshold)
    sh = df.select(
        F.col(id_col).alias("__id"),
        hashed_shingles(F.col(text_col), shingle_n).alias("__sh"),
    )
    ex = sh.select("__id", F.explode("__sh").alias("__h"))
    census = ex.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    ranked = ex.join(census, "__h")
    rec = ranked.groupBy("__id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__df"), F.col("__h")))
        ).alias("__ord"),
        F.count(F.lit(1)).alias("__sz"),
    )
    # prefix length |x| - ceil(t|x|) + 1; the -1e-9 absorbs upward
    # double error in t*|x| (never downward: ceil(k - 1e-9) == k for
    # exact-integer k, so the prefix can only ever be >= the true
    # length — completeness is preserved, a few extra candidates cost
    # only verify work)
    plen = (
        F.col("__sz")
        - F.ceil(F.lit(t) * F.col("__sz") - F.lit(1e-9))
        + F.lit(1)
    ).cast("int")
    pref = rec.select(
        F.col("__id"),
        F.col("__sz"),
        F.explode(
            F.slice(
                F.transform(F.col("__ord"), lambda s: s["__h"]),
                F.lit(1),
                plen,
            )
        ).alias("__h"),
    )
    a = pref.select(
        F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"), "__h"
    )
    b = pref.select(
        F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"), "__h"
    )
    cand = (
        a.join(b, "__h")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__szb") >= F.lit(t) * F.col("__sza") - F.lit(1e-9))
            & (F.col("__sza") >= F.lit(t) * F.col("__szb") - F.lit(1e-9))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"))
    sb = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                jaccard(F.col("__sha"), F.col("__shb")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= t)
    )
