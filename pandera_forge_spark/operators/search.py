"""Sparse lexical retrieval (BM25) over an inverted-index shape.

Training-data-pipeline addition (build brief: similarity search): the
term-sparse complement to the dense-embedding paths in
``operators/similarity.py`` — the retrieval primitive behind corpus
search, eval-set leak triage ("which training docs score highest
against this benchmark question?"), and hybrid (sparse+dense) ranking.

Spark-first shape, and the reason it scales to 10^12 docs:

- The corpus reduces to POSTINGS ``(doc_id, term, tf, dl)`` — one
  explode + one partially-aggregated groupBy. Persisted with
  ``bucketBy(term)`` (see :func:`bm25_index` notes) the index is the
  classic term-partitioned inverted index.
- At query time the postings frame is filtered to the query's terms
  BEFORE any shuffle — an ``isin`` over a handful of literals that
  Catalyst pushes into the scan (partition/bucket prune on a bucketed
  index), so a 5-term query moves 5 posting lists, not the corpus.
- Per-term document frequencies for scoring are aggregated from those
  same filtered postings (tiny: one row per query term) and broadcast
  back; global stats (N, avgdl) ride a 1-row broadcast crossJoin, so
  the whole plan stays lazy — no driver-side ``collect`` of anything
  data-proportional.
- Per-term BM25 contributions are quantized to integer micro-units
  (``floor(x·1e6 + 0.5)`` longs) BEFORE the per-doc sum: integer sums
  are exact in any order, so scores are reproducible across
  partitionings and retries — no float-summation-order ambiguity at
  the top-k boundary (same discipline as
  ``similarity.quantize_embeddings``). Residual cross-ENGINE caveat:
  the per-term double itself involves ``ln`` (JVM vs libm may differ
  in the last ulp), so an oracle replay additionally spells the
  arithmetic in the same association order; a contribution landing
  within ~1 ulp of a micro-unit boundary could still floor differently
  — astronomically unlikely per term, and confined to a ±1e-6 score
  wiggle, but it is ``ln``-accuracy-dependent, not "bit-identical by
  construction" the way pure-integer pipelines are.

No UDF anywhere; the only Python is tokenizing the QUERY string (a
constant) with the same rules as the corpus tokenizer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandera_forge_spark.operators.text import tokens

# BM25 Okapi defaults (Robertson et al.); idf uses the
# ln(1 + (N - df + 0.5)/(df + 0.5)) form, which is non-negative for
# every df <= N (the form Lucene uses).
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def tokenize_query(query: str) -> list[str]:
    """Query-string twin of ``text.tokens`` (lower, trim, whitespace
    split, drop empties), deduplicated and sorted for deterministic
    plans. Runs driver-side on a constant — not a UDF."""
    return sorted({t for t in (query or "").strip().lower().split() if t})


def bm25_index(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Postings frame ``(id_col, term, tf, dl)`` — term frequency per
    (doc, term) plus the doc's token length carried through the
    aggregation as a grouping key (constant per doc, so it adds no
    cardinality and saves a second join against a doc-length table).

    One explode + one groupBy; count partial-aggregates map-side. To
    persist as a real inverted index, write with
    ``.write.bucketBy(n, "term").sortBy("term")`` so query-time term
    filters prune buckets instead of scanning the index."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    post = toks.select(
        F.col(id_col), F.size("__t").alias("dl"), F.explode("__t").alias("term")
    )
    return post.groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).alias("tf"))


def corpus_stats(df: DataFrame, text_col: str) -> DataFrame:
    """1-row frame ``(n_docs, avgdl)`` — the only global state BM25
    needs; broadcast into the scoring plan, never collected."""
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("avgdl"),
    )


def _bm25_contrib(k1: float, b: float):
    """The per-(doc, term) Okapi contribution as a micro-unit long —
    THE one definition of the scoring formula, shared by the single-
    query and batch paths (and mirrored literally by their SQL
    oracles): ``floor(idf · tf_norm · 1e6 + 0.5)`` over columns
    (tf, dl, df, n_docs, avgdl). Integer micro-units make per-doc sums
    order-independent; see the module docstring for the residual
    ``ln`` cross-engine caveat."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_term = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return F.floor(idf * tf_term * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    index: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25 against ``query``.

    Returns ``(id_col, score)`` ordered by score descending, ties by
    id. ``score`` is the sum of per-term contributions quantized to
    1e-6 — exact integer arithmetic end to end, so equal-profile
    documents tie EXACTLY and the ranking is reproducible bit-for-bit
    on any engine or partitioning.

    Pass a precomputed ``index`` (:func:`bm25_index`) and ``stats``
    (:func:`corpus_stats`) to amortize the corpus pass across queries —
    the query-time plan then touches only the query terms' postings.
    """
    q_terms = tokenize_query(query)
    if not q_terms:
        raise ValueError("query has no tokens")
    idx = index if index is not None else bm25_index(df, text_col, id_col)
    st = stats if stats is not None else corpus_stats(df, text_col)

    # filter FIRST: only the query terms' postings enter any shuffle
    hits = idx.where(F.col("term").isin(q_terms))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = hits.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(st))
    contrib = _bm25_contrib(k1, b)
    return (
        scored.select(F.col(id_col), contrib.alias("__c"))
        .groupBy(id_col)
        .agg(F.sum("__c").alias("__s"))
        .select(F.col(id_col), (F.col("__s") / F.lit(1000000.0)).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_join(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    index: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Batch sparse retrieval — the BM25 twin of ``similarity.knn_join``:
    every row of ``queries`` gets its top-``k`` corpus documents by
    BM25. The bulk shape behind eval-set leak triage ("for EACH
    benchmark question, which training docs score highest?") and
    retrieval-augmented labeling, where one query at a time would mean
    thousands of jobs.

    Plan shape for 10^12 docs × 10^5 queries:
    - queries tokenize to ``(query_id, term)`` pairs (per-query
      DISTINCT terms — BM25 ignores query-term multiplicity);
    - the postings frame is filtered by a BROADCAST semi-join on the
      queries' distinct term set — the dynamic-set equivalent of
      ``bm25_topk``'s literal ``isin`` (same posting-list pruning; the
      term set is query-frame-sized, hence broadcastable);
    - document frequencies come from the filtered postings (exact: df
      counts the FULL corpus occurrences of each surviving term);
    - scoring joins postings to query terms ON TERM (broadcast), sums
      micro-unit long contributions per (query, doc) — order-free,
      engine-exact — and takes top-k per query with a window
      (partitioned by query: parallel across queries, never global).

    Returns ``(query_id_col, id_col, score, rank)``.
    """
    per_pair = _bm25_pairs(
        corpus, queries, text_col, id_col, query_text_col, query_id_col,
        k1, b, index, stats,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__s"), F.asc(id_col)
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            (F.col("__s") / F.lit(1000000.0)).alias("score"),
            "rank",
        )
    )


def _bm25_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_text_col: str,
    query_id_col: str,
    k1: float,
    b: float,
    index: DataFrame | None,
    stats: DataFrame | None,
) -> DataFrame:
    """THE batch-scoring kernel shared by :func:`bm25_join` and
    :func:`hard_negatives`: every (query, candidate-doc) pair that
    shares at least one term, with its micro-unit long score ``__s`` —
    no rank cut yet, so callers can exclude rows (positives) BEFORE
    ranking without the truncate-then-filter bug a composed
    ``bm25_join -> anti-join`` would have (a positive inside the top-k
    would silently shrink that query's result)."""
    idx = index if index is not None else bm25_index(corpus, text_col, id_col)
    st = stats if stats is not None else corpus_stats(corpus, text_col)

    # tokenless queries would otherwise VANISH from the output (no
    # terms, no joins) — in leak triage that reads as "no leak found";
    # fail loudly instead. One tiny limit(1) job over the query frame.
    empty = (
        # coalesce first: tokens(NULL) is NULL and size(NULL) is NULL
        # under ANSI, so a bare size()==0 would let NULL text slip past
        queries.where(
            F.size(tokens(F.coalesce(F.col(query_text_col), F.lit("")))) == 0
        )
        .select(query_id_col)
        .limit(1)
        .collect()
    )
    if empty:
        raise ValueError(
            f"query {query_id_col}={empty[0][0]!r} has no tokens — "
            "tokenless queries would silently disappear from the result"
        )
    # .distinct(): duplicate query rows would otherwise duplicate
    # (query_id, term) pairs and sum each contribution once per copy —
    # silently k-folding every score
    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens(F.col(query_text_col)))).alias("term"),
    ).distinct()
    term_set = q_terms.select("term").distinct()
    hits = idx.join(F.broadcast(term_set), "term", "left_semi")
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        hits.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(st))
    )
    contrib = _bm25_contrib(k1, b)
    return (
        scored.select(F.col(query_id_col), F.col(id_col), contrib.alias("__c"))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__c").alias("__s"))
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    n: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    index: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training — for every query,
    the ``n`` HIGHEST-BM25 corpus documents that are NOT that query's
    labeled positives. Random negatives are trivially separable; the
    negatives that actually train a retriever/reranker are the
    lexically-confusable near-misses, i.e. exactly the top of the BM25
    ranking minus the positive set (the standard DPR/ANCE recipe).

    Shape: the shared :func:`_bm25_pairs` kernel scores every
    term-sharing (query, doc) pair, positives are removed with a
    per-(query, doc) left-anti hash join BEFORE the rank cut (an
    after-the-cut filter would return fewer than ``n`` negatives for
    exactly the queries whose positives rank highest — the ones that
    matter), then a per-query window takes the top ``n``. The positives
    frame is (query_id, doc_id) pairs; a NULL in either key column
    raises loudly — an equality anti-join would silently NOT exclude
    such a pair, handing the model its own positive as a "negative".

    Returns ``(query_id_col, id_col, score, rank)`` like
    :func:`bm25_join`.
    """
    missing = [c for c in (query_id_col, id_col) if c not in positives.columns]
    if missing:
        raise ValueError(f"hard_negatives: positives frame lacks {missing}")
    pos = positives.select(query_id_col, id_col)
    bad = pos.where(
        F.col(query_id_col).isNull() | F.col(id_col).isNull()
    ).limit(1).collect()
    if bad:
        raise ValueError(
            "hard_negatives: positives contain a NULL key "
            f"({bad[0].asDict()}) — equality anti-join would silently "
            "keep that positive as a negative"
        )
    per_pair = _bm25_pairs(
        corpus, queries, text_col, id_col, query_text_col, query_id_col,
        k1, b, index, stats,
    )
    neg = per_pair.join(pos, [query_id_col, id_col], "left_anti")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__s"), F.asc(id_col))
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select(
            query_id_col,
            id_col,
            (F.col("__s") / F.lit(1000000.0)).alias("score"),
            "rank",
        )
    )


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009) of
    N retrieval result lists — the standard hybrid-ranking combiner for
    sparse (BM25) + dense (embedding) retrieval, score-scale-free
    because it uses only RANKS: ``rrf(d) = Σ_lists 1/(rrf_k +
    rank_list(d))``.

    ``rankings`` is a list of ``(frame, score_col)`` pairs; each frame
    is an ALREADY-BOUNDED top-N result (e.g. :func:`bm25_topk`,
    ``similarity.cosine_topk``) — that bound is what makes the global
    ``row_number`` window here safe: it sorts a frame of N rows, not a
    corpus (ranks must be global, so computing them distributed would
    be wrong, and computing them over unbounded input would be the
    single-partition-window anti-pattern).

    Per-list contributions are quantized to ``floor(1e9/(rrf_k+rank))``
    longs before the union+sum — exact integer arithmetic, so fused
    scores and tie-breaks are engine-identical (same discipline as
    :func:`bm25_topk`). Returns ``(id_col, rrf)`` top-``k``.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = []
    for frame, score_col in rankings:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        parts.append(
            frame.select(
                F.col(id_col), F.row_number().over(w).alias("__r")
            ).select(
                F.col(id_col),
                F.floor(F.lit(1000000000.0) / (F.lit(rrf_k) + F.col("__r")))
                .cast("long")
                .alias("__c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(F.sum("__c").alias("__s"))
        .select(F.col(id_col), (F.col("__s") / F.lit(1000000000.0)).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


# ----------------------------------------------------------------------
# persisted inverted index (the partitioned-write twin of
# similarity.write_ivf_partitioned)
# ----------------------------------------------------------------------

def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of the index's bucket expression: IEEE CRC32 of
    the UTF-8 term, mod n_buckets. zlib.crc32 and Spark's ``crc32``
    compute the same checksum, so a query plans its partition filter
    without touching the JVM."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _term_bucket_col(n_buckets: int):
    return F.pmod(
        F.crc32(F.encode(F.col("term"), "UTF-8")), F.lit(n_buckets)
    ).cast("int")


def write_bm25_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> dict:
    """Persist the postings frame PARTITIONED BY term bucket, plus a
    ``_bm25_meta.json`` sidecar carrying the corpus stats (n_docs,
    avgdl) and the bucket count — so query sessions score WITHOUT ever
    touching the corpus again.

    Hash-bucket partition dirs rather than ``bucketBy``: plain parquet
    paths work on any object store with no metastore, and a query's
    term set maps driver-side (same CRC32, :func:`_term_bucket_py`) to
    at most |terms| partition directories — planning-time pruning, the
    inverted-index read pattern. The sidecar goes through DriverFS, so
    the path may be s3a://, hdfs:// or local alike."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    for col in (text_col, id_col):
        if col not in df.columns:
            raise ValueError(
                f"column {col!r} missing from the corpus frame — "
                "checked before the expensive partitioned write"
            )
    idx = bm25_index(df, text_col, id_col).withColumn(
        "__tb", _term_bucket_col(n_buckets)
    )
    idx.write.partitionBy("__tb").mode("overwrite").parquet(path)
    st = corpus_stats(df, text_col).collect()[0]  # 1 row, driver-safe
    meta = {
        "n_buckets": int(n_buckets),
        "n_docs": int(st["n_docs"]),
        "avgdl": float(st["avgdl"]),
        "id_col": id_col,
    }
    DriverFS(df.sparkSession).write_bytes(
        f"{path}/_bm25_meta.json", json.dumps(meta).encode()
    )
    return meta


def load_bm25_index(spark, path: str):
    """(postings frame with ``__tb``, 1-row stats frame, meta dict)."""
    import json

    from pandera_forge_spark.sources.fs import DriverFS

    meta = json.loads(DriverFS(spark).read_bytes(f"{path}/_bm25_meta.json"))
    post = spark.read.parquet(path)
    stats = spark.createDataFrame(
        [(meta["n_docs"], meta["avgdl"])], "n_docs long, avgdl double"
    )
    return post, stats, meta


def bm25_topk_indexed(
    spark,
    path: str,
    query: str,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """:func:`bm25_topk` against a :func:`write_bm25_index` corpus: the
    query's terms map to their partition dirs driver-side and the scan
    reads ONLY those (PartitionFilters, asserted in tests) — a 5-term
    query against a 10^12-doc index touches at most 5 of n_buckets
    directories, and the sidecar stats mean no corpus pass at all.
    Scores are identical to the direct path (same postings rows, same
    integer micro-unit arithmetic)."""
    post, stats, meta = load_bm25_index(spark, path)
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no tokens")
    buckets = sorted({_term_bucket_py(t, meta["n_buckets"]) for t in terms})
    # explicit cast: with partition-column type inference disabled the
    # dir value reads back as string (same defense as ivf_topk_partitioned)
    pruned = post.where(F.col("__tb").cast("int").isin(buckets)).drop("__tb")
    return bm25_topk(
        None, None, meta["id_col"], query, k=k, k1=k1, b=b,
        index=pruned, stats=stats,
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation — MRR / recall@k / nDCG@k over a run + qrels
# ---------------------------------------------------------------------------

# nDCG gains are quantized to nano-units (floor(1e9/log2(rank+1) + 0.5)
# longs) so per-query DCG totals are exact integer sums — the BM25
# micro-unit discipline applied to the EVALUATION, making metric rows
# replayable value-for-value by any engine with libm log2
_GAIN_SCALE = 1e9


def _gain_q(rank_col):
    """Quantized DCG gain of a 1-based rank:
    ``floor(1e9 / (ln(r+1)/ln(2)) + 0.5)``. Spelled as the ln RATIO —
    not ``log2`` — because natural log is the ONE transcendental this
    repo's oracle parity record is built on (BM25, MI, the perplexity
    filter all bank on JVM StrictMath.log == libm log at these
    arguments); a direct log2 would add a second, unproven libm
    function to the trust base for zero benefit."""
    return F.floor(
        F.lit(_GAIN_SCALE)
        / (
            F.log(rank_col.cast("double") + F.lit(1.0))
            / F.log(F.lit(2.0))
        )
        + F.lit(0.5)
    ).cast("long")


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval quality of a ranked ``run`` (the output shape
    of :func:`bm25_join` / :func:`rrf_fuse`: one row per (query, doc)
    with a 1-based ``rank``) against binary relevance judgments
    ``qrels`` (one row per relevant (query, doc) pair) — the trec_eval
    core, as one distributed plan. The missing piece between the
    retrieval operators and :func:`hard_negatives`: you tune k1/b or
    fusion weights BY this number.

    One row per JUDGED query (a query in ``run`` without judgments has
    no defined metrics and is dropped; a judged query missing from the
    run scores 0 — the trec_eval convention):

    - ``n_rel``  — its total relevant docs,
    - ``hits_at_k`` — relevant docs retrieved at rank <= k,
    - ``recall_at_k`` = hits_at_k / n_rel,
    - ``rr_at_k`` — 1/rank of the first relevant hit (0 when none):
      mean over queries = MRR@k,
    - ``ndcg_at_k`` — DCG/IDCG with binary gains 1/log2(rank+1), both
      sides quantized to nano-unit longs (exact integer sums, see
      ``_gain_q``); IDCG is the closed form over ranks
      1..min(n_rel, k), computed as column algebra (sequence +
      transform + aggregate), never a join.

    Scale shape: the run is cut to rank <= k FIRST (a pushable
    predicate), then ONE hash join qrels⋈run on (query, doc) and ONE
    groupBy(query) — both map-side combinable; qrels (human judgments,
    tiny) also feeds n_rel via its own groupBy. Duplicate qrels pairs
    raise IN-BAND (they would double-count hits silently); NULL keys in
    qrels raise for the same reason an anti-join fence does in
    :func:`hard_negatives`.
    """
    if k < 1:
        raise ValueError(f"retrieval_metrics: k must be >= 1, got {k}")
    for frame, name, cols in (
        (run, "run", (query_id_col, id_col, rank_col)),
        (qrels, "qrels", (query_id_col, id_col)),
    ):
        missing = [c for c in cols if c not in frame.columns]
        if missing:
            raise ValueError(f"retrieval_metrics: {name} lacks {missing}")
    q, d = query_id_col, id_col
    nullkey = F.col(q).isNull() | F.col(d).isNull()
    # the fence RIDES the kept doc-id column — a fence on a dropped
    # column would be pruned by Catalyst and never evaluate
    d_type = dict(qrels.dtypes)[d]
    pairs = (
        qrels.select(q, d)
        .groupBy(q, d)
        .agg(F.count(F.lit(1)).alias("__m"))
        .select(
            F.col(q),
            F.when(~nullkey & (F.col("__m") == 1), F.col(d))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "retrieval_metrics: qrels pair is NULL-keyed "
                            "or duplicated (would double-count): "
                        ),
                        F.coalesce(F.col(q).cast("string"), F.lit("NULL")),
                        F.lit("/"),
                        F.coalesce(F.col(d).cast("string"), F.lit("NULL")),
                    )
                ).cast(d_type)
            )
            .alias(d),
        )
    )
    nrel = pairs.groupBy(q).agg(F.count(F.lit(1)).alias("n_rel"))
    # the RUN side gets the same dup fence as qrels (a run assembled by
    # concatenating two runs would double-count hits and DCG silently),
    # plus a rank >= 1 fence: a 0-based rank makes the DCG gain
    # 1e9/log2(1) = Infinity and poisons ndcg. Both ride the kept __r.
    topk = (
        run.select(q, d, F.col(rank_col).alias("__r"))
        .where(F.col("__r") <= k)
        .groupBy(q, d)
        .agg(F.count(F.lit(1)).alias("__m"), F.min("__r").alias("__rmin"))
        .select(
            q,
            d,
            F.when(
                (F.col("__m") == 1) & (F.col("__rmin") >= 1), F.col("__rmin")
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "retrieval_metrics: run pair duplicated or "
                            "rank < 1 (would corrupt hits/DCG): "
                        ),
                        F.coalesce(F.col(q).cast("string"), F.lit("NULL")),
                        F.lit("/"),
                        F.coalesce(F.col(d).cast("string"), F.lit("NULL")),
                    )
                ).cast(dict(run.dtypes)[rank_col])
            )
            .alias("__r"),
        )
    )
    hit_agg = (
        topk.join(pairs, [q, d])
        .groupBy(q)
        .agg(
            F.count(F.lit(1)).alias("__hits"),
            F.min("__r").alias("__first"),
            F.sum(_gain_q(F.col("__r"))).alias("__dcg_q"),
        )
    )
    per_q = nrel.join(hit_agg, q, "left")
    m = F.least(F.col("n_rel"), F.lit(k))
    idcg_q = F.aggregate(
        F.transform(F.sequence(F.lit(1), m), lambda i: _gain_q(i)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    hits = F.coalesce(F.col("__hits"), F.lit(0))
    return per_q.select(
        q,
        F.col("n_rel"),
        hits.cast("long").alias("hits_at_k"),
        (hits.cast("double") / F.col("n_rel").cast("double")).alias(
            "recall_at_k"
        ),
        F.when(
            F.col("__first").isNotNull(),
            F.lit(1.0) / F.col("__first").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr_at_k"),
        (
            F.coalesce(F.col("__dcg_q"), F.lit(0)).cast("double")
            / idcg_q.cast("double")
        ).alias("ndcg_at_k"),
    )


def footrule_disagreement(
    df: DataFrame,
    key_cols: Sequence[str],
    item_col: str,
    score_a: str,
    score_b: str,
) -> DataFrame:
    """Spearman-footrule disagreement between two rankings of the same
    items — "how differently do my two retrievers order the same
    candidates", answered with an EXACT integer statistic instead of a
    float correlation: per key, both scores rank the items
    (descending, item id breaking ties deterministically) and the
    footrule is ``Σ |rank_a − rank_b|`` — 0 for identical orderings,
    maximal (``⌊n²/2⌋``) for a reversal, and every intermediate value
    an exact long. ``norm`` divides by that maximum (one raw IEEE
    division; NULL when n < 2, where disagreement is undefined) so
    0→identical, 1→reversed reads directly in a triage queue. The
    lens the retrieval-metrics family lacks: recall@k/MRR/NDCG score
    each ranking against LABELS; the footrule scores them against
    EACH OTHER — no labels needed, which is exactly the situation a
    new embedding model lands in ("does it even rank like the old
    one?").

    Rows with a NULL item or either score NULL are excluded (an item
    one ranker cannot score has no rank pair — filter upstream if
    that is itself the finding). Duplicate items per key raise
    IN-BAND: two rows claiming the same item make "its rank"
    meaningless.

    Scale shape: two row_number windows over the SAME key partition
    (one sort each on its score) + one fused groupBy on the same keys
    — Catalyst plans one Exchange for the windows chain; the
    aggregate is algebraic. Per-key candidate lists are ranking-sized
    (100s–1000s), the standard per-query window the BM25 family
    already uses — never a global sort.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("footrule_disagreement: key_cols must be non-empty")
    for c in (item_col, score_a, score_b):
        if c not in df.columns:
            raise ValueError(
                f"footrule_disagreement: column {c!r} not in frame"
            )
    missing = [c for c in keys if c not in df.columns]
    if missing:
        raise ValueError(
            f"footrule_disagreement: frame lacks key columns {missing}"
        )
    clash = set(keys) & {"n_items", "footrule", "norm"}
    if clash:
        raise ValueError(
            f"footrule_disagreement: key columns {sorted(clash)} collide "
            "with output names — rename them"
        )
    base = df.where(
        F.col(item_col).isNotNull()
        & F.col(score_a).isNotNull()
        & F.col(score_b).isNotNull()
    )
    kp = [F.col(k) for k in keys]
    wa = Window.partitionBy(*kp).orderBy(
        F.col(score_a).desc(), F.col(item_col)
    )
    wb = Window.partitionBy(*kp).orderBy(
        F.col(score_b).desc(), F.col(item_col)
    )
    wdup = Window.partitionBy(*kp, F.col(item_col))
    dup_fence = F.when(
        F.count(F.lit(1)).over(wdup) == 1, F.lit(1)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "footrule_disagreement: duplicate item per key — two "
                    "rows claiming the same item make its rank "
                    "meaningless (item="
                ),
                F.col(item_col).cast("string"),
                F.lit(")"),
            )
        )
    )
    ranked = base.select(
        *keys,
        dup_fence.alias("__ok"),
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wb).alias("__rb"),
    )
    # the fence multiplies into the summed term (×1 when clean) so
    # column pruning cannot delete the raise_error expression
    diff = (
        F.abs(F.col("__ra") - F.col("__rb")).cast("long")
        * F.col("__ok").cast("long")
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(diff).alias("footrule"),
    )
    n = F.col("n_items")
    max_fr = F.expr("(n_items * n_items) div 2")
    return agg.select(
        *keys,
        "n_items",
        "footrule",
        F.when(
            n >= 2, F.col("footrule").cast("double") / max_fr.cast("double")
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("norm"),
    )
