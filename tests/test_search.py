import pytest
"""BM25 sparse retrieval (operators/search.py)."""

import math

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.search import (
    bm25_index,
    bm25_topk,
    corpus_stats,
    tokenize_query,
)


def _bm25_local(docs, query, k1=1.2, b=0.75):
    """Pure-Python BM25 reference with the same micro-unit
    quantization — the executable spec."""
    toks = {i: t.strip().lower().split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    q = sorted({t for t in query.strip().lower().split() if t})
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in q}
    scores = {}
    for i, tk in toks.items():
        s = 0
        for t in q:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            term = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(tk) / avgdl)
            )
            s += math.floor(term * 1000000.0 + 0.5)
        if s:
            scores[i] = s / 1000000.0
    return scores


DOCS = [
    (0, "spark shuffles data between stages during wide joins"),
    (1, "the hash join broadcasts the small side to every executor"),
    (2, "window functions rank rows within partitions"),
    (3, "gardening tips for tomatoes and basil in summer"),
    (4, "spark spark spark join join hash"),  # term-stuffed
]


def test_bm25_matches_local_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    query = "spark hash join"
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, "text", "doc_id", query, k=10).collect()
    }
    want = _bm25_local(DOCS, query)
    assert got == want
    # the term-stuffed doc outranks everything; the gardening doc
    # scores no hits at all
    assert max(got, key=got.get) == 4
    assert 3 not in got


def test_bm25_precomputed_index_path(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = bm25_index(df, "text", "doc_id")
    st = corpus_stats(df, "text")
    direct = bm25_topk(df, "text", "doc_id", "window rank", k=5).collect()
    via_index = bm25_topk(
        df, "text", "doc_id", "window rank", k=5, index=idx, stats=st
    ).collect()
    assert direct == via_index


def test_bm25_query_validation_and_tokenizer(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "text", "doc_id", "   ")
    assert tokenize_query("  Hash JOIN hash ") == ["hash", "join"]


def test_bm25_plan_udf_free_and_filter_first(spark, tmp_path):
    from pandera_forge_spark.plans.inspect import has_python_udf, pushed_filters

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bm25_topk(df, "text", "doc_id", "spark join")
    assert not has_python_udf(top)

    # on a PERSISTED index, the query-term isin reaches the parquet scan
    p = str(tmp_path / "postings")
    bm25_index(df, "text", "doc_id").write.parquet(p)
    idx = spark.read.parquet(p)
    st = corpus_stats(df, "text")
    top2 = bm25_topk(
        df, "text", "doc_id", "spark join", index=idx, stats=st
    )
    pushed = " ".join(pushed_filters(top2)).lower()
    assert "term" in pushed, f"term filter not pushed: {pushed!r}"


def test_rrf_fuse_exact_and_validated(spark):
    """RRF over two tiny rankings matches the closed form, and the
    combiner validates empty input."""
    from pandera_forge_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 5.0), (1, 4.0), (4, 3.0)], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([(a, "score"), (b, "score")], "doc_id", k=10).collect()
    }

    def c(rank):
        import math
        return math.floor(1e9 / (60 + rank))

    want = {
        1: (c(1) + c(2)) / 1e9,   # rank 1 in a, rank 2 in b
        2: c(2) / 1e9,
        3: (c(3) + c(1)) / 1e9,
        4: c(3) / 1e9,
    }
    assert got == want
    # doc 3 (ranks 3+1) beats doc 1 (ranks 1+2)? both sum c(1)+c(2) vs
    # c(3)+c(1) -> doc 1 wins; order check:
    order = [r["doc_id"] for r in
             rrf_fuse([(a, "score"), (b, "score")], "doc_id", k=10).collect()]
    assert order[0] == 1 and order[1] == 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        rrf_fuse([], "doc_id")


def test_bm25_bucketed_index_prunes_buckets(spark):
    """The production index shape (bucketBy(term)) must actually
    bucket-prune: a 2-term query's scan reads only the query terms'
    buckets, not the whole index — the executed plan reports
    SelectedBucketsCount < total."""
    import re

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    spark.sql("DROP TABLE IF EXISTS __bm25_postings_test")
    (
        bm25_index(df, "text", "doc_id")
        .write.bucketBy(16, "term")
        .sortBy("term")
        .mode("overwrite")
        .saveAsTable("__bm25_postings_test")
    )
    try:
        idx = spark.table("__bm25_postings_test")
        top = bm25_topk(
            df, "text", "doc_id", "spark join", k=5,
            index=idx, stats=corpus_stats(df, "text"),
        )
        plan = top._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, f"no bucket pruning in plan:\n{plan[:2000]}"
        selected, total = int(m.group(1)), int(m.group(2))
        assert total == 16 and selected <= 2  # <= one bucket per query term
        assert top.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS __bm25_postings_test")


def test_bm25_join_matches_single_query_path(spark):
    """bm25_join over a one-row query frame must equal bm25_topk for
    the same query string (rank included), and multiple queries rank
    independently."""
    from pandera_forge_spark.operators.search import bm25_join

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(10, "spark hash join"), (20, "window rank")],
        "query_id long, text string",
    )
    joined = bm25_join(df, queries, k=5)
    by_q = {}
    for r in joined.collect():
        by_q.setdefault(r["query_id"], []).append(r)

    single = bm25_topk(df, "text", "doc_id", "spark hash join", k=5).collect()
    got = sorted(by_q[10], key=lambda r: r["rank"])
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in single
    ]
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    # second query scores independently: doc 2 (window functions rank
    # rows) tops "window rank"
    assert sorted(by_q[20], key=lambda r: r["rank"])[0]["doc_id"] == 2


def test_bm25_join_plan_udf_free(spark):
    from pandera_forge_spark.operators.search import bm25_join
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame([(1, "spark")], "query_id long, text string")
    assert not has_python_udf(bm25_join(df, queries, k=3))


def test_bm25_join_guards_duplicates_and_empty_queries(spark):
    """Review-found edges: duplicate query rows must not k-fold scores,
    and a tokenless query raises instead of vanishing."""
    from pandera_forge_spark.operators.search import bm25_join

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    dup = spark.createDataFrame(
        [(10, "spark hash"), (10, "spark hash")], "query_id long, text string"
    )
    single = spark.createDataFrame(
        [(10, "spark hash")], "query_id long, text string"
    )
    assert (
        bm25_join(df, dup, k=5).collect()
        == bm25_join(df, single, k=5).collect()
    )
    with pytest.raises(ValueError):
        bm25_join(df, spark.createDataFrame(
            [(1, "spark"), (2, "   ")], "query_id long, text string"
        ))
    with pytest.raises(ValueError):
        bm25_join(df, spark.createDataFrame(
            [(1, "spark"), (2, None)], "query_id long, text string"
        ))


def test_bm25_persisted_index_equality_and_pruning(spark, tmp_path):
    """write_bm25_index/load_bm25_index/bm25_topk_indexed: the indexed
    path returns EXACTLY the direct path's rows (same micro-unit
    arithmetic over the same postings), the scan reads only the query
    terms' bucket directories (PartitionFilters in the executed plan,
    file count bounded by the touched buckets), the sidecar stats make
    the query corpus-free, and the driver-side CRC32 bucket matches the
    JVM's for every indexed term."""
    from pandera_forge_spark.operators.search import (
        _term_bucket_py,
        bm25_topk_indexed,
        load_bm25_index,
        write_bm25_index,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    path = str(tmp_path / "bm25_idx")
    meta = write_bm25_index(df, path, "text", "doc_id", n_buckets=16)
    assert meta["n_docs"] == len(DOCS)

    query = "spark hash join"
    direct = bm25_topk(df, "text", "doc_id", query, k=10)
    indexed = bm25_topk_indexed(spark, path, query, k=10)
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, indexed.collect())
    )

    # planning-time pruning: PartitionFilters on __tb, and the files
    # actually read are only the touched buckets' dirs
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "__tb" in plan.split("PartitionFilters: [", 1)[1][:300]
    buckets = {_term_bucket_py(t, 16) for t in tokenize_query(query)}
    # execution-time proof (inputFiles() lists the UNPRUNED relation):
    # the files actually read all live under the query terms' bucket dirs
    read_files = {
        r[0]
        for r in spark.read.parquet(path)
        .where(F.col("__tb").cast("int").isin(list(buckets)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    touched = {
        f.split("__tb=")[1].split("/")[0] for f in read_files if "__tb=" in f
    }
    assert touched <= {str(b) for b in buckets} and touched

    # python CRC32 bucketing == the JVM expression, term by term
    post, stats, _ = load_bm25_index(spark, path)
    for r in post.select("term", "__tb").distinct().collect():
        assert _term_bucket_py(r["term"], 16) == int(r["__tb"])
    # sidecar stats match a fresh corpus pass
    live = corpus_stats(df, "text").collect()[0]
    got = stats.collect()[0]
    assert got["n_docs"] == live["n_docs"]
    assert abs(got["avgdl"] - live["avgdl"]) < 1e-12

    with pytest.raises(ValueError):
        bm25_topk_indexed(spark, path, "   ")
    with pytest.raises(ValueError):
        write_bm25_index(df, path, "nope", "doc_id")


# ---------------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_match_unranked_filter(spark):
    """negatives == the FULL candidate ranking minus positives — the
    kernel is shared with bm25_join, so compare against bm25_join with
    an unreachable k, python-filtered, re-ranked."""
    from pandera_forge_spark.operators.search import bm25_join, hard_negatives

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = df.where(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    positives = spark.createDataFrame(
        [(0, 0), (1, 1)], "query_id long, doc_id long"
    )
    got = hard_negatives(df, queries, positives, n=3).collect()
    full = bm25_join(df, queries, k=100).collect()
    want = {}
    for r in sorted(full, key=lambda r: (r["query_id"], r["rank"])):
        if (r["query_id"], r["doc_id"]) in {(0, 0), (1, 1)}:
            continue
        want.setdefault(r["query_id"], [])
        if len(want[r["query_id"]]) < 3:
            want[r["query_id"]].append((r["doc_id"], r["score"]))
    got_by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"])
        )
    assert got_by_q == want
    # ranks are renumbered 1..len per query (contiguous from 1, no holes
    # where the positive used to sit)
    for qid in got_by_q:
        ranks = sorted(r["rank"] for r in got if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_hard_negatives_full_n_when_positive_tops(spark):
    """THE reason the anti-join runs before the rank cut: the query's
    positive is its own top-1 (self-retrieval), yet n negatives still
    come back — a compose-with-bm25_join(k=n) would return n-1."""
    from pandera_forge_spark.operators.search import bm25_join, hard_negatives

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = df.where(F.col("doc_id") == 4).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    positives = spark.createDataFrame([(4, 4)], "query_id long, doc_id long")
    top = bm25_join(df, queries, k=1).collect()
    assert top[0]["doc_id"] == 4  # the positive IS the top hit
    neg = hard_negatives(df, queries, positives, n=2).collect()
    assert len(neg) == 2
    assert all(r["doc_id"] != 4 for r in neg)


def test_hard_negatives_null_positive_key_is_loud(spark):
    from pandera_forge_spark.operators.search import hard_negatives

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = df.where(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    positives = spark.createDataFrame(
        [(0, None)], "query_id long, doc_id long"
    )
    with pytest.raises(ValueError, match="NULL key"):
        hard_negatives(df, queries, positives, n=2)


def test_hard_negatives_missing_positive_columns_is_loud(spark):
    from pandera_forge_spark.operators.search import hard_negatives

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = df.where(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    positives = spark.createDataFrame([(0,)], "query_id long")
    with pytest.raises(ValueError, match="lacks"):
        hard_negatives(df, queries, positives, n=2)


# ---------------------------------------------------------------------------
# footrule_disagreement
# ---------------------------------------------------------------------------

from pandera_forge_spark.operators.search import footrule_disagreement


def test_footrule_planted(spark):
    rows = (
        # q1: identical order -> footrule 0
        [("q1", f"d{i}", 10.0 - i, 100.0 - i) for i in range(5)]
        # q2: exact reversal of 4 items -> footrule 8 = floor(16/2), norm 1.0
        + [("q2", f"d{i}", 4.0 - i, float(i)) for i in range(4)]
        # q3: one swap in 3 items -> |1-2|+|2-1|+0 = 2; norm 2/4
        + [("q3", "a", 3.0, 2.0), ("q3", "b", 2.0, 3.0), ("q3", "c", 1.0, 1.0)]
        # q4: single item -> norm NULL
        + [("q4", "only", 1.0, 9.0)]
        # NULL score rows excluded
        + [("q1", "dropme", None, 5.0)]
    )
    df = spark.createDataFrame(rows, "q string, item string, sa double, sb double")
    out = {r["q"]: r for r in footrule_disagreement(
        df, ["q"], "item", "sa", "sb").collect()}
    assert (out["q1"]["n_items"], out["q1"]["footrule"], out["q1"]["norm"]) == (5, 0, 0.0)
    assert (out["q2"]["footrule"], out["q2"]["norm"]) == (8, 1.0)
    assert (out["q3"]["footrule"], out["q3"]["norm"]) == (2, 0.5)
    assert out["q4"]["norm"] is None and out["q4"]["footrule"] == 0


def test_footrule_tie_break_deterministic(spark):
    # equal scores: item id orders them the same way on both sides, so
    # ties contribute ZERO disagreement rather than random noise
    rows = [("q", f"d{i}", 1.0, 1.0) for i in range(6)]
    df = spark.createDataFrame(rows, "q string, item string, sa double, sb double")
    [r] = footrule_disagreement(df, ["q"], "item", "sa", "sb").collect()
    assert r["footrule"] == 0


def test_footrule_duplicate_item_raises_and_fences(spark):
    df = spark.createDataFrame(
        [("q", "d", 1.0, 1.0), ("q", "d", 2.0, 2.0)],
        "q string, item string, sa double, sb double",
    )
    with pytest.raises(Exception, match="duplicate item"):
        footrule_disagreement(df, ["q"], "item", "sa", "sb").collect()
    with pytest.raises(ValueError, match="non-empty"):
        footrule_disagreement(df, [], "item", "sa", "sb")
    with pytest.raises(ValueError, match="not in frame"):
        footrule_disagreement(df, ["q"], "nope", "sa", "sb")
    with pytest.raises(ValueError, match="collide"):
        footrule_disagreement(
            df.withColumnRenamed("q", "norm"), ["norm"], "item", "sa", "sb"
        )


def test_footrule_partition_independence_no_udf(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf

    rows = [
        (f"q{i % 4}", f"d{i}", float((i * 7) % 23), float((i * 11) % 19))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "q string, item string, sa double, sb double")
    out = footrule_disagreement(df, ["q"], "item", "sa", "sb")
    assert not has_python_udf(out)
    a = sorted(map(tuple, footrule_disagreement(
        df.repartition(7), ["q"], "item", "sa", "sb").collect()))
    b = sorted(map(tuple, footrule_disagreement(
        df.coalesce(1), ["q"], "item", "sa", "sb").collect()))
    assert a == b
