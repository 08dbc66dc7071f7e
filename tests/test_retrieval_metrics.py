"""retrieval_metrics — hand-computed trec_eval replays + fences."""

import math

import pytest

from pandera_forge_spark.operators.search import retrieval_metrics


def _gain(r):
    # the ln-ratio form, matching _gain_q exactly (NOT math.log2 —
    # a correctly-rounded log2 can differ from ln(x)/ln(2) by an ulp)
    return math.floor(1e9 / (math.log(r + 1) / math.log(2)) + 0.5)


# query 1: rel docs {10, 11, 12}; run ranks 10 at 1, 11 at 4, 99 at 2...
RUN = [
    (1, 10, 1), (1, 99, 2), (1, 98, 3), (1, 11, 4), (1, 97, 5),
    # query 2: first relevant at rank 3
    (2, 50, 1), (2, 51, 2), (2, 20, 3),
    # query 3 is judged but absent from the run entirely
    # query 4 appears in the run but has NO judgments -> dropped
    (4, 70, 1),
]
QRELS = [
    (1, 10), (1, 11), (1, 12),
    (2, 20),
    (3, 30),
]


def _metrics(spark, k=5):
    run = spark.createDataFrame(RUN, "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(QRELS, "query_id long, doc_id long")
    return {
        r["query_id"]: r.asDict()
        for r in retrieval_metrics(run, qrels, k=k).collect()
    }


def test_metrics_hand_computed(spark):
    m = _metrics(spark, k=5)
    assert set(m) == {1, 2, 3}  # judged queries only; q4 dropped

    q1 = m[1]
    assert q1["n_rel"] == 3 and q1["hits_at_k"] == 2
    assert q1["recall_at_k"] == pytest.approx(2 / 3)
    assert q1["rr_at_k"] == 1.0
    dcg = _gain(1) + _gain(4)
    idcg = _gain(1) + _gain(2) + _gain(3)  # min(n_rel, k) = 3
    assert q1["ndcg_at_k"] == dcg / idcg

    q2 = m[2]
    assert q2["hits_at_k"] == 1 and q2["rr_at_k"] == pytest.approx(1 / 3)
    assert q2["ndcg_at_k"] == _gain(3) / _gain(1)

    q3 = m[3]  # judged, never retrieved: all zeros
    assert q3["hits_at_k"] == 0 and q3["recall_at_k"] == 0.0
    assert q3["rr_at_k"] == 0.0 and q3["ndcg_at_k"] == 0.0


def test_metrics_cutoff_k(spark):
    m = _metrics(spark, k=1)
    assert m[1]["hits_at_k"] == 1
    # idcg at k=1 is gain(1) regardless of n_rel
    assert m[1]["ndcg_at_k"] == _gain(1) / _gain(1) == 1.0
    assert m[2]["hits_at_k"] == 0 and m[2]["rr_at_k"] == 0.0


def test_metrics_duplicate_qrels_raise_in_band(spark):
    run = spark.createDataFrame(RUN, "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(
        QRELS + [(1, 10)], "query_id long, doc_id long"
    )
    with pytest.raises(Exception, match="duplicated"):
        retrieval_metrics(run, qrels).collect()


def test_metrics_null_qrels_key_raises(spark):
    run = spark.createDataFrame(RUN, "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(
        QRELS + [(1, None)], "query_id long, doc_id long"
    )
    with pytest.raises(Exception, match="NULL-keyed"):
        retrieval_metrics(run, qrels).collect()


def test_metrics_param_and_column_fences(spark):
    run = spark.createDataFrame(RUN, "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(QRELS, "query_id long, doc_id long")
    with pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(run, qrels, k=0)
    with pytest.raises(ValueError, match="run lacks"):
        retrieval_metrics(run.drop("rank"), qrels)
    with pytest.raises(ValueError, match="qrels lacks"):
        retrieval_metrics(run, qrels.withColumnRenamed("doc_id", "d"))


def test_metrics_compose_with_bm25_join(spark):
    """Composition over real docs: qrels = each query's own BM25 top-3
    (so the ideal ordering is achieved by construction — the documents
    fixture plants duplicates that can outrank a query's own doc, so
    self-qrels are NOT guaranteed rank 1) -> metrics must be exactly
    perfect: recall 1, RR 1, nDCG 1."""
    from pyspark.sql import functions as F

    from pandera_forge_spark.operators.search import bm25_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    run = bm25_join(docs, queries, k=10)
    qrels = run.where(F.col("rank") <= 3).select("query_id", "doc_id")
    m = {
        r["query_id"]: r.asDict()
        for r in retrieval_metrics(run, qrels, k=10).collect()
    }
    assert set(m) == {0, 1, 2}
    for v in m.values():
        assert v["n_rel"] == 3 and v["hits_at_k"] == 3
        assert v["rr_at_k"] == 1.0 and v["ndcg_at_k"] == 1.0
        assert v["recall_at_k"] == 1.0


def test_metrics_no_udf(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf

    run = spark.createDataFrame(RUN, "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(QRELS, "query_id long, doc_id long")
    assert not has_python_udf(retrieval_metrics(run, qrels))


def test_metrics_duplicate_run_pair_raises_in_band(spark):
    """A run built by concatenating two runs: the same relevant
    (query, doc) at two ranks would double-count hits/DCG — fenced."""
    run = spark.createDataFrame(
        RUN + [(1, 10, 5)], "query_id long, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(QRELS, "query_id long, doc_id long")
    with pytest.raises(Exception, match="duplicated or rank"):
        retrieval_metrics(run, qrels, k=5).collect()


def test_metrics_zero_based_rank_raises_in_band(spark):
    """rank 0 would make the DCG gain 1e9/log2(1) = Infinity — fenced."""
    run = spark.createDataFrame(
        [(1, 10, 0)], "query_id long, doc_id long, rank int"
    )
    qrels = spark.createDataFrame([(1, 10)], "query_id long, doc_id long")
    with pytest.raises(Exception, match="duplicated or rank"):
        retrieval_metrics(run, qrels, k=5).collect()
