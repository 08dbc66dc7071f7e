from pyspark.sql import functions as F

from pandera_forge_spark.operators.text import (
    detect_language,
    fingerprint,
    quality_score,
    text_metrics,
    token_count,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(expr(F.col("t")).alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "the quick  brown fox", token_count) == 4
    assert _one(spark, "   ", token_count) == 0
    assert _one(spark, "", token_count) == 0
    assert _one(spark, "one", token_count) == 1


def test_language_detection(spark):
    en = "the cat and the dog sat in the house that is big for it"
    de = "der hund und die katze das ist nicht ein problem mit von zu"
    fr = "le chat et la maison est pas une des choses que pour les"
    assert _one(spark, en, detect_language) == "en"
    assert _one(spark, de, detect_language) == "de"
    assert _one(spark, fr, detect_language) == "fr"
    assert _one(spark, "zzz qqq xxx", detect_language) == "und"
    assert _one(spark, "", detect_language) == "und"


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and it is a fine day in the park"
    bad = "!!!! @@@@ #### $$$$ %%%%"
    shouty = "THE QUICK BROWN FOX JUMPS"
    g = _one(spark, good, quality_score)
    b = _one(spark, bad, quality_score)
    s = _one(spark, shouty, quality_score)
    assert g > s > b
    assert 0.0 <= b and g <= 1.0


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello,  World!", fingerprint)
    b = _one(spark, "hello world", fingerprint)
    c = _one(spark, "totally different", fingerprint)
    assert a == b != c
    assert len(a) == 32


def test_text_metrics_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = text_metrics(docs, "text", ["doc_id"])
    assert m.count() == docs.count()
    row = m.agg(
        F.min("quality"), F.max("quality"), F.countDistinct("fingerprint")
    ).collect()[0]
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert row[2] > 0
    # no shuffle: pure projection
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_metrics(spark):
    from pandera_forge_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "line one\nline two\nline one"),       # 1 dup line of 3
            (2, "all words all words all"),            # 5 words, 2 distinct
            (3, "clean unique text here"),
            (4, ""),                                   # empty -> 0.0, 0.0
        ],
        "id long, text string",
    )
    got = {
        r["id"]: (r["dup_line_ratio"], r["dup_word_ratio"])
        for r in repetition_metrics(df, "text", ["id"]).collect()
    }
    assert got[1][0] == round(1 - 2 / 3, 6)
    assert got[2][1] == round(1 - 2 / 5, 6)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)


def test_top_ngrams(spark):
    from pandera_forge_spark.operators.text import top_ngrams

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat quietly down"),
            (3, "the cat sat on the mat"),   # exact repeat of 1
            (4, "a dog"),                    # <3 tokens -> whole-doc shingle
        ],
        "id long, text string",
    )
    rows = top_ngrams(df, "text", k=3).collect()
    # "the cat sat" appears in 3 docs (per-doc distinct, so doc freq)
    assert rows[0]["ngram"] == "the cat sat" and rows[0]["doc_freq"] == 3
    assert all(rows[i]["doc_freq"] >= rows[i + 1]["doc_freq"] for i in range(2))
    whole = top_ngrams(df.where(F.col("id") == 4), "text", k=5).collect()
    assert [r["ngram"] for r in whole] == ["a dog"]


def test_contamination(spark):
    from pandera_forge_spark.operators.text import contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # fully contained: ratio 1.0
            (2, "alpha beta gamma nothing else"), # 1 of 3 shingles shared
            (3, "totally different words here"),  # 0 overlap
            (4, "xy"),                            # <3 tokens: whole-doc shingle
        ],
        "id long, text string",
    )
    got = {
        r["id"]: (r["n_shingles"], r["n_contaminated"], r["contamination_ratio"])
        for r in contamination(corpus, bench, "text", "id").collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (2, 0, 0.0)
    assert got[4] == (1, 0, 0.0)
    # shuffle-join mode gives identical answers
    got2 = {
        r["id"]: (r["n_shingles"], r["n_contaminated"], r["contamination_ratio"])
        for r in contamination(corpus, bench, "text", "id", broadcast=False).collect()
    }
    assert got2 == got


def test_tfidf_top_terms(spark):
    import math

    from pandera_forge_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry apple"),
        ],
        "id long, text string",
    )
    rows = tfidf_top_terms(df, "text", "id", k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: apple tf=2 df=2 -> 2*(ln(4/3)+1); banana tf=1 df=2
    idf2 = math.log(4 / 3) + 1
    assert by_doc[1][0]["term"] == "apple"
    assert by_doc[1][0]["tfidf"] == round(2 * idf2, 6)
    assert by_doc[1][0]["rank"] == 1
    # doc 2: banana and cherry both tf=1 df=2 -> tie broken term asc
    assert [r["term"] for r in by_doc[2]] == ["banana", "cherry"]
    # every doc emits at most k rows, ranks are 1..k
    assert all([r["rank"] for r in v] == list(range(1, len(v) + 1))
               for v in by_doc.values())


def test_filter_funnel(spark):
    from pyspark.sql import functions as F

    from pandera_forge_spark.operators.text import filter_funnel, token_count

    df = spark.createDataFrame(
        [
            (1, "ok " * 30),            # passes both
            (2, "x"),                   # fails chars (never reaches tokens)
            (3, "word " * 12),          # >= 50 chars but only 12 tokens
        ],
        "id long, text string",
    )
    c = F.col("text")
    row = filter_funnel(
        df, {"chars": F.length(c) >= 50, "tokens": token_count(c) >= 20}
    ).collect()[0]
    assert row["total"] == 3
    assert row["dropped_chars"] == 1
    assert row["dropped_tokens"] == 1   # doc 3 only; doc 2 already gone
    assert row["survivors"] == 1


def test_chunk_documents(spark):
    from pandera_forge_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xyz"), (3, "")], "doc_id long, text string"
    )
    got = chunk_documents(df, "text", ["doc_id"], size=4, overlap=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["offset"], r["chunk_text"], r["chunk_len"])
        )
    # stride 2: offsets 0,2,4,6,8 for len 10
    assert [t[2] for t in sorted(by_doc[1])] == [
        "abcd", "cdef", "efgh", "ghij", "ij",
    ]
    assert [t[1] for t in sorted(by_doc[1])] == [0, 2, 4, 6, 8]
    assert [t[3] for t in sorted(by_doc[1])] == [4, 4, 4, 4, 2]
    assert [t[2] for t in sorted(by_doc[2])] == ["xyz", "z"]
    assert 3 not in by_doc  # empty doc -> no chunks
    # full coverage, no gaps: concatenating stride-prefix of each chunk
    # (except last) + last chunk reconstructs the text
    parts = [t[2] for t in sorted(by_doc[1])]
    assert "".join(p[:2] for p in parts[:-1]) + parts[-1] == "abcdefghij"


def test_chunk_documents_validates_args(spark):
    import pytest
    from pandera_forge_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "text", ["doc_id"], size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", ["doc_id"], size=4, overlap=4)


def test_chunk_documents_reconstruction_randomized(spark):
    """For arbitrary text and any (size, overlap), concatenating each
    chunk's first `stride` chars plus the final chunk reproduces the
    document exactly, and every chunk equals the corresponding
    substring — the lossless-cover property chunking must guarantee."""
    import random

    from pandera_forge_spark.operators.text import chunk_documents

    rng = random.Random(20260817)
    alphabet = "abc xyzé中 "
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 50))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    texts = dict(rows)
    for size, overlap in [(7, 3), (5, 0)]:
        stride = size - overlap
        got = chunk_documents(df, "text", ["doc_id"], size=size, overlap=overlap)
        by_doc = {}
        for r in got.collect():
            by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["offset"], r["chunk_text"]))
        for doc_id, text in texts.items():
            if not text:
                assert doc_id not in by_doc
                continue
            chunks = [c for c in sorted(by_doc[doc_id])]
            # each chunk is exactly the substring at its offset
            for cid, off, ct in chunks:
                assert ct == text[off:off + size], (doc_id, size, overlap)
            parts = [c[2] for c in chunks]
            rebuilt = "".join(p[:stride] for p in parts[:-1]) + parts[-1]
            assert rebuilt == text, (doc_id, size, overlap)


def test_normalize_text(spark):
    from pandera_forge_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "  Hello\tWORLD \x01\x02 again  "),
            (2, "a,b;c!"),
            (3, None),
        ],
        "id long, t string",
    )
    got = {
        r["id"]: (r["n"], r["np"])
        for r in df.select(
            "id",
            normalize_text(F.col("t")).alias("n"),
            normalize_text(F.col("t"), strip_punct=True).alias("np"),
        ).collect()
    }
    assert got[1] == ("hello world again", "hello world again")
    assert got[2] == ("a,b;c!", "a b c")
    assert got[3] == (None, None)


def test_normalize_text_preserves_unicode_letters(spark):
    from pandera_forge_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, "caf\u00e9 \u4e2d\u6587 test!")], "id long, t string")
    got = df.select(
        normalize_text(F.col("t"), strip_punct=True).alias("np")
    ).collect()[0]["np"]
    # accented and CJK letters survive; only the '!' is stripped
    assert got == "caf\u00e9 \u4e2d\u6587 test"


def test_contamination_bloom_matches_exact(spark):
    """Bloom variant: identical columns, NO false negatives (every
    per-doc count >= the exact operator's), and at 1% fp over a small
    benchmark the planted answers are exactly the exact operator's. A
    larger corpus-vs-bench run bounds the aggregate false-positive
    overcount; the probe plan carries no join beyond the 1-row bloom
    broadcast and no Python UDF."""
    from pandera_forge_spark.operators.text import contamination, contamination_bloom

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma nothing else"),
            (3, "totally different words here"),
            (4, "xy"),
        ],
        "id long, text string",
    )
    exact = {
        r["id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination(corpus, bench, "text", "id").collect()
    }
    bloom = {
        r["id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_bloom(corpus, bench, "text", "id").collect()
    }
    assert set(bloom) == set(exact)
    for i in exact:
        assert bloom[i][0] == exact[i][0]            # same shingle counts
        assert bloom[i][1] >= exact[i][1]            # no false negatives
    # tiny benchmark + 1% target: planted answers come out exact
    assert bloom == exact

    # aggregate FP bound on a larger disjoint corpus: ~1% of shingles
    from pyspark.sql import functions as F

    big = spark.range(2000).select(
        F.col("id"),
        F.concat(
            F.lit("unique filler "), F.col("id").cast("string"),
            F.lit(" more words "), (F.col("id") * 7).cast("string"),
            F.lit(" trailing tokens here"),
        ).alias("text"),
    )
    res = contamination_bloom(big, bench, "text", "id", fp_rate=0.01)
    agg = res.agg(
        F.sum("n_shingles").alias("s"), F.sum("n_contaminated").alias("c")
    ).collect()[0]
    assert agg["c"] / agg["s"] < 0.05  # ~1% target, generous margin

    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------ winnowing

def _winnow_local(text, k=8, w=4):
    """Pure-Python reference of operators/text.py winnow_fingerprints:
    same normalization, same md5/48-bit gram hashes, same window-min +
    distinct — the executable spec the Spark algebra must match."""
    import hashlib
    import re as _re

    s = _re.sub(r"[^A-Za-z0-9]+", "", text or "").lower()
    if not s:
        return []
    m = max(len(s) - k + 1, 1)
    grams = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:12], 16)
        for i in range(m)
    ]
    nwin = max(len(grams) - w + 1, 1)
    return sorted({min(grams[j : j + w]) for j in range(nwin)})


def test_winnow_matches_local_reference(spark):
    from pandera_forge_spark.operators.text import winnow_fingerprints

    texts = [
        "The quick brown fox jumps over the lazy dog, twice over!",
        "short",
        "punctuation---only***separators###between@@@words",
        "a" * 100,  # degenerate: all grams identical -> one fingerprint
        "Tiny",    # shorter than k: one whole-string gram
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: list(r["fps"])
        for r in winnow_fingerprints(df, "text", "id").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _winnow_local(t), f"doc {i} diverged"
    # winnowing density: ~2/(w+1) of grams selected, never more than
    # the window count
    n_grams = len(texts[0].replace(" ", "")) - 8 + 1
    assert 0 < len(got[0]) <= n_grams


def test_winnow_shared_substring_guarantee(spark):
    """The winnowing guarantee: any shared substring of length >=
    k + window - 1 (in normalized space) produces at least one shared
    fingerprint, whatever surrounds it."""
    from pandera_forge_spark.operators.text import winnow_fingerprints

    shared = "thecommonpassagebothdocumentsquoteverbatim0123456789"
    a = "left context before it " + shared + " and trailing words"
    b = "totally different opening " + shared + " unrelated ending!"
    df = spark.createDataFrame([(0, a), (1, b)], "id long, text string")
    fps = {
        r["id"]: set(r["fps"])
        for r in winnow_fingerprints(df, "text", "id").collect()
    }
    assert fps[0] & fps[1]


def test_fingerprint_overlap_pairs_planted(spark):
    from pandera_forge_spark.operators.text import fingerprint_overlap_pairs

    import hashlib

    # fully-distinct bodies (md5-derived words): any shared 8-gram
    # between two base docs would be an astronomically unlikely hex
    # coincidence, so the only legitimate pair is the planted copy
    def _body(i):
        return " ".join(
            hashlib.md5(f"{i}-{j}".encode()).hexdigest()[:10] for j in range(12)
        )

    base = [(i, _body(i)) for i in range(8)]
    # near-copy of doc 0 with edits at both ends
    mutated = [(100, "PREFIX added. " + base[0][1] + " plus a new tail.")]
    df = spark.createDataFrame(base + mutated, "doc_id long, text string")
    pairs = fingerprint_overlap_pairs(
        df, "text", "doc_id", min_shared=2, max_df=50
    ).collect()
    by_pair = {(r["id_a"], r["id_b"]): r for r in pairs}
    assert (0, 100) in by_pair
    hit = by_pair[(0, 100)]
    assert hit["overlap"] > 0.5
    assert hit["shared"] >= 2
    # containment denominator is the SMALLER set
    assert hit["overlap"] <= 1.0
    # distinct docs share nothing
    assert (1, 2) not in by_pair


def test_fingerprint_overlap_stop_fingerprints(spark):
    """Boilerplate shared by more than max_df docs must NOT create
    pairs: its fingerprints exceed the document-frequency cap and are
    dropped before the self-join (the winnowing-index stop-fingerprint
    rule that bounds join fanout at scale)."""
    from pandera_forge_spark.operators.text import fingerprint_overlap_pairs

    import hashlib

    boiler = "standard license header attached to every file in the corpus"
    docs = [
        (
            i,
            boiler
            + " "
            + " ".join(
                hashlib.md5(f"body-{i}-{j}".encode()).hexdigest()[:10]
                for j in range(6)
            ),
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # every fingerprint of `boiler` occurs in all 30 docs > max_df=10
    pairs = fingerprint_overlap_pairs(
        df, "text", "doc_id", min_shared=2, max_df=10
    ).collect()
    assert pairs == []
    # raising the cap above the corpus size re-admits the boilerplate
    pairs_uncapped = fingerprint_overlap_pairs(
        df, "text", "doc_id", min_shared=2, max_df=100
    ).collect()
    assert len(pairs_uncapped) == 30 * 29 // 2


def test_winnow_plan_is_udf_free(spark):
    from pandera_forge_spark.operators.text import (
        fingerprint_overlap_pairs,
        winnow_fingerprints,
    )
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([(0, "some text body")], "doc_id long, text string")
    assert not has_python_udf(winnow_fingerprints(df, "text", "doc_id"))
    assert not has_python_udf(
        fingerprint_overlap_pairs(df, "text", "doc_id")
    )


# ------------------------------------------------------- boilerplate

def test_strip_boilerplate_removes_frequent_lines(spark):
    from pandera_forge_spark.operators.text import (
        boilerplate_lines,
        strip_boilerplate,
    )

    banner = "SUBSCRIBE TO OUR NEWSLETTER"
    docs = [
        (i, "lang" + str(i % 2), f"unique body line {i}\n{banner}\nsecond body {i}")
        for i in range(12)
    ] + [(100, "en", banner)]  # all-boilerplate doc
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")

    census = {r["line"]: r["df"] for r in boilerplate_lines(df, "text", min_df=10).collect()}
    assert census == {banner: 13}

    out = {r["doc_id"]: r for r in strip_boilerplate(df, "text", min_df=10).collect()}
    assert len(out) == 13  # every doc survives as a row
    for i in range(12):
        # banner gone, order preserved, raw line text intact
        assert out[i]["text"] == f"unique body line {i}\nsecond body {i}"
        assert out[i]["lang"] == "lang" + str(i % 2)  # passthrough cols
    assert out[100]["text"] == ""  # all-boilerplate -> empty, not dropped


def test_strip_boilerplate_counts_per_doc_distinct(spark):
    """A doc repeating its own footer 5 times contributes ONCE to the
    census df, so self-repetition can't promote a line to boilerplate."""
    from pandera_forge_spark.operators.text import boilerplate_lines

    df = spark.createDataFrame(
        [(0, "footer\nfooter\nfooter\nfooter\nfooter"), (1, "footer\nbody")],
        "doc_id long, text string",
    )
    census = {r["line"]: r["df"] for r in boilerplate_lines(df, "text", min_df=2).collect()}
    assert census == {"footer": 2}


def test_strip_boilerplate_plan_udf_free(spark):
    from pandera_forge_spark.operators.text import strip_boilerplate
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([(0, "a\nb")], "doc_id long, text string")
    assert not has_python_udf(strip_boilerplate(df, "text", min_df=2))


def test_strip_boilerplate_null_passthrough_and_regex_delimiter(spark):
    """Review-found edge cases: (a) a NULL passthrough column must not
    orphan its document (null-safe seed-back join), (b) a regex-
    metachar delimiter is literal, (c) a text-only frame raises."""
    import pytest as _pytest

    from pandera_forge_spark.operators.text import strip_boilerplate

    df = spark.createDataFrame(
        [
            (1, None, "BANNER|keep one"),
            (2, "en", "BANNER|keep two"),
            (3, None, "BANNER|keep three"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(df, "text", min_df=3, delimiter="|").collect()
    }
    assert out[1]["text"] == "keep one" and out[1]["lang"] is None
    assert out[2]["text"] == "keep two"
    assert out[3]["text"] == "keep three"

    with _pytest.raises(ValueError):
        strip_boilerplate(df.select("text"), "text", min_df=3)


# ---------------------------------------------------------------------------
# bigram LM perplexity scoring
# ---------------------------------------------------------------------------


def _lm_fixture(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the dog sat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bigram_lm_counts(spark):
    from pandera_forge_spark.operators.text import train_bigram_lm

    lm = {(r["w1"], r["w2"]): r["n"] for r in train_bigram_lm(_lm_fixture(spark)).collect()}
    # BOS-prefixed: each doc contributes ('<s>', first-word)
    assert lm[("<s>", "the")] == 3
    assert lm[("the", "cat")] == 2
    assert lm[("the", "dog")] == 1
    assert lm[("cat", "sat")] == 1
    assert lm[("dog", "sat")] == 1
    # 3 docs x 3 bigrams each
    assert sum(lm.values()) == 9


def test_train_bigram_lm_min_count(spark):
    from pandera_forge_spark.operators.text import train_bigram_lm

    lm = train_bigram_lm(_lm_fixture(spark), min_count=2)
    keys = {(r["w1"], r["w2"]) for r in lm.collect()}
    assert ("the", "cat") in keys and ("<s>", "the") in keys
    assert ("the", "dog") not in keys  # hapax pruned


def test_lm_score_hand_computed(spark):
    import math

    from pandera_forge_spark.operators.text import lm_score, train_bigram_lm

    docs = _lm_fixture(spark)
    lm = train_bigram_lm(docs)
    out = {r["doc_id"]: r for r in lm_score(docs, lm, broadcast_lm=True).collect()}
    # vocabulary of trained w2: the, cat, ran, dog, sat -> V = 5 + 1
    V = 6
    a = 0.5

    def lp(n, c1):
        return math.floor(math.log((n + a) / (c1 + a * V)) * 1e6)

    # doc 1 "the cat sat": (<s>,the) n=3 c1=3; (the,cat) n=2 c1=3; (cat,sat) n=1 c1=2
    expect = lp(3, 3) + lp(2, 3) + lp(1, 2)
    r = out[1]
    assert r["n_bigrams"] == 3 and r["oov_bigrams"] == 0
    assert r["sum_lp_micro"] == expect
    assert abs(r["avg_logprob"] - expect / 3 / 1e6) < 1e-12


def test_lm_score_oov_and_empty(spark):
    import math

    from pandera_forge_spark.operators.text import lm_score, train_bigram_lm

    lm = train_bigram_lm(_lm_fixture(spark))
    probe = spark.createDataFrame(
        [(10, "zz qq"), (11, ""), (12, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_score(probe, lm, broadcast_lm=True).collect()}
    # "zz qq": (<s>,zz) context <s> seen (c1=3), pair unseen; (zz,qq) both unseen
    V = 6
    a = 0.5
    exp = math.floor(math.log(a / (3 + a * V)) * 1e6) + math.floor(
        math.log(a / (0 + a * V)) * 1e6
    )
    assert out[10]["n_bigrams"] == 2
    assert out[10]["oov_bigrams"] == 2
    assert out[10]["sum_lp_micro"] == exp
    # empty and null text: a row with zero bigrams and NULL score
    for d in (11, 12):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["oov_bigrams"] == 0
        assert out[d]["sum_lp_micro"] == 0
        assert out[d]["avg_logprob"] is None


def test_lm_score_partition_independent(spark):
    from pandera_forge_spark.operators.text import lm_score, train_bigram_lm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lm = train_bigram_lm(docs).persist()
    base = {r["doc_id"]: r for r in lm_score(docs, lm).collect()}
    skewed = {
        r["doc_id"]: r
        for r in lm_score(docs.repartition(17), lm, broadcast_lm=True).collect()
    }
    lm.unpersist()
    assert base.keys() == skewed.keys()
    for k in base:
        assert base[k]["sum_lp_micro"] == skewed[k]["sum_lp_micro"]
        assert base[k]["n_bigrams"] == skewed[k]["n_bigrams"]


def test_lm_score_plan_clean(spark):
    from pandera_forge_spark.operators.text import lm_score, train_bigram_lm
    from pandera_forge_spark.plans.inspect import (
        has_broadcast_hash_join,
        has_python_udf,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lm = train_bigram_lm(docs)
    out = lm_score(docs, lm, broadcast_lm=True)
    assert not has_python_udf(out)
    assert not has_python_udf(lm)
    assert has_broadcast_hash_join(out)


def test_collapse_repeated_lines(spark):
    from pandera_forge_spark.operators.text import collapse_repeated_lines

    rows = [
        (1, "a\nb\nb\nb\nc"),          # consecutive dups collapse
        (2, "a\nb\na"),                  # non-consecutive dups survive
        (3, "x\n  x  \nx"),              # trim-normalized compare, first kept
        (4, ""),
        (5, None),
        (6, "only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in collapse_repeated_lines(df).collect()}
    assert out[1] == "a\nb\nc"
    assert out[2] == "a\nb\na"
    assert out[3] == "x"
    assert out[4] == ""
    assert out[5] == ""  # null coalesces to empty, documented
    assert out[6] == "only"


def test_collapse_repeated_lines_passthrough_and_plan(spark):
    from pandera_forge_spark.operators.text import collapse_repeated_lines
    from pandera_forge_spark.plans.inspect import has_python_udf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = collapse_repeated_lines(docs)
    assert out.columns == docs.columns
    assert not has_python_udf(out)
    # idempotent: a second pass changes nothing
    once = {r["doc_id"]: r["text"] for r in out.collect()}
    twice = {
        r["doc_id"]: r["text"]
        for r in collapse_repeated_lines(out).collect()
    }
    assert once == twice


# ------------------------------------------- dup_ngram_spans (round 5)

def test_positional_ngrams_order_and_short_docs(spark):
    from pandera_forge_spark.operators.text import positional_ngrams
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c d"),      # 3 bigrams in position order
        (2, "a"),            # shorter than n -> empty
        (3, ""),             # empty -> empty
        (4, None),           # null -> empty
        (5, "x x x"),        # repeats stay, no dedup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", positional_ngrams(F.col("text"), 2).alias("g")
        ).collect()
    }
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == []
    assert got[5] == ["x x", "x x"]


def test_dup_ngram_spans_hand_computed(spark):
    from pandera_forge_spark.operators.text import dup_ngram_spans

    # n=2, min_count=2: "p q" appears in docs 1 and 2; "q r" only in 1;
    # doc 3 repeats "z z" internally (intra-doc occurrences count)
    rows = [
        (1, "p q r s t"),
        (2, "a b p q c"),
        (3, "z z z u v"),
        (4, "unique words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        tuple(r)
        for r in dup_ngram_spans(df, "text", "doc_id", n=2).collect()
    )
    # doc1: dup positions {0} -> span [0,1]; doc2: {2} -> [2,3];
    # doc3: "z z" at 0 and 1 -> merged [0,2]
    assert out == [(1, 0, 1, 2), (2, 2, 3, 2), (3, 0, 2, 3)]


def test_dup_ngram_spans_island_merge_gap(spark):
    from pandera_forge_spark.operators.text import dup_ngram_spans

    # duplicated bigrams separated by > n tokens stay separate islands;
    # positions within n of each other merge into one span
    rows = [
        (1, "p q gap1 gap2 gap3 p q"),   # dup "p q" at 0 and 5; 5 > 0+2
        (2, "p q xx2 yy2 p q"),          # dup "p q" at 0 and 4; 4 > 0+2
        (3, "r s r s uu3"),              # dup pos 0,1,2: chain merges
        (4, "r s r s uu4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        tuple(r)
        for r in dup_ngram_spans(df, "text", "doc_id", n=2).collect()
    )
    # census: "p q" x4, "r s" x4, "s r" x2 — gap/xx/yy/uu grams unique.
    # doc1 islands [0,1],[5,6]; doc2 islands [0,1],[4,5];
    # docs 3/4: dup positions {0,1,2} chain-merge into one span [0,3]
    assert out == [
        (1, 0, 1, 2), (1, 5, 6, 2),
        (2, 0, 1, 2), (2, 4, 5, 2),
        (3, 0, 3, 4), (4, 0, 3, 4),
    ]


def test_dup_ngram_spans_max_df_fence(spark):
    from pandera_forge_spark.operators.text import dup_ngram_spans

    rows = [(i, "viral viral tail%d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # "viral viral" occurs 10x; max_df=5 fences it out entirely
    out = dup_ngram_spans(df, "text", "doc_id", n=2, max_df=5).collect()
    assert out == []


def test_dup_ngram_spans_validation_and_plan(spark):
    import pytest
    from pandera_forge_spark.operators.text import dup_ngram_spans
    from pandera_forge_spark.plans.inspect import has_python_udf

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="lacks column"):
        dup_ngram_spans(docs, "nope", "doc_id")
    with pytest.raises(ValueError, match="min_count"):
        dup_ngram_spans(docs, "text", "doc_id", min_count=1)
    out = dup_ngram_spans(docs, "text", "doc_id")
    assert not has_python_udf(out)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "bigint", "bigint", "bigint"
    ]
    # spans are well-formed: start <= end, width == dup_tokens >= n
    for r in out.collect():
        assert r["span_start"] <= r["span_end"]
        assert r["dup_tokens"] == r["span_end"] - r["span_start"] + 1
        assert r["dup_tokens"] >= 8


# --------------------------------------------------- markup_residue_census


def test_markup_residue_census_classifies_each_failure(spark):
    from pandera_forge_spark.operators.text import markup_residue_census

    rows = [
        ("clean", "a perfectly ordinary paragraph of text."),
        ("clean", "another one, with < and > used as math."),
        ("html", "leftover <div class='x'>markup</div> here"),
        ("html", "entities &amp; more &#8217; residue"),
        ("decode", "bytes died � somewhere upstream"),
        ("decode", "control\x07bytes\x1fremain"),
        ("mojibake", "cafÃ© and curly â€™ quotes"),
        ("mojibake", None),
    ]
    df = spark.createDataFrame(rows, "src string, text string")
    got = {
        r["src"]: r
        for r in markup_residue_census(df, "text", ["src"]).collect()
    }
    c = got["clean"]
    assert (c["n_docs"], c["n_html_tag"], c["n_html_entity"]) == (2, 0, 0)
    assert c["n_replacement_char"] == 0 and c["n_mojibake"] == 0
    h = got["html"]
    assert h["n_html_tag"] == 1 and h["n_html_entity"] == 1
    d = got["decode"]
    assert d["n_replacement_char"] == 1 and d["n_control_char"] == 1
    m = got["mojibake"]
    assert m["n_docs"] == 1  # the NULL text dropped
    assert m["n_mojibake"] == 1
    # global mode: one row, sums across groups
    g = markup_residue_census(df, "text").first()
    assert g["n_docs"] == 7 and g["n_html_tag"] == 1


def test_markup_residue_census_contracts_and_plan(spark):
    import pytest

    from pandera_forge_spark.operators.text import markup_residue_census
    from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf

    df = spark.createDataFrame([("s", "t")], "src string, text string")
    with pytest.raises(ValueError, match="lacks column"):
        markup_residue_census(df, "nope")
    with pytest.raises(ValueError, match="lacks columns"):
        markup_residue_census(df, "text", ["nope"])
    out = markup_residue_census(df, "text", ["src"])
    assert not has_python_udf(out)
    assert "Window" not in executed_plan(out)


def test_readability_hand_computed(spark):
    """'the cat sat. the dog ran!' — 6 words, 2 sentences, 6
    one-syllable words: flesch = 206.835 - 1.015*3 - 84.6*1 =
    119.19. 'beautiful examination' — 2 words, 1 sentence,
    eau-i-u + e-a-i-a-io = 3+5=8 vowel groups."""
    from pandera_forge_spark.operators.text import readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "beautiful examination"),
            (3, "   "),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in readability(df).collect()}
    r1 = rows[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    assert abs(r1.flesch - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-9
    r2 = rows[2]
    assert (r2.n_words, r2.n_sentences, r2.n_syllables) == (2, 1, 8)
    for k in (3, 4):
        assert rows[k].n_words == 0 and rows[k].flesch is None


def test_readability_no_python_udf_and_no_shuffle(spark):
    from pandera_forge_spark.operators.text import readability
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = readability(df)
    assert not has_python_udf(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_readability_validates_columns(spark):
    import pytest

    from pandera_forge_spark.operators.text import readability

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="missing"):
        readability(df, text_col="body")


def test_zipf_fit_perfect_power_law(spark):
    """Counts 12, 6, 4, 3 at ranks 1..4 are exactly freq = 12/rank:
    the OLS fit on ln/ln must return slope -1, intercept ln(12)."""
    import math

    from pandera_forge_spark.operators.text import zipf_fit

    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = zipf_fit(df).collect()[0]
    assert r.n_ranks == 4
    assert abs(r.slope - (-1.0)) < 1e-9
    assert abs(r.intercept - math.log(12.0)) < 1e-9


def test_zipf_fit_groups_and_degenerate(spark):
    from pandera_forge_spark.operators.text import zipf_fit

    df = spark.createDataFrame(
        [
            ("en", "x x x x y y z"),
            ("de", "nur"),           # 1 distinct token -> NULL fit
        ],
        "lang string, text string",
    )
    rows = {r.lang: r for r in zipf_fit(df, group_cols=["lang"]).collect()}
    assert rows["en"].n_ranks == 3 and rows["en"].slope < 0
    assert rows["de"].n_ranks == 1 and rows["de"].slope is None
    assert rows["de"].intercept is None


def test_zipf_fit_validates_args(spark):
    import pytest

    from pandera_forge_spark.operators.text import zipf_fit

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="top_k"):
        zipf_fit(df, top_k=1)
    with pytest.raises(ValueError, match="group column"):
        zipf_fit(df, group_cols=["ghost"])


def test_language_margin_hand_computed(spark):
    """'the the und' -> en score 2/3, de score 1/3 (und), others 0:
    margin exactly 1/3. Pure-stopword single-language text maxes the
    margin; gibberish and empty report 0."""
    from pandera_forge_spark.operators.text import language_margin

    def _m(text):
        df = spark.createDataFrame([(text,)], "t string")
        return df.select(language_margin(F.col("t")).alias("m")).collect()[0].m

    got = _m("the the und")
    assert abs(got - (2 / 3 - 1 / 3)) < 1e-12
    assert _m("zzz qqq") == 0.0
    assert _m("") == 0.0
    # code-switched half-and-half: margin collapses to 0
    assert _m("the der") == 0.0


def test_language_margin_no_shuffle(spark):
    from pandera_forge_spark.operators.text import language_margin

    df = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    out = df.select(language_margin(F.col("text")).alias("m"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_token_entropy_hand_computed(spark):
    """Uniform 4-token text: H = ln 4, eff_vocab = 4 exactly; a
    skewed 2-token text (3:1) gets H = ln4 - (3 ln3)/4 < ln 2 + eps
    and eff_vocab < 2 is false — it's between; verify against the
    closed form."""
    import math

    from pandera_forge_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [("u", "a b c d"), ("s", "x x x y")], "grp string, text string"
    )
    rows = {r.grp: r for r in token_entropy(df, group_cols=["grp"]).collect()}
    u = rows["u"]
    assert (u.n_tokens, u.n_distinct) == (4, 4)
    assert abs(u.entropy - math.log(4)) < 1e-12
    assert abs(u.eff_vocab - 4.0) < 1e-9
    s = rows["s"]
    expect = math.log(4) - (3 * math.log(3)) / 4
    assert abs(s.entropy - expect) < 1e-12
    assert abs(s.eff_vocab - math.exp(expect)) < 1e-9


def test_token_entropy_empty_group_null(spark):
    from pandera_forge_spark.operators.text import token_entropy

    df = spark.createDataFrame([("e", "   ")], "grp string, text string")
    out = token_entropy(df, group_cols=["grp"]).collect()
    assert out == []   # no tokens -> no census rows at all
    import pytest

    with pytest.raises(ValueError, match="group column"):
        token_entropy(df, group_cols=["ghost"])


def test_keyness_finds_planted_marker(spark):
    """A token stamped across group A and absent elsewhere must top
    A's keyness; the shared stopword must not appear in either top
    list; the G² value is replayed in python from the 2x2 table."""
    import math

    from pandera_forge_spark.operators.text import keyness_by_group

    rows = []
    for i in range(20):
        rows.append(("A", "common filler marker marker"))
        rows.append(("B", "common filler other words"))
    df = spark.createDataFrame(rows, "grp string, text string")
    out = keyness_by_group(
        df, "text", "grp", top_k=2, min_count=5
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    top_a = by_grp["A"][0]
    assert top_a.token == "marker" and top_a.rank == 1
    assert top_a.n_in == 40 and top_a.n_out == 0

    def g2(o11, tm, gm, n):
        o12, o21 = tm - o11, gm - o11
        o22 = n - o11 - o12 - o21
        tot = 0.0
        for o, e in (
            (o11, gm * tm / n),
            (o12, (n - gm) * tm / n),
            (o21, gm * (n - tm) / n),
            (o22, (n - gm) * (n - tm) / n),
        ):
            if o > 0:
                tot += o * (math.log(o) - math.log(e))
        return 2.0 * tot

    # A: 20 docs x 4 tokens = 80 tokens; B: 80 tokens; N = 160
    expect = g2(40.0, 40.0, 80.0, 160.0)
    assert abs(top_a.g2 - round(expect, 6)) < 1e-9
    # the evenly-shared tokens are never overused anywhere
    for grp_rows in by_grp.values():
        assert all(r.token not in ("common", "filler") for r in grp_rows)


def test_keyness_min_count_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.text import keyness_by_group

    df = spark.createDataFrame(
        [("A", "rare unique"), ("B", "boring boring")],
        "grp string, text string",
    )
    out = keyness_by_group(df, "text", "grp", min_count=5).collect()
    assert out == []   # everything under min_count
    with pytest.raises(ValueError, match="top_k"):
        keyness_by_group(df, "text", "grp", top_k=0)
    with pytest.raises(ValueError, match="missing"):
        keyness_by_group(df, "body", "grp")


def test_jsd_matrix_hand_computed(spark):
    """Identical groups -> JSD 0; disjoint single-token groups ->
    JSD = ln 2 exactly; a mixed pair replayed in python."""
    import math

    from pandera_forge_spark.operators.text import jsd_matrix

    df = spark.createDataFrame(
        [
            ("a", "x x y"),
            ("b", "x x y"),
            ("c", "z z z"),
        ],
        "src string, text string",
    )
    out = {(r.group_a, r.group_b): r.jsd for r in jsd_matrix(
        df, "text", "src", vocab_k=10
    ).collect()}
    assert abs(out[("a", "b")]) < 1e-15
    assert abs(out[("a", "c")] - math.log(2)) < 1e-12

    def jsd(pd1, pd2):
        cells = set(pd1) | set(pd2)
        tot = 0.0
        for c in cells:
            p, q = pd1.get(c, 0.0), pd2.get(c, 0.0)
            m = (p + q) / 2
            if p > 0:
                tot += p * (math.log(p) - math.log(m))
            if q > 0:
                tot += q * (math.log(q) - math.log(m))
        return tot / 2

    expect = jsd({"x": 2 / 3, "y": 1 / 3}, {"z": 1.0})
    assert abs(out[("a", "c")] - expect) < 1e-12


def test_jsd_matrix_rest_bucket_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.text import jsd_matrix

    # vocab_k=1 forces everything but the single top token into
    # '__rest' — the matrix still compares complete distributions
    df = spark.createDataFrame(
        [("a", "top top odd1"), ("b", "top odd2 odd3")],
        "src string, text string",
    )
    out = jsd_matrix(df, "text", "src", vocab_k=1).collect()
    assert len(out) == 1
    # a: top 2/3, rest 1/3; b: top 1/3, rest 2/3 -> symmetric, 0 < jsd < ln2
    import math

    assert 0 < out[0].jsd < math.log(2)
    with pytest.raises(ValueError, match="vocab_k"):
        jsd_matrix(df, "text", "src", vocab_k=0)
    with pytest.raises(ValueError, match="missing"):
        jsd_matrix(df, "body", "src")


def test_hashed_bow_python_replay(spark):
    """Cells and weights replayed exactly with hashlib: same md5
    prefix arithmetic, same modulus; repeated tokens accumulate."""
    import hashlib

    from pandera_forge_spark.operators.text import hashed_bow

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana"), (3, "   ")],
        "doc_id long, text string",
    )
    got = {}
    for r in hashed_bow(df, dim=64).collect():
        got[(r.doc_id, r.cell)] = r.weight

    def cell(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    assert got[(1, cell("apple"))] == 2
    assert got[(1, cell("banana"))] == 1
    assert got[(2, cell("banana"))] == 1
    assert all(d != 3 for d, _ in got)   # empty doc emits nothing
    import pytest

    with pytest.raises(ValueError, match="dim"):
        hashed_bow(df, dim=1)
    with pytest.raises(ValueError, match="missing"):
        hashed_bow(df, text_col="body")


def test_heaps_fit_exact_power_law(spark):
    """A synthetic corpus engineered so V(N) = N^0.5 exactly at every
    grid point: doc d contributes tokens so cumulative (N, V) land on
    (4,2),(16,4),(64,8),(256,16): beta = 0.5, K = 1."""
    from pandera_forge_spark.operators.text import heaps_fit

    # doc i (1..4): cumulative tokens 4^i, cumulative vocab 2^i
    docs = []
    tok_id = 0
    cum_tokens = 0
    for i in range(1, 5):
        new_vocab = 2 ** i - (2 ** (i - 1) if i > 1 else 0)
        target_tokens = 4 ** i
        add_tokens = target_tokens - cum_tokens
        words = [f"w{tok_id + j}" for j in range(new_vocab)]
        tok_id += new_vocab
        # fill with repeats of the first new word to hit the count
        body = words + [words[0]] * (add_tokens - new_vocab)
        docs.append((i, " ".join(body)))
        cum_tokens = target_tokens
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = heaps_fit(df, n_points=4).collect()[0]
    assert r.n_points_used == 4
    assert (r.total_tokens, r.vocab) == (256, 16)
    assert abs(r.beta - 0.5) < 1e-9
    assert abs(r.k_coef - 1.0) < 1e-9


def test_heaps_fit_degenerate_and_fences(spark):
    import pytest

    from pandera_forge_spark.operators.text import heaps_fit

    df = spark.createDataFrame([(1, "only")], "doc_id long, text string")
    r = heaps_fit(df, n_points=4).collect()[0]
    # every grid point sees the same (N, V) -> zero x-variance -> NULL
    assert r.beta is None and r.k_coef is None
    with pytest.raises(ValueError, match="n_points"):
        heaps_fit(df, n_points=1)
    with pytest.raises(ValueError, match="missing"):
        heaps_fit(df, text_col="body")
