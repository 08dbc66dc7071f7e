"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Not in the reference (it has no text analytics at all); mandated by the
build brief as first-class engine components. Everything here is pure
``pyspark.sql.functions`` column algebra — JVM-side, whole-stage
codegen, zero Python in the hot path — so these scale to 100 TB like
any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword seed sets for the n-gram/stopword
# heuristic language ID. Deliberately small: the operator's value is
# the distributed argmax plumbing, not lexicon quality.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "des", "une", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "en", "un", "por", "con"],
}

# whitespace tokenizer plus a BPE-ish fallback that splits punctuation
# off words, approximating subword token counts
WORD_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Lower-cased whitespace tokens; empty string → empty array."""
    t = F.split(F.trim(F.lower(col)), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def word_count_bpe_ish(col: Column) -> Column:
    """BPE-ish token count: words and punctuation as separate tokens
    (regex extraction, a cheap proxy for subword tokenizers)."""
    return F.size(F.regexp_extract_all(col, F.lit(WORD_RE), F.lit(0)))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.when(
        F.length(col) > 0, F.length(stripped) / F.length(col)
    ).otherwise(F.lit(0.0))


def upper_ratio(col: Column) -> Column:
    letters = F.regexp_replace(col, r"[^A-Za-z]", "")
    uppers = F.regexp_replace(col, r"[^A-Z]", "")
    return F.when(
        F.length(letters) > 0, F.length(uppers) / F.length(letters)
    ).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(col)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
    )
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic [0,1] quality score: rewards reasonable length and
    stopword presence, penalizes punctuation soup and shouting.
    Deterministic closed form so it is oracle-checkable in SQL."""
    length_term = F.least(char_count(col) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(col) * 3.0, F.lit(0.0))
    upper_pen = F.greatest(F.lit(1.0) - upper_ratio(col), F.lit(0.0))
    return (
        length_term * 0.3 + stop_term * 0.3 + punct_pen * 0.25 + upper_pen * 0.15
    )


def detect_language(col: Column) -> Column:
    """Stopword-hit-ratio argmax over the lexicon languages; 'und'
    (undetermined) when nothing scores > 0. One pass of array algebra —
    no UDF, no shuffle."""
    toks = tokens(col)
    n = F.size(toks)

    def hit_ratio(lang):
        words = STOPWORDS[lang]
        return F.when(
            n > 0, F.size(F.filter(toks, lambda t: t.isin(*words))) / n
        ).otherwise(F.lit(0.0))

    scored = F.array(
        *[
            F.struct(
                hit_ratio(lang).alias("score"),
                # array_max orders structs field-by-field: score first,
                # then lang — equal scores deterministically resolve to
                # the lexicographically-largest language code
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 over the casefolded,
    alnum-only normalization. md5 exists identically in DuckDB, making
    this oracle-checkable end to end."""
    return F.md5(F.lower(F.regexp_replace(col, r"[^A-Za-z0-9]+", "")))


def text_metrics(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """All text metrics as one narrow projection (no shuffle)."""
    c = F.col(text_col)
    return df.select(
        *id_cols,
        token_count(c).alias("n_tokens"),
        word_count_bpe_ish(c).alias("n_tokens_bpe"),
        char_count(c).alias("n_chars"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(quality_score(c), 6).alias("quality"),
        detect_language(c).alias("lang_detected"),
        fingerprint(c).alias("fingerprint"),
    )


def dup_ratio(items: Column) -> Column:
    """1 - distinct/total over an array (0 for empty arrays) — the
    repeated-content fraction. Pure array algebra, per-row, no
    shuffle."""
    n = F.size(items)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(items)) / n.cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_metrics(
    df: DataFrame, text_col: str, id_cols: list[str]
) -> DataFrame:
    """C4/Gopher-style repetition signals per document — the filters a
    training-data pipeline applies before anything else, because
    boilerplate (repeated lines, repeated words) is the dominant
    low-quality mode in web text:

    - ``dup_line_ratio``: fraction of non-empty lines that are
      duplicates of an earlier line,
    - ``dup_word_ratio``: same over whitespace tokens.

    One narrow projection (split + array_distinct, all JVM codegen);
    no shuffle, no UDF. Formula replayed verbatim by the DuckDB oracle
    (list_filter/list_distinct), so the numbers are engine-checked."""
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda x: x != "")
    words = tokens(c)
    return df.select(
        *id_cols,
        F.round(dup_ratio(lines), 6).alias("dup_line_ratio"),
        F.round(dup_ratio(words), 6).alias("dup_word_ratio"),
    )


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast: bool = True,
) -> DataFrame:
    """Benchmark-contamination check: per document, the fraction of its
    DISTINCT token n-gram shingles that also occur anywhere in
    ``benchmark`` — the standard train/eval leakage test a training-data
    pipeline runs before export (an eval question whose shingles all
    appear in a training doc is leaked, not learned).

    Shape for 10^12 docs vs a ~10^5-doc eval set: the benchmark
    collapses to its DISTINCT shingle set once (tiny — eval sets are
    small by construction) and is broadcast, so the probe is a map-side
    hash lookup with NO shuffle; the only shuffle is the per-doc
    groupBy, which partial-aggregates map-side (count/sum are
    algebraic). Pass ``broadcast=False`` to shuffle-join instead when
    the "benchmark" side is itself huge (corpus-vs-corpus overlap).

    Returns (id, n_shingles, n_contaminated, contamination_ratio).
    Empty/whitespace docs have the single whole-doc shingle ''
    (see ``dedup.shingles``) and score 0 unless the benchmark also
    contains an empty doc.
    """
    from pandera_forge_spark.operators.dedup import shingles

    bench = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("__s"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast:
        bench = F.broadcast(bench)
    doc_sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__s")
    )
    return (
        doc_sh.join(bench, "__s", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_contaminated"),
        )
        .withColumn(
            "contamination_ratio",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


def bloom_filter_words(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    fp_rate: float = 0.01,
) -> tuple[list[int], int, int]:
    """Build the packed Bloom filter over ``benchmark``'s distinct
    token n-gram shingles: returns ``(words, m_bits, k)`` where
    ``words`` is the ``m_bits/64``-long bit array as longs and ``k``
    the number of xxhash64 seeds. Shared by the batch probe
    (:func:`contamination_bloom`) and the stateless streaming probe
    (``streaming.text.stream_contamination``) so both test the SAME
    bits.

    The build is distributed column algebra — k positions per shingle,
    ``bit_or`` packing per word — and the assembled O(m/64)-long array
    is the only thing the driver holds. (``shiftleft`` via SQL expr:
    the Python ``F.shiftleft`` only takes a literal shift amount.)"""
    import math

    from pandera_forge_spark.operators.dedup import shingles

    bench_sh = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("__s")
    ).distinct()
    n_items = max(1, bench_sh.count())
    m_bits = max(64, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
    m_bits = ((m_bits + 63) // 64) * 64  # whole words
    k = max(1, round(m_bits / n_items * math.log(2)))
    n_words = m_bits // 64

    pos = bench_sh.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(i), F.col("__s")), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("__p")
    )
    rows = (
        pos.select(
            (F.col("__p") / 64).cast("long").alias("__w"),
            F.expr("shiftleft(1L, cast(__p % 64 as int))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__v"))
        .collect()
    )
    packed = [0] * n_words
    for r in rows:
        packed[int(r["__w"])] = int(r["__v"])
    return packed, m_bits, k


def bloom_hit_expr(shingle: Column, m_bits: int, k: int) -> Column:
    """Membership test of one shingle against the broadcast ``__bloom``
    word-array column — usable INSIDE higher-order-function lambdas
    (``call_function`` for the variable-amount shiftleft), which is
    what makes the per-row streaming probe possible."""
    h = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(F.lit(i), shingle), F.lit(m_bits))
        word = F.element_at(F.col("__bloom"), (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        h = h & (word.bitwiseAND(mask) != 0)
    return h


def contamination_bloom(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    fp_rate: float = 0.01,
) -> DataFrame:
    """``contamination`` for benchmark sides too large to broadcast as
    an exact shingle set: the benchmark collapses to a BLOOM FILTER
    built entirely with column algebra — xxhash64 under ``k`` seeds for
    the bit positions, one ``bit_or`` aggregation packing them into
    64-bit words — and the probe side tests bits against a single
    broadcast row holding the packed array. Broadcast bytes drop from
    O(distinct shingles x avg shingle width) to ``m/8`` bytes chosen
    from ``fp_rate`` (1% -> ~1.2 bytes per benchmark shingle), and the
    probe stays a map-side whole-stage-codegen projection with no
    shuffle beyond the per-doc groupBy.

    Bloom semantics: NO false negatives — a leaked shingle is always
    counted — and ~``fp_rate`` false positives, so
    ``n_contaminated``/``contamination_ratio`` are upper bounds of the
    exact operator's values (pytest-asserted against ``contamination``
    on planted leaks). Same output columns as ``contamination``.
    """
    packed, m_bits, k = bloom_filter_words(benchmark, text_col, n, fp_rate)
    bloom = df.sparkSession.createDataFrame(
        [(packed,)], "__bloom array<long>"
    )
    from pandera_forge_spark.operators.dedup import shingles

    doc_sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__s")
    ).join(F.broadcast(bloom))  # 1-row broadcast: the packed filter
    hit = F.lit(True)
    for i in range(k):
        p_sql = f"pmod(xxhash64({i}, __s), {m_bits})"
        term = F.expr(
            f"(element_at(__bloom, cast({p_sql} / 64 as int) + 1) & "
            f"shiftleft(1L, cast({p_sql} % 64 as int))) != 0"
        )
        hit = hit & term
    return (
        doc_sh.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit.cast("long")).alias("n_contaminated"),
        )
        .withColumn(
            "contamination_ratio",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    broadcast_df_threshold: bool = True,
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the keyword-extraction /
    topic-fingerprint primitive (dedup clustering labels, corpus search,
    boilerplate spotting all start from it).

    tf = raw term count within the doc; idf = ln((1+N)/(1+df)) + 1
    (smoothed, always positive); score = tf·idf rounded to 6 digits.
    Ties break deterministically (score desc, term asc).

    Scale shape: one shuffle to (doc, term) counts (map-side combine —
    zipf hot terms collapse before the exchange), one vocab-keyed
    aggregation for document frequency (vocab ≪ corpus; broadcast back
    when it fits, else a term-keyed shuffle join), the corpus size N as
    a broadcast 1-row cross join, and a per-doc window for top-k. The
    window's partition is doc_id — millions of small partitions, no
    skew (a doc has at most its own length in distinct terms).
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_df_threshold:
        dfreq = F.broadcast(dfreq)
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("df")))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def filter_funnel(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Sequential quality-filter funnel report (C4/Gopher cleaning
    shape): for each named rule, how many docs that SURVIVED all earlier
    rules are dropped by this one, plus the final survivor count — the
    per-stage attrition table every curation run publishes.

    ONE full-scan aggregation: `dropped_at(i) = Σ (pass₁∧…∧passᵢ₋₁ ∧
    ¬passᵢ)` — all algebraic sums, partial-aggregated map-side, no
    shuffle beyond the 1-row final combine. Returns one row:
    (total, dropped_<rule>..., survivors).
    """
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("total")]
    so_far = F.lit(True)
    for name in names:
        pred = rules[name]
        aggs.append(
            F.sum((so_far & ~pred).cast("long")).alias(f"dropped_{name}")
        )
        so_far = so_far & pred
    aggs.append(F.sum(so_far.cast("long")).alias("survivors"))
    return df.agg(*aggs)


def top_ngrams(
    df: DataFrame, text_col: str, k: int = 100, n: int = 3
) -> DataFrame:
    """Corpus-level top-k token n-grams by DOCUMENT frequency — the
    contamination / boilerplate census (an n-gram in half the corpus is
    a template, not content; eval-set n-grams appearing here are
    leakage).

    Shape: per-doc DISTINCT shingles (so a doc spamming one phrase
    counts once — and the explode fan-out is bounded by doc length),
    explode, one partial-aggregatable count per n-gram, TakeOrdered for
    the top k. The groupBy key space is large but the hot keys are
    exactly what partial aggregation combines map-side; no window, no
    full sort — ordering cost is O(rows log k)."""
    from pandera_forge_spark.operators.dedup import shingles

    c = F.col(text_col)
    return (
        df.select(F.explode(shingles(c, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("ngram"))
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    size: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-size character windows with
    optional overlap — the RAG/embedding-pipeline fan-out step (chunk,
    then embed each chunk). Output: (ids…, chunk_id, offset,
    chunk_text, chunk_len).

    Pure column algebra: ``sequence(0, len-1, stride)`` generates the
    offsets, ``explode`` fans them out, ``substring`` slices — one
    narrow map stage, no shuffle, no Python. The fan-out factor is
    len/stride per row, exactly the output size; empty documents emit
    zero chunks. At 100 TB this is the shape you want: chunking is
    embarrassingly parallel and the explode count is bounded by the
    data you must emit anyway."""
    if size <= 0:
        raise ValueError("size must be positive")
    if not 0 <= overlap < size:
        raise ValueError("overlap must be in [0, size)")
    stride = size - overlap
    c = F.col(text_col)
    offsets = F.sequence(
        F.lit(0), F.length(c) - F.lit(1), F.lit(stride)
    )
    out = (
        df.where(F.length(c) > 0)
        .select(
            *id_cols,
            F.posexplode(offsets).alias("chunk_id", "offset"),
            c.alias("__t"),
        )
        .select(
            *id_cols,
            "chunk_id",
            "offset",
            F.substring(F.col("__t"), F.col("offset") + 1, F.lit(size)).alias(
                "chunk_text"
            ),
        )
    )
    return out.withColumn("chunk_len", F.length("chunk_text"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer,
    Wilkerson, Aiken, SIGMOD 2003 — the MOSS algorithm): hash every
    character ``k``-gram of the casefolded alnum-only normalization,
    then keep the minimum hash of every ``window`` consecutive grams.
    The selected set is a position-robust content signature with
    guaranteed density (any match of length ``k + window - 1`` chars
    shares at least one fingerprint) at an expected ``2/(window+1)``
    selection rate — the "document fingerprinting (rolling hash)"
    primitive the training-data brief mandates, and the substrate for
    :func:`fingerprint_overlap_pairs`.

    Returns ``(id_col, fps: array<bigint>)`` — sorted distinct
    fingerprints; empty/null text yields an empty array (no content,
    no signature).

    Engineering shape — the ``zip_with``-ladder idiom (see
    ``dedup.shingles``), NOT ``transform(sequence(i), i -> f(arr, i))``
    lambdas: a captured subtree inside a higher-order-function lambda
    is re-evaluated PER ELEMENT (no CSE), and chaining projections
    does not help because Catalyst's CollapseProject inlines a
    once-referenced alias straight back into the lambda — the naive
    form is O(n²) md5 calls per document. Both the k-gram build and
    the sliding window-min are instead elementwise ``zip_with`` over
    SHIFTED SLICES of the previous array, so every lambda touches only
    its own element variables and each expensive subtree is evaluated
    a constant (k·window) times per ROW:

    - grams: a (k-1)-level ``zip_with``/``concat_ws`` ladder over the
      char array, then one ``transform`` hashing each gram (lambda
      references only the lambda var) — first 12 hex chars (48 bits)
      of md5, md5 because DuckDB computes it bit-identically (the
      oracle replays the whole pipeline), 48 bits because 32-bit
      grams birthday-collide into false shared fingerprints at corpus
      scale while 48 bits keep the array a plain ``bigint``;
    - window minima: a (window-1)-level ``zip_with``/``least`` ladder
      over the gram-hash array (``least`` skips the null padding of
      the shorter slice; partial tail windows are sliced off).

    Per-row cost is O(n_chars · window) md5/compare work — a narrow
    map stage, no shuffle, no UDF; at 100 TB it scales like any other
    projection, and the output is ~``2/(window+1) · n_chars`` longs
    per doc (a compression of the text, not an expansion).
    """
    if k <= 0 or window <= 0:
        raise ValueError("k and window must be positive")
    _max = 1 << 30
    s = F.lower(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"[^A-Za-z0-9]+", "")
    )
    n = F.length(s)
    chars = F.split(s, "")
    # k-gram ladder: concat_ws skips the null padding zip_with adds to
    # the shorter side, so tail entries are TRUNCATED grams — exactly
    # substring semantics; texts shorter than k keep one whole-string
    # gram via the greatest(...) slice below
    gacc = chars
    for j in range(1, k):
        gacc = F.zip_with(
            gacc,
            F.slice(chars, j + 1, _max),
            lambda a, b: F.concat_ws("", a, b),
        )
    m = F.greatest(n - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.slice(gacc, 1, m),
        lambda x: F.conv(F.substring(F.md5(x), 1, 12), 16, 10).cast("long"),
    )
    # sliding window-min ladder; least() skips null padding, partial
    # tail windows are sliced off (fewer grams than `window` keeps the
    # single min-of-all entry); tie-breaking is irrelevant because
    # only the value set survives the distinct
    wacc = grams
    for j in range(1, window):
        wacc = F.zip_with(
            wacc,
            F.slice(grams, j + 1, _max),
            lambda a, b: F.least(a, b),
        )
    wins = F.slice(wacc, 1, F.greatest(m - F.lit(window - 1), F.lit(1)))
    fps = F.array_sort(F.array_distinct(wins))
    return df.select(
        F.col(id_col),
        F.when(n > 0, fps).otherwise(F.array().cast("array<long>")).alias("fps"),
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    min_overlap: float = 0.0,
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints — the
    MOSS-style overlap detector, complementing the MinHash/SimHash
    family with a CHARACTER-level, position-robust signal (catches
    copies with word-boundary edits that token shingles fragment).

    Pipeline: :func:`winnow_fingerprints` → explode → document-
    frequency filter → self-join on fingerprint → per-pair count.
    Returns ``(id_a, id_b, shared, overlap)`` where ``overlap`` is
    ``shared / min(|fps_a|, |fps_b|)`` (containment-style, so a small
    doc fully embedded in a big one scores 1.0). ``min_overlap``
    gates on that ratio BEFORE rounding — the ratio is a quotient of
    exact small integers, so the gate is engine-exact (no float-
    boundary ambiguity). Phrase-heavy natural corpora share isolated
    fingerprints constantly; ``min_overlap≈0.3`` is the useful
    near-dup operating point, while 0.0 returns the raw overlap graph.

    Scale shape: fingerprints occurring in more than ``max_df``
    documents are STOP FINGERPRINTS (boilerplate — headers, license
    blocks) and are dropped before the join, the standard winnowing-
    index practice; it bounds per-fingerprint join fanout at
    ``max_df²`` pairs and keeps the self-join linear in corpus size
    under virality, the same discipline as ``dedup.DEFAULT_MAX_BUCKET``.
    Both shuffles (doc-frequency groupBy, pair groupBy) partial-
    aggregate map-side; no UDF anywhere.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k, window)
    ex = fps.select(
        F.col(id_col), F.size("fps").alias("__n"), F.explode("fps").alias("__fp")
    )
    counts = (
        ex.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .where((F.col("__df") >= 2) & (F.col("__df") <= max_df))
    )
    kept = ex.join(counts.select("__fp"), "__fp")
    a = kept.select(
        "__fp", F.col(id_col).alias("id_a"), F.col("__n").alias("__na")
    )
    b = kept.select(
        "__fp", F.col(id_col).alias("id_b"), F.col("__n").alias("__nb")
    )
    pairs = (
        a.join(b, "__fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.max("__na").alias("__na"),
            F.max("__nb").alias("__nb"),
        )
        .where(F.col("shared") >= min_shared)
    )
    if min_overlap > 0.0:
        pairs = pairs.where(
            F.col("shared") / F.least("__na", "__nb") >= F.lit(min_overlap)
        )
    # floor-based rounding for cross-engine parity (see BASELINE.md:
    # Spark round() HALF_UPs the shortest-decimal repr, DuckDB the
    # binary value)
    overlap = (
        F.floor(
            F.col("shared") / F.least("__na", "__nb") * 1000000 + F.lit(0.5)
        )
        / 1000000
    )
    return pairs.select("id_a", "id_b", "shared", overlap.alias("overlap"))


def normalize_text(
    col: Column,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    strip_punct: bool = False,
) -> Column:
    """Standard pre-tokenization text normalization as a pure codegen
    projection — the cleanup pass that runs before chunking, packing,
    or near-dedup shingling so that formatting noise (stray control
    characters, run-on whitespace, case) doesn't fragment otherwise
    identical content.

    Chained ``regexp_replace``/``lower`` — JVM-side, no UDF, no
    shuffle; composes with any operator taking a text Column. Order:
    control-strip, optional punct-strip, whitespace collapse + trim,
    casefold — so collapsed whitespace also absorbs gaps left by
    stripped characters."""
    out = col
    if strip_control:
        out = F.regexp_replace(out, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if strip_punct:
        # \p{L}\p{N}, not \w: Java's \w is ASCII-only without
        # UNICODE_CHARACTER_CLASS, so [^\w\s] would delete every
        # accented/CJK character from a multilingual corpus
        out = F.regexp_replace(out, r"[^\p{L}\p{N}\s]", " ")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    if lowercase:
        out = F.lower(out)
    return out


def boilerplate_lines(
    df: DataFrame,
    text_col: str,
    min_df: int = 10,
    delimiter: str = "\n",
) -> DataFrame:
    """Lines (or ``delimiter``-separated segments) that occur in at
    least ``min_df`` DISTINCT documents — the corpus-level boilerplate
    census (nav menus, cookie banners, license headers) that C4-style
    cleaning removes before anything else. Returns ``(line, df)``.

    Per-doc DISTINCT lines (``array_distinct`` before the explode) so a
    page repeating its own footer five times still counts once toward
    document frequency. One explode + one count groupBy, partial-
    aggregated map-side; empty/whitespace-only segments are never
    reported. Output cardinality is bounded by corpus_lines / min_df —
    at a given min_df the frame SHRINKS as the threshold rises, which
    is what makes the strip pass below broadcastable.

    ``delimiter`` is treated as a LITERAL string (escaped before the
    regex split), so '|' or '.' separators split where the user means,
    not per-character."""
    import re as _re

    lines = F.array_distinct(
        F.filter(
            F.transform(
                F.split(
                    F.coalesce(F.col(text_col), F.lit("")),
                    _re.escape(delimiter),
                ),
                lambda s: F.trim(s),
            ),
            lambda s: s != "",
        )
    )
    return (
        df.select(F.explode(lines).alias("line"))
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str,
    min_df: int = 10,
    delimiter: str = "\n",
    boilerplate: DataFrame | None = None,
) -> DataFrame:
    """Remove boilerplate lines from every document — the C4 cleaning
    pass: any line occurring in ≥ ``min_df`` distinct documents is
    deleted corpus-wide; surviving lines keep their original order;
    ``text_col`` is REPLACED, all other columns pass through.

    Shape for 10^12 docs: the boilerplate census (see
    :func:`boilerplate_lines`) is O(corpus_lines / min_df) rows and is
    BROADCAST; the strip itself is then posexplode → broadcast
    LEFT-ANTI hash join → per-doc reassembly (groupBy doc,
    order-restoring ``array_sort`` on (pos, line) structs,
    ``concat_ws``). The only non-broadcast shuffle is the reassembly
    groupBy, keyed on the doc — the same cardinality as the input.
    Trimmed-empty lines are dropped like boilerplate (they carry no
    content); a document that was ALL boilerplate comes back with
    ``text_col = ''`` rather than vanishing.

    Contract: the NON-text columns together must uniquely identify a
    document — reassembly groups by them, so two rows sharing every
    non-text value would have their lines merged (and a text-only
    frame has no identity at all: that case raises). The seed-back
    join is NULL-SAFE (``eqNullSafe`` terms), so a null in a
    passthrough column cannot orphan its document's text. ``delimiter``
    is a literal string, escaped before the regex split.

    Pass a precomputed ``boilerplate`` frame (``(line, ...)``) to
    reuse one census across strips or to inject a curated blocklist.
    """
    import re as _re

    bp = (
        boilerplate
        if boilerplate is not None
        else boilerplate_lines(df, text_col, min_df, delimiter)
    ).select("line")
    other_cols = [c for c in df.columns if c != text_col]
    if not other_cols:
        raise ValueError(
            "strip_boilerplate needs at least one non-text column to "
            "identify documents (a text-only frame would reassemble the "
            "whole corpus into every row)"
        )
    exploded = df.select(
        *other_cols,
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")), _re.escape(delimiter)
            )
        ).alias("__pos", "__line"),
    ).where(F.trim(F.col("__line")) != "")
    kept = exploded.join(
        F.broadcast(bp),
        F.trim(exploded["__line"]) == bp["line"],
        "left_anti",
    )
    reassembled = (
        kept.groupBy(*other_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__line"))
            ).alias("__ordered")
        )
        .select(
            *other_cols,
            F.concat_ws(
                delimiter,
                F.transform(F.col("__ordered"), lambda s: s["__line"]),
            ).alias(text_col),
        )
    )
    # all-boilerplate docs have no kept lines: seed them back with ''.
    # eqNullSafe terms: a NULL passthrough value must still match its
    # own reassembled row (plain equi-join would orphan it and wipe
    # the document's text)
    left = df.select(*other_cols).alias("__l")
    right = reassembled.alias("__r")
    cond = None
    for c in other_cols:
        term = F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}"))
        cond = term if cond is None else (cond & term)
    return left.join(right, cond, "left").select(
        *[F.col(f"__l.{c}").alias(c) for c in other_cols],
        F.coalesce(F.col(f"__r.{text_col}"), F.lit("")).alias(text_col),
    )


# ---------------------------------------------------------------------------
# Bigram language-model perplexity scoring (beyond-reference: the
# CCNet/Gopher-style "perplexity filter" every large-scale pretraining
# pipeline runs — train a cheap n-gram LM on a trusted corpus, score
# candidate documents by average token log-probability, drop the tails).
# ---------------------------------------------------------------------------

LM_BOS = "<s>"


def _bigram_structs(col: Column) -> Column:
    """``[w1..wn]`` (BOS-prefixed) -> ``[(BOS,w1),(w1,w2)..]`` as an
    array<struct<w1,w2>> — pure column algebra, one narrow projection.

    The zip_with lambda touches only its own arguments, so the
    CollapseProject lambda-inlining trap (captured subtrees re-evaluated
    per element) does not apply: the two slices are per-ROW expressions.
    Null text is coalesced to '' (0 bigrams) so engine and oracle agree
    without relying on NULL-array propagation semantics.
    """
    a = F.concat(F.array(F.lit(LM_BOS)), tokens(F.coalesce(col, F.lit(""))))
    n = F.size(a)
    return F.zip_with(
        F.slice(a, 1, n - 1),
        F.slice(a, 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Bigram counts ``(w1, w2, n)`` over a corpus — the training half
    of the perplexity filter.

    Scale shape: one narrow map stage (tokenize + zip_with bigrams, no
    data-proportional driver work) into ONE shuffle to (w1, w2) counts
    with map-side combine — zipf-hot bigrams ("of the") collapse to one
    row per map task before the exchange, so key skew never concentrates
    rows. The result is vocabulary-sized, not corpus-sized; persist it
    or write it out once and reuse across scoring runs. ``min_count``
    prunes hapax bigrams (at web scale the long tail is ~half the rows
    and pure noise — pruning shrinks the scoring join's build side and
    only shifts those contexts into the smoothed-unseen mass).
    """
    bg = df.select(F.explode(_bigram_structs(F.col(text_col))).alias("bg"))
    out = bg.groupBy(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        out = out.where(F.col("n") >= min_count)
    return out


def lm_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    alpha: float = 0.5,
    broadcast_lm: bool = False,
) -> DataFrame:
    """Per-document average bigram log-probability under ``lm`` (output
    of :func:`train_bigram_lm`) with add-alpha smoothing — higher is more
    fluent under the training corpus; ``exp(-avg_logprob)`` is the
    perplexity. Emits one row per input document:

    ``id_cols..., n_bigrams, oov_bigrams, sum_lp_micro, avg_logprob``

    P(w2|w1) = (c(w1,w2)+alpha) / (c(w1)+alpha*V) with V = distinct
    trained w2 + 1 (one reserved unseen type). Per-bigram log-probs are
    quantized to micro-units (floor(ln(p)*1e6) as BIGINT) BEFORE any
    sum, so per-doc totals are integer sums — order-independent across
    partitions and bit-identical between engines (the BM25 trick).

    Scale shape: docs reduce to per-doc DISTINCT bigram counts (one
    shuffle, map-side combine), then an equi-join against the
    vocabulary-sized lm/context frames — broadcast both when the lm
    fits (``broadcast_lm=True``), else a plain shuffle join whose hot
    keys are ordinary join skew (AQE splits them); V rides along as a
    1-row broadcast. No UDFs, no collect, no window.
    """
    id_cols = list(id_cols) if id_cols is not None else ["doc_id"]
    ctx = lm.groupBy("w1").agg(F.sum("n").alias("c1"))
    voc = lm.agg((F.countDistinct("w2") + F.lit(1)).alias("v"))
    flat = df.select(
        *id_cols, F.explode_outer(_bigram_structs(F.col(text_col))).alias("bg")
    )
    dbc = flat.groupBy(
        *id_cols, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("k"))
    lm_side = F.broadcast(lm) if broadcast_lm else lm
    ctx_side = F.broadcast(ctx) if broadcast_lm else ctx
    p = (F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v")
    )
    scored = (
        dbc.join(lm_side, ["w1", "w2"], "left")
        .join(ctx_side, ["w1"], "left")
        .crossJoin(F.broadcast(voc))
        .withColumn("__lp_micro", F.floor(F.log(p) * F.lit(1e6)).cast("long"))
    )
    real = F.col("w1").isNotNull()  # explode_outer's empty-doc row
    agg = scored.groupBy(*id_cols).agg(
        F.sum(F.when(real, F.col("k")).otherwise(F.lit(0))).alias("n_bigrams"),
        F.sum(
            F.when(real & F.col("n").isNull(), F.col("k")).otherwise(F.lit(0))
        ).alias("oov_bigrams"),
        F.sum(
            F.when(real, F.col("k") * F.col("__lp_micro")).otherwise(F.lit(0))
        ).alias("sum_lp_micro"),
    )
    return agg.withColumn(
        "avg_logprob",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("sum_lp_micro").cast("double")
            / F.col("n_bigrams").cast("double")
            / F.lit(1e6),
        ).otherwise(F.lit(None).cast("double")),
    )


def collapse_repeated_lines(
    df: DataFrame, text_col: str = "text", delimiter: str = "\n"
) -> DataFrame:
    """Collapse CONSECUTIVE duplicate lines within each document to
    their first occurrence (crawler artifacts repeat nav/footer lines
    back-to-back; this is the intra-document complement of the
    corpus-level :func:`strip_boilerplate`). Lines compare
    trim-normalized; the kept line keeps its original form. Every
    other column passes through untouched.

    Scale shape: a narrow per-row projection — split, one zip_with
    against the 1-shifted array, filter, rejoin; zero shuffles, zero
    UDFs, no corpus-wide state. The shifted array is a zip_with
    ARGUMENT (not a captured subtree), so the split is evaluated
    per row, not per element — the CollapseProject lambda-inlining
    trap documented at winnow_fingerprints does not bite here."""
    import re as _re

    a = F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(delimiter))
    prev = F.concat(
        F.array(F.lit(None).cast("string")), F.slice(a, 1, F.size(a) - 1)
    )
    pairs = F.zip_with(
        a,
        prev,
        lambda x, p: F.struct(
            x.alias("line"),
            (p.isNull() | (F.trim(x) != F.trim(p))).alias("keep"),
        ),
    )
    kept = F.filter(pairs, lambda s: s["keep"])
    out = F.array_join(F.transform(kept, lambda s: s["line"]), delimiter)
    return df.withColumn(text_col, out)


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    max_terms_per_doc: int = 1000,
) -> DataFrame:
    """Pointwise mutual information of token PAIRS co-occurring in the
    same document — the word-association miner (collocations, entity
    couplings, template fingerprints) complementing
    `profiler.mutual_information` (column-level) and `top_ngrams`
    (adjacency-level): PMI finds "tokyo"~"yen" even when they never
    touch. One row per unordered pair with

        ``t1, t2, c_ab, pmi_micro``

    where ``c_ab`` is the number of documents containing BOTH terms and
    ``pmi_micro = floor((ln n − ln c_a − ln c_b + ln c_ab) · 1e6)`` —
    the log-SUM form (never materializes ``n·c_ab``, BIGINT-safe at
    10^12 docs — the `mutual_information` discipline) quantized to
    micro-nat longs so ordering and ties are exact integers on every
    engine.

    Scale shape: documents reduce to DISTINCT (doc, term) rows first
    (one narrow explode + distinct — presence, not frequency, is what
    doc-level PMI measures), then the ONLY superlinear step is the
    within-doc pair self-join, bounded by ``max_terms_per_doc``² per
    document with an IN-BAND ``raise_error`` fence riding the term
    column (a 10^6-distinct-token pathological doc would otherwise be
    one task's quadratic memory — the `label_conflicts` cap
    discipline). ``min_count`` prunes pairs BEFORE the frequency joins,
    so the expensive side of the join is (surviving pairs), not
    (all pairs); per-term doc frequencies and the 1-row corpus count
    join back as vocabulary-sized frames. No UDF, no window, no
    collect.
    """
    if min_count < 1:
        raise ValueError(
            f"cooccurrence_pmi: min_count must be >= 1, got {min_count}"
        )
    if max_terms_per_doc < 2:
        raise ValueError(
            "cooccurrence_pmi: max_terms_per_doc must be >= 2, got "
            f"{max_terms_per_doc}"
        )
    missing = [c for c in (text_col, id_col) if c not in df.columns]
    if missing:
        raise ValueError(f"cooccurrence_pmi: frame lacks columns {missing}")
    dt = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias(
                "__t"
            ),
        )
    )
    per_doc = dt.groupBy("__doc").agg(F.count(F.lit(1)).alias("__m"))
    fenced = dt.join(per_doc, "__doc").select(
        "__doc",
        F.when(F.col("__m") <= max_terms_per_doc, F.col("__t"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "cooccurrence_pmi: document exceeds "
                        f"max_terms_per_doc={max_terms_per_doc} distinct "
                        "tokens (quadratic pair blow-up); doc id: "
                    ),
                    F.col("__doc").cast("string"),
                )
            )
        )
        .alias("__t"),
    )
    a = fenced.select("__doc", F.col("__t").alias("t1"))
    b = fenced.select("__doc", F.col("__t").alias("t2"))
    pairs = (
        a.join(b, "__doc")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    tf = dt.groupBy(F.col("__t")).agg(F.count(F.lit(1)).alias("__c"))
    n = dt.agg(F.countDistinct("__doc").alias("__n"))
    ca = tf.select(F.col("__t").alias("t1"), F.col("__c").alias("__ca"))
    cb = tf.select(F.col("__t").alias("t2"), F.col("__c").alias("__cb"))
    out = (
        pairs.join(ca, "t1")
        .join(cb, "t2")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi_micro",
            F.floor(
                (
                    F.log(F.col("__n").cast("double"))
                    - F.log(F.col("__ca").cast("double"))
                    - F.log(F.col("__cb").cast("double"))
                    + F.log(F.col("c_ab").cast("double"))
                )
                * F.lit(1e6)
            ).cast("long"),
        )
    )
    return out.select("t1", "t2", "c_ab", "pmi_micro")


# ----------------------------------------- substring-level duplication

def positional_ngrams(col: Column, n: int) -> Column:
    """Token n-grams IN POSITION ORDER, no dedup: element ``i`` is the
    n-gram starting at token ``i`` (0-based). Documents with fewer than
    ``n`` tokens yield an EMPTY array — a span detector has nothing to
    say about them (contrast :func:`~pandera_forge_spark.operators.
    dedup.shingles`, whose whole-doc fallback serves set semantics).

    Same zip_with ladder as ``shingles()`` — the documented
    O(tokens**2) trap of capturing the token array inside a
    ``transform(sequence(...))`` lambda applies here identically."""
    from pandera_forge_spark.operators.dedup import _SLICE_MAX

    if n < 1:
        raise ValueError(f"positional_ngrams: n must be >= 1, got {n}")
    toks = tokens(col)
    acc = toks
    for j in range(1, n):
        # zip_with pads the short side with null; concat_ws skips
        # nulls, so the tail holds partial grams — sliced off below
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, _SLICE_MAX),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        F.size(toks) >= n, F.slice(acc, 1, F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_count: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Substring-level duplication spans — the n-gram-granular
    approximation of suffix-array training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    token position is *duplicated* when its n-gram occurs at least
    ``min_count`` times corpus-wide (occurrences, not documents —
    intra-document repetition is memorization fuel too), and runs of
    duplicated positions merge into maximal per-document spans.
    Document-level near-dedup (MinHash) keeps one copy of a 90%-equal
    pair but never sees the paragraph pasted into 10,000 otherwise
    distinct pages; this operator works at the span grain those misses
    live at.

    Output: ``(id, span_start, span_end, dup_tokens)`` — 0-based
    inclusive token indices, ``dup_tokens = span_end - span_start + 1``,
    all BIGINT. Two duplicated positions merge while their n-token
    windows overlap or touch (``next_pos <= pos + n``).

    Shape, and why it survives 100 TB: posexplode of the positional
    grams is corpus_tokens rows — the unavoidable fan-out — but each
    row is immediately reduced to ``(id, pos, xxhash64(gram))``, a
    ~20-byte shuffle record instead of the ~6x-wider gram text. The
    census is one partial-aggregatable groupBy on the 64-bit key; the
    dup-position recovery is a shuffle join on the same key (NOT a
    broadcast: the duplicated-gram set is data-proportional —
    boilerplate corpora make it huge — so planning a broadcast here
    would be the OOM, and AQE may still downgrade small censuses to
    one at runtime). The island merge windows over (id, pos): keyed by
    document, never a global sort. ``max_df`` fences viral grams
    (navigation chrome in half the corpus) out of the join fan-out the
    same way fingerprint_overlap's stop-fingerprint filter does —
    strip those with strip_boilerplate first, then span-dedup what
    remains.

    64-bit hash collisions: a colliding pair would mint a false
    duplicated position; at 10^12 grams the expected collision count
    is ~0.03 per corpus (birthday bound), and a collision marks one
    n-token span, never deletes data — acceptable for a curation
    signal, same budget as minhash banding."""
    from pyspark.sql import Window

    for c in (text_col, id_col):
        if c not in df.columns:
            raise ValueError(f"dup_ngram_spans: frame lacks column {c!r}")
    if min_count < 2:
        raise ValueError(
            f"dup_ngram_spans: min_count must be >= 2, got {min_count}"
        )
    g = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(positional_ngrams(F.col(text_col), n)).alias(
            "__pos", "__gram"
        ),
    ).select("__id", "__pos", F.xxhash64("__gram").alias("__h"))
    census = g.groupBy("__h").agg(F.count(F.lit(1)).alias("__c")).where(
        F.col("__c") >= min_count
    )
    if max_df is not None:
        census = census.where(F.col("__c") <= max_df)
    dup = g.join(census.select("__h"), "__h").select("__id", "__pos")
    w = Window.partitionBy("__id").orderBy("__pos")
    # first row of each id: lag is null -> condition null -> 0; islands
    # therefore number from 0 within each document
    island = F.sum(
        F.when(F.col("__pos") > F.lag("__pos").over(w) + n, 1).otherwise(0)
    ).over(w)
    return (
        dup.withColumn("__isl", island)
        .groupBy("__id", "__isl")
        .agg(
            F.min("__pos").cast("long").alias("span_start"),
            (F.max("__pos") + F.lit(n - 1)).cast("long").alias("span_end"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
        )
    )


RESIDUE_PATTERNS = {
    # extraction residue: the HTML that the stripper missed
    "html_tag": r"</?[a-zA-Z][a-zA-Z0-9]*[^<>]*>",
    "html_entity": r"&(amp|lt|gt|quot|nbsp|#[0-9]+);",
    # decode residue: U+FFFD means bytes already died upstream
    "replacement_char": "�",
    # control characters that no clean text contains
    "control_char": r"[\x00-\x08\x0b\x0c\x0e-\x1f]",
    # the classic UTF-8-read-as-Latin-1 digraphs (Ã©=é, â€=’/“/–...)
    "mojibake": r"Ã©|Ã¨|Ã¼|Ã±|Ã¤|Ã¶|â€",
}


def markup_residue_census(
    df: DataFrame,
    text_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Extraction-quality census: how much of each source's text still
    carries the scars of a bad pipeline stage — unstripped HTML,
    undecoded entities, U+FFFD replacement characters, raw control
    bytes, and UTF-8-as-Latin-1 mojibake digraphs. Each is a distinct
    upstream failure with a distinct fix (re-extract, re-decode,
    re-crawl), which is why this is a CENSUS per failure class and not
    one "dirty" bit: a source at 40% mojibake needs its decoder fixed,
    not its documents dropped.

    Every pattern is lookaround-free and dialect-portable (same
    semantics under Java regex and RE2), and every output is an exact
    long count of DOCUMENTS matching the class (not match
    occurrences — one doc with 50 tags is one bad doc). NULL texts
    drop. One fused aggregate evaluates all five classes in a single
    scan — the pii_scan discipline; no UDF, no explode, no second
    pass.

    Scale shape: ONE map-side-partial groupBy (or a global agg without
    groups); regex evaluation is JVM codegen over the projected text
    column only."""
    keys = list(group_cols)
    if text_col not in df.columns:
        raise ValueError(
            f"markup_residue_census: frame lacks column {text_col!r}"
        )
    missing = [c for c in keys if c not in df.columns]
    if missing:
        raise ValueError(
            f"markup_residue_census: frame lacks columns {missing}"
        )
    t = F.col(text_col)
    base = df.where(t.isNotNull())
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum(t.rlike(pat).cast("long")).alias(f"n_{name}")
        for name, pat in RESIDUE_PATTERNS.items()
    ]
    if keys:
        return base.groupBy(*keys).agg(*aggs)
    return base.agg(*aggs)


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Tokenizer-fit audit: build the corpus's own top-``vocab_k``
    token vocabulary (by total count, ties to the lexicographically
    smaller token — deterministic) and score every document's
    out-of-vocabulary rate against it. The question this answers
    BEFORE a training run: if the tokenizer's vocab is k entries,
    what fraction of each document falls outside the head —
    high-OOV documents are the ones that will shatter into
    byte-fallback soup, and a per-lang/per-source aggregate of this
    frame localizes which slice the vocab underserves.

    Output per document: ``id, n_tokens, n_oov, oov_ratio`` (one IEEE
    division; empty/whitespace docs report 0 tokens and NULL ratio).

    Scale shape: one token explode + count groupBy builds the
    census (map-side partials; the census is vocabulary-sized, not
    corpus-sized); the top-k election is a window over THAT census —
    a single-partition sort of O(distinct tokens) rows, census-sized
    by construction and said out loud; membership then rides back as
    a broadcast semi-join flag and ONE per-doc count groupBy. Two
    corpus-sized shuffles total (token count, per-doc rollup)."""
    if int(vocab_k) < 1:
        raise ValueError(
            f"vocab_coverage: vocab_k must be >= 1, got {vocab_k}"
        )
    for c in (text_col, id_col):
        if c not in df.columns:
            raise ValueError(f"vocab_coverage: column {c!r} missing")
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).where(F.col("__t") != "")
    census = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy(F.col("__c").desc(), F.col("__t").asc())
    vocab = (
        census.where(F.col("__c") >= int(min_count))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(vocab_k))
        .select("__t")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "__t", "left"
    )
    per_doc = flagged.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("__in").isNull(), 1)), F.lit(0)
        )
        .cast("long")
        .alias("n_oov"),
    )
    base = df.select(F.col(id_col).alias("__id")).distinct()
    out = base.join(per_doc, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
            "n_tokens"
        ),
        F.coalesce(F.col("n_oov"), F.lit(0).cast("long")).alias("n_oov"),
        F.when(
            F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("oov_ratio"),
    )
    return out


# ------------------------------------------------------- readability

def readability(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document readability census: word / sentence / syllable
    counts and the Flesch reading-ease score
    ``206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)``
    (public formula; Flesch 1948). Readability is a standard
    training-corpus quality axis — a slice whose score collapses is
    usually boilerplate, OCR soup, or code misfiled as prose, and the
    integer counts roll up exactly so fleet-level aggregation never
    accumulates float error.

    Syllables use the deterministic vowel-group heuristic: per word
    ``max(1, #maximal [aeiouy]+ runs)`` — the standard cheap proxy
    (hyphenation dictionaries are out of scope); sentences are
    non-empty ``[.!?]+`` splits, floored at 1 for any non-empty doc.

    All counting is JVM array algebra on the token array — one
    ``transform`` + ``aggregate`` fold per doc, no explode, no UDF,
    no shuffle: a pure projection that scales as a narrow map stage.
    Empty/whitespace docs report 0 words, 0 sentences, 0 syllables
    and NULL flesch (nothing to score, loudly absent rather than a
    fake 206.835).

    Output: ``id, n_words, n_sentences, n_syllables, flesch``.
    """
    for c in (text_col, id_col):
        if c not in df.columns:
            raise ValueError(f"readability: column {c!r} missing")
    toks = tokens(F.col(text_col))
    n_words = F.coalesce(F.size(toks), F.lit(0))
    syl = F.aggregate(
        F.transform(
            toks,
            lambda t: F.greatest(
                F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sents = F.size(
        F.filter(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.trim(s) != "",
        )
    )
    has_words = n_words > 0
    n_sent = F.when(has_words, F.greatest(sents, F.lit(1))).otherwise(F.lit(0))
    flesch = F.when(
        has_words,
        F.lit(206.835)
        - F.lit(1.015)
            * (n_words.cast("double") / F.greatest(sents, F.lit(1)).cast("double"))
        - F.lit(84.6) * (syl.cast("double") / n_words.cast("double")),
    )
    return df.select(
        F.col(id_col).alias(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        F.when(has_words, syl).otherwise(F.lit(0)).cast("long").alias(
            "n_syllables"
        ),
        flesch.alias("flesch"),
    )


# --------------------------------------------------------- zipf fit

def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = (),
    top_k: int = 200,
    min_count: int = 1,
) -> DataFrame:
    """Rank-frequency (Zipf) fit of the token census: OLS slope and
    intercept of ``ln(freq)`` on ``ln(rank)`` over the top-``top_k``
    ranks, optionally per group. Natural language reliably shows a
    slope near -1 (Zipf's law — public linguistics folklore); a
    corpus slice whose slope collapses toward 0 is word-salad /
    template soup, and one that dives far below -1 is a few tokens
    stamped everywhere — both are generator or scraper failures that
    per-doc quality scores miss because every individual doc looks
    fine. This is the corpus-level fingerprint check.

    Scale shape: one corpus-sized explode + hash groupBy builds the
    census (map-side partials; result is vocabulary-sized, not
    corpus-sized); the rank election is a window over THAT census
    partitioned by group — the same census-sized-sort-said-out-loud
    discipline as vocab_coverage; the OLS moments are one tiny
    groupBy over <= top_k rows per group. Ranks break count ties by
    token asc, so the fit is deterministic. Groups with fewer than 2
    ranked tokens report NULL slope/intercept (a line needs two
    points), never a divide-by-zero.

    Output: ``group_cols..., n_ranks, slope, intercept`` — raw
    doubles; callers round for cross-engine comparison (the
    corr_lineitem ROUND-6 convention).
    """
    if int(top_k) < 2:
        raise ValueError(f"zipf_fit: top_k must be >= 2, got {top_k}")
    if text_col not in df.columns:
        raise ValueError(f"zipf_fit: column {text_col!r} missing")
    for c in group_cols:
        if c not in df.columns:
            raise ValueError(f"zipf_fit: group column {c!r} missing")
    from pyspark.sql import Window

    gcols = [F.col(c) for c in group_cols]
    toks = df.select(
        *gcols, F.explode(tokens(F.col(text_col))).alias("__t")
    ).where(F.col("__t") != "")
    census = toks.groupBy(*group_cols, "__t").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("__c").desc(), F.col("__t").asc()
    )
    ranked = (
        census.where(F.col("__c") >= int(min_count))
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(top_k))
    )
    x = F.log(F.col("__rk").cast("double"))
    y = F.log(F.col("__c").cast("double"))
    mo = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_ranks"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n = F.col("n_ranks").cast("double")
    den = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when(
        (F.col("n_ranks") >= 2) & (den != 0),
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / den,
    )
    return mo.select(
        *group_cols,
        "n_ranks",
        slope.alias("slope"),
        F.when(
            slope.isNotNull(),
            (F.col("__sy") - slope * F.col("__sx")) / n,
        ).alias("intercept"),
    )


# ------------------------------------------- language-id confidence

def language_margin(col: Column) -> Column:
    """Confidence margin of :func:`detect_language`: the gap between
    the best and second-best stopword-hit-ratio scores. The argmax
    alone hides how close the call was — a corpus slice whose margins
    crowd zero is code-switched, boilerplate, or simply misrouted,
    and every downstream per-language pipeline (tokenizer choice,
    quality thresholds, mixture budgets) inherits the error. Margin
    ~0 with a nonzero best score is the "send to review" band.

    Same one-pass array algebra as detect_language — the scored
    struct array is sorted and the top two scores differenced; docs
    with no stopword hits at all ('und') report margin 0.0. Pure
    projection, no UDF, no shuffle."""
    toks = tokens(col)
    n = F.size(toks)

    def hit_ratio(lang):
        words = STOPWORDS[lang]
        return F.when(
            n > 0, F.size(F.filter(toks, lambda t: t.isin(*words))) / n
        ).otherwise(F.lit(0.0))

    scores = F.array_sort(F.array(*[hit_ratio(lang) for lang in sorted(STOPWORDS)]))
    top = F.element_at(scores, -1)
    second = F.element_at(scores, -2)
    return F.when(top > 0, top - second).otherwise(F.lit(0.0))


# --------------------------------------------------- token entropy

def token_entropy(
    df: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Shannon entropy of the token distribution and its exponential
    — the EFFECTIVE vocabulary size — per group.
    ``H = ln(N) - (Σ_t c_t·ln c_t)/N`` over the token census;
    ``exp(H)`` is "how many tokens the corpus behaves as if it had,
    uniformly". The raw distinct count can't tell a healthy corpus
    from one where three boilerplate tokens carry half the mass;
    effective vocabulary collapses immediately when generation or
    scraping degenerates, and it pairs with zipf_fit as the
    corpus-shape fingerprint (Zipf gives the head's slope, entropy
    the whole distribution's concentration).

    Scale shape: one corpus-sized explode + hash groupBy to the
    census (map-side partials, census-sized result), then one
    census-sized fold per group — the two-shuffle shape every census
    operator here uses. Per-row ln on exact integer counts; the
    cross-row ln sum follows the corr_lineitem ROUND-6 comparison
    convention (callers round). Empty groups (no tokens) report NULL
    entropy, loudly.

    Output per group: ``group_cols..., n_tokens, n_distinct, entropy,
    eff_vocab``.
    """
    if text_col not in df.columns:
        raise ValueError(f"token_entropy: column {text_col!r} missing")
    for c in group_cols:
        if c not in df.columns:
            raise ValueError(f"token_entropy: group column {c!r} missing")
    gcols = [F.col(c) for c in group_cols]
    toks = df.select(
        *gcols, F.explode(tokens(F.col(text_col))).alias("__t")
    ).where(F.col("__t") != "")
    census = toks.groupBy(*group_cols, "__t").agg(
        F.count(F.lit(1)).alias("__c")
    )
    agg = census.groupBy(*group_cols).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(
            F.col("__c").cast("double") * F.log(F.col("__c").cast("double"))
        ).alias("__sum_clnc"),
    )
    n = F.col("n_tokens").cast("double")
    h = F.when(
        F.col("n_tokens") > 0,
        F.log(n) - F.col("__sum_clnc") / n,
    )
    return agg.select(
        *group_cols,
        "n_tokens",
        "n_distinct",
        h.alias("entropy"),
        F.when(h.isNotNull(), F.exp(h)).alias("eff_vocab"),
    )


# ------------------------------------------------------ keyness (G²)

def keyness_by_group(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    top_k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Dunning log-likelihood keyness (public: Dunning 1993): for
    every (group, token), the G² statistic of the 2×2 contingency
    (token-in-group vs token-elsewhere) — and the top-``top_k``
    OVERUSED tokens per group. "What words make this slice this
    slice" is the first question when a source or language bucket
    drifts: frequency alone surfaces stopwords, TF-IDF surfaces
    rarities; G² surfaces what is disproportionately THERE relative
    to the rest of the corpus, with a principled statistic.

        G² = 2·Σ_cells O·ln(O/E),   E from the margins;

    only cells with O>0 contribute (the 0·ln0 = 0 convention), and
    only overused tokens (O11 > E11) are ranked. Ties break by token
    asc; equal-profile tokens get bit-equal G² on any engine, so the
    election is deterministic (ROUND-6 on the emitted statistic).

    Scale shape: one corpus-sized explode + (group, token) census;
    marginals are two census-sized groupBys broadcast back by key
    join; the per-group election is a window over the census. Tokens
    rarer than ``min_count`` corpus-wide are dropped before any ln —
    the classic keyness hygiene (singletons are all noise).

    Output: ``group_col, token, n_in, n_out, g2, rank``.
    """
    if int(top_k) < 1:
        raise ValueError(f"keyness_by_group: top_k must be >= 1, got {top_k}")
    for c in (text_col, group_col):
        if c not in df.columns:
            raise ValueError(f"keyness_by_group: column {c!r} missing")
    from pyspark.sql import Window

    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).where(F.col("__t") != "")
    cell = toks.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__o11"))
    tok_marg = cell.groupBy("__t").agg(F.sum("__o11").alias("__tm"))
    grp_marg = cell.groupBy("__g").agg(F.sum("__o11").alias("__gm"))
    total = cell.agg(F.sum("__o11").alias("__N"))
    j = (
        cell.join(tok_marg, "__t")
        .where(F.col("__tm") >= int(min_count))
        .join(grp_marg, "__g")
        .crossJoin(F.broadcast(total))
    )
    o11 = F.col("__o11").cast("double")
    o12 = (F.col("__tm") - F.col("__o11")).cast("double")      # token, other groups
    o21 = (F.col("__gm") - F.col("__o11")).cast("double")      # group, other tokens
    n = F.col("__N").cast("double")
    o22 = n - o11 - o12 - o21
    e11 = F.col("__gm").cast("double") * F.col("__tm").cast("double") / n
    e12 = (n - F.col("__gm")).cast("double") * F.col("__tm").cast("double") / n
    e21 = F.col("__gm").cast("double") * (n - F.col("__tm")).cast("double") / n
    e22 = (n - F.col("__gm")).cast("double") * (n - F.col("__tm")).cast("double") / n

    def term(o, e):
        return F.when(o > 0, o * (F.log(o) - F.log(e))).otherwise(F.lit(0.0))

    g2 = F.lit(2.0) * (
        term(o11, e11) + term(o12, e12) + term(o21, e21) + term(o22, e22)
    )
    scored = j.where(o11 > e11).withColumn("__g2", g2)
    w = Window.partitionBy("__g").orderBy(
        F.col("__g2").desc(), F.col("__t").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(top_k))
        .select(
            F.col("__g").alias(group_col),
            F.col("__t").alias("token"),
            F.col("__o11").cast("long").alias("n_in"),
            (F.col("__tm") - F.col("__o11")).cast("long").alias("n_out"),
            F.round("__g2", 6).alias("g2"),
            "rank",
        )
    )


# -------------------------------------------------------- JSD matrix

def jsd_matrix(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    vocab_k: int = 200,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between groups over their
    token distributions (public information theory; symmetric,
    bounded by ln 2) — the corpus-divergence MATRIX: which scrapers /
    sources / snapshots speak the same language, numerically. Keyness
    names the tokens that differ; JSD says how far apart two whole
    distributions are, which is what mixture design and
    source-dedup prioritization actually consume.

    The distributions are projected onto the corpus-wide
    top-``vocab_k`` tokens (deterministic count-desc/token-asc
    election, the vocab_coverage kernel) plus ONE '__rest' bucket
    holding each group's remaining mass — so every group's
    distribution has exactly vocab_k+1 cells, missing cells count 0,
    and the matrix is comparable across pairs. With q_i = (p_ai +
    p_bi)/2:

        JSD = Σ_i [ p_ai·ln(p_ai/q_i) + p_bi·ln(p_bi/q_i) ] / 2

    (0·ln0 = 0). Probabilities are single integer divisions; the ln
    fold follows the ROUND-6 comparison convention.

    Scale shape: one corpus-sized explode + census; a census-sized
    top-k election (single ordered window over distinct tokens, said
    out loud); per-group cell rollup is (groups × vocab_k)-sized, and
    the pairwise join is over THAT frame — groups², never corpus².

    Output per unordered pair: ``group_a, group_b, jsd``.
    """
    if int(vocab_k) < 1:
        raise ValueError(f"jsd_matrix: vocab_k must be >= 1, got {vocab_k}")
    for c in (text_col, group_col):
        if c not in df.columns:
            raise ValueError(f"jsd_matrix: column {c!r} missing")
    from pyspark.sql import Window

    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).where(F.col("__t") != "")
    census = toks.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__c"))
    glob = census.groupBy("__t").agg(F.sum("__c").alias("__gc"))
    w = Window.orderBy(F.col("__gc").desc(), F.col("__t").asc())
    vocab = (
        glob.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(vocab_k))
        .select("__t")
    )
    tagged = census.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), "__t", "left"
    ).select(
        "__g",
        F.when(F.col("__in") == 1, F.col("__t")).otherwise(
            F.lit("__rest")
        ).alias("__cell"),
        "__c",
    )
    cells = tagged.groupBy("__g", "__cell").agg(F.sum("__c").alias("__c"))
    totals = cells.groupBy("__g").agg(F.sum("__c").alias("__n"))
    dist = cells.join(totals, "__g").select(
        "__g",
        "__cell",
        (F.col("__c").cast("double") / F.col("__n").cast("double")).alias(
            "__p"
        ),
    )
    # complete (group × cell) grid: the cell universe is top-V +
    # '__rest', so absent cells coalesce to probability 0 and every
    # pair compares the SAME vocab_k+1 cells
    cells_univ = vocab.select(F.col("__t").alias("__cell")).unionByName(
        vocab.sparkSession.createDataFrame([("__rest",)], "__cell string")
    )
    groups = dist.select(F.col("__g")).distinct()
    grid = groups.crossJoin(F.broadcast(cells_univ))
    full = grid.join(dist, ["__g", "__cell"], "left").select(
        "__g", "__cell", F.coalesce(F.col("__p"), F.lit(0.0)).alias("__p")
    )
    pa = full.select(
        F.col("__g").alias("group_a"), "__cell", F.col("__p").alias("__pa")
    )
    pb = full.select(
        F.col("__g").alias("group_b"), "__cell", F.col("__p").alias("__pb")
    )
    joined = pa.join(pb, "__cell").where(F.col("group_a") < F.col("group_b"))
    m = (F.col("__pa") + F.col("__pb")) / F.lit(2.0)

    def term(p):
        return F.when(p > 0, p * (F.log(p) - F.log(m))).otherwise(F.lit(0.0))

    return (
        joined.groupBy("group_a", "group_b")
        .agg(
            (
                F.sum(term(F.col("__pa")) + term(F.col("__pb")))
                / F.lit(2.0)
            ).alias("jsd")
        )
    )


# ---------------------------------------------------- feature hashing

def hashed_bow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
) -> DataFrame:
    """Feature hashing (the hashing trick — public: Weinberger et al.
    2009): each document's token counts land in a fixed-``dim``
    vector by hashing tokens to cells, no vocabulary table, no
    fitting, no driver state — the preprocessing that makes linear
    models and cheap similarity work at 10^12 docs where a fitted
    vocabulary cannot even be collected. Collisions are the accepted
    tax; dim trades them against memory.

    The bucket hash is md5-prefix arithmetic (``conv(substr(md5(t),
    1, 8), 16, 10) % dim``) — deliberately NOT xxhash64: md5 exists
    bit-identically in DuckDB/Python/everywhere, so the vectors are
    engine-replayable, the package's determinism contract for
    anything an oracle must rebuild.

    Output is LONG form — ``id, cell, weight`` (count per occupied
    cell) — the shape sparse consumers actually want; pivot to a
    dense array only at the model boundary. One explode + one
    (id, cell) groupBy; census-free, scales as a plain aggregation.
    """
    if int(dim) < 2:
        raise ValueError(f"hashed_bow: dim must be >= 2, got {dim}")
    for c in (text_col, id_col):
        if c not in df.columns:
            raise ValueError(f"hashed_bow: column {c!r} missing")
    toks = df.select(
        F.col(id_col).alias(id_col),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).where(F.col("__t") != "")
    cell = F.pmod(
        F.conv(F.substring(F.md5(F.col("__t")), 1, 8), 16, 10).cast("long"),
        F.lit(int(dim)),
    )
    return (
        toks.groupBy(id_col, cell.alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


# ---------------------------------------------------------- heaps fit

def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_points: int = 20,
) -> DataFrame:
    """Heaps'-law fit (public linguistics: V(N) ≈ K·N^β, β ~ 0.4-0.6
    for natural text): how the distinct vocabulary V grows with
    tokens ingested N, fitted by OLS on ln V vs ln N over an
    ``n_points`` document grid. The companion to zipf_fit: Zipf is
    the corpus's head at one instant, Heaps is its growth law — and
    the growth law is what sizes vocab tables, predicts dedup-index
    growth, and flags a scraper that started re-crawling (β
    collapsing toward 0 means new data brings no new words).

    Scale shape — deliberately WINDOW-FREE: the grid is ``n_points``
    exact percentiles of ``id_col`` (one aggregate); N_g at each
    grid point is a conditional token-count sum (one fused pass over
    per-doc counts); V_g is a conditional count over the FIRST-doc
    census (token → min doc id — one census groupBy), because a
    token is in the prefix vocabulary iff its first document is.
    Nothing sorts docs globally, nothing is corpus-row windowed.
    The OLS fold follows the zipf/corr ROUND-6 convention.

    Output (single row): ``n_points_used, total_tokens, vocab, beta,
    k_coef`` (NULL fit when fewer than 2 grid points carry tokens).
    """
    if int(n_points) < 2:
        raise ValueError(f"heaps_fit: n_points must be >= 2, got {n_points}")
    for c in (text_col, id_col):
        if c not in df.columns:
            raise ValueError(f"heaps_fit: column {c!r} missing")
    G = int(n_points)
    probs = ", ".join(repr(k / G) for k in range(1, G + 1))
    grid_row = df.agg(
        F.expr(f"percentile({id_col}, array({probs}))").alias("__grid")
    )
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    ).where(F.col("__t") != "")
    per_doc = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    first_doc = toks.groupBy("__t").agg(F.min("__id").alias("__fd"))

    def grid_sums(src: DataFrame, id_c: str, val: Column, tag: str):
        j = src.crossJoin(F.broadcast(grid_row))
        aggs = [
            F.sum(
                F.when(
                    F.col(id_c)
                    <= F.element_at(F.col("__grid"), g + 1),
                    val,
                )
            ).alias(f"__{tag}_{g}")
            for g in range(G)
        ]
        return j.agg(*aggs)

    n_row = grid_sums(per_doc, "__id", F.col("__n"), "N")
    v_row = grid_sums(first_doc, "__fd", F.lit(1), "V")
    both = n_row.crossJoin(v_row)
    pts = both.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"__N_{g}").cast("double").alias("N"),
                        F.col(f"__V_{g}").cast("double").alias("V"),
                    )
                    for g in range(G)
                ]
            )
        ).alias("__p")
    ).select("__p.N", "__p.V").where(
        F.col("N").isNotNull() & (F.col("N") > 0) & (F.col("V") > 0)
    )
    x = F.log(F.col("N"))
    y = F.log(F.col("V"))
    mo = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_points_used"),
        F.max("N").alias("__maxN"),
        F.max("V").alias("__maxV"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    k = F.col("n_points_used").cast("double")
    den = k * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    beta = F.when(
        (F.col("n_points_used") >= 2) & (den != 0),
        (k * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / den,
    )
    return mo.select(
        "n_points_used",
        F.col("__maxN").cast("long").alias("total_tokens"),
        F.col("__maxV").cast("long").alias("vocab"),
        beta.alias("beta"),
        F.when(
            beta.isNotNull(),
            F.exp((F.col("__sy") - beta * F.col("__sx")) / k),
        ).alias("k_coef"),
    )
