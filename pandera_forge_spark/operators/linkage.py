"""Edit-distance record linkage: blocked fuzzy joins on short keys.

The operator a training-data pipeline needs when the join key itself is
dirty — entity names, titles, product codes, author strings — and an
exact equi-join silently drops every row with a one-character typo.
``fuzzy_pairs`` (self-dedup) and ``fuzzy_join`` (two-table linkage)
return every pair within a Levenshtein distance bound, EXACTLY, without
an O(n²) cross join.

Blocking is the symmetric-delete scheme (public algorithm, known from
the SymSpell spell-checker): every string is expanded to the set of
variants reachable by deleting at most ``max_distance`` characters, and
candidate pairs are pairs sharing ANY variant. The guarantee is
lossless: if ``lev(s, t) <= d``, an optimal alignment turns each of the
``d`` edits into at most one deletion on each side (a substitution
deletes one char from both, an insert deletes one from ``t``, a delete
one from ``s``), so some common string lies in both delete
neighborhoods and the pair is generated. Candidates are then verified
with the engine's native ``levenshtein`` (threshold form — early exit
above the bound), so false candidates cost one bounded string scan and
emit nothing.

100-TB shape: a narrow projection explodes each key into
``O(len^max_distance)`` variants (len+1 at d=1; ~len²/2 at d=2), one
hash-partitioned equi-join on the variant string, one distinct, one
verify filter — all JVM-side, zero Python UDFs, no cross join anywhere.
The explode factor is the cost knob, which is why this operator is for
SHORT KEYS (names, codes — not document text; near-dup text is
``operators/dedup``'s banded MinHash): ``max_key_length`` fences the
blow-up loudly instead of letting a 10-KB outlier key generate 50M
variants inside one task. Variant-block skew (many rows sharing one
variant) is ordinary join-key skew, handled by AQE skew splitting like
every other join in this engine.

No reference counterpart: pandera-forge validates single tables; this
extends the dedup/RI family (SURVEY.md §2 J1-J2) to approximate keys,
per the training-data-pipeline mandate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F


def _deletions(v: Column) -> Column:
    """All strings obtained by deleting exactly one character of ``v``
    (empty array for the empty string — Spark's ``sequence(1, 0)``
    would otherwise count DOWN and fabricate indices)."""
    one_each = F.transform(
        F.sequence(F.lit(1), F.length(v)),
        lambda i: F.concat(
            F.substr(v, F.lit(1), i - F.lit(1)),
            F.substr(v, i + F.lit(1), F.length(v)),
        ),
    )
    return F.when(F.length(v) > 0, one_each).otherwise(
        F.array().cast("array<string>")
    )


def delete_variants(key: Column, max_distance: int) -> Column:
    """The delete-neighborhood of ``key``: every string reachable by
    deleting 0..``max_distance`` characters, deduplicated. Size is
    1 at d=0, len+1 at d=1, ~len²/2 at d=2 — pure column algebra
    (nested ``transform``/``flatten``), evaluated row-local inside
    whole-stage codegen."""
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    vars_col = F.array(key)
    for _ in range(max_distance):
        vars_col = F.array_distinct(
            F.concat(vars_col, F.flatten(F.transform(vars_col, _deletions)))
        )
    return vars_col


def _keyed(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_distance: int,
    max_key_length: int,
    side: str,
) -> DataFrame:
    """(variant, id, key) candidate frame: null keys dropped (a null
    key matches nothing — documented, not sprayed into the '' block),
    over-long keys refused loudly BEFORE the explode multiplies them.

    The length fence is IN-BAND (``raise_error`` inside the key
    projection) rather than a driver-side probe: a ``limit(1)`` probe
    with no offender is a full extra scan per side, eagerly, at
    DataFrame-construction time — two spare full-corpus jobs per call
    at the module's advertised scale. In-band, the guard rides the one
    real scan for free and fires at action time with the same message."""
    key = F.col(key_col)
    if max_key_length is not None:
        # null-safe: a null condition would fall into the otherwise
        # branch and raise on rows the isNotNull filter drops anyway
        key = F.when(
            key.isNull() | (F.length(key) <= max_key_length), key
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "fuzzy join key exceeds "
                        f"max_key_length={max_key_length} (the delete "
                        f"neighborhood is O(len^{max_distance})) — link "
                        "on a short key, or raise max_key_length "
                        "deliberately; offending key starts: "
                    ),
                    F.substring(F.col(key_col), 1, 40),
                )
            )
        )
    base = df.where(F.col(key_col).isNotNull()).select(
        F.col(id_col).alias(f"id_{side}"), key.alias(f"key_{side}")
    )
    return base.select(
        F.explode(
            delete_variants(F.col(f"key_{side}"), max_distance)
        ).alias("__variant"),
        f"id_{side}",
        f"key_{side}",
    )


def fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_distance: int = 1,
    max_key_length: Optional[int] = 64,
) -> DataFrame:
    """Every unordered pair of rows whose ``key_col`` values are within
    Levenshtein distance ``max_distance`` — exact (the symmetric-delete
    block is lossless, see module docstring), one equi-join, no cross
    join. Returns (id_a, id_b, key_a, key_b, distance) with
    ``id_a < id_b``."""
    keyed_a = _keyed(df, key_col, id_col, max_distance, max_key_length, "a")
    keyed_b = _keyed(df, key_col, id_col, max_distance, max_key_length, "b")
    cand = (
        keyed_a.join(keyed_b, "__variant")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "key_a", "key_b")
        # a pair sharing k variants arrives k times; dedup BEFORE the
        # verify so levenshtein runs once per pair, not once per block
        .distinct()
    )
    return _verify(cand, max_distance)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    id_col: str,
    right_key_col: Optional[str] = None,
    right_id_col: Optional[str] = None,
    max_distance: int = 1,
    max_key_length: Optional[int] = 64,
) -> DataFrame:
    """Two-table linkage: every (left row, right row) pair whose keys
    are within ``max_distance`` edits. Returns (id_a, key_a from left;
    id_b, key_b from right; distance). Same lossless blocking as
    ``fuzzy_pairs``; both sides pay their own explode and meet in one
    shuffle on the variant string."""
    keyed_a = _keyed(
        left, key_col, id_col, max_distance, max_key_length, "a"
    )
    keyed_b = _keyed(
        right,
        right_key_col or key_col,
        right_id_col or id_col,
        max_distance,
        max_key_length,
        "b",
    )
    cand = (
        keyed_a.join(keyed_b, "__variant")
        .select("id_a", "id_b", "key_a", "key_b")
        .distinct()
    )
    return _verify(cand, max_distance)


def _verify(cand: DataFrame, max_distance: int) -> DataFrame:
    """Exact Levenshtein verify over the candidate pairs. Uses the
    thresholded engine form (returns -1 past the bound without
    finishing the DP table) and casts to bigint so oracles compare
    type-identically."""
    return (
        cand.withColumn(
            "distance",
            F.levenshtein("key_a", "key_b", int(max_distance)),
        )
        .where(F.col("distance") >= 0)
        .withColumn("distance", F.col("distance").cast("bigint"))
    )


def best_match_pairs(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str,
    mutual: bool = True,
) -> DataFrame:
    """Reduce a scored candidate-pair frame (the output of
    ``fuzzy_pairs``/``fuzzy_join``, a k-NN join, or any blocking stage)
    to each entity's single best match — and, with ``mutual=True``
    (the default), to RECIPROCAL best matches only: pairs where each
    side is the other's top-1. Mutual top-1 is the classic
    high-precision linkage rule (embedding alignment, dedup canonical
    picking): a hub record that is "everyone's best match" survives at
    most once, as the one pair it reciprocates.

    Returns (left_col, right_col, score_col). Ties on score break to
    the SMALLEST partner id (total order → deterministic, engine-
    reproducible). Rows with a NULL id on either side or a NULL score
    are ignored — a match needs two identities and a comparable score.
    NaN scores rank above all finite scores in Spark's ordering; feed
    finite scores.

    Plan: two algebraic aggregations (``min`` of a (negated-score,
    partner-id) struct — partial-aggregates map-side, so a hot entity
    with millions of candidates collapses inside the scan) plus one
    equi-join of the two one-row-per-entity frames on the (left, right)
    pair. No window over the raw pairs, no sort of the candidate set,
    never O(candidates²)."""
    for c in [left_col, right_col, score_col]:
        if c not in pairs.columns:
            raise ValueError(f"best_match_pairs: column {c!r} missing")
    clean = pairs.where(
        F.col(left_col).isNotNull()
        & F.col(right_col).isNotNull()
        & F.col(score_col).isNotNull()
    )

    def top1(group_col: str, partner_col: str) -> DataFrame:
        best = F.min(
            F.struct(
                (-F.col(score_col).cast("double")).alias("__ns"),
                F.col(partner_col).alias("__p"),
            )
        ).alias("__best")
        return clean.groupBy(group_col).agg(best).select(
            F.col(group_col),
            F.col("__best.__p").alias(partner_col),
            (-F.col("__best.__ns")).alias(score_col),
        )

    best_l = top1(left_col, right_col)
    if not mutual:
        return best_l
    best_r = top1(right_col, left_col).select(left_col, right_col)
    return best_l.join(best_r, [left_col, right_col], "inner").select(
        left_col, right_col, score_col
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 5,
    prefix_len: int = 2,
    max_distance: Optional[int] = None,
) -> DataFrame:
    """The OTHER classic blocking strategy: sorted-neighborhood (SNM,
    Hernández & Stolfo 1995). Sort the corpus by a normalized key and
    pair every row with its ``window`` predecessors in that GLOBAL
    order — near-duplicates cluster under any reasonable sort key, so
    O(n·w) candidate pairs replace O(n²). Complements the symmetric-
    delete block (``fuzzy_pairs``): deletes guarantee recall within an
    edit bound but blow up on long keys; SNM is linear in key length
    and catches prefix-preserving variants at ANY edit distance, at the
    cost of missing first-character typos (mitigate with a second pass
    on the reversed key). ``max_distance`` adds the same thresholded
    levenshtein verify; without it the raw neighbor pairs return for
    caller-side scoring.

    EXACT global-window semantics, bounded tasks — not the usual
    per-partition approximation: rows chunk on the key's
    ``prefix_len``-char prefix (equal keys share a chunk, prefix order
    == key order), each row takes up to ``window`` predecessors from a
    per-chunk lag ladder, and a chunk's first rows patch from a carry
    of the last ``window`` rows across earlier chunks. Because every
    non-empty chunk contributes at least one row, those last ``window``
    global predecessors always lie within the previous ``window``
    non-empty chunks — so the carry is a bounded
    ``rowsBetween(-window, -1)`` flatten over the O(chunks) summary
    frame (w² structs max), never an unbounded scan. The summary window
    is a single task of O(chunks) rows; everything row-proportional
    is hash-distributed by prefix. A hot prefix is one chunk's sort —
    external, slow-not-OOM, and narrowed by raising ``prefix_len``.

    Each unordered pair emits ONCE, attributed to the later row:
    ``(key_a, id_a)`` precedes ``(key_b, id_b)`` in (key, id) order.
    NULL keys sort first and pair among themselves/the earliest rows —
    filter them upstream if that is noise. ``id_col`` must be unique
    (pair identity); ties on key break by id, so the order is total.

    Returns (key_a, id_a, key_b, id_b [, distance])."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if window > 64:
        raise ValueError(
            f"window={window}: the lag ladder materializes `window` "
            "expressions per row and the carry w² structs per chunk — "
            "SNM windows beyond ~10 add recall only via weaker sort "
            "keys; use a second sort pass instead"
        )
    if prefix_len < 1:
        raise ValueError(f"prefix_len must be >= 1, got {prefix_len}")
    for c in ("__chunk", "__rnd", "__cands", "__carry", "__tail", "__me"):
        if c in df.columns:
            raise ValueError(
                f"sorted_neighborhood_pairs: input column {c!r} collides "
                "with an internal working name — rename it"
            )
    from pyspark.sql import Window as W

    key = F.col(key_col)
    base = df.select(
        key.alias("__k"),
        F.col(id_col).alias("__i"),
        F.coalesce(F.substring(key, 1, prefix_len), F.lit("")).alias("__chunk"),
    )
    worder = [F.col("__k"), F.col("__i")]
    wc = W.partitionBy("__chunk").orderBy(*worder)
    # oldest-first lag ladder; nulls (start-of-chunk) form a prefix and
    # compact away
    lags = F.array_compact(
        F.array(
            *[
                F.lag(F.struct(F.col("__k"), F.col("__i")), i).over(wc)
                for i in range(window, 0, -1)
            ]
        )
    )
    rows = base.withColumn("__cands", lags)
    # per-chunk tail: last `window` rows, ascending
    wd = W.partitionBy("__chunk").orderBy(F.desc("__k"), F.desc("__i"))
    tails = (
        base.withColumn("__rnd", F.row_number().over(wd))
        .where(F.col("__rnd") <= window)
        .groupBy("__chunk")
        .agg(F.array_sort(F.collect_list(F.struct("__k", "__i"))).alias("__tail"))
    )
    # carry-in = last `window` rows among ALL earlier chunks == within
    # the previous `window` non-empty chunks (each contributes >= 1 row)
    ws = W.orderBy("__chunk").rowsBetween(-window, -1)
    gathered = F.array_sort(F.flatten(F.collect_list("__tail").over(ws)))
    carry = F.when(
        F.size(gathered) > window, F.slice(gathered, -window, window)
    ).otherwise(gathered)  # slice(-w) on a shorter array returns EMPTY
    summ = tails.select("__chunk", carry.alias("__carry"))
    joined = rows.join(summ, "__chunk", "left")
    # last `window` of (carry ++ in-chunk predecessors); in-chunk lags
    # are the nearest, so when they already number `window` the slice
    # keeps exactly them
    both = F.concat(F.coalesce(F.col("__carry"), F.array()), F.col("__cands"))
    cands = F.when(
        F.size(both) > window, F.slice(both, -window, window)
    ).otherwise(both)
    out = (
        joined.select(
            F.col("__k").alias("key_b"),
            F.col("__i").alias("id_b"),
            F.explode(cands).alias("__me"),
        )
        .select(
            F.col("__me.__k").alias("key_a"),
            F.col("__me.__i").alias("id_a"),
            "key_b",
            "id_b",
        )
    )
    if max_distance is None:
        return out
    return (
        out.withColumn(
            "distance", F.levenshtein("key_a", "key_b", int(max_distance))
        )
        .where(F.col("distance") >= 0)
        .withColumn("distance", F.col("distance").cast("bigint"))
    )


def value_variants(
    df: DataFrame,
    col: str,
    max_distance: int = 1,
    min_count: int = 1,
    max_value_length: Optional[int] = 64,
    max_iter: int = 15,
    checkpoint_dir: Optional[str] = None,
    eager: bool = True,
) -> DataFrame:
    """Value-standardization audit (the OpenRefine "cluster & edit"
    primitive, distributed): find groups of DISTINCT values of ``col``
    within ``max_distance`` edits of each other — misspellings, case
    slips, truncations of one intended value — and elect each group's
    canonical form (the highest-frequency member, ties to the
    lexicographically smallest). Returns the CORRECTION MAPPING, one
    row per clustered value::

        (value, n_rows, canonical, canonical_rows, cluster_size,
         cluster_rows)

    — join it back on ``value`` and ``coalesce(canonical, value)`` is
    the repaired column. Values in no cluster (nothing within
    ``max_distance``) are absent: a singleton needs no standardizing.

    Pipeline (every stage an existing audited kernel):

    1. ``groupBy(col)`` count — the ONLY shuffle over raw rows; from
       here everything is O(distinct values). ``min_count`` prunes
       hapax noise BEFORE pair generation.
    2. :func:`fuzzy_pairs` over the distinct-value frame (value is its
       own id) — lossless symmetric-delete blocking, never a cross
       join; ``max_value_length`` is its loud explode fence.
    3. ``dedup.pairs_to_clusters`` min-label propagation — A~B and B~C
       standardize together even when A~C exceeds the distance (the
       truncation and the suffix typo of one word are distance 2 apart
       but share their canonical); ``checkpoint_dir`` passes through
       for the fault-tolerant lineage-truncation mode.
    4. canonical per cluster as ONE algebraic ``min(struct(-count,
       value))`` — the ``majority_label`` argmax idiom, map-side
       combinable, no window over members.

    NULL values never cluster (dropped with the count pass).
    ``eager=True`` persists the distinct-count frame across its three
    consumers (pair generation uses it twice, the mapping join once)
    and localCheckpoints the audit-sized result; ``eager=False``
    returns the pure lazy plan for inspection."""
    if col not in df.columns:
        raise ValueError(f"value_variants: column {col!r} missing")
    if min_count < 1:
        raise ValueError(f"value_variants: min_count must be >= 1, got {min_count}")
    counts = (
        df.select(F.col(col).cast("string").alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") >= int(min_count))
    )
    if eager:
        counts = counts.persist()
    try:
        pairs = fuzzy_pairs(
            counts,
            key_col="value",
            id_col="value",
            max_distance=max_distance,
            max_key_length=max_value_length,
        )
        from pandera_forge_spark.operators.dedup import pairs_to_clusters

        clusters = pairs_to_clusters(
            pairs, max_iter=max_iter, checkpoint_dir=checkpoint_dir
        )
        mem = clusters.withColumnRenamed("id", "value").join(counts, "value")
        canon = mem.groupBy("cluster_id").agg(
            F.min(F.struct((-F.col("n_rows")).alias("neg"), F.col("value"))).alias(
                "__c"
            ),
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum("n_rows").alias("cluster_rows"),
        )
        out = (
            mem.join(canon, "cluster_id")
            .select(
                "value",
                "n_rows",
                F.col("__c.value").alias("canonical"),
                (-F.col("__c.neg")).alias("canonical_rows"),
                "cluster_size",
                "cluster_rows",
            )
        )
        if eager:
            out = out.localCheckpoint(eager=True)
    finally:
        if eager:
            counts.unpersist()
    return out


def blocking_quality(
    candidates: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_records: Optional[int] = None,
    n_left: Optional[int] = None,
    n_right: Optional[int] = None,
) -> DataFrame:
    """Score a BLOCKING scheme against labeled truth: pairs
    completeness (what fraction of true matches survive blocking) and
    reduction ratio (what fraction of the all-pairs quadratic work the
    blocks avoided) — the two numbers every record-linkage /
    dedup-candidate strategy is tuned by (Christen's standard metrics,
    public methodology). A blocker that drops true matches poisons the
    downstream dedup silently; one that barely reduces the pair space
    *works* at sf0.01 and melts at 100 TB. Both failure modes are one
    cheap audit away when a labeled sample exists.

    Inputs are two pair frames (``id_a``/``id_b`` columns): the
    candidate pairs a blocker emitted and the ground-truth match
    pairs. Pairs are normalized (least/greatest) so orientation and
    duplicates never skew counts. Pass ``n_records`` for a self-dedup
    blocker (possible pairs = n(n-1)/2) or ``n_left``+``n_right`` for
    two-table linkage (n_left*n_right) — counts the caller knows
    without another scan.

    Output is ONE row of exact longs — n_candidates, n_truth,
    n_found, n_possible — plus ``pairs_completeness`` and
    ``reduction_ratio`` as single IEEE divisions of those longs.

    Scale shape: two distincts and one equi-join on the normalized
    pair key, each hash-partitioned on (lo, hi) — truth samples are
    small in practice and broadcast under AQE; nothing here scales
    with corpus size, only with candidate volume, which is the very
    thing being measured."""
    if (n_records is None) == (n_left is None and n_right is None):
        raise ValueError(
            "blocking_quality: pass exactly one of n_records "
            "(self-dedup) or n_left+n_right (two-table linkage)"
        )
    if n_records is not None:
        if int(n_records) < 2:
            raise ValueError(
                f"blocking_quality: n_records must be >= 2, got {n_records}"
            )
        n_possible = int(n_records) * (int(n_records) - 1) // 2
    else:
        if n_left is None or n_right is None:
            raise ValueError(
                "blocking_quality: two-table mode needs BOTH n_left and n_right"
            )
        if int(n_left) < 1 or int(n_right) < 1:
            raise ValueError(
                "blocking_quality: n_left and n_right must be >= 1, got "
                f"{n_left}, {n_right}"
            )
        n_possible = int(n_left) * int(n_right)
    for side, frame in (("candidates", candidates), ("truth", truth)):
        missing = [c for c in (id_a, id_b) if c not in frame.columns]
        if missing:
            raise ValueError(
                f"blocking_quality: {side} frame lacks columns {missing}"
            )

    def _norm(frame: DataFrame) -> DataFrame:
        a, b = F.col(id_a), F.col(id_b)
        return (
            frame.where(a.isNotNull() & b.isNotNull() & (a != b))
            .select(
                F.least(a, b).alias("__lo"), F.greatest(a, b).alias("__hi")
            )
            .distinct()
        )

    cand = _norm(candidates)
    tru = _norm(truth)
    found = cand.join(tru, ["__lo", "__hi"], "inner")
    counted = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(
            F.broadcast(tru.agg(F.count(F.lit(1)).alias("n_truth")))
        )
        .crossJoin(
            F.broadcast(found.agg(F.count(F.lit(1)).alias("n_found")))
        )
    )
    return counted.select(
        "n_candidates",
        "n_truth",
        "n_found",
        F.lit(n_possible).cast("long").alias("n_possible"),
        F.when(
            F.col("n_truth") > 0,
            F.col("n_found").cast("double") / F.col("n_truth").cast("double"),
        ).alias("pairs_completeness"),
        (
            F.lit(1.0)
            - F.col("n_candidates").cast("double") / F.lit(float(n_possible))
        ).alias("reduction_ratio"),
    )


# --------------------------------------------- fellegi-sunter weights

def fs_u_probabilities(df: DataFrame, cols) -> DataFrame:
    """u-probabilities for Fellegi-Sunter record linkage (public:
    Fellegi & Sunter 1969): per field, the probability that two
    RANDOM records agree — ``u_f = Σ_v n_v·(n_v-1) / (N·(N-1))``
    over the field's value frequencies, N = non-null count (exact
    without-replacement form; the "chance agreement" denominator of
    every match weight). Estimating u from the data itself is the
    standard move — no labels needed; m (agreement among true
    matches) comes from a clerical sample or a planted-dup set and
    stays a caller-supplied constant.

    Scale shape: one hash groupBy per field over the value census
    (map-side partials, census-sized results), folded to ONE output
    row with a ``u_<field>`` column per field — ready to broadcast
    onto a pair frame. Integer-exact numerators and denominators,
    one division per field.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("fs_u_probabilities: cols must be non-empty")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"fs_u_probabilities: column {c!r} missing")
    out = None
    for c in cols:
        cen = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(c))
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.sum(F.col("__n") * (F.col("__n") - 1)).alias("__num"),
                F.sum("__n").alias("__N"),
            )
            .select(
                (
                    F.col("__num").cast("double")
                    / (
                        F.col("__N").cast("double")
                        * (F.col("__N") - 1).cast("double")
                    )
                ).alias(f"u_{c}")
            )
        )
        out = cen if out is None else out.crossJoin(cen)
    return out


def fs_score_pairs(
    pairs: DataFrame,
    agree_cols,
    m: dict,
    u_row: DataFrame,
    out_col: str = "fs_weight",
) -> DataFrame:
    """Fellegi-Sunter match weight per candidate pair:
    ``Σ_f γ_f·log2(m_f/u_f) + (1-γ_f)·log2((1-m_f)/(1-u_f))`` where
    γ_f are the pair's Boolean agreement indicators (NULL counts as
    disagreement — an unverifiable field should penalise, not
    abstain), m_f are caller-supplied match-agreement rates, and u_f
    ride in from :func:`fs_u_probabilities`'s one-row frame via a
    broadcast crossJoin. Positive total ⇒ the pair agrees on enough
    low-chance fields to outweigh its disagreements — the classic
    linkage decision score, here as one pure-projection expression
    (log2 of data-derived u, so callers round for cross-engine
    comparison).

    Scale shape: 1-row broadcast + a narrow map over the pair frame
    — no shuffle beyond whatever produced the candidates.
    """
    agree_cols = list(agree_cols)
    if not agree_cols:
        raise ValueError("fs_score_pairs: agree_cols must be non-empty")
    for c in agree_cols:
        if c not in pairs.columns:
            raise ValueError(f"fs_score_pairs: column {c!r} missing")
        if c not in m:
            raise ValueError(f"fs_score_pairs: m probability for {c!r} missing")
        if not (0.0 < float(m[c]) < 1.0):
            raise ValueError(
                f"fs_score_pairs: m[{c!r}] must be in (0, 1), got {m[c]}"
            )
    if out_col in pairs.columns:
        raise ValueError(
            f"fs_score_pairs: output column {out_col!r} already exists"
        )
    w = None
    for c in agree_cols:
        mf = F.lit(float(m[c]))
        uf = F.col(f"u_{c}")
        g = F.coalesce(F.col(c), F.lit(False))
        term = F.when(g, F.log2(mf / uf)).otherwise(
            F.log2((F.lit(1.0) - mf) / (F.lit(1.0) - uf))
        )
        w = term if w is None else w + term
    scored = pairs.crossJoin(F.broadcast(u_row)).withColumn(out_col, w)
    return scored.drop(*[f"u_{c}" for c in agree_cols])
