"""Training-label quality operators: conflict detection, majority
(golden) labels, and inter-annotator agreement.

The reference validates *schemas* (pandera-forge's inferred checks);
label QA extends the same distributed-assertion discipline to the
label columns a training-data pipeline carries: the questions "do two
sources disagree on the same example", "which label wins", and "how
far above chance do two annotators agree" — each as exact integer
aggregates + broadcast-sized pair frames, no Python UDFs, no
collect-and-loop.

Determinism contract (shared with the BM25 / rolling-zscore family):
every ratio is a SINGLE IEEE division of exact integer counts, so
both Spark and any replay engine produce bit-identical doubles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_clash(df: DataFrame, names: Sequence[str], op: str) -> None:
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input columns {clash} collide with output/internal "
            "names — rename them"
        )


def label_conflicts(
    df: DataFrame,
    key_cols: Sequence[str],
    label_col: str,
    max_labels: int = 64,
) -> DataFrame:
    """Examples carrying MORE THAN ONE distinct non-null label: the
    keys, the sorted distinct labels, how many, and how many rows.
    The cross-source contradiction check — a near-dup pair that
    survived dedup with opposite labels poisons training quietly.

    Mechanics: one hash groupBy on the keys; ``collect_set`` is
    bounded by the per-key distinct-label count, which the in-band
    ``max_labels`` fence caps LOUDLY (``raise_error`` inside the
    projection, no separate scan) — a free-text column mistakenly
    passed as ``label_col`` fails the job instead of buffering the
    corpus into one task. Map-side partial aggregation bounds the
    shuffle at O(distinct keys x labels), never O(rows)."""
    keys = list(key_cols)
    # only the KEYS survive the groupBy alongside the emitted columns
    _check_clash(df.select(*keys), ["labels", "n_labels", "n_rows"], "label_conflicts")
    agg = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(*keys)
        .agg(
            F.sort_array(F.collect_set(F.col(label_col))).alias("labels"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    n_labels = F.size(F.col("labels"))
    fence = F.when(
        n_labels > int(max_labels),
        F.raise_error(
            F.concat(
                F.lit(
                    f"label_conflicts: a key exceeds max_labels={max_labels} "
                    "distinct labels — is this really a label column? key="
                ),
                F.concat_ws("|", *[F.col(k).cast("string") for k in keys]),
            )
        ).cast("int"),
    ).otherwise(n_labels.cast("int"))
    return (
        agg.withColumn("n_labels", fence)
        .where(F.col("n_labels") > 1)
        .select(*keys, "labels", "n_labels", "n_rows")
    )


def majority_label(
    df: DataFrame,
    key_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """The modal non-null label per key (golden-label election):
    ``label`` (the winner — ties broken toward the LEXICOGRAPHICALLY
    SMALLEST label, deterministic on every engine), ``votes`` (its
    count), ``total`` (all non-null votes) and ``n_labels``.

    Mechanics: count per (key, label), then ONE algebraic struct-min —
    ``min(struct(-votes, label))`` IS "argmax votes, tie -> min label"
    — so the election partial-aggregates map-side; no window, no sort,
    no row_number. Two shuffles total ((key, label) then key), both
    bounded by distinct combinations."""
    keys = list(key_cols)
    # only the KEYS survive the groupBy alongside the emitted columns
    # (label_col itself may legitimately be named "label")
    _check_clash(
        df.select(*keys), ["label", "votes", "total", "n_labels"], "majority_label"
    )
    counts = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(*keys, F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    winner = F.min(
        F.struct((-F.col("votes")).alias("neg"), F.col("label").alias("lab"))
    )
    return (
        counts.groupBy(*keys)
        .agg(
            winner.alias("__w"),
            F.sum("votes").alias("total"),
            F.count(F.lit(1)).alias("n_labels"),
        )
        .select(
            *keys,
            F.col("__w.lab").alias("label"),
            (-F.col("__w.neg")).alias("votes"),
            "total",
            "n_labels",
        )
    )


def annotator_agreement(
    df: DataFrame,
    item_col: str,
    annotator_col: str,
    label_col: str,
) -> DataFrame:
    """Pairwise inter-annotator agreement over co-annotated items: for
    every annotator pair (a < b), ``n_items`` they both labeled,
    ``n_agree``, and Cohen's kappa — chance-corrected agreement, the
    standard label-quality gate before trusting a crowd-sourced set.

    Kappa is computed from EXACT integer counts in one division:
    ``kappa = (agree*n - sum_l na_l*nb_l) / (n*n - sum_l na_l*nb_l)``
    (multiply ``po = agree/n`` and ``pe = sum na*nb / n^2`` through by
    ``n^2``), where ``na_l``/``nb_l`` are each side's label marginals
    over the CO-ANNOTATED items. NULL when the denominator is zero
    (both annotators constant on the same label — kappa undefined).

    Mechanics: one self-equi-join on the item (each item contributes
    k*(k-1)/2 pairs, k = its annotators — never all-pairs across
    items), then three aggregates over the broadcast-sized
    (pair x label) frame. A duplicate (item, annotator) row would
    double-count silently, so the join input is counted per
    (item, annotator) with an in-band ``raise_error`` fence.
    Overflow bound (ANSI raises, never wraps): co-annotated items per
    pair < 2^31.5 keeps ``n*n`` inside a long."""
    # no collision fence needed: every internal frame is built from
    # explicit selects with fresh names, so no input column survives
    one = (
        df.where(F.col(label_col).isNotNull() & F.col(annotator_col).isNotNull())
        .groupBy(
            F.col(item_col).alias("__item"),
            F.col(annotator_col).alias("__ann"),
        )
        .agg(F.min(label_col).alias("__lab"), F.count(F.lit(1)).alias("__c"))
        .select(
            "__item",
            "__ann",
            F.when(
                F.col("__c") > 1,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "annotator_agreement: duplicate (item, annotator) "
                            "rows — resolve re-labels first (item="
                        ),
                        F.col("__item").cast("string"),
                        F.lit(")"),
                    )
                ).cast(dict(df.dtypes)[label_col]),
            )
            .otherwise(F.col("__lab"))
            .alias("__lab"),
        )
    )
    left = one.select(
        F.col("__item"),
        F.col("__ann").alias("ann_a"),
        F.col("__lab").alias("__lab_a"),
    )
    right = one.select(
        F.col("__item"),
        F.col("__ann").alias("ann_b"),
        F.col("__lab").alias("__lab_b"),
    )
    pairs = left.join(right, "__item").where(F.col("ann_a") < F.col("ann_b"))
    po = pairs.groupBy("ann_a", "ann_b").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (F.col("__lab_a") == F.col("__lab_b")).cast("long")
        ).alias("n_agree"),
    )
    marg_a = pairs.groupBy("ann_a", "ann_b", F.col("__lab_a").alias("__l")).agg(
        F.count(F.lit(1)).alias("__na")
    )
    marg_b = pairs.groupBy("ann_a", "ann_b", F.col("__lab_b").alias("__l")).agg(
        F.count(F.lit(1)).alias("__nb")
    )
    # inner join is exact: a label one side never used contributes
    # na*nb = 0 to the expected-agreement sum
    pe = (
        marg_a.join(marg_b, ["ann_a", "ann_b", "__l"])
        .groupBy("ann_a", "ann_b")
        .agg(F.sum(F.col("__na") * F.col("__nb")).alias("__nanb"))
    )
    # LEFT join + coalesce: a pair whose two annotators never used a
    # common label on shared items has an EMPTY marginal intersection
    # (no pe row at all) — an inner join would silently drop the pair
    # instead of reporting its kappa of 0
    out = po.join(pe, ["ann_a", "ann_b"], "left").withColumn(
        "__nanb", F.coalesce(F.col("__nanb"), F.lit(0).cast("long"))
    )
    num = F.col("n_agree") * F.col("n_items") - F.col("__nanb")
    den = F.col("n_items") * F.col("n_items") - F.col("__nanb")
    return out.select(
        "ann_a",
        "ann_b",
        "n_items",
        "n_agree",
        F.when(den != 0, num.cast("double") / den.cast("double")).alias("kappa"),
    )


def reliability_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Calibration (reliability-diagram) table for a probabilistic
    scorer against binary outcomes: per score bin, how many items,
    how many positives, and the confidence the scorer claimed — the
    audit that decides whether a quality classifier's 0.9 means 90%.
    A filter that keeps "score >= 0.8" documents silently shifts the
    corpus whenever the scorer is over-confident; the reliability
    table is how that drift is caught BEFORE the filter runs.

    Exact integer output: bin = least(floor(score*bins), bins-1)
    (IEEE multiply+floor, engine-reproducible; score exactly 1.0
    joins the top bin), n / n_pos are counts, conf_sum_micro is the
    sum of micro-quantized scores, and gap_micro =
    |n_pos*1e6 - conf_sum_micro| is n_b*|accuracy - confidence| in
    micro units — so ECE = sum(gap_micro) / (N*1e6) without a single
    engine-dependent division in the table itself. At 10^12 rows
    n_pos*1e6 <= 1e18 < 2^63: no overflow, no HUGEINT divergence.

    Scores must lie in [0, 1] and labels in {0, 1, true, false} —
    both fenced IN-BAND (raise_error in the expression tree, so a bad
    row fails the job loudly rather than skewing a bin). NULL score
    or label rows are excluded (they carry no calibration evidence).

    Scale shape: ONE groupBy on (groups x bins) — map-side partial,
    O(groups x bins) output rows, no window, no join, no UDF."""
    if int(bins) < 2:
        raise ValueError(f"reliability_table: bins must be >= 2, got {bins}")
    keys = list(group_cols)
    missing = [c for c in keys + [score_col, label_col] if c not in df.columns]
    if missing:
        raise ValueError(f"reliability_table: frame lacks columns {missing}")
    _check_clash(df, ["__rb", "__lab", "__sm"], "reliability_table")
    s = F.col(score_col).cast("double")
    bad_score = F.isnan(s) | (s < 0.0) | (s > 1.0)
    rb = F.when(s.isNull(), F.lit(None).cast("long")).when(
        bad_score,
        F.raise_error(
            F.concat(
                F.lit("reliability_table: score outside [0, 1] in column "),
                F.lit(score_col),
                F.lit(" (value "),
                s.cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(
        F.least(
            F.floor(s * F.lit(float(int(bins)))).cast("long"),
            F.lit(int(bins) - 1),
        )
    )
    lab_raw = F.col(label_col).cast("long")
    lab = F.when(F.col(label_col).isNull(), F.lit(None).cast("long")).when(
        ~lab_raw.isin(0, 1),
        F.raise_error(
            F.concat(
                F.lit("reliability_table: non-binary label in column "),
                F.lit(label_col),
                F.lit(" (value "),
                F.col(label_col).cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(lab_raw)
    base = (
        df.withColumn("__rb", rb)
        .withColumn("__lab", lab)
        .withColumn("__sm", F.floor(s * F.lit(1000000.0)).cast("long"))
        .where(F.col("__rb").isNotNull() & F.col("__lab").isNotNull())
    )
    out = base.groupBy(*keys, F.col("__rb").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__lab").alias("n_pos"),
        F.sum("__sm").alias("conf_sum_micro"),
    )
    return out.withColumn(
        "gap_micro",
        F.abs(F.col("n_pos") * F.lit(1000000) - F.col("conf_sum_micro")),
    )


def expected_calibration_error(
    table: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Fold a :func:`reliability_table` into ECE per group: ONE
    O(bins)-row aggregate, ece = sum(gap_micro) / (n_total * 1e6)
    through a single IEEE division at the very end."""
    keys = list(group_cols)
    missing = [
        c for c in keys + ["n", "gap_micro"] if c not in table.columns
    ]
    if missing:
        raise ValueError(
            f"expected_calibration_error: frame lacks columns {missing} — "
            "pass reliability_table output"
        )
    aggs = [
        F.sum("n").alias("n_total"),
        F.sum("gap_micro").alias("gap_sum_micro"),
    ]
    folded = table.groupBy(*keys).agg(*aggs) if keys else table.agg(*aggs)
    return folded.withColumn(
        "ece",
        F.col("gap_sum_micro").cast("double")
        / (F.col("n_total").cast("double") * F.lit(1000000.0)),
    )


def weighted_majority_label(
    df: DataFrame,
    item_col: str,
    annotator_col: str,
    label_col: str,
    min_overlap: int = 1,
) -> DataFrame:
    """Reliability-weighted label election — one exact fixed-point
    step of the Dawid-Skene idea (public methodology) kept entirely
    in integers: round 1 elects the plain majority per item
    (:func:`majority_label`); each annotator's WEIGHT is then the
    count of items where they agreed with that majority; round 2
    re-elects each item's label with votes weighted by annotator
    reliability. A spammer who labels everything "ok" wins ties under
    one-annotator-one-vote; under agreement weighting their weight
    collapses and the careful annotators' consensus stands.

    Weight = agreement COUNT, not rate — a deliberate, documented
    choice: counts keep the entire election in exact BIGINT algebra
    (rates would force per-annotator divisions whose sums no engine
    reproduces bit-identically), and they encode volume — an
    annotator right 90 times carries more evidence than one right 9
    of 10. ``min_overlap`` floors how many majority-comparable items
    an annotator needs before earning any weight (below it they vote
    with weight 0 — present, counted in totals, uninfluential).

    Ties break to the lexicographically smallest label via the same
    struct-min election as round 1. Output per item: ``label``
    (weighted winner), ``weight`` (its weighted votes),
    ``weight_total`` (all weighted votes on the item), ``n_voters``,
    and ``changed`` (did weighting flip the unweighted verdict?).

    Scale shape: two (item, label)-bounded groupBys, one
    (annotator)-bounded groupBy, two broadcast-or-hash equi-joins —
    every frame after the first count is bounded by distinct
    (item, label) / annotator cardinality, never raw votes. No
    window, no UDF, no collect."""
    for c in [item_col, annotator_col, label_col]:
        if c not in df.columns:
            raise ValueError(
                f"weighted_majority_label: frame lacks column {c!r}"
            )
    if int(min_overlap) < 1:
        raise ValueError(
            f"weighted_majority_label: min_overlap must be >= 1, got {min_overlap}"
        )
    _check_clash(
        df.select(item_col, annotator_col),
        ["label", "weight", "weight_total", "n_voters", "changed"],
        "weighted_majority_label",
    )
    votes = df.where(F.col(label_col).isNotNull()).select(
        F.col(item_col).alias("__item"),
        F.col(annotator_col).alias("__ann"),
        F.col(label_col).alias("label"),
    )
    maj = majority_label(votes, ["__item"], "label").select(
        "__item", F.col("label").alias("__maj")
    )
    # annotator reliability: agreements with the round-1 majority
    rel = (
        votes.join(maj, "__item")
        .groupBy("__ann")
        .agg(
            F.sum(
                (F.col("label") == F.col("__maj")).cast("long")
            ).alias("__agree"),
            F.count(F.lit(1)).alias("__seen"),
        )
        .select(
            "__ann",
            F.when(F.col("__seen") >= int(min_overlap), F.col("__agree"))
            .otherwise(F.lit(0))
            .alias("__w"),
        )
    )
    weighted = (
        votes.join(rel, "__ann")
        .groupBy(F.col("__item"), F.col("label"))
        .agg(
            F.sum("__w").alias("__wv"),
            F.count(F.lit(1)).alias("__nv"),
        )
    )
    winner = F.min(
        F.struct((-F.col("__wv")).alias("neg"), F.col("label").alias("lab"))
    )
    out = (
        weighted.groupBy("__item")
        .agg(
            winner.alias("__win"),
            F.sum("__wv").alias("weight_total"),
            F.sum("__nv").alias("n_voters"),
        )
        .select(
            "__item",
            F.col("__win.lab").alias("label"),
            (-F.col("__win.neg")).alias("weight"),
            "weight_total",
            "n_voters",
        )
    )
    return (
        out.join(maj, "__item")
        .select(
            F.col("__item").alias(item_col),
            "label",
            "weight",
            "weight_total",
            "n_voters",
            (F.col("label") != F.col("__maj")).alias("changed"),
        )
    )


# ------------------------------------------------- krippendorff alpha

def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    ann_col: str,
    label_col: str,
) -> DataFrame:
    """Krippendorff's alpha, nominal metric (public: Krippendorff,
    Content Analysis — the coincidence-matrix formulation). Unlike
    pairwise Cohen's kappa (annotator_agreement), alpha handles ANY
    number of raters with MISSING ratings in one number, which is what
    a real labeling fleet produces: overlapping three-way passes where
    most items get 2 of 5 annotators.

    Math, reduced to distributed aggregations: items with m_u >= 2
    ratings contribute; with n_uc = ratings of category c on item u,
    the coincidence diagonal is ``Σ_u Σ_c n_uc·(n_uc-1)/(m_u-1)``, the
    category marginals are plain totals ``n_c = Σ_u n_uc`` (exact
    integers — the per-item division cancels in the marginal), and

        D_o = (n - Σ_c o_cc) / n
        D_e = (n² - Σ_c n_c²) / (n·(n-1))
        alpha = 1 - D_o / D_e

    Everything is exact-integer except the per-item ``/(m_u-1)``
    halves/thirds; with <= 3 raters per item the divisor is a power of
    two, so even that is exact in doubles (the planted-fixture case is
    bit-deterministic; round at 6 for the general case).

    Scale shape: one (item,label) hash groupBy, one per-item rollup,
    then two scalar aggregates (global moments, per-category totals)
    joined as 1-row broadcast frames — nothing driver-side, nothing
    proportional to items beyond the two groupBys. Degenerate inputs
    (no pairable items, or D_e = 0 because every rating in the whole
    pool is one category) report NULL alpha loudly rather than 1.0.

    Output (single row): ``n_items, n_ratings, d_o, d_e, alpha``.
    """
    for c in (item_col, ann_col, label_col):
        if c not in df.columns:
            raise ValueError(f"krippendorff_alpha: column {c!r} missing")
    per_cell = df.groupBy(
        F.col(item_col).alias("__item"), F.col(label_col).alias("__lab")
    ).agg(F.count(F.lit(1)).alias("__nuc"))
    per_item = per_cell.groupBy("__item").agg(
        F.sum("__nuc").alias("__mu"),
        F.sum(F.col("__nuc") * (F.col("__nuc") - 1)).alias("__diag_num"),
    ).where(F.col("__mu") >= 2)
    moments = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("__mu").cast("long").alias("n_ratings"),
        F.sum(
            F.col("__diag_num").cast("double")
            / (F.col("__mu") - 1).cast("double")
        ).alias("__sum_diag"),
    )
    marg = (
        per_cell.join(per_item.select("__item"), "__item", "left_semi")
        .groupBy("__lab")
        .agg(F.sum("__nuc").alias("__nc"))
        .agg(F.sum(F.col("__nc") * F.col("__nc")).cast("long").alias("__sum_nc2"))
    )
    n = F.col("n_ratings").cast("double")
    d_o = F.when(n > 0, (n - F.col("__sum_diag")) / n)
    d_e = F.when(
        F.col("n_ratings") >= 2,
        (n * n - F.col("__sum_nc2").cast("double")) / (n * (n - 1)),
    )
    return (
        moments.crossJoin(F.broadcast(marg))
        .select(
            "n_items",
            "n_ratings",
            d_o.alias("d_o"),
            d_e.alias("d_e"),
            F.when(d_e != 0, F.lit(1.0) - d_o / d_e).alias("alpha"),
        )
    )


# ------------------------------------------------------- exact AUC

def auc_score(
    df: DataFrame,
    score_col: str,
    label_pred,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney U identity
    (public): with average ranks r_i of the scores (ties shared),

        AUC = (Σ_{i∈pos} r_i − n_pos·(n_pos+1)/2) / (n_pos·n_neg)

    — the probability a random positive outranks a random negative,
    which is THE threshold-free answer to "does this quality score /
    retrieval score / classifier actually rank the good ones first".
    Computed exactly: no sampling, no curve discretization.

    Distributed ranks without a global sort (the spearman_matrix
    construction): the per-group VALUE CENSUS of scores gets
    cumulative offsets via a census-sized ordered window, average
    rank = offset + (tie_count+1)/2 rides back on a value join, and
    one fold per group sums positive ranks. Ranks are exact binary
    halves; their sums stay exact below 2^53 (≈9e15 — a 10^8-row
    group's rank sum is ~5e15, the edge of exactness, said out
    loud; callers round at 6 regardless).

    NULL scores are dropped; ``label_pred`` is any Boolean Column
    (NULL counts as negative). Groups with no positives or no
    negatives report NULL auc, loudly, next to their counts.

    Output per group: ``group_cols..., n_pos, n_neg, auc``.
    """
    if score_col not in df.columns:
        raise ValueError(f"auc_score: column {score_col!r} missing")
    for c in group_cols:
        if c not in df.columns:
            raise ValueError(f"auc_score: group column {c!r} missing")
    from pyspark.sql import Window

    gcols = list(group_cols)
    base = df.where(F.col(score_col).isNotNull()).select(
        *[F.col(c) for c in gcols],
        F.col(score_col).alias("__v"),
        F.coalesce(label_pred, F.lit(False)).cast("int").alias("__pos"),
    )
    census = base.groupBy(*gcols, "__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__pos").alias("__np"),
    )
    wc = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy(
        F.col("__v").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = census.withColumn("__cum", F.sum("__cnt").over(wc)).withColumn(
        "__r",
        (F.col("__cum") - F.col("__cnt")).cast("double")
        + (F.col("__cnt").cast("double") + 1.0) / 2.0,
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__np").cast("long").alias("n_pos"),
        (F.sum("__cnt") - F.sum("__np")).cast("long").alias("n_neg"),
        F.sum(F.col("__np").cast("double") * F.col("__r")).alias("__rpos"),
    )
    np_d = F.col("n_pos").cast("double")
    nn_d = F.col("n_neg").cast("double")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("__rpos") - np_d * (np_d + 1.0) / 2.0) / (np_d * nn_d),
    )
    return agg.select(*gcols, "n_pos", "n_neg", auc.alias("auc"))


# ------------------------------------------------------- lift table

def lift_table(
    df: DataFrame,
    score_col: str,
    label_pred,
    n_bins: int = 10,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Decile lift and cumulative-gain table: rows ranked by score
    DESCENDING, cut into ``n_bins`` equal-population bins, and per
    bin the positive rate, its LIFT over the base rate, and the
    cumulative share of all positives captured so far — the "if we
    act on the top k% how much do we catch" curve behind every triage
    queue (review the top decile of PII-risk scores, audit the top
    5% of anomaly scores). AUC says whether the ranking works; the
    lift table says what a budget buys.

    Determinism with ties, said out loud: the score VALUE CENSUS
    (not per-row ranks) drives the cut — each tie group is atomic and
    lands in the bin of its midpoint position (``ceil(mid·bins/N)``
    with the −1e-9 float-boundary guard), so heavy ties make bins
    UNEVEN rather than splitting a value across bins
    nondeterministically; the emitted ``n`` per bin is the honest
    population. Census-offset construction as in auc_score — no
    global per-row sort.

    Output per (group, bin): ``group_cols..., bin, n, positives,
    rate, lift, cum_n, cum_positives, cum_gain`` (single divisions
    over exact integers — raw doubles, no rounding convention
    needed).
    """
    if int(n_bins) < 2:
        raise ValueError(f"lift_table: n_bins must be >= 2, got {n_bins}")
    if score_col not in df.columns:
        raise ValueError(f"lift_table: column {score_col!r} missing")
    for c in group_cols:
        if c not in df.columns:
            raise ValueError(f"lift_table: group column {c!r} missing")
    from pyspark.sql import Window

    gcols = list(group_cols)
    nb = int(n_bins)
    base = df.where(F.col(score_col).isNotNull()).select(
        *[F.col(c) for c in gcols],
        F.col(score_col).alias("__v"),
        F.coalesce(label_pred, F.lit(False)).cast("long").alias("__pos"),
    )
    census = base.groupBy(*gcols, "__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__pos").alias("__np"),
    )
    wc = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy(
        F.col("__v").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wsz = Window.partitionBy(*[F.col(c) for c in gcols])
    keyed = (
        census.withColumn("__cum", F.sum("__cnt").over(wc))
        .withColumn("__N", F.sum("__cnt").over(wsz))
        .withColumn("__P", F.sum("__np").over(wsz))
    )
    mid = (F.col("__cum") - F.col("__cnt")).cast("double") + (
        F.col("__cnt").cast("double") + 1.0
    ) / 2.0
    bin_ = F.least(
        F.ceil(
            mid * F.lit(float(nb)) / F.col("__N").cast("double") - F.lit(1e-9)
        ).cast("int"),
        F.lit(nb),
    )
    bins = keyed.groupBy(*gcols, bin_.alias("bin")).agg(
        F.sum("__cnt").cast("long").alias("n"),
        F.sum("__np").cast("long").alias("positives"),
        F.max("__N").cast("long").alias("__N"),
        F.max("__P").cast("long").alias("__P"),
    )
    wb = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy(
        F.col("bin").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        bins.withColumn("cum_n", F.sum("n").over(wb).cast("long"))
        .withColumn("cum_positives", F.sum("positives").over(wb).cast("long"))
    )
    rate = F.col("positives").cast("double") / F.col("n").cast("double")
    overall = F.col("__P").cast("double") / F.col("__N").cast("double")
    return out.select(
        *gcols,
        "bin",
        "n",
        "positives",
        rate.alias("rate"),
        F.when(F.col("__P") > 0, rate / overall).alias("lift"),
        "cum_n",
        "cum_positives",
        F.when(
            F.col("__P") > 0,
            F.col("cum_positives").cast("double") / F.col("__P").cast("double"),
        ).alias("cum_gain"),
    )


# --------------------------------------------------------- PR curve

def pr_curve(
    df: DataFrame,
    score_col: str,
    label_pred,
    n_points: int = 20,
) -> DataFrame:
    """Precision-recall table at a fixed operating grid: the score
    axis is cut at ``n_points`` equal-population thresholds (census
    ranks, the auc/lift construction — no global per-row sort), and
    each grid point reports the confusion counts and P/R/F1 of the
    rule "flag everything scoring at or above this threshold".
    AUC ranks, lift budgets, the PR table OPERATES — it is the
    artifact a reviewer reads to pick the production threshold, and
    at 20 points it is dashboard-sized no matter how many rows fed
    it.

    Per grid point g (1..n_points): the threshold is the score at
    census position ``ceil(g·N/n_points)`` from the TOP (tie groups
    atomic, same midpoint discipline as lift_table), tp/fp are the
    cumulative positive/negative counts at or above it, fn = P − tp.
    All exact integers; P/R/F1 are single divisions (raw doubles).
    Degenerate slices (no positives) report NULL precision-recall,
    loudly.

    Output: ``point, threshold, tp, fp, fn, precision, recall, f1``.
    """
    if int(n_points) < 2:
        raise ValueError(f"pr_curve: n_points must be >= 2, got {n_points}")
    if score_col not in df.columns:
        raise ValueError(f"pr_curve: column {score_col!r} missing")
    from pyspark.sql import Window

    npts = int(n_points)
    base = df.where(F.col(score_col).isNotNull()).select(
        F.col(score_col).alias("__v"),
        F.coalesce(label_pred, F.lit(False)).cast("long").alias("__pos"),
    )
    census = base.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum("__pos").alias("__np"),
    )
    wc = Window.orderBy(F.col("__v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    keyed = (
        census.withColumn("__cum", F.sum("__cnt").over(wc))
        .withColumn("__cpos", F.sum("__np").over(wc))
        .crossJoin(
            F.broadcast(
                census.agg(
                    F.sum("__cnt").alias("__N"), F.sum("__np").alias("__P")
                )
            )
        )
    )
    pts = keyed.select(
        "*",
        F.explode(F.sequence(F.lit(1), F.lit(npts))).alias("point"),
    ).withColumn(
        "__target",
        F.ceil(
            F.col("point").cast("double")
            * F.col("__N").cast("double")
            / F.lit(float(npts))
            - F.lit(1e-9)
        ).cast("long"),
    )
    # the grid point's census row: the FIRST row whose cumulative
    # count reaches the target position
    hit = pts.where(
        (F.col("__cum") >= F.col("__target"))
        & (F.col("__cum") - F.col("__cnt") < F.col("__target"))
    )
    tp = F.col("__cpos").cast("double")
    fp = (F.col("__cum") - F.col("__cpos")).cast("double")
    fn = (F.col("__P") - F.col("__cpos")).cast("double")
    prec = F.when(F.col("__cum") > 0, tp / (tp + fp))
    rec = F.when(F.col("__P") > 0, tp / F.col("__P").cast("double"))
    return hit.select(
        "point",
        F.col("__v").alias("threshold"),
        F.col("__cpos").cast("long").alias("tp"),
        (F.col("__cum") - F.col("__cpos")).cast("long").alias("fp"),
        (F.col("__P") - F.col("__cpos")).cast("long").alias("fn"),
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
            F.lit(2.0) * prec * rec / (prec + rec),
        ).alias("f1"),
    ).orderBy("point")


# ------------------------------------------------- cronbach's alpha

def cronbach_alpha(df: DataFrame, item_cols) -> DataFrame:
    """Cronbach's alpha (public: Cronbach 1951): internal consistency
    of k parallel measurements of one construct,

        alpha = k/(k−1) · (1 − Σ_i var(x_i) / var(Σ_i x_i))

    — the "are these sub-scores measuring the same thing" number. In
    a data pipeline it reads on composite quality scores (length /
    stopword / punctuation sub-scores claiming one 'quality'
    construct), on redundant sensor channels, and on embedding
    dimensions suspected of collapse: alpha near 1 means the items
    are interchangeable (and the composite is stable), near 0 means
    the composite is averaging unrelated noise.

    One fused aggregation pass: exact moment sums per item plus the
    row-sum moments (the row sum is one fixed-order expression).
    Population variances (the /n form). Listwise NULL drop — an
    item missing on a row removes the row, so every variance sees
    identical rows. Degenerate inputs (zero total variance, n < 2)
    report NULL alpha loudly.

    Output (single row): ``n_rows, k_items, sum_item_var, total_var,
    alpha`` (float sums over rows — callers round at 6).
    """
    item_cols = list(item_cols)
    if len(item_cols) < 2:
        raise ValueError("cronbach_alpha: need at least 2 item columns")
    for c in item_cols:
        if c not in df.columns:
            raise ValueError(f"cronbach_alpha: column {c!r} missing")
    k = len(item_cols)
    base = df.na.drop(subset=item_cols)
    total = None
    for c in item_cols:
        v = F.col(c).cast("double")
        total = v if total is None else total + v
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in item_cols:
        v = F.col(c).cast("double")
        aggs.append(F.sum(v).alias(f"__s_{c}"))
        aggs.append(F.sum(v * v).alias(f"__ss_{c}"))
    aggs.append(F.sum(total).alias("__st"))
    aggs.append(F.sum(total * total).alias("__sst"))
    mo = base.agg(*aggs)
    n = F.col("n_rows").cast("double")
    item_var = None
    for c in item_cols:
        vi = F.col(f"__ss_{c}") / n - (F.col(f"__s_{c}") / n) * (
            F.col(f"__s_{c}") / n
        )
        item_var = vi if item_var is None else item_var + vi
    tot_var = F.col("__sst") / n - (F.col("__st") / n) * (F.col("__st") / n)
    return mo.select(
        "n_rows",
        F.lit(k).alias("k_items"),
        item_var.alias("sum_item_var"),
        tot_var.alias("total_var"),
        F.when(
            (F.col("n_rows") >= 2) & (tot_var > 0),
            F.lit(float(k) / (k - 1)) * (F.lit(1.0) - item_var / tot_var),
        ).alias("alpha"),
    )


# -------------------------------------------------- return labels

def label_will_return(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    cutoff,
    horizon_seconds: int,
) -> DataFrame:
    """Leakage-disciplined churn/return label construction: for every
    unit ACTIVE BEFORE the cutoff, ``label = 1`` iff it has any event
    in ``(cutoff, cutoff + horizon]``. The two rules that make such a
    label trainable rather than leaky are enforced structurally:
    only pre-cutoff units are emitted (a unit born inside the label
    window is not a "return", it is a new arrival the model could
    never have seen), and nothing after ``cutoff + horizon`` is
    consulted (an open-ended "ever returns" label changes meaning
    every time the table grows). Feature columns join on the unit
    from a separate strictly-pre-cutoff aggregation — this operator
    deliberately emits the label frame alone, so the time boundary
    between features and labels is a join key, not a convention.

    One fused per-unit aggregation with conditional counts; all
    boundary comparisons are half-open exactly as written above.
    Output per pre-cutoff-active unit: ``unit, n_before,
    last_ts_before, n_in_window, label``.
    """
    if int(horizon_seconds) < 1:
        raise ValueError(
            f"label_will_return: horizon_seconds must be >= 1, got {horizon_seconds}"
        )
    for c in (unit_col, ts_col):
        if c not in df.columns:
            raise ValueError(f"label_will_return: column {c!r} missing")
    cut = F.lit(cutoff).cast("timestamp")
    end = F.timestamp_seconds(
        F.unix_timestamp(cut) + F.lit(int(horizon_seconds))
    )
    t = F.col(ts_col)
    agg = df.groupBy(F.col(unit_col)).agg(
        F.sum((t < cut).cast("long")).alias("n_before"),
        F.max(F.when(t < cut, t)).alias("last_ts_before"),
        F.sum(((t > cut) & (t <= end)).cast("long")).alias("n_in_window"),
    )
    return agg.where(F.col("n_before") > 0).select(
        unit_col,
        "n_before",
        "last_ts_before",
        "n_in_window",
        (F.col("n_in_window") > 0).cast("int").alias("label"),
    )
