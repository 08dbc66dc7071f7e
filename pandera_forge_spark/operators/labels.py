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
