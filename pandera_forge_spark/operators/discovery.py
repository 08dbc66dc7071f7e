"""Join-key discovery: find candidate foreign-key / join columns across
a set of tables by distinct-value overlap.

The reference infers per-column constraints from one frame at a time
(reference: generators/base_generator.py); a lakehouse catalog also
needs the CROSS-table question "which columns join?" before any RI
check (``validator.ri_violations``) can even be configured. This
operator answers it with set containment — the classic inclusion-
dependency / Jaccard profile (public textbook material, cf. Bauckmann
et al.'s SPIDER and the Aurum/Sherlock data-discovery line):

    containment(a ⊆ b) = |distinct(a) ∩ distinct(b)| / |distinct(a)|

Plan shape (all JVM-side, no UDFs, no collect):

1. per column: ``distinct()`` of the value cast to string — map-side
   partial aggregation collapses each scan partition before ONE shuffle
   per column; the string cast makes int/bigint/decimal widths of the
   same key value identical across tables.
2. ``unionByName`` melts the per-column distinct frames into
   ``(table, column, value)``.
3. ONE self-join shuffle on ``value``: every group holds at most one
   row PER CANDIDATE COLUMN, so the per-value fanout is bounded by
   C(n_columns, 2) — a constant chosen by the caller, never data-sized.
   No skew is possible by construction: the hottest join key in the
   data still contributes exactly one row per column here.
4. pair counts join the (n_columns)-row distinct-count frame twice
   (broadcast) to derive containment / jaccard.

At 100 TB the dominant cost is step 1's per-column distinct — inherent
to exact containment. For an estimate-first pass over thousands of
columns, sketch each column with ``sketches.theta_sketch`` /
``hll_sketch`` instead and intersect sketches; this module is the exact
verifier you run on the survivors.

Float/double columns are excluded by default (equality joins on floats
are a data-modeling bug, and their string casts are representation-
sensitive); pass ``cols`` explicitly to override.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EXCLUDED_TYPES = ("float", "double")


def _candidate_cols(df: DataFrame, requested: Optional[Sequence[str]]) -> list[str]:
    dtypes = dict(df.dtypes)
    if requested is not None:
        missing = [c for c in requested if c not in dtypes]
        if missing:
            raise ValueError(f"join_key_candidates: columns {missing} missing")
        bad = [c for c in requested if dtypes[c].startswith("array")
               or dtypes[c].startswith("struct") or dtypes[c].startswith("map")]
        if bad:
            raise ValueError(
                f"join_key_candidates: nested columns {bad} cannot be join keys"
            )
        return list(requested)
    return [
        c
        for c, t in df.dtypes
        if t not in _EXCLUDED_TYPES
        and not (t.startswith("array") or t.startswith("struct") or t.startswith("map"))
    ]


def column_value_sets(
    tables: Mapping[str, DataFrame],
    cols: Optional[Mapping[str, Sequence[str]]] = None,
) -> DataFrame:
    """Melted distinct-value frame: (tbl, col, value:string), one row
    per distinct non-NULL value per candidate column. NULLs are not
    join-key values (an equi-join never matches them) and are dropped.
    """
    if not tables:
        raise ValueError("column_value_sets: need at least one table")
    melted = []
    for tname, df in tables.items():
        for c in _candidate_cols(df, cols.get(tname) if cols else None):
            melted.append(
                df.select(F.col(c).cast("string").alias("value"))
                .where(F.col("value").isNotNull())
                .distinct()
                .select(
                    F.lit(tname).alias("tbl"),
                    F.lit(c).alias("col"),
                    F.col("value"),
                )
            )
    if not melted:
        raise ValueError("column_value_sets: no candidate columns survived")
    return reduce(lambda a, b: a.unionByName(b), melted)


def join_key_candidates(
    tables: Mapping[str, DataFrame],
    cols: Optional[Mapping[str, Sequence[str]]] = None,
    min_containment: float = 0.9,
    min_overlap: int = 1,
    eager: bool = True,
) -> DataFrame:
    """Candidate join pairs across ``tables``: one row per unordered
    column pair with

    (table_a, col_a, table_b, col_b, distinct_a, distinct_b, overlap,
     containment, jaccard)

    where ``containment = overlap / min(distinct_a, distinct_b)`` (the
    inclusion coefficient — 1.0 means the smaller side is a subset, the
    FK direction being the smaller-distinct side) and pairs below
    ``min_containment`` or ``min_overlap`` are dropped. Within-table
    pairs are reported too (self-FKs are real). The pair is ordered
    lexicographically by (table, column) so each pair appears once.

    Ratios are emitted as raw IEEE divisions of exact longs — bit-equal
    across engines, no rounding step to diverge on.

    With ``eager=True`` (default) the melted distinct frame is persisted,
    the audit-sized result is materialized (``localCheckpoint``) inside
    the call, and the cache is released — two consumers (pair join +
    count frame) share ONE distinct pass. ``eager=False`` returns the
    pure lazy plan instead (melted recomputed per consumer) for plan
    inspection or when the caller manages caching itself.
    """
    if not 0.0 <= min_containment <= 1.0:
        raise ValueError(
            f"min_containment must be in [0, 1], got {min_containment}"
        )
    melted = column_value_sets(tables, cols)
    if eager:
        melted = melted.persist()
    try:
        counts = melted.groupBy("tbl", "col").agg(
            F.count(F.lit(1)).alias("n_distinct")
        )
        a = melted.select(
            F.col("tbl").alias("table_a"),
            F.col("col").alias("col_a"),
            "value",
        )
        b = melted.select(
            F.col("tbl").alias("table_b"),
            F.col("col").alias("col_b"),
            "value",
        )
        pairs = (
            a.join(b, "value")
            .where(
                (F.col("table_a") < F.col("table_b"))
                | (
                    (F.col("table_a") == F.col("table_b"))
                    & (F.col("col_a") < F.col("col_b"))
                )
            )
            .groupBy("table_a", "col_a", "table_b", "col_b")
            .agg(F.count(F.lit(1)).alias("overlap"))
        )
        ca = counts.select(
            F.col("tbl").alias("table_a"),
            F.col("col").alias("col_a"),
            F.col("n_distinct").alias("distinct_a"),
        )
        cb = counts.select(
            F.col("tbl").alias("table_b"),
            F.col("col").alias("col_b"),
            F.col("n_distinct").alias("distinct_b"),
        )
        out = (
            pairs.join(F.broadcast(ca), ["table_a", "col_a"])
            .join(F.broadcast(cb), ["table_b", "col_b"])
            .withColumn(
                "containment",
                F.col("overlap") / F.least("distinct_a", "distinct_b"),
            )
            .withColumn(
                "jaccard",
                F.col("overlap")
                / (F.col("distinct_a") + F.col("distinct_b") - F.col("overlap")),
            )
            .where(
                (F.col("containment") >= min_containment)
                & (F.col("overlap") >= min_overlap)
            )
            .select(
                "table_a", "col_a", "table_b", "col_b",
                "distinct_a", "distinct_b", "overlap",
                "containment", "jaccard",
            )
        )
        if eager:
            # Materialize before unpersisting the melted frame it reads.
            out = out.localCheckpoint(eager=True)
    finally:
        if eager:
            melted.unpersist()
    return out
