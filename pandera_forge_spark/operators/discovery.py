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


def _candidate_cols(
    df: DataFrame,
    requested: Optional[Sequence[str]],
    op: str = "join_key_candidates",
) -> list[str]:
    dtypes = dict(df.dtypes)
    if requested is not None:
        missing = [c for c in requested if c not in dtypes]
        if missing:
            raise ValueError(f"{op}: columns {missing} missing")
        bad = [c for c in requested if dtypes[c].startswith("array")
               or dtypes[c].startswith("struct") or dtypes[c].startswith("map")]
        if bad:
            raise ValueError(
                f"{op}: nested columns {bad} cannot be join keys"
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


def candidate_keys(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    max_arity: int = 2,
    max_combos: int = 20,
    screen: Optional[float] = None,
) -> DataFrame:
    """Within-table candidate-KEY discovery: for every column combination
    up to ``max_arity``, exact uniqueness stats and a key verdict — the
    profiling step that runs BEFORE ``validator.duplicate_keys`` /
    ``uniqueness`` checks can even be configured (the within-table
    complement of :func:`join_key_candidates`; the reference infers a
    ``unique`` flag for single columns only, one at a time —
    reference: generators/spark/spark_field_analyzer.py:44).

    One row per combination::

        (key_cols, arity, n_rows, n_nonnull, n_distinct, n_dup_rows,
         uniqueness, is_unique, is_key)

    - ``key_cols``: comma-joined column names (a scalar string — the
      proven cross-engine hashing shape).
    - ``n_nonnull``: rows where EVERY combo column is non-NULL — SQL's
      UNIQUE constraint ignores rows with any NULL component, and a
      primary key forbids them, so NULL-component tuples count toward
      neither distinctness nor duplication.
    - ``n_dup_rows``: non-null rows whose tuple occurs more than once.
    - ``uniqueness`` = n_distinct / n_nonnull — ONE raw IEEE division of
      exact longs (NULL when n_nonnull = 0), bit-equal across engines.
    - ``is_unique``: no duplicated tuple AND at least one non-null tuple
      (an empty or all-NULL combo is vacuously NOT unique — it certifies
      nothing).
    - ``is_key`` = is_unique AND n_nonnull = n_rows AND n_rows > 0 (a
      key additionally forbids NULLs).

    Plan shape: each combination costs ONE ``groupBy(combo)`` shuffle
    whose second stage aggregates the O(distinct tuples) group-count
    frame algebraically (count / sum / conditional sum — map-side
    partials end to end; the ``l_diversity_violations`` two-stage
    discipline, never a COUNT(DISTINCT) Expand which would replicate
    every raw row per combination). ``n_rows`` comes from one shared
    1-row aggregate crossJoined back (broadcast — the stats-frame
    idiom). The per-combo shuffle cost is the honest price of EXACT
    verdicts; ``max_combos`` fences it loudly.

    ``screen`` (e.g. ``0.9``): estimate-first prune — ONE extra fused
    scan computes ``approx_count_distinct(struct(combo))`` for ALL
    combinations at once (HLL++, algebraic, no Expand) and only
    combinations whose approx distinct/row ratio reaches the threshold
    proceed to the exact phase; the rest are dropped from the output.
    HLL error (default rsd 5%) means the threshold needs slack — pick
    ``screen <= 0.9`` to never prune a true key. The screen decision is
    deterministic in Spark but not replayable by a SQL oracle, so
    driver-verified rows use ``screen=None`` (exact everything).
    """
    if max_arity < 1:
        raise ValueError(f"candidate_keys: max_arity must be >= 1, got {max_arity}")
    if max_combos < 1:
        raise ValueError(f"candidate_keys: max_combos must be >= 1, got {max_combos}")
    if screen is not None and not 0.0 < screen <= 1.0:
        raise ValueError(f"candidate_keys: screen must be in (0, 1], got {screen}")
    base_cols = _candidate_cols(df, cols, op="candidate_keys")
    if len(set(base_cols)) != len(base_cols):
        dupes = sorted({c for c in base_cols if base_cols.count(c) > 1})
        raise ValueError(f"candidate_keys: duplicate columns {dupes}")
    if not base_cols:
        raise ValueError("candidate_keys: no candidate columns survived")

    from itertools import combinations

    combos: list[tuple[str, ...]] = []
    for arity in range(1, min(max_arity, len(base_cols)) + 1):
        combos.extend(combinations(base_cols, arity))
    if len(combos) > max_combos:
        raise ValueError(
            f"candidate_keys: {len(combos)} combinations exceed max_combos="
            f"{max_combos} (each costs one shuffle at table scale) — pass a "
            "narrower cols list, lower max_arity, or raise max_combos "
            "deliberately"
        )

    if screen is not None:
        approx = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.approx_count_distinct(F.struct(*c)).alias(f"__d{i}")
                for i, c in enumerate(combos)
            ],
        ).collect()[0]
        n = approx["__n"]
        combos = [
            c
            for i, c in enumerate(combos)
            if n == 0 or approx[f"__d{i}"] >= screen * n
        ]

    totals = df.agg(F.count(F.lit(1)).alias("n_rows"))
    parts = []
    for combo in combos:
        nonnull = df
        for c in combo:
            nonnull = nonnull.where(F.col(c).isNotNull())
        one = (
            nonnull.groupBy(*[F.col(c) for c in combo])
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.count(F.lit(1)).alias("n_distinct"),
                F.coalesce(F.sum("__c"), F.lit(0).cast("long")).alias("n_nonnull"),
                F.coalesce(
                    F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)),
                    F.lit(0).cast("long"),
                ).alias("n_dup_rows"),
            )
            .crossJoin(F.broadcast(totals))
            .select(
                F.lit(",".join(combo)).alias("key_cols"),
                F.lit(len(combo)).alias("arity"),
                "n_rows",
                "n_nonnull",
                "n_distinct",
                "n_dup_rows",
                F.when(
                    F.col("n_nonnull") > 0,
                    F.col("n_distinct") / F.col("n_nonnull"),
                ).alias("uniqueness"),
                ((F.col("n_dup_rows") == 0) & (F.col("n_nonnull") > 0)).alias(
                    "is_unique"
                ),
                (
                    (F.col("n_dup_rows") == 0)
                    & (F.col("n_nonnull") > 0)
                    & (F.col("n_nonnull") == F.col("n_rows"))
                ).alias("is_key"),
            )
        )
        parts.append(one)
    if not parts:
        raise ValueError(
            "candidate_keys: the screen pruned every combination — lower "
            "screen or pass screen=None for the exact path"
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


_NUMERIC_PREFIXES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "decimal",
)
_TEMPORAL_PREFIXES = ("date", "timestamp")


def _order_family(dtype: str) -> Optional[str]:
    if dtype.startswith(_NUMERIC_PREFIXES):
        return "numeric"
    if dtype.startswith(_TEMPORAL_PREFIXES):
        return "temporal"
    return None


def order_dependencies(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    min_support: int = 100,
    max_violation_ratio: float = 0.0,
    include_rejected: bool = False,
    max_pairs: int = 500,
) -> DataFrame:
    """Cross-column ORDER-dependency mining: which pairs of comparable
    columns satisfy ``lhs <= rhs`` on (almost) every row where both are
    present? The reference infers only PER-column bounds
    (reference: generators/base_generator.py ge/le checks); the natural
    next constraint class is the pairwise inequality — ship_date <=
    receipt_date, start <= end, discount <= price — the classic order
    dependency of the FD-discovery literature (public material, cf.
    Szlichta et al., "Discovering Order Dependencies", VLDB). A pair
    that HOLDS becomes a row-level check (``checks.from_predicates``);
    a pair that holds at 0.999 is a dirty-data finding with the
    violating remainder countable by the same predicate.

    Candidates pair only within a comparability family — numerics with
    numerics, date/timestamp with date/timestamp (temporal operands are
    compared as-is; Spark and the SQL oracle both promote date vs
    timestamp identically) — never string/binary (lexicographic order
    dependencies on strings are locale bait, and the reference never
    orders strings either). Floats are fine here: ORDER on floats is
    well-defined even though equality-JOINing them (join_key_candidates
    above) is not.

    Output, one row per DIRECTED candidate (both directions of every
    pair): ``lhs, rhs, n_both, n_violations, violation_ratio, n_eq,
    verdict`` — verdict ``holds`` (support met, ratio within
    ``max_violation_ratio``), ``rejected``, or ``no_support``
    (n_both < min_support). ``include_rejected=False`` (default)
    returns only ``holds`` rows. ``n_eq`` distinguishes the degenerate
    always-equal pair (both directions hold) from a strict order.

    Scale shape: ONE scan, ONE fused global aggregate — 3 counters per
    unordered pair (lt/eq/gt over both-non-null rows), all map-side
    partially aggregated, so the shuffle is a single 1-row frame no
    matter the table size; the directed melt explodes literals from
    that 1-row frame driver-free. O(p^2) counter growth is fenced
    LOUDLY by ``max_pairs`` (default 500 = 32 comparable columns)
    before any job runs — at 100 TB you screen wide tables down with
    ``cols=`` rather than paying a 10k-counter codegen stage blind."""
    dtypes = dict(df.dtypes)
    if cols is not None:
        missing = [c for c in cols if c not in dtypes]
        if missing:
            raise ValueError(f"order_dependencies: frame lacks columns {missing}")
        cand = list(cols)
        for c in cand:
            if _order_family(dtypes[c]) is None:
                raise ValueError(
                    f"order_dependencies: column {c!r} has non-orderable "
                    f"type {dtypes[c]!r} (numeric and date/timestamp only)"
                )
    else:
        cand = [c for c in df.columns if _order_family(dtypes[c]) is not None]
    if int(min_support) < 1:
        raise ValueError(
            f"order_dependencies: min_support must be >= 1, got {min_support}"
        )
    pairs = [
        (a, b)
        for i, a in enumerate(cand)
        for b in cand[i + 1 :]
        if _order_family(dtypes[a]) == _order_family(dtypes[b])
    ]
    if not pairs:
        raise ValueError(
            "order_dependencies: no comparable column pair (need >= 2 "
            "columns of the same family among "
            f"{cand!r})"
        )
    if len(pairs) > int(max_pairs):
        raise ValueError(
            f"order_dependencies: {len(pairs)} candidate pairs exceed "
            f"max_pairs={max_pairs} — pass cols= to screen, or raise the "
            "fence deliberately"
        )
    exprs = []
    for i, (a, b) in enumerate(pairs):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        exprs.append(
            F.coalesce(
                F.sum(F.when(both & (F.col(a) < F.col(b)), 1)), F.lit(0)
            )
            .cast("long")
            .alias(f"__lt_{i}")
        )
        exprs.append(
            F.coalesce(
                F.sum(F.when(both & (F.col(a) == F.col(b)), 1)), F.lit(0)
            )
            .cast("long")
            .alias(f"__eq_{i}")
        )
        exprs.append(
            F.coalesce(
                F.sum(F.when(both & (F.col(a) > F.col(b)), 1)), F.lit(0)
            )
            .cast("long")
            .alias(f"__gt_{i}")
        )
    stats = df.agg(*exprs)
    directed = []
    for i, (a, b) in enumerate(pairs):
        lt, eq, gt = F.col(f"__lt_{i}"), F.col(f"__eq_{i}"), F.col(f"__gt_{i}")
        n_both = (lt + eq + gt).cast("long")
        for lhs, rhs, viol in ((a, b, gt), (b, a, lt)):
            directed.append(
                F.struct(
                    F.lit(lhs).alias("lhs"),
                    F.lit(rhs).alias("rhs"),
                    n_both.alias("n_both"),
                    viol.cast("long").alias("n_violations"),
                    eq.cast("long").alias("n_eq"),
                )
            )
    melted = stats.select(
        F.explode(F.array(*directed)).alias("s")
    ).select("s.*")
    ratio = F.when(
        F.col("n_both") > 0, F.col("n_violations") / F.col("n_both")
    )
    verdict = (
        F.when(F.col("n_both") < int(min_support), F.lit("no_support"))
        .when(
            F.col("n_violations") <= float(max_violation_ratio) * F.col("n_both"),
            F.lit("holds"),
        )
        .otherwise(F.lit("rejected"))
    )
    out = melted.select(
        "lhs",
        "rhs",
        "n_both",
        "n_violations",
        ratio.alias("violation_ratio"),
        "n_eq",
        verdict.alias("verdict"),
    )
    if not include_rejected:
        out = out.where(F.col("verdict") == "holds")
    return out


def overlap_census(
    frames: Mapping[str, DataFrame],
    col: Optional[str] = None,
    cols: Optional[Mapping[str, str]] = None,
    max_sources: int = 8,
) -> DataFrame:
    """Exact multi-source Venn census: how do 2..``max_sources``
    catalogs' value sets for one column actually overlap — not
    pairwise containment (``join_key_candidates``) or a sketch
    estimate (``sketches.kmv_overlap``) but the full combination
    breakdown ("2.1M user_ids in all three systems, 40k only in CRM,
    9 only in billing"), which is the migration/reconciliation
    question pairwise numbers cannot answer (three pairwise overlaps
    are consistent with MANY different triple intersections).

    Mechanics: each source's DISTINCT values (cast to string, the
    cross-width normalization `join_key_candidates` uses) tag with
    that source's bit; one union + ONE groupBy(value) sums the
    distinct powers of two into an exact membership mask; one
    O(2^n_sources) rollup counts values per combination. Per-value
    fanout is bounded by n_sources by construction — no skew possible.
    Output: ``sources`` (comma-joined names, sorted), ``n_sources``,
    ``n_values``; combinations with zero values emit no row.

    Same float caveat as ``join_key_candidates``: string casts of
    float/double are representation-sensitive — equality census on
    floats is a modeling bug; this refuses them unless you pass the
    column through ``cols`` deliberately after thinking."""
    names = sorted(frames)
    if len(names) < 2:
        raise ValueError("overlap_census: need at least 2 sources")
    if len(names) > int(max_sources):
        raise ValueError(
            f"overlap_census: {len(names)} sources exceed max_sources="
            f"{max_sources} (output is O(2^n)) — raise the fence "
            "deliberately"
        )
    if (col is None) == (cols is None):
        raise ValueError(
            "overlap_census: pass exactly one of col= (same name "
            "everywhere) or cols= (per-source mapping)"
        )
    colmap = dict(cols) if cols is not None else {n: col for n in names}
    missing = [n for n in names if n not in colmap]
    if missing:
        raise ValueError(f"overlap_census: cols lacks sources {missing}")
    parts = []
    for i, n in enumerate(names):
        c = colmap[n]
        dtypes = dict(frames[n].dtypes)
        if c not in dtypes:
            raise ValueError(
                f"overlap_census: source {n!r} lacks column {c!r}"
            )
        if col is not None and dtypes[c] in ("float", "double"):
            raise ValueError(
                f"overlap_census: column {c!r} of source {n!r} is "
                f"{dtypes[c]} — float equality census is a modeling "
                "bug; pass cols= explicitly to override"
            )
        parts.append(
            frames[n]
            .where(F.col(c).isNotNull())
            .select(F.col(c).cast("string").alias("value"))
            .distinct()
            .withColumn("__bit", F.lit(1 << i).cast("long"))
        )
    melted = reduce(lambda a, b: a.unionByName(b), parts)
    masks = melted.groupBy("value").agg(F.sum("__bit").alias("__mask"))
    label = F.concat_ws(
        ",",
        *[
            F.when(
                F.col("__mask").bitwiseAND(F.lit(1 << i)) != 0, F.lit(n)
            )
            for i, n in enumerate(names)
        ],
    )
    n_src = reduce(
        lambda a, b: a + b,
        [
            (F.col("__mask").bitwiseAND(F.lit(1 << i)) != 0).cast("int")
            for i in range(len(names))
        ],
    )
    return (
        masks.groupBy("__mask")
        .agg(F.count(F.lit(1)).alias("n_values"))
        .select(
            label.alias("sources"),
            n_src.alias("n_sources"),
            "n_values",
        )
    )


def checks_from_order_dependencies(deps: DataFrame) -> list:
    """Close the mine→enforce loop: the ``holds`` rows of
    :func:`order_dependencies` become executable row-level ``Check``
    objects (``custom_sql`` kind, compiled by ``checks.compile_check``
    into JVM codegen like every other constraint) ready for
    ``validator.validate_table`` — a mined ``ship <= receipt``
    invariant starts counting its own violations on the next run, the
    same lifecycle as the reference's inferred per-column checks.

    Null semantics match the value-check family: a row where either
    side is NULL passes (not_null checks own missingness). The deps
    frame is O(columns²) — the ``collect`` here is metadata-sized by
    construction, never data-sized. Directed duplicates (a<=b holding
    alongside b<=a, the always-equal pair) each produce their own
    check; labels keep them distinct."""
    from pandera_forge_spark.schema import Check

    need = {"lhs", "rhs", "verdict"}
    missing = need - set(deps.columns)
    if missing:
        raise ValueError(
            f"checks_from_order_dependencies: deps frame lacks columns "
            f"{sorted(missing)} — pass order_dependencies() output"
        )
    out = []
    for r in deps.where(F.col("verdict") == "holds").collect():
        lhs, rhs = r["lhs"], r["rhs"]
        out.append(
            Check(
                column=lhs,
                kind="custom_sql",
                value=(
                    f"`{lhs}` IS NULL OR `{rhs}` IS NULL "
                    f"OR `{lhs}` <= `{rhs}`"
                ),
                label=f"{lhs}__le__{rhs}",
            )
        )
    return out
