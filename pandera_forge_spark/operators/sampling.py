"""Deterministic stratified sampling for training-data curation.

A 100-TB corpus is never trained on whole: pipelines take N documents
per language / source / quality bucket, and the take must be
DETERMINISTIC (same corpus -> same sample, any cluster size, any
partitioning) so experiments are reproducible and downstream shards
stable. Random sampling (``df.sample``) is seed-stable only per
partitioning; these operators instead rank every row by a content hash
of its id (md5 — chosen over xxhash64 because any engine can replay
it, so the sample is verifiable outside Spark), which is both
deterministic and uniformly distributed.

Scale shape: the naive window (rank within stratum) shuffles the WHOLE
corpus into per-stratum partitions — a hot stratum ("en" at 60% of the
web) lands on one task. ``stratified_take`` therefore pre-filters by a
per-stratum hash threshold ~ safety*n/count (an O(strata) broadcast),
cutting the window's shuffle volume from O(rows) to O(strata x n x
safety), and VERIFIES the cut: any stratum the threshold under-selected
(possible, just exponentially unlikely at safety=2) is re-taken without
the threshold, so the result is byte-identical to the exhaustive
window — asserted against a DuckDB oracle in __spark_entry__.

No reference counterpart (the reference has no sampling operators);
``[NR]`` per SURVEY.md §2 conventions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SAFETY = 2.0  # prefilter keeps ~2x the quota per stratum before ranking


def _nullsafe_join(
    left: DataFrame, right: DataFrame, cols: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Broadcast join on stratum columns that treats NULL as a normal
    stratum value (groupBy puts nulls in one group; a plain equi-join
    would silently drop those rows). Right-side key columns are
    dropped after an inner join."""
    # rename right-side keys first: the right frame derives from the
    # left, so left[c]/right[c] would resolve to the SAME attribute
    # (trivially-true self-join predicate)
    renamed = right
    for c in cols:
        renamed = renamed.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for c in cols:
        term = left[c].eqNullSafe(renamed[f"__r_{c}"])
        cond = term if cond is None else cond & term
    out = left.join(F.broadcast(renamed), cond, how)
    if how == "inner":
        out = out.drop(*[f"__r_{c}" for c in cols])
    return out


def _rank_key(id_col: str) -> Column:
    """Deterministic uniform ranking key: the md5 hex of the id's
    string form. Lexicographic order on the fixed-width lowercase hex
    IS numeric order on the 128-bit value, so ordering by the string
    matches ordering by any numeric prefix of it."""
    return F.md5(F.col(id_col).cast("string"))


def _key_fraction(key: Column) -> Column:
    """Map the first 8 hex chars to [0, 1) — monotonic in the full key,
    so `fraction <= t` keeps exactly a hash-prefix range."""
    return F.conv(F.substring(key, 1, 8), 16, 10).cast("double") / float(1 << 32)


def stratified_take(
    df: DataFrame,
    strata_cols: Sequence[str],
    n: int,
    id_col: str,
    prefilter: Optional[bool] = None,
) -> DataFrame:
    """The first ``n`` rows per stratum in deterministic hash order
    (md5 of ``id_col``, ties broken by the id) — same result on any
    cluster, any partitioning, any engine that can md5.

    ``prefilter=None`` defaults to ``True`` (the threshold pre-cut);
    ``False`` forces the exhaustive window (the oracle-parity mode).
    Either way the OUTPUT is identical — the pre-cut is verified per
    stratum and any under-selected stratum falls back to its full row
    set before ranking."""
    if prefilter is None:
        prefilter = True
    strata = [F.col(c) for c in strata_cols]
    keyed = df.withColumn("__key", _rank_key(id_col))

    if prefilter:
        counts = keyed.groupBy(*strata_cols).agg(
            F.count(F.lit(1)).alias("__stratum_n")
        )
        # threshold so ~safety*n rows pass; small strata keep everything
        thresh = F.least(
            F.lit(1.0), F.lit(SAFETY * n) / F.col("__stratum_n")
        )
        cut = _nullsafe_join(keyed, counts, strata_cols).where(
            (F.col("__stratum_n") <= F.lit(int(SAFETY * n)))
            | (_key_fraction(F.col("__key")) <= thresh)
        )
        # verify: a stratum must retain min(n, its full count) rows.
        # Start from COUNTS, not from the cut — a stratum the threshold
        # eliminated entirely has no kept rows at all and would
        # otherwise escape the check. O(strata) rows either way.
        kept = cut.groupBy(*strata_cols).agg(
            F.count(F.lit(1)).alias("__kept_n")
        )
        short = (
            _nullsafe_join(counts, kept, strata_cols, "left")
            .where(
                F.coalesce(F.col("__kept_n"), F.lit(0))
                < F.least(F.lit(n), F.col("__stratum_n"))
            )
            .select(*strata_cols)
        )
        n_short = short.count()
        if n_short:
            fallback = _nullsafe_join(keyed, short, strata_cols, "semi")
            survivors = _nullsafe_join(cut, short, strata_cols, "anti").drop(
                "__stratum_n"
            )
            keyed = survivors.unionByName(fallback)
        else:
            keyed = cut.drop("__stratum_n")

    w = Window.partitionBy(*strata).orderBy(F.col("__key"), F.col(id_col))
    return (
        keyed.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
        .drop("__key", "__rk")
    )


def proportional_quotas(
    df: DataFrame, strata_cols: Sequence[str], total_n: int,
    max_strata: int = 1_000_000,
) -> dict:
    """Largest-remainder allocation of ``total_n`` across strata,
    proportional to stratum size and capped by it. Driver-side math
    over O(strata) count rows; deterministic (remainder ties broken by
    stratum key).

    ``max_strata`` fences the collect: the right trade at categorical
    cardinalities (languages, sources, shards), but if the stratum key
    is accidentally per-URL/per-doc the count frame IS the corpus —
    fail loudly instead of pulling it onto the driver."""
    # one job, driver memory bounded by the limit even when the check
    # fails: collect at most max_strata+1 rows, never the full blowup
    rows = df.groupBy(*strata_cols).count().limit(max_strata + 1).collect()
    if len(rows) > max_strata:
        raise ValueError(
            f"more than {max_strata} strata over {list(strata_cols)} — the "
            "quota table would not fit on the driver; coarsen the stratum "
            "key or raise max_strata deliberately"
        )
    sizes = {tuple(r[c] for c in strata_cols): r["count"] for r in rows}
    total = sum(sizes.values())
    if total == 0:
        return {}
    exact = {k: total_n * sz / total for k, sz in sizes.items()}
    quotas = {k: min(int(e), sizes[k]) for k, e in exact.items()}
    left = total_n - sum(quotas.values())
    by_rem = sorted(
        sizes, key=lambda k: (-(exact[k] - int(exact[k])), tuple(map(str, k)))
    )
    for k in by_rem:
        if left <= 0:
            break
        if quotas[k] < sizes[k]:
            quotas[k] += 1
            left -= 1
    return quotas


def _ranked_quota_take(
    df: DataFrame,
    strata_cols: Sequence[str],
    quotas: dict,
    id_col: str,
) -> DataFrame:
    """First ``quotas[stratum]`` rows per stratum in deterministic md5
    order — the shared take behind :func:`proportional_sample` and
    :func:`mixture_sample`. The quota table is O(strata) rows and joins
    in as a broadcast; strata without a quota row drop out (inner
    join). One window per stratum, same shape as stratified_take."""
    if not quotas:
        return df.limit(0)
    spark = df.sparkSession
    qrows = [(*k, q) for k, q in quotas.items()]
    schema_parts = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in strata_cols
    )
    qdf = spark.createDataFrame(qrows, f"{schema_parts}, __quota int")
    strata = [F.col(c) for c in strata_cols]
    w = Window.partitionBy(*strata).orderBy(F.col("__key"), F.col(id_col))
    keyed = df.withColumn("__key", _rank_key(id_col))
    return (
        _nullsafe_join(keyed, qdf, strata_cols)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.col("__quota"))
        .drop("__key", "__rk", "__quota")
    )


def proportional_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    total_n: int,
    id_col: str,
) -> DataFrame:
    """~``total_n`` rows allocated across strata proportionally to
    their sizes (largest remainder), each stratum's share taken in
    deterministic hash order. Two jobs: the O(strata) count, then one
    ranked take with per-stratum quotas broadcast in."""
    quotas = proportional_quotas(df, strata_cols, total_n)
    return _ranked_quota_take(df, strata_cols, quotas, id_col)


def mixture_quotas(
    df: DataFrame,
    strata_cols: Sequence[str],
    weights: dict,
    total_n: Optional[int] = None,
    max_strata: int = 1_000_000,
) -> dict:
    """Per-stratum quotas hitting TARGET mixture ``weights`` (the
    static domain-mixture allocator: "50% web, 30% code, 20% books" —
    the Pile/DoReMi shape), capped by what each stratum actually holds.

    ``weights`` maps stratum key (scalar for one stratum column, tuple
    otherwise) to a positive weight; weights are normalized internally,
    strata not named are dropped (weight 0). ``total_n=None`` takes the
    LARGEST total that satisfies the mixture without upsampling:
    T = min over weighted strata of floor(n_s / w_s). An explicit
    ``total_n`` above that ceiling raises loudly (this operator never
    silently degrades the mixture); a weighted stratum absent from the
    corpus raises for the same reason. Integerization is
    largest-remainder (remainder ties broken by stratum key), matching
    :func:`proportional_quotas`.

    Driver-side math over O(strata) count rows; ``max_strata`` fences
    the collect exactly like :func:`proportional_quotas`."""
    rows = df.groupBy(*strata_cols).count().limit(max_strata + 1).collect()
    if len(rows) > max_strata:
        raise ValueError(
            f"more than {max_strata} strata over {list(strata_cols)} — the "
            "quota table would not fit on the driver; coarsen the stratum "
            "key or raise max_strata deliberately"
        )
    sizes = {tuple(r[c] for c in strata_cols): r["count"] for r in rows}
    wkeys = {
        (k if isinstance(k, tuple) else (k,)): float(v)
        for k, v in weights.items()
    }
    if not wkeys:
        return {}
    bad = {k: v for k, v in wkeys.items() if v <= 0}
    if bad:
        raise ValueError(f"weights must be positive: {bad}")
    missing = sorted(str(k) for k in wkeys if sizes.get(k, 0) == 0)
    if missing:
        raise ValueError(
            f"weighted strata absent from the corpus: {missing} — the "
            "target mixture is unsatisfiable without upsampling"
        )
    wsum = sum(wkeys.values())
    feasible = min(int(sizes[k] * wsum / w) for k, w in wkeys.items())
    if total_n is None:
        total_n = feasible
    elif total_n > feasible:
        raise ValueError(
            f"total_n={total_n} exceeds the mixture-feasible ceiling "
            f"{feasible} (binding stratum caps); pass total_n=None for "
            "the maximum, or shrink the request"
        )
    if total_n <= 0:
        return {}
    exact = {k: total_n * w / wsum for k, w in wkeys.items()}
    quotas = {k: min(int(e), sizes[k]) for k, e in exact.items()}
    left = total_n - sum(quotas.values())
    by_rem = sorted(
        wkeys, key=lambda k: (-(exact[k] - int(exact[k])), tuple(map(str, k)))
    )
    for k in by_rem:
        if left <= 0:
            break
        if quotas[k] < sizes[k]:
            quotas[k] += 1
            left -= 1
    return quotas


def mixture_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    weights: dict,
    id_col: str,
    total_n: Optional[int] = None,
) -> DataFrame:
    """Rebalance a corpus to a target domain mixture: quotas from
    :func:`mixture_quotas`, rows taken per stratum in deterministic
    md5 order (same key discipline as every sampler here — the
    selection is reproducible on any cluster size, any partitioning,
    any engine that can md5). Unweighted strata drop out entirely.

    Shape: one O(strata) count (fenced), a broadcast quota join, one
    ranked window per stratum — identical cost to
    :func:`proportional_sample`; only the quota arithmetic differs."""
    quotas = mixture_quotas(df, strata_cols, weights, total_n)
    return _ranked_quota_take(df, strata_cols, quotas, id_col)


def take_token_budget(
    df: DataFrame,
    strata_cols: Sequence[str],
    budget: int,
    id_col: str,
    token_col: str,
) -> DataFrame:
    """Greedy per-stratum TOKEN-budget take: rows in deterministic
    hash order until the stratum's cumulative ``token_col`` exceeds
    ``budget`` (the boundary-crossing row is excluded). Training-data
    quotas are token counts, not document counts — "50 B tokens of en,
    5 B of de" — and this is that allocator, reproducible on any
    engine (running sum over the md5 rank order).

    One window per stratum over a running sum; pre-bound the shuffle
    with ``stratified_take`` when strata are huge and budgets small
    (take ~budget/avg_tokens × safety docs first, then apply the exact
    budget)."""
    strata = [F.col(c) for c in strata_cols]
    w = (
        Window.partitionBy(*strata)
        .orderBy(F.col("__key"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__key", _rank_key(id_col))
        .withColumn("__cum", F.sum(F.col(token_col).cast("long")).over(w))
        .where(F.col("__cum") <= budget)
        .drop("__key", "__cum")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle for training-data export: assign
    every row a shard in [0, n_shards) and a stable within-shard order,
    both pure functions of (salt, id) — same corpus + same salt ->
    byte-identical shards on any cluster size, any input partitioning.

    Training runs need the corpus in a fixed pseudo-random order
    (curriculum-free SGD) that is REPRODUCIBLE across re-exports;
    ``df.repartition(n).sortWithinPartitions(rand())`` is neither. Here
    order is the md5 of the salted id (uniform, engine-independent —
    same rationale as ``_rank_key``), shard is its first 8 hex chars
    mod n_shards, so a different ``salt`` yields an independent
    permutation for the next epoch.

    Adds (__shard int, __order string) columns; the export is then
        out.repartition(n_shards, "__shard")
           .sortWithinPartitions("__order")
           .write.partitionBy("__shard")...
    — ONE shuffle (the repartition), sort is per-partition spillable
    TimSort, no global sort / range exchange needed because shard
    membership already equals the hash range.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards).cast("int")
    return df.withColumn("__order", key).withColumn("__shard", shard)


def pack_concat_split(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    n_shards: int = 1,
    salt: str = "",
) -> DataFrame:
    """GPT-style sequence packing manifest: documents are (virtually)
    concatenated in deterministic shuffle order and SPLIT into
    fixed-``capacity`` token packs — a doc may straddle a pack
    boundary, exactly like concat-and-chunk pretraining tokenization.

    Pure window algebra per shard (one running token sum — no UDF, no
    sequential state): a doc starting at cumulative offset ``o`` with
    ``t`` tokens occupies packs ``o/capacity`` .. ``(o+t-1)/capacity``.
    Returns the manifest (id, tokens, shard, start_offset, pack_first,
    pack_last) from which a writer slices actual token ranges.
    Deterministic on any cluster size (order = md5 of salted id)."""
    strata = deterministic_shuffle(
        df.select(id_col, token_col), id_col, n_shards, salt
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy(F.col("__order"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col(token_col).cast("long")
    cum = F.sum(t).over(w)
    start = (cum - t).alias("start_offset")
    return strata.select(
        F.col(id_col),
        t.alias("tokens"),
        F.col("__shard").alias("shard"),
        start,
        F.floor((cum - t) / capacity).alias("pack_first"),
        # empty docs (t=0) sit entirely at their start offset
        F.floor((cum - F.least(t, F.lit(1))) / capacity).alias("pack_last"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    n_shards: int = 1,
    salt: str = "",
) -> DataFrame:
    """No-split greedy packing manifest (instruction-tuning shape):
    documents in deterministic shuffle order fill a pack until the next
    doc would overflow ``capacity``, then a new pack starts; a doc
    larger than ``capacity`` gets a pack of its own. Docs are never
    split.

    Greedy packing is inherently SEQUENTIAL within a shard — that is
    the semantics, not an implementation artifact — so this is the
    engine's declared Arrow escape hatch: ``applyInPandas`` per shard,
    one vectorized batch per group, parallelism = ``n_shards`` (pick
    shards ≈ cluster cores; a 10^12-doc export uses 10^5 shards, each
    a few million manifest rows of (id, tokens) — far under Arrow group
    limits). Returns (id, tokens, shard, pack, pos)."""
    strata = deterministic_shuffle(
        df.select(id_col, token_col), id_col, n_shards, salt
    )
    id_t = df.schema[id_col].dataType.simpleString()

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__order", id_col]).reset_index(drop=True)
        packs, poss = [], []
        pack_id, fill, pos = 0, 0, 0
        for t in pdf[token_col].astype("int64"):
            if fill > 0 and fill + t > capacity:
                pack_id += 1
                fill = 0
                pos = 0
            packs.append(pack_id)
            poss.append(pos)
            fill += t
            pos += 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "tokens": pdf[token_col].astype("int64"),
                "shard": pdf["__shard"].astype("int32"),
                "pack": pd.Series(packs, dtype="int64"),
                "pos": pd.Series(poss, dtype="int32"),
            }
        )

    out_schema = f"`{id_col}` {id_t}, tokens long, shard int, pack long, pos int"
    return strata.groupBy("__shard").applyInPandas(pack, out_schema)


def weighted_take(
    df: DataFrame,
    n: int,
    id_col: str,
    weight_col: str,
    strata_cols: Sequence[str] = (),
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (global or
    per stratum): each row's inclusion probability is proportional to
    its weight — the quality-score / domain-temperature sampler every
    training-mix recipe needs, but reproducible on any cluster.

    Efraimidis–Spirakis A-Res: rank by ``ln(u) / w`` descending where
    ``u`` is a uniform in (0,1) derived from the md5 of the salted id
    (the same engine-independent trick as ``_rank_key``) — the top n
    keys ARE an exact weighted sample without replacement. One narrow
    map to attach keys, one top-n (window per stratum, or TakeOrdered
    when global) — no iteration, no rejection loop, no rand()
    nondeterminism. Rows with weight <= 0 or NULL are excluded (their
    inclusion probability is 0). Ties (u identical) break by id.

    A different ``salt`` draws an independent sample — epochs, CV
    folds, ablation mixes."""
    key_hex = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # first 8 hex chars -> uniform in (0,1); +1 on numerator and +1 on
    # the 2^32 denominator keep u strictly inside (0,1) so ln(u) is
    # finite and nonzero
    u = (F.conv(F.substring(key_hex, 1, 8), 16, 10).cast("double") + 1.0) / float(
        (1 << 32) + 1
    )
    w = F.col(weight_col).cast("double")
    keyed = df.where(w.isNotNull() & (w > 0)).withColumn(
        "__wkey", F.log(u) / w
    )
    if not strata_cols:
        # global top-n: orderBy+limit compiles to TakeOrdered (per-
        # partition heap + driver merge of n rows), NOT a one-task
        # window over the whole table
        return (
            keyed.orderBy(F.col("__wkey").desc(), F.col(id_col))
            .limit(n)
            .drop("__wkey")
        )
    # Hot-stratum note: the row_number()<=n filter triggers Spark's
    # rank-limit pushdown (WindowGroupLimit, 3.5+): each MAP task
    # pre-trims to its local top-n per stratum BEFORE the exchange, so
    # the shuffle carries <= n rows per (input partition, stratum) and
    # the final per-stratum task sorts <= n x input-partitions rows —
    # never the whole hot stratum. Plan-asserted in
    # test_weighted_take_rank_limit_pushdown; no manual salting needed.
    strata = [F.col(c) for c in strata_cols]
    win = Window.partitionBy(*strata).orderBy(
        F.col("__wkey").desc(), F.col(id_col)
    )
    return (
        keyed.withColumn("__rk", F.row_number().over(win))
        .where(F.col("__rk") <= n)
        .drop("__wkey", "__rk")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
    group_col: Optional[str] = None,
) -> DataFrame:
    """Deterministic split assignment for training-data export: adds a
    ``__split`` column ("train"/"val"/... per ``fractions``) that is a
    pure function of (salt, key) — same corpus + same salt gives the
    SAME assignment on any cluster size, any partitioning, any engine
    (md5 is the uniform source, like every sampler in this module; no
    ``rand()``, no ``randomSplit`` nondeterminism).

    ``group_col`` is the leak defense: pass a near-dup cluster id
    (``dedup.dedup_clusters``), source domain, or url host and every
    row of a group lands in the SAME split — without it, two near-
    duplicate documents can straddle train and test and the eval is
    contaminated by construction. The hash key is then the group, so
    group sizes skew split sizes slightly; fractions govern the GROUP
    mass, which is what leak-aware splitting means.

    NULL keys hash as '' — all of them land together in one
    deterministic split rather than spraying nondeterministically.

    Shape: one narrow projection (hash + chained comparisons against
    the cumulative boundaries); zero shuffles, zero UDFs — at 10^12
    rows this is a free rider on whatever scan already runs.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bad = {k: v for k, v in fractions.items() if v <= 0}
    if bad:
        raise ValueError(f"fractions must be positive: {bad}")
    total = float(sum(fractions.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key_col = group_col if group_col is not None else id_col
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    u = _key_fraction(F.md5(F.concat(F.lit(salt), key)))
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(fractions[name])
        branch = u < F.lit(cum)
        expr = F.when(branch, name) if expr is None else expr.when(branch, name)
    label = names[-1] if expr is None else expr.otherwise(names[-1])
    return df.withColumn("__split", label)


def calibrate_scores(
    df: DataFrame,
    group_col: str,
    score_col: str,
    grid: int = 1000,
    out_col: str = "score_pct",
) -> DataFrame:
    """Per-group percentile calibration of a score column: adds
    ``out_col`` = the score's mid-rank percentile within its group, in
    (0, 1). Quality scores are only comparable WITHIN the scorer and
    slice that produced them — "keep the top 30% of each source" needs
    each source's own CDF, and raw thresholds transfer across sources
    exactly wrong. Mid-rank (ties share the average of their ranks) is
    the standard unbiased convention.

    Mechanics: scores bucket onto a fixed grid (``floor(score *
    grid)`` — exact IEEE multiply+floor, engine-reproducible), ONE
    ``groupBy(group, bucket)`` count builds the per-group histogram,
    one window over the histogram (at most ~grid rows per group — the
    window sorts BOUNDED data no matter how many raw rows hit the
    group) turns it into a CDF, and one equi-join maps every row
    through it. The percentile is computed as the exact integer
    ``(2*below + in_bucket) / (2*n)`` pushed through a single IEEE
    division — bit-identical on any engine. Scores tied within one
    grid cell share a percentile: resolution is 1/grid of the score
    range, pick ``grid`` accordingly.

    NULL scores take no part in the CDF and calibrate to NULL.
    Non-finite scores raise in-band (one NaN/Inf would silently own
    the top cell otherwise).

    Scale: the histogram frame is O(groups x grid) rows — join-back is
    an AQE-broadcast in practice; the raw frame shuffles ONCE on
    (group, bucket) for the count and once on (group, bucket) for the
    join, both partial-aggregated/skew-safe because the hot unit is a
    (group, bucket) cell, never a whole group."""
    if grid < 1:
        raise ValueError(f"calibrate_scores: grid must be >= 1, got {grid}")
    for c in [group_col, score_col]:
        if c not in df.columns:
            raise ValueError(f"calibrate_scores: column {c!r} missing")
    for c in ["__b", "__cnt", "__below", "__n", out_col]:
        if c in df.columns:
            raise ValueError(
                f"calibrate_scores: column {c!r} already exists "
                "(reserved/output name)"
            )
    s = F.col(score_col).cast("double")
    bucket = F.when(
        s.isNull(), F.lit(None).cast("long")
    ).when(
        F.isnan(s) | (F.abs(s) == float("inf")),
        F.raise_error(
            F.concat(
                F.lit("calibrate_scores: non-finite score in column "),
                F.lit(score_col),
                F.lit(" (value "),
                s.cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(F.floor(s * F.lit(float(grid))).cast("long"))
    base = df.withColumn("__b", bucket)
    hist = (
        base.where(F.col("__b").isNotNull())
        .groupBy(group_col, "__b")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wp = Window.partitionBy(group_col).orderBy("__b")
    cdf = (
        hist.withColumn(
            "__below",
            F.coalesce(
                F.sum("__cnt").over(wp.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "__n",
            F.sum("__cnt").over(
                wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .select(
            group_col,
            "__b",
            (
                (2 * F.col("__below") + F.col("__cnt")).cast("double")
                / (2 * F.col("__n")).cast("double")
            ).alias(out_col),
        )
    )
    return base.join(cdf, [group_col, "__b"], "left").drop("__b")


def split_balance_report(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
    group_col: Optional[str] = None,
) -> DataFrame:
    """Allocation audit for ``train_val_test_split`` (and any hash-
    bucketed assignment): per split, the observed row count against the
    expected mass, plus its chi-square term — the sample-ratio-mismatch
    check. A healthy md5 split matches fractions to sampling noise; a
    big term means the KEY is pathological (constant/low-cardinality
    ids collapsing into one bucket, upstream filtering correlated with
    the hash, a salt reused against a skewed group_col) — exactly the
    silent eval-contamination failure a split audit exists to catch.

    Every arm appears even at zero observed rows (a literal arms frame
    left-joins the counts — a missing arm IS the finding). The
    chi-square statistic is the SUM of ``chi2_term`` over arms; it is
    emitted per-arm rather than summed so the output is engine-exact
    (each term is one (obs-exp)^2/exp from exact integers — a cross-arm
    float sum would depend on arm order) and so the report says WHICH
    arm drifted. Degrees of freedom = arms - 1.

    Scale: the assignment is the same zero-shuffle hash projection as
    ``train_val_test_split``; the audit adds one algebraic groupBy over
    ~|arms| cells (map-side combine reduces each task to at most one
    row per arm) and a broadcast-sized join against the literal arms
    frame. With ``group_col``, expected masses govern GROUP counts, so
    the audit counts distinct groups (two-phase, still bounded by
    |groups|), matching what the splitter actually randomizes."""
    labeled = train_val_test_split(df, id_col, fractions, salt, group_col)
    if group_col is None:
        counts = labeled.groupBy("__split").agg(
            F.count(F.lit(1)).alias("observed")
        )
    else:
        # the splitter hashes the GROUP, so fractions promise group
        # mass, not row mass — audit the thing that was randomized
        counts = (
            labeled.select("__split", group_col)
            .groupBy("__split")
            .agg(F.countDistinct(F.coalesce(
                F.col(group_col).cast("string"), F.lit(""))).alias("observed"))
        )
    spark = df.sparkSession
    arms = spark.createDataFrame(
        [(k, float(v)) for k, v in fractions.items()],
        "split string, expected_fraction double",
    )
    out = (
        # broadcast the COUNTS side: Spark can't build the left side of
        # a left-outer join, and counts is <= |arms| rows post-agg
        arms.join(
            F.broadcast(counts.withColumnRenamed("__split", "split")),
            "split",
            "left",
        ).withColumn("observed", F.coalesce(F.col("observed"), F.lit(0)))
    )
    # unpartitioned window is safe here: the frame is |arms| rows
    total = F.sum(F.col("observed")).over(Window.partitionBy())
    out = out.withColumn("total", total)
    exp = F.col("total") * F.col("expected_fraction")
    return out.select(
        "split",
        "expected_fraction",
        F.col("observed").cast("long").alias("observed"),
        F.col("total").cast("long").alias("total"),
        exp.alias("expected"),
        F.try_divide((F.col("observed") - exp) * (F.col("observed") - exp), exp)
        .alias("chi2_term"),
    )


def neyman_allocation(
    df: DataFrame,
    strata: Sequence[str],
    value_col: str,
    total_n: int,
    cap_at_stratum: bool = False,
) -> DataFrame:
    """Optimal (Neyman) allocation of a validation-sample budget across
    strata: stratum h gets ``total_n * N_h*S_h / sum(N_j*S_j)`` draws —
    proportional to size x spread, the textbook variance-minimizing
    design (public material, Neyman 1934; Cochran, "Sampling
    Techniques"). ``sampled_violation_bound`` certifies a sample after
    the fact; this designs the sample BEFORE: high-variance strata
    (where a mean or violation-rate estimate is noisiest) get more
    budget, constant strata get almost none. Falls back to
    proportional-to-size allocation when every stratum has zero spread
    (all-constant or all-null values), rather than dividing by zero.

    Determinism discipline (the alignment_outliers idiom): the value is
    micro-quantized (``floor(x*1e6)`` as long) so per-stratum sums and
    sums-of-squares are EXACT integers (decimal(38,0) — no
    float-addition order sensitivity between partitionings or engines);
    mean/std/weights then derive through a FIXED sequence of IEEE
    double ops (each deterministic), and the integer allocation is
    floor + largest-remainder with rank ties broken by the strata key —
    so the same frame allocates identically at any parallelism and
    replays exactly in an external SQL engine. Non-finite values and
    |value| >= 1e9 (the micro-long envelope) raise IN-BAND.

    Rows with NULL value still count toward stratum SIZE (N_h is the
    population the sample represents); mean/std are over the non-null
    measured rows. The returned ``alloc`` column sums exactly to
    ``total_n`` (largest-remainder repairs floor truncation in both
    directions); with ``cap_at_stratum=True`` each alloc is additionally
    clamped to ``n_rows``, and the total may then undershoot — the
    caller asked for more draws than some strata hold.

    Scale shape: ONE scan into a per-stratum aggregate (map-side
    partials, one shuffle on the strata key), a 1-row totals broadcast,
    then window ranks over the O(strata) frame — the only
    single-partition step is strata-sized, never data-sized."""
    strata = list(strata)
    if not strata:
        raise ValueError("neyman_allocation: strata must be non-empty")
    for c in strata + [value_col]:
        if c not in df.columns:
            raise ValueError(f"neyman_allocation: column {c!r} missing")
    if int(total_n) < 0:
        raise ValueError(
            f"neyman_allocation: total_n must be >= 0, got {total_n}"
        )
    reserved = [
        "__vm", "__nv", "__sm", "__sq", "__w", "__weff", "__q", "__af",
        "__rem", "__rr", "__sr", "__sumaf", "n_rows", "mean_value",
        "std_value", "alloc",
    ]
    for c in reserved:
        if c in strata:
            raise ValueError(
                f"neyman_allocation: stratum column {c!r} collides with a "
                "reserved/output name"
            )
    v = F.col(value_col).cast("double")
    vm = F.when(v.isNull(), F.lit(None).cast("long")).when(
        F.isnan(v) | (F.abs(v) >= F.lit(1e9)),
        F.raise_error(
            F.concat(
                F.lit("neyman_allocation: value outside the micro-long "
                      "envelope (non-finite or |x| >= 1e9) in column "),
                F.lit(value_col),
                F.lit(" (value "),
                v.cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(F.floor(v * F.lit(1000000.0)).cast("long"))
    per = (
        df.withColumn("__vm", vm)
        .groupBy(*strata)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("__vm").alias("__nv"),
            F.coalesce(
                F.sum(F.col("__vm").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__sm"),
            F.coalesce(
                F.sum(
                    F.col("__vm").cast("decimal(19,0)")
                    * F.col("__vm").cast("decimal(19,0)")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__sq"),
        )
    )
    dn = F.col("__nv").cast("double")
    dsm = F.col("__sm").cast("double")
    dsq = F.col("__sq").cast("double")
    var_micro2 = F.greatest(
        (dn * dsq - dsm * dsm) / (dn * dn), F.lit(0.0)
    )
    stats = per.select(
        *strata,
        "n_rows",
        "__nv",
        F.when(F.col("__nv") > 0, dsm / dn / F.lit(1000000.0)).alias(
            "mean_value"
        ),
        F.when(
            F.col("__nv") > 0, F.sqrt(var_micro2) / F.lit(1000000.0)
        ).alias("std_value"),
        F.when(
            F.col("__nv") > 0,
            F.floor(F.col("n_rows").cast("double") * F.sqrt(var_micro2)),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__w"),
    )
    totals = stats.agg(
        F.coalesce(F.sum("__w"), F.lit(0).cast("long")).alias("__sw"),
        F.coalesce(F.sum("n_rows"), F.lit(0).cast("long")).alias("__sn"),
    )
    sized = stats.crossJoin(F.broadcast(totals))
    w_eff = F.when(F.col("__sw") > 0, F.col("__w")).otherwise(
        F.col("n_rows")
    )
    sw_eff = F.when(F.col("__sw") > 0, F.col("__sw")).otherwise(
        F.col("__sn")
    )
    q = (
        F.lit(float(int(total_n)))
        * w_eff.cast("double")
        / sw_eff.cast("double")
    )
    based = sized.select(
        *strata,
        "n_rows",
        "mean_value",
        "std_value",
        F.floor(q).cast("long").alias("__af"),
        (q - F.floor(q)).alias("__rem"),
    )
    strata_asc = [F.col(c).asc_nulls_last() for c in strata]
    strata_desc = [F.col(c).desc_nulls_first() for c in strata]
    w_over = Window.orderBy(F.col("__rem").desc(), *strata_asc)
    w_under = Window.orderBy(F.col("__rem").asc(), *strata_desc)
    w_all = Window.partitionBy()
    deficit = F.lit(int(total_n)) - F.sum("__af").over(w_all)
    alloc = F.greatest(
        F.col("__af")
        + F.when(
            (deficit > 0) & (F.row_number().over(w_over) <= deficit),
            F.lit(1),
        )
        .when(
            (deficit < 0) & (F.row_number().over(w_under) <= -deficit),
            F.lit(-1),
        )
        .otherwise(F.lit(0)),
        F.lit(0),
    ).cast("long")
    if cap_at_stratum:
        alloc = F.least(alloc, F.col("n_rows"))
    return based.select(
        *strata, "n_rows", "mean_value", "std_value", alloc.alias("alloc")
    )


def neyman_sample(
    df: DataFrame,
    strata: Sequence[str],
    value_col: str,
    total_n: int,
    id_col: str,
    cap_at_stratum: bool = True,
) -> DataFrame:
    """The actionable composition of :func:`neyman_allocation` and the
    deterministic ranked take: DESIGN the per-stratum budgets
    (variance-minimizing, exact-total), then TAKE exactly each
    stratum's quota in md5 hash order — one verb from "I can afford
    total_n validation rows" to the rows themselves, reproducible on
    any cluster size and replayable outside Spark.

    ``cap_at_stratum`` defaults True here (unlike the raw allocator):
    a take cannot return more rows than a stratum holds, so an uncapped
    quota would silently under-deliver anyway — capping makes the
    shortfall explicit in the allocation rather than implicit in the
    take.

    Scale: the allocation frame is O(strata) and is collected to the
    driver to become the broadcast quota table (strata-sized, never
    data-sized — the same driver surface `proportional_sample` already
    accepts); the take is `_ranked_quota_take`'s one window."""
    alloc = neyman_allocation(
        df, strata, value_col, total_n, cap_at_stratum=cap_at_stratum
    )
    strata = list(strata)
    quotas = {
        tuple(r[c] for c in strata): int(r["alloc"])
        for r in alloc.select(*strata, "alloc").collect()
        if int(r["alloc"]) > 0
    }
    return _ranked_quota_take(df, strata, quotas, id_col)


def dense_ids(
    df: DataFrame,
    id_col: str,
    out_col: str = "dense_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic DENSE surrogate ids 0..n-1 — what
    ``monotonically_increasing_id`` refuses to be (it is sparse and
    partitioning-dependent) and what a naive global
    ``row_number() OVER (ORDER BY ...)`` only delivers by moving the
    whole table through ONE task. Embedding matrices, vocab tables and
    negative samplers all need exactly this: a stable, gap-free long
    per row that every re-run of the pipeline reproduces bit-for-bit.

    Order is the md5 hash of the id's string form (ties broken by the
    id itself) — the same engine-replayable uniform order every
    deterministic sampler in this module uses, so the assignment is
    independent of partitioning, cluster size, and engine.

    Scale shape (the two-phase rank): rows route to ``n_buckets``
    hash-RANGE buckets (the md5 prefix fraction, monotone in the full
    key, so bucket-then-key order IS global key order); per-bucket
    counts (an O(n_buckets) frame) come to the driver once and turn
    into exclusive prefix-sum offsets broadcast back; each bucket then
    ranks its own ~n/n_buckets rows in an ordinary partitioned window
    and adds its offset. Two shuffles of the carried rows, NO
    single-partition stage — the thing this operator exists to avoid.

    NULL ids raise IN-BAND (a dense id for "no identity" is a bug
    upstream, not a rank). Duplicate ids are allowed and receive
    consecutive dense ids (they are interchangeable under the hash
    order)."""
    if id_col not in df.columns:
        raise ValueError(f"dense_ids: column {id_col!r} missing")
    if out_col in df.columns:
        raise ValueError(
            f"dense_ids: output column {out_col!r} already exists"
        )
    for c in ("__key", "__bkt", "__off", "__rk"):
        if c in df.columns:
            raise ValueError(
                f"dense_ids: input column {c!r} collides with an internal "
                "working name — rename it"
            )
    nb = int(n_buckets)
    if nb < 1:
        raise ValueError(f"dense_ids: n_buckets must be >= 1, got {nb}")
    key = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"dense_ids: NULL id in column {id_col!r}")
        ).cast("string"),
    ).otherwise(_rank_key(id_col))
    keyed = df.withColumn("__key", key).withColumn(
        "__bkt",
        F.least(
            F.floor(_key_fraction(F.col("__key")) * F.lit(float(nb))),
            F.lit(nb - 1),
        ).cast("int"),
    )
    counts = {
        r["__bkt"]: r["__c"]
        for r in keyed.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    }
    offsets, acc = [], 0
    for b in range(nb):
        offsets.append((b, acc))
        acc += counts.get(b, 0)
    odf = df.sparkSession.createDataFrame(
        offsets, "__bkt int, __off long"
    )
    w = Window.partitionBy("__bkt").orderBy(F.col("__key"), F.col(id_col))
    return (
        keyed.join(F.broadcast(odf), "__bkt")
        .withColumn("__rk", F.row_number().over(w))
        .withColumn(
            out_col, (F.col("__off") + F.col("__rk") - F.lit(1)).cast("long")
        )
        .drop("__key", "__bkt", "__off", "__rk")
    )


# ------------------------------------------------ numeric split balance

def numeric_balance(
    df: DataFrame,
    split_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Standardized mean difference (SMD — public biostatistics
    convention) of numeric columns between every pair of splits:
    ``|mean_a − mean_b| / sqrt((var_a + var_b)/2)``. The numeric
    companion to the categorical split-balance report: a train/test
    split whose label rates match can still be badly unbalanced on a
    continuous covariate, and SMD > 0.1 is the conventional "these
    groups differ materially" line that decides whether a split is
    usable for evaluation.

    One fused aggregation pass collects per-split exact moment sums
    (n, Σx, Σx²) per column; the pairwise SMDs are closed-form
    expressions over that tiny frame (splits × columns rows). Means/
    variances are single fixed-order float expressions over exact
    sums; population variance (the /n form) is used so the statistic
    is defined down to n=1. Splits with zero pooled variance report
    NULL smd loudly (identical constants are not "balanced", they
    are degenerate).

    Output: one row per (column, split_a < split_b):
    ``column, split_a, split_b, n_a, n_b, mean_a, mean_b, smd``.
    """
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("numeric_balance: value_cols must be non-empty")
    for c in [split_col] + value_cols:
        if c not in df.columns:
            raise ValueError(f"numeric_balance: column {c!r} missing")
    aggs = []
    for c in value_cols:
        v = F.col(c).cast("double")
        nn = v.isNotNull()
        aggs += [
            F.sum(nn.cast("long")).alias(f"__n_{c}"),
            F.sum(F.when(nn, v)).alias(f"__s_{c}"),
            F.sum(F.when(nn, v * v)).alias(f"__ss_{c}"),
        ]
    mo = df.groupBy(F.col(split_col).alias("__split")).agg(*aggs)
    a = mo.select(
        F.col("__split").alias("split_a"),
        *[F.col(f"__n_{c}").alias(f"__na_{c}") for c in value_cols],
        *[F.col(f"__s_{c}").alias(f"__sa_{c}") for c in value_cols],
        *[F.col(f"__ss_{c}").alias(f"__ssa_{c}") for c in value_cols],
    )
    b = mo.select(
        F.col("__split").alias("split_b"),
        *[F.col(f"__n_{c}").alias(f"__nb_{c}") for c in value_cols],
        *[F.col(f"__s_{c}").alias(f"__sb_{c}") for c in value_cols],
        *[F.col(f"__ss_{c}").alias(f"__ssb_{c}") for c in value_cols],
    )
    pairs = a.crossJoin(b).where(F.col("split_a") < F.col("split_b"))
    cells = []
    for c in value_cols:
        na = F.col(f"__na_{c}").cast("double")
        nb = F.col(f"__nb_{c}").cast("double")
        ma = F.col(f"__sa_{c}") / na
        mb = F.col(f"__sb_{c}") / nb
        va = F.col(f"__ssa_{c}") / na - ma * ma
        vb = F.col(f"__ssb_{c}") / nb - mb * mb
        pooled = (va + vb) / F.lit(2.0)
        cells.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("split_a").cast("string").alias("split_a"),
                F.col("split_b").cast("string").alias("split_b"),
                F.col(f"__na_{c}").alias("n_a"),
                F.col(f"__nb_{c}").alias("n_b"),
                ma.alias("mean_a"),
                mb.alias("mean_b"),
                F.when(
                    (F.col(f"__na_{c}") > 0)
                    & (F.col(f"__nb_{c}") > 0)
                    & (pooled > 0),
                    F.abs(ma - mb) / F.sqrt(pooled),
                ).alias("smd"),
            )
        )
    return pairs.select(F.explode(F.array(*cells)).alias("__c")).select(
        "__c.column", "__c.split_a", "__c.split_b", "__c.n_a", "__c.n_b",
        "__c.mean_a", "__c.mean_b", "__c.smd",
    )


# ------------------------------------------------------------ CUPED

def cuped_summary(
    df: DataFrame,
    y_col: str,
    x_col: str,
) -> DataFrame:
    """CUPED variance reduction (public: Deng et al., WSDM 2013):
    given each unit's experiment-period metric ``y`` and pre-period
    covariate ``x``, the adjustment ``y' = y − θ·(x − x̄)`` with
    ``θ = cov(y,x)/var(x)`` keeps the mean unbiased and removes the
    share of variance that pre-period behaviour predicts:

        var(y') = var(y) − cov(y,x)²/var(x)

    — reduction_pct is the fraction of a metric's noise an A/B test
    no longer pays for, i.e. how much smaller the experiment can be.
    This summary is the go/no-go artifact for adopting the
    adjustment on a metric.

    One fused aggregation (exact n, Σy, Σx, Σy², Σx², Σxy — the
    corr_lineitem moment kernel), population variances, every output
    a fixed-order expression over the sums. Listwise NULL drop;
    var(x) = 0 reports NULL θ loudly (a constant covariate predicts
    nothing).

    Output (single row): ``n_units, theta, mean_y, var_y, var_adj,
    reduction_pct``.
    """
    for c in (y_col, x_col):
        if c not in df.columns:
            raise ValueError(f"cuped_summary: column {c!r} missing")
    base = df.na.drop(subset=[y_col, x_col])
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    mo = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(y).alias("__sy"),
        F.sum(x).alias("__sx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n_units").cast("double")
    my = F.col("__sy") / n
    mx = F.col("__sx") / n
    var_y = F.col("__syy") / n - my * my
    var_x = F.col("__sxx") / n - mx * mx
    cov = F.col("__sxy") / n - mx * my
    theta = F.when(var_x > 0, cov / var_x)
    var_adj = F.when(var_x > 0, var_y - cov * cov / var_x)
    return mo.select(
        "n_units",
        theta.alias("theta"),
        my.alias("mean_y"),
        var_y.alias("var_y"),
        var_adj.alias("var_adj"),
        F.when(
            var_x.isNotNull() & (var_x > 0) & (var_y > 0),
            (var_y - var_adj) / var_y * F.lit(100.0),
        ).alias("reduction_pct"),
    )


def cuped_adjust(
    df: DataFrame,
    y_col: str,
    x_col: str,
    out_col: str = "y_cuped",
) -> DataFrame:
    """Row-level CUPED attach: ``y' = y − θ·(x − x̄)`` with θ and x̄
    from :func:`cuped_summary`'s moments, broadcast as a 1-row frame.
    Means are preserved exactly in expectation; rows with NULL x keep
    their raw y (no covariate, no adjustment — documented, not
    silent). Pure narrow map after one aggregate."""
    if out_col in df.columns:
        raise ValueError(
            f"cuped_adjust: output column {out_col!r} already exists"
        )
    for c in (y_col, x_col):
        if c not in df.columns:
            raise ValueError(f"cuped_adjust: column {c!r} missing")
    base = df.na.drop(subset=[y_col, x_col])
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    mo = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(y).alias("__sy"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("__n")
    mx = F.col("__sx") / n
    var_x = F.col("__sxx") / n - mx * mx
    cov = F.col("__sxy") / n - mx * (F.col("__sy") / n)
    params = mo.select(
        F.when(var_x > 0, cov / var_x).alias("__theta"),
        mx.alias("__mx"),
    )
    return (
        df.crossJoin(F.broadcast(params))
        .withColumn(
            out_col,
            F.when(
                F.col(x_col).isNotNull()
                & F.col(y_col).isNotNull()
                & F.col("__theta").isNotNull(),
                F.col(y_col).cast("double")
                - F.col("__theta")
                * (F.col(x_col).cast("double") - F.col("__mx")),
            ).otherwise(F.col(y_col).cast("double")),
        )
        .drop("__theta", "__mx")
    )


# ----------------------------------------------------------- DiD

def did_estimate(
    df: DataFrame,
    treat_pred,
    post_pred,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences (public econometrics): with the four
    cell means over (treated?, post?),

        DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)

    — the effect estimate that survives a level difference between
    the groups AND a common time trend, which is exactly the
    situation every staged rollout and infra migration creates
    (treated hosts were always different; everything drifted over
    the window). The naive SE ships with it:
    ``SE² = Σ_cells var_c/n_c`` (population variances — independent-
    cells assumption, said out loud; cluster at the unit level with
    jackknife_ratio over units when rows within a unit correlate).

    One fused aggregation: exact conditional moment sums for the
    four cells, every output a fixed-order expression. NULL values
    drop; any empty cell reports NULL did/se loudly.

    Output (single row): ``n_tp, n_tc, n_cp, n_cc, mean_tp, mean_tc,
    mean_cp, mean_cc, did, se`` (t=treated/c=control × p=post/
    c=pre).
    """
    if value_col not in df.columns:
        raise ValueError(f"did_estimate: column {value_col!r} missing")
    v = F.col(value_col).cast("double")
    t = F.coalesce(treat_pred, F.lit(False))
    p = F.coalesce(post_pred, F.lit(False))
    base = df.where(v.isNotNull())
    cells = {
        "tp": t & p,
        "tc": t & ~p,
        "cp": ~t & p,
        "cc": ~t & ~p,
    }
    aggs = []
    for tag, cond in cells.items():
        aggs += [
            F.sum(cond.cast("long")).alias(f"n_{tag}"),
            F.sum(F.when(cond, v)).alias(f"__s_{tag}"),
            F.sum(F.when(cond, v * v)).alias(f"__ss_{tag}"),
        ]
    mo = base.agg(*aggs)
    means, vars = {}, {}
    for tag in cells:
        n = F.col(f"n_{tag}").cast("double")
        means[tag] = F.col(f"__s_{tag}") / n
        vars[tag] = F.col(f"__ss_{tag}") / n - means[tag] * means[tag]
    ok = None
    for tag in cells:
        c = F.col(f"n_{tag}") > 0
        ok = c if ok is None else ok & c
    did = F.when(
        ok,
        (means["tp"] - means["tc"]) - (means["cp"] - means["cc"]),
    )
    se2 = None
    for tag in cells:
        term = vars[tag] / F.col(f"n_{tag}").cast("double")
        se2 = term if se2 is None else se2 + term
    return mo.select(
        *[F.col(f"n_{tag}") for tag in cells],
        *[means[tag].alias(f"mean_{tag}") for tag in cells],
        did.alias("did"),
        F.when(ok & (se2 >= 0), F.sqrt(se2)).alias("se"),
    )


# ---------------------------------------------------- A/A calibration

def aa_calibration(
    df: DataFrame,
    unit_col: str,
    success_pred,
    n_splits: int = 20,
    salt: str = "aa",
) -> DataFrame:
    """A/A calibration harness: ``n_splits`` PLACEBO experiments —
    units assigned to fake treatment/control by md5 parity of
    ``salt#k#unit`` — each scored with the pooled two-proportion
    z-statistic. Real effects are impossible by construction, so the
    z's should look standard-normal: a fat |z| tail means the testing
    machinery (not the product) is broken — clustered rows violating
    the independence the z assumes, a biased splitter, or a leaky
    metric. Running this BEFORE trusting any real experiment is the
    experimentation platform's own validation check, and a different
    ``salt`` draws a fresh placebo family.

    No row explosion: every split is two conditional aggregates in
    ONE fused pass (K md5 evaluations per row, zero shuffle growth),
    and the per-split z's unpack from the single moment row. The
    z uses the pooled rate: ``(p1−p0)/sqrt(p̂(1−p̂)(1/n1+1/n0))`` —
    exact integer counts, one sqrt. NULL successes count failure;
    NULL units go to control (parity of md5('') — deterministic,
    documented).

    Output per split: ``split, n_t, x_t, n_c, x_c, z`` (NULL z when
    a side is empty or the pooled rate is degenerate).
    """
    if int(n_splits) < 1:
        raise ValueError(f"aa_calibration: n_splits must be >= 1, got {n_splits}")
    if unit_col not in df.columns:
        raise ValueError(f"aa_calibration: column {unit_col!r} missing")
    K = int(n_splits)
    s = F.coalesce(success_pred, F.lit(False)).cast("long")
    aggs = []
    for k in range(K):
        key = F.md5(
            F.concat(
                F.lit(f"{salt}#{k}#"),
                F.coalesce(F.col(unit_col).cast("string"), F.lit("")),
            )
        )
        treat = (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % 2 == 0
        )
        aggs += [
            F.sum(treat.cast("long")).alias(f"__nt_{k}"),
            F.sum(F.when(treat, s)).alias(f"__xt_{k}"),
            F.sum((~treat).cast("long")).alias(f"__nc_{k}"),
            F.sum(F.when(~treat, s)).alias(f"__xc_{k}"),
        ]
    mo = df.agg(*aggs)
    cells = []
    for k in range(K):
        nt = F.col(f"__nt_{k}").cast("double")
        xt = F.col(f"__xt_{k}").cast("double")
        nc = F.col(f"__nc_{k}").cast("double")
        xc = F.col(f"__xc_{k}").cast("double")
        pool = (xt + xc) / (nt + nc)
        z = F.when(
            (F.col(f"__nt_{k}") > 0)
            & (F.col(f"__nc_{k}") > 0)
            & (pool > 0)
            & (pool < 1),
            (xt / nt - xc / nc)
            / F.sqrt(pool * (1 - pool) * (1 / nt + 1 / nc)),
        )
        cells.append(
            F.struct(
                F.lit(k).alias("split"),
                F.col(f"__nt_{k}").alias("n_t"),
                F.col(f"__xt_{k}").alias("x_t"),
                F.col(f"__nc_{k}").alias("n_c"),
                F.col(f"__xc_{k}").alias("x_c"),
                z.alias("z"),
            )
        )
    return mo.select(F.explode(F.array(*cells)).alias("__s")).select(
        "__s.split", "__s.n_t", "__s.x_t", "__s.n_c", "__s.x_c", "__s.z"
    )


# ------------------------------------------------------------- MDE

# two-sided alpha=0.05 and power=0.80 normal quantiles (public
# constants, fixed literals so every engine sees identical doubles)
Z_ALPHA_2 = 1.9599639845400545
Z_BETA = 0.8416212335729143


def mde_report(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    n_per_arm: Optional[int] = None,
) -> DataFrame:
    """Minimum detectable effect per slice (public power analysis):
    with the slice's own observed variance and an equal-split
    two-arm test at alpha=0.05 / power=0.80,

        MDE_abs = (z_{α/2} + z_β) · sqrt(2·σ² / n_arm)

    — the planning number every "can we even measure this" debate
    needs: a slice whose MDE exceeds any plausible effect is not an
    experiment, it is a coin flip, and the honest report says so
    BEFORE the test ships. ``n_per_arm`` defaults to half the
    slice's rows (the run-it-on-everything case); pass a planned
    size to evaluate a design.

    One fused aggregation (exact moment sums), population variance,
    fixed-literal z constants; MDE_rel divides by the slice mean
    (NULL when the mean is 0 — a rate of nothing has no relative
    anything). Output per slice: ``group_cols..., n, mean, variance,
    n_arm, mde_abs, mde_rel``.
    """
    if value_col not in df.columns:
        raise ValueError(f"mde_report: column {value_col!r} missing")
    for c in group_cols:
        if c not in df.columns:
            raise ValueError(f"mde_report: group column {c!r} missing")
    if not group_cols:
        raise ValueError("mde_report: group_cols must be non-empty")
    if n_per_arm is not None and int(n_per_arm) < 2:
        raise ValueError(
            f"mde_report: n_per_arm must be >= 2, got {n_per_arm}"
        )
    v = F.col(value_col).cast("double")
    mo = df.where(v.isNotNull()).groupBy(
        *[F.col(c) for c in group_cols]
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
    )
    n = F.col("n").cast("double")
    mean = F.col("__s") / n
    var = F.col("__ss") / n - mean * mean
    arm = (
        F.lit(float(int(n_per_arm)))
        if n_per_arm is not None
        else F.floor(n / 2).cast("double")
    )
    mde = F.when(
        (arm >= 2) & (var > 0),
        F.lit(Z_ALPHA_2 + Z_BETA) * F.sqrt(F.lit(2.0) * var / arm),
    )
    return mo.select(
        *group_cols,
        "n",
        mean.alias("mean"),
        var.alias("variance"),
        arm.cast("long").alias("n_arm"),
        mde.alias("mde_abs"),
        F.when(mde.isNotNull() & (mean != 0), mde / mean).alias("mde_rel"),
    )
