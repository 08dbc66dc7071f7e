"""Temporal operators: as-of join, interval (range) join,
sessionization, and time-bucket rollups.

Spark's DataFrame API has no native as-of or band join (the brief's
canonical "operator the engine lacks"); a naive theta-join
(``l.ts >= r.ts``) plans as BroadcastNestedLoop/cartesian and dies at
scale. These implementations re-express each operator as shuffle-bounded
compositions of equi-joins, windows, and row-local algebra:

- ``asof_join``   — union + keyed window carry-forward: ONE shuffle of
  both sides on the key, no join at all.
- ``interval_join`` — bucketed equi-join: intervals explode into the
  fixed-width buckets they cover, points join their single bucket, the
  exact predicate filters residuals. Shuffle is O(points + intervals x
  avg_span/bucket_width), never O(points x intervals).
- ``sessionize``  — lag + running sum per key: one shuffle, one sort.
- ``time_rollup`` — date_trunc groupBy: plain partial-aggregated agg.

Skew: all four shuffle on the entity/bucket key; a hot user or a
time-bucket hot spot lands on one task. The window ops (asof, sessions)
are order-dependent so salting cannot split a key — both implement the
pre-split-by-time-range-and-stitch mitigation behind ``split_every``
(per-(key, chunk) windows bound any task at one chunk's rows; a tiny
per-chunk summary frame stitches the boundaries; outputs are
pytest-asserted identical to the unsplit path). The rollup is algebraic
and AQE/salting-safe as-is.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _nullsafe_equi_join(
    left: DataFrame, right: DataFrame, cols: Sequence[str], how: str
) -> DataFrame:
    """Equi-join treating NULL keys as ordinary values (`<=>`): the
    split-stitch frames group null keys/chunks like any other group, so
    a plain name-list join would silently DROP null-key rows from the
    stitched output. Null-safe equality still hash-partitions, so this
    plans as an ordinary shuffled join (the summary side is O(keys x
    chunks) — not necessarily broadcastable). Right-side key columns
    are renamed first (the right frame derives from the left, so bare
    names would self-resolve) and dropped after."""
    renamed = right
    for c in cols:
        renamed = renamed.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for c in cols:
        term = left[c].eqNullSafe(renamed[f"__r_{c}"])
        cond = term if cond is None else cond & term
    return left.join(renamed, cond, how).drop(*[f"__r_{c}" for c in cols])


def _check_split_every(split_every: Optional[float]) -> None:
    """Loud fence shared by every split-stitch operator: a zero chunk
    width divides by zero (Inf/NaN chunk ids) and a negative one makes
    ``floor(t / split_every)`` DECREASE in time, so the chunk-ordered
    stitch runs backwards and silently produces wrong carries/merges —
    plausible-looking output, no error (review-found)."""
    if split_every is not None and not split_every > 0:
        raise ValueError(f"split_every must be > 0 seconds, got {split_every}")


def _chunk_of(sec: Column, split_every: float) -> Column:
    """``floor(sec / split_every)`` with an IN-BAND NaN fence: Spark
    floors NaN into chunk 0 while NaN SORTS last, so a NaN value would
    teleport to the earliest chunk and silently corrupt every stitch or
    carry built on chunk order (review-found). Timestamps can't be NaN
    (casts yield NULL); only raw float/double order columns can, and
    they now raise inside the same job instead — no extra scan."""
    return F.when(
        F.isnan(sec),
        F.raise_error(
            F.lit(
                "split_every: NaN in the chunk column — NaN sorts last "
                "but floors to chunk 0; filter or repair NaN values first"
            )
        ),
    ).otherwise(F.floor(sec / F.lit(float(split_every))))


def _check_chunkable_dtype(df: DataFrame, col: str, what: str) -> None:
    """split_every needs a numeric/timestamp column to chunk on; a
    string column would cast to NULL seconds and silently collapse
    every row into one chunk."""
    d0 = dict(df.dtypes)[col]
    if not (
        d0.startswith("timestamp")
        or d0.startswith("decimal")
        or d0 in ("tinyint", "smallint", "int", "bigint", "float", "double")
    ):
        raise ValueError(
            f"split_every needs a numeric/timestamp {what} to chunk on; "
            f"{col!r} is {d0}"
        )


def _check_reserved(df: DataFrame, names: Sequence[str], op: str) -> None:
    """The split paths attach internal working columns and drop them at
    the end; an input that already carries one of those names would be
    silently overwritten AND deleted from the output — fence loudly,
    like the prev_end/op_col collisions (review-found)."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input columns {clash} collide with internal working "
            "names — rename them"
        )


def _seconds(df: DataFrame, ts_col: str) -> Column:
    """Epoch seconds (fractional) for numeric OR timestamp inputs.
    TIMESTAMP_NTZ has no direct double cast in Spark 4 — route it
    through timestamp_ltz (interpreted in the session TZ, which the
    engine pins to UTC), matching DuckDB's ``epoch()`` on the same
    naive timestamp."""
    dtype = dict(df.dtypes)[ts_col]
    c = F.col(ts_col)
    if dtype.startswith("timestamp"):
        return c.cast("timestamp_ltz").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    tolerance: Optional[float] = None,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``value_cols``
    from the right row with the greatest ``ts_col`` <= left's
    (inclusive), matching on ``by_cols``; null when no prior right row
    (or when older than ``tolerance`` seconds, if given).

    Plan shape (the scale-first trick): tag both sides, unionByName,
    ONE shuffle partitioning the union by ``by_cols``, then a running
    ``last(struct(ts, values), ignorenulls=True)`` ordered by
    (ts, side) carries each right ROW forward onto the left rows that
    follow it. Carrying the whole row as a struct (never-null for a
    right row) rather than each value column separately is what makes
    the semantics pandas ``merge_asof``-exact: a matched right row
    whose value is NULL yields NULL (a bare ``last(value,
    ignorenulls=True)`` would skip it and resurrect an OLDER row's
    value), and ``tolerance`` gates on the timestamp of the row the
    values actually came from. At equal timestamps the right row sorts
    first, so ties match inclusively. No join operator appears in the
    plan at all, so there is nothing for Catalyst to turn into a
    nested-loop: cost is one exchange + one per-key sorted scan
    regardless of how many right rows each left row skips over.

    Hot keys: the per-key window is order-dependent, so salting cannot
    split it — one pathological key (a bot user, a default id) lands
    its whole timeline on one task. ``split_every=<seconds>`` is the
    documented pre-split-and-stitch, implemented: rows chunk by
    ``floor(ts / split_every)``, the carry runs per (key, chunk) —
    bounding a task at one chunk's rows — and a per-(key, chunk)
    summary frame (max-ts right row per chunk, O(keys x chunks) rows)
    window-carries each chunk's carry-IN from earlier chunks; a row
    whose chunk has no prior right row coalesces to the carry-in.
    Output is identical to the unsplit path (asserted by pytest on a
    planted hot key).
    """
    by = list(by_cols)
    vals = list(value_cols)
    ts = _seconds(left, ts_col)

    l = left.withColumn("__side", F.lit(1))
    for v in vals:
        l = l.withColumn(f"__v_{v}", F.lit(None).cast(right.schema[v].dataType))
    r = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in vals],
    )
    # right rows contribute only key/ts/values; left keeps its payload
    u = l.unionByName(r, allowMissingColumns=True)

    _check_split_every(split_every)
    # One struct per right row — non-null whenever a right row exists,
    # even if every value column in it is NULL — so last(...,
    # ignorenulls=True) selects the latest right ROW, not the latest
    # non-null VALUE.
    rstruct = F.when(
        F.col("__side") == 0,
        F.struct(
            ts.alias("__mts"),
            *[F.col(f"__v_{v}").alias(v) for v in vals],
        ),
    )
    if split_every is None:
        w = (
            Window.partitionBy(*by)
            .orderBy(ts, F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = u.withColumn("__m", F.last(rstruct, ignorenulls=True).over(w))
    else:
        u = u.withColumn("__chunk", _chunk_of(ts, split_every))
        wc = (
            Window.partitionBy(*by, "__chunk")
            .orderBy(ts, F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = F.last(rstruct, ignorenulls=True).over(wc)
        u = u.withColumn("__w", within)
        # carry-out per chunk: the max-ts right row (== what the
        # sequential carry holds at chunk end); carry-in per chunk:
        # last non-null carry-out of any EARLIER chunk — a window over
        # the tiny per-(key, chunk) summary, never over the data
        outs = (
            u.where(F.col("__side") == 0)
            .groupBy(*by, "__chunk")
            .agg(F.max_by(rstruct, ts).alias("__out"))
        )
        chunks = u.select(*by, "__chunk").distinct()
        wprev = (
            Window.partitionBy(*by)
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_in = (
            _nullsafe_equi_join(chunks, outs, [*by, "__chunk"], "left")
            .withColumn("__in", F.last("__out", ignorenulls=True).over(wprev))
            .select(*by, "__chunk", "__in")
        )
        out = _nullsafe_equi_join(
            u, carry_in, [*by, "__chunk"], "left"
        ).withColumn("__m", F.coalesce(F.col("__w"), F.col("__in")))
    for v in vals:
        carried = F.col("__m")[v]
        if tolerance is not None:
            # gate on the matched row's own ts (null match -> null)
            carried = F.when(
                ts - F.col("__m")["__mts"] <= F.lit(float(tolerance)), carried
            )
        out = out.withColumn(v, carried)
    return out.where(F.col("__side") == 1).drop(
        "__side", "__m", "__w", "__in", "__chunk",
        *[f"__v_{v}" for v in vals],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Band join: every (point, interval) pair with
    ``lo <= point <= hi`` — WITHOUT the cartesian plan a raw range
    predicate produces.

    Both sides map into fixed-width buckets: a point belongs to exactly
    ``floor(point/width)``; an interval explodes into every bucket it
    overlaps (``sequence`` + explode, row-local). The equi-join on
    bucket id is then an ordinary shuffled hash join — candidate pairs
    only where buckets collide — and the exact BETWEEN filter runs on
    the joined rows. Shuffle volume: O(points) + O(intervals x
    span/width); pick ``bucket_width`` ~ the median interval span so
    the explode factor stays ~2.

    ``max_buckets_per_interval`` fences degenerate inputs (an interval
    spanning the whole axis would explode into the full bucket range —
    the same viral-fan-out class the dedup paths cap): wider intervals
    raise rather than silently flooding the shuffle; split such
    intervals upstream or raise the width.
    """
    width = float(bucket_width)
    p_bucket = F.floor(F.col(point_col) / width)
    lo_b = F.floor(F.col(lo_col) / width)
    hi_b = F.floor(F.col(hi_col) / width)

    guarded = intervals.withColumn(
        "__nb", (hi_b - lo_b + 1).cast("long")
    )
    # fail loudly on fan-out bombs instead of shuffling them
    bomb = guarded.where(F.col("__nb") > max_buckets_per_interval).limit(1)
    if bomb.count() > 0:
        raise ValueError(
            f"interval wider than {max_buckets_per_interval} buckets; "
            "raise bucket_width or split the interval"
        )
    iv = guarded.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b))).drop(
        "__nb"
    )
    pt = points.withColumn("__bucket", p_bucket)
    joined = pt.join(iv, on="__bucket", how="inner").drop("__bucket")
    return joined.where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Gap-based sessionization: adds ``session_idx`` (0-based per key)
    and ``session_id`` (``key#idx``). A new session starts when the gap
    since the key's previous event exceeds ``gap_seconds``.

    One shuffle (partition by key) + per-key sort; ``lag`` marks
    session starts, a running sum numbers them — both in the same
    window stage.

    Hot keys: ``split_every=<seconds>`` runs the lag + running sum per
    (key, time-chunk) — bounding a task at one chunk's rows — and
    stitches at boundaries through a per-(key, chunk) summary: chunk k
    MERGES its first session into chunk k-1's last iff the gap between
    k-1's last event and k's first event is <= gap_seconds (exactly the
    global rule, since those two events are globally consecutive), and
    each chunk's session offset is a prefix sum of prior session counts
    minus merges. Output identical to the unsplit path (pytest-planted
    hot key, sessions straddling chunk boundaries included)."""
    _check_split_every(split_every)
    gap = float(gap_seconds)
    ts = _seconds(events, ts_col)
    if split_every is None:
        w = Window.partitionBy(key_col).orderBy(ts)
        prev = F.lag(ts).over(w)
        is_new = F.when(
            prev.isNull() | ((ts - prev) > gap), F.lit(1)
        ).otherwise(F.lit(0))
        idx = (
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("long")
        out = events.withColumn("session_idx", idx)
    else:
        e = events.withColumn("__chunk", _chunk_of(ts, split_every))
        wc = Window.partitionBy(key_col, "__chunk").orderBy(ts)
        prev = F.lag(ts).over(wc)
        is_new = F.when(
            prev.isNull() | ((ts - prev) > gap), F.lit(1)
        ).otherwise(F.lit(0))
        widx = (
            F.sum(is_new).over(
                wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("long")
        e = e.withColumn("__widx", widx)
        summ = e.groupBy(key_col, "__chunk").agg(
            F.min(ts).alias("__first"),
            F.max(ts).alias("__last"),
            (F.max("__widx") + 1).alias("__nsess"),
        )
        ws = Window.partitionBy(key_col).orderBy("__chunk")
        prev_last = F.lag("__last").over(ws)
        # materialize the merge bit before summing it — windows can't
        # nest, and __merge is itself a lag over the summary frame
        summ = summ.withColumn(
            "__merge",
            F.when(
                prev_last.isNotNull() & ((F.col("__first") - prev_last) <= gap),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        # offset_k = sum_{j<k} nsess_j - sum_{j<=k} merge_j: sessions
        # opened by earlier chunks, minus every boundary that turned
        # out to be one continuing session
        cum_prev = F.coalesce(
            F.sum("__nsess").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        cum_merge = F.sum("__merge").over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        offsets = summ.select(
            key_col, "__chunk", (cum_prev - cum_merge).cast("long").alias("__off")
        )
        out = (
            _nullsafe_equi_join(e, offsets, [key_col, "__chunk"], "inner")
            .withColumn(
                "session_idx", (F.col("__off") + F.col("__widx")).cast("long")
            )
            .drop("__chunk", "__widx", "__off")
        )
    return out.withColumn(
        "session_id",
        F.concat(F.col(key_col).cast("string"), F.lit("#"), F.col("session_idx")),
    )


def session_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Per-session rollup: (key, session_idx, n_events, start_ts,
    end_ts, duration_secs). Sessionize + one algebraic groupBy — the
    second shuffle is on (key, session_idx), strictly finer than the
    first, and AQE coalesces it. ``split_every`` passes through to the
    hot-key split-stitch."""
    s = sessionize(events, key_col, ts_col, gap_seconds, split_every=split_every)
    ts = _seconds(events, ts_col)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("start_ts"),
        F.max(ts).alias("end_ts"),
        (F.max(ts) - F.min(ts)).alias("duration_secs"),
    )


def time_rollup(
    events: DataFrame,
    ts_col: str,
    unit: str,
    agg_exprs: Sequence,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Hypertable-style time-bucket rollup: groupBy
    ``date_trunc(unit, ts)`` (+ optional dimension keys) with the given
    aggregate expressions. Pure algebraic aggregation — map-side
    partial combine does most of the work; with the table
    partitioned/sorted by time the scan prunes to the queried range."""
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    return events.groupBy(bucket, *[F.col(k) for k in extra_keys]).agg(*agg_exprs)


def event_funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    split_every: Optional[float] = None,
) -> DataFrame:
    """Ordered-step funnel per key — the product-analytics primitive
    "how far did each user get through view → click → purchase?",
    where each step must occur STRICTLY AFTER the previous step's
    first qualifying occurrence (equivalently: t1 = min ts of step 1,
    t2 = min ts of step 2 with ts > t1, …).

    ONE shuffle, not one per step: the k-pass "min-then-join-then-min"
    formulation shuffles k times; here each key's step events are
    collected once, sorted row-locally, and a single ``aggregate``
    fold walks them in time order advancing a (step, last_ts) state —
    the per-key sequential scan the semantics inherently require,
    done inside the row instead of across k jobs. The collect buffer
    holds only STEP-typed events for the key (the ``isin`` filter runs
    before the shuffle), the usual per-user cardinality bound.

    Hot keys: ``split_every=<seconds>`` bounds any task at ONE time
    chunk's step events, like ``sessionize``/``asof_join``. The fold
    state ``(step, last_ts)`` composes associatively across ordered
    chunks, and — because two events with equal timestamps always land
    in the SAME chunk — an incoming ``last_ts`` is strictly below
    every timestamp in a later chunk, so only the incoming STEP can
    gate a later chunk's fold. Each (key, chunk) therefore reduces to
    a transition table ``T[s] = fold(chunk events, init step=s)`` for
    the n possible incoming steps, and a per-key fold over the tiny
    O(keys x chunks) summary frame stitches chunks left-to-right:
    ``state = T_chunk[state.step]``, absorbing once complete. Output
    identical to the unsplit path (pytest-planted hot key).

    Tie semantics: equal timestamps do NOT advance (strict ``>``), so
    the result is insensitive to the sort order of same-timestamp
    events — and therefore deterministic and engine-replayable.

    Returns ``(key_col, steps_completed, completed_ts)`` — one row per
    key that has at least one step-typed event; ``completed_ts`` is
    the epoch-seconds of the final step (NULL unless all steps
    completed).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    _check_split_every(split_every)
    ts = _seconds(events, ts_col)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    filtered = events.where(F.col(type_col).isin(list(steps)))
    evs_agg = F.array_sort(
        F.collect_list(F.struct(ts.alias("ts"), F.col(type_col).alias("t")))
    ).alias("__evs")

    def fold(acc, ev):
        # try_element_at: NULL past the end (funnel already complete)
        # instead of an ANSI index error; NULL comparison is false
        want = F.try_element_at(steps_arr, acc["step"] + F.lit(1))
        advance = (
            want.isNotNull()
            & (ev["t"] == want)
            & (ev["ts"] > acc["last_ts"])
        )
        return F.when(
            advance,
            F.struct(
                (acc["step"] + F.lit(1)).alias("step"),
                ev["ts"].alias("last_ts"),
            ),
        ).otherwise(acc)

    def run_fold(start_step: int):
        init = F.struct(
            F.lit(start_step).alias("step"),
            F.lit(float("-inf")).alias("last_ts"),
        )
        return F.aggregate(F.col("__evs"), init, fold)

    def finish(frame, final):
        return frame.select(
            F.col(key_col),
            final["step"].alias("steps_completed"),
            F.when(final["step"] == n, final["last_ts"]).alias("completed_ts"),
        )

    if split_every is None:
        return finish(filtered.groupBy(key_col).agg(evs_agg), run_fold(0))

    # Split-stitch: fold each (key, time-chunk) once per possible
    # incoming step (n tiny folds over the SAME sorted chunk array —
    # within-chunk tie semantics preserved by the -inf init, and
    # cross-chunk ties cannot exist because equal ts => equal chunk),
    # then stitch the O(keys x chunks) summary left-to-right.
    per_chunk = (
        filtered.withColumn("__chunk", _chunk_of(ts, split_every))
        .groupBy(key_col, "__chunk")
        .agg(evs_agg)
    )
    trans = F.array(*[run_fold(s) for s in range(n)])
    stitched = (
        per_chunk.select(F.col(key_col), F.col("__chunk"), trans.alias("__tr"))
        .groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__chunk").alias("c"), F.col("__tr").alias("tr"))
                )
            ).alias("__chunks")
        )
    )
    init2 = F.struct(
        F.lit(0).alias("step"), F.lit(None).cast("double").alias("last_ts")
    )

    def fold2(acc, ch):
        # absorbing once complete; try_element_at guards the (never
        # taken at runtime) step==n lookup against ANSI index errors
        t = F.try_element_at(ch["tr"], acc["step"] + F.lit(1))
        return F.when(acc["step"] == n, acc).otherwise(
            F.struct(
                t["step"].alias("step"),
                F.when(t["step"] > acc["step"], t["last_ts"])
                .otherwise(acc["last_ts"])
                .alias("last_ts"),
            )
        )

    return finish(stitched, F.aggregate(F.col("__chunks"), init2, fold2))


def retention_cohorts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    period_seconds: float = 604800.0,
) -> DataFrame:
    """Retention cohort matrix — the other standard product-analytics
    rollup: keys cohorted by their FIRST activity period, then counted
    in every later period they were active. Returns
    ``(cohort_period, periods_since, n_active)`` where
    ``cohort_period`` is the epoch-anchored period index (floor(epoch /
    period_seconds) — fixed-width periods, not calendar weeks) and
    ``periods_since`` is 0 for the cohort period itself.

    Shape: distinct (key, period) pairs first (one partial-aggregated
    shuffle — this dedupes the raw event volume down to at most
    keys × active-periods), per-key min as the cohort (a second agg on
    the already-deduped frame, same key partitioning so AQE keeps it
    co-located), join back on the key, and a final O(cohorts ×
    periods)-row count. Nothing scales with raw event count past the
    first dedup; no UDF anywhere.
    """
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    ts = _seconds(events, ts_col)
    period = F.floor(ts / F.lit(float(period_seconds)))
    active = (
        events.select(F.col(key_col), period.alias("__period")).distinct()
    )
    cohorts = active.groupBy(key_col).agg(F.min("__period").alias("__cohort"))
    # null-safe join-back (module convention): a NULL key is a real
    # group (anonymous traffic) and must keep its cohort row — a plain
    # name-list join would silently drop it from the matrix
    return (
        _nullsafe_equi_join(active, cohorts, [key_col], "inner")
        .groupBy(
            F.col("__cohort").alias("cohort_period"),
            (F.col("__period") - F.col("__cohort")).alias("periods_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def rolling_zscore(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    frame_seconds: float = 3600.0,
    z_threshold: float = 4.0,
    min_points: int = 8,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Trailing-window anomaly detection: for every event, the z-score
    of its value against the OTHER events of the same key in the
    preceding ``frame_seconds`` — the windowed form of a range
    constraint, for metrics whose normal band moves with time. Adds
    ``n_window`` (peer count, self excluded), ``z`` (NULL when the
    window is too thin: fewer than ``min_points`` peers, or zero
    variance) and ``is_anomaly`` (``|z| > z_threshold``; never NULL).

    Mechanics: ONE range frame per key (``[t - frame_seconds, t]``,
    peers at the same timestamp included) computes sum/sum-of-squares/
    count; the current row is subtracted out algebraically
    (leave-one-out), so there is no off-by-one-second frame hack and
    ties behave identically on every engine. Variance uses the sample
    formula ``(ss - s^2/n)/(n-1)`` over the n peers. Whole-stage
    codegen throughout — no UDF.

    Scale: the shuffle is one hash partition by key; a hot key is one
    task's sort. ``split_every`` (seconds, must be >= frame_seconds)
    splits each key's timeline into independent chunks, duplicating
    only the trailing ``frame_seconds`` of each chunk into the next as
    context rows — exact (the frame never looks back further), and
    per-task work drops from O(key's rows) to O(rows per chunk)."""
    if min_points < 2:
        raise ValueError("min_points must be >= 2 (variance needs 2 peers)")
    if float(frame_seconds) != int(frame_seconds):
        raise ValueError(
            "frame_seconds must be integral (rangeBetween takes long "
            f"offsets), got {frame_seconds}"
        )
    _check_split_every(split_every)
    if split_every is not None and split_every < frame_seconds:
        raise ValueError(
            f"split_every={split_every} must be >= frame_seconds="
            f"{frame_seconds}: a shorter chunk cannot carry the full "
            "lookback context"
        )
    v = F.col(value_col).cast("double")
    base = events.withColumn("__t", _seconds(events, ts_col))
    if split_every is not None:
        chunk = _chunk_of(F.col("__t"), split_every)
        cur = base.withColumn("__chunk", chunk).withColumn(
            "__ctx", F.lit(False)
        )
        carry = (
            # pmod, not %: Spark's remainder keeps the dividend's sign,
            # so a negative timestamp would never test >= the carry
            # cutoff and the split path would silently lose its context
            # rows (review-found)
            base.where(
                F.pmod(F.col("__t"), F.lit(float(split_every)))
                >= F.lit(float(split_every - frame_seconds))
            )
            .withColumn("__chunk", chunk + 1)
            .withColumn("__ctx", F.lit(True))
        )
        base = cur.unionByName(carry)
        part = [F.col(key_col), F.col("__chunk")]
    else:
        part = [F.col(key_col)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col("__t"))
        .rangeBetween(-int(frame_seconds), 0)
    )
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    n = F.count(v).over(w)
    # leave-one-out: stats over the n-1 PEERS (nulls never enter: a
    # null value is not counted by n and contributes nothing to s/ss)
    n1 = n - F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    s1 = s - F.coalesce(v, F.lit(0.0))
    ss1 = ss - F.coalesce(v * v, F.lit(0.0))
    mean = s1 / n1
    var = (ss1 - s1 * s1 / n1) / (n1 - 1)
    z = F.when((n1 >= min_points) & (var > 0), (v - mean) / F.sqrt(var))
    out = (
        base.withColumn("n_window", n1.cast("long"))
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(z) > F.lit(float(z_threshold)), F.lit(False)),
        )
    )
    if split_every is not None:
        out = out.where(~F.col("__ctx")).drop("__ctx", "__chunk")
    return out.drop("__t")


def _last_row_struct(order_cols: Sequence[str], capture_cols: Sequence[str]):
    """``max()`` operand picking the row with the greatest
    ``order_cols`` tuple, carrying ``capture_cols`` in a nested
    ``__cap`` struct behind the comparison fields: the lexicographic
    struct max IS "last row by order", algebraic, so it
    partial-aggregates map-side. Shared by ``_with_prev``'s chunk
    summary and ``cdc.latest_by_key`` — one kernel, one set of
    NULL-ordering/tie rules (Spark struct comparison, NULL fields
    lowest; captures only consulted if the full order tuple ties)."""
    return F.max(
        F.struct(
            *[F.col(c).alias(c) for c in order_cols],
            F.struct(*[F.col(c).alias(c) for c in capture_cols]).alias("__cap"),
        )
    )


def _with_prev(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    capture: dict,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Attach, for every row, values captured from the PREVIOUS row of
    the same key in ``order_cols`` order: ``capture`` maps output column
    name -> source column name. First row of a key gets NULLs. The
    shared kernel of the sequence validators (``monotonic_violations``,
    ``sequence_gaps``).

    Unsplit: one ``lag`` window — one shuffle on the key, O(1) window
    state, and the per-key sort is external (spills), so a hot key is
    slow but never OOM.

    ``split_every`` bounds a hot key's SORT too: rows chunk on
    ``floor(order_cols[0] / split_every)`` (epoch seconds for
    timestamps), lag runs per (key, chunk), and each chunk's first row
    takes its prev from a per-(key, chunk) "last row" summary shifted
    by one chunk — O(keys x chunks) rows, exactly the sessionize
    stitch shape. Equal first-order values always share a chunk, so the
    chunked order is the global order and the output is identical to
    the unsplit path (pytest-asserted). The summary's struct-max needs
    the order tuple total per key to pick the true last row — the same
    contract lag itself needs for a deterministic answer."""
    _check_split_every(split_every)
    keys = list(key_cols)
    order = list(order_cols)
    srcs = list(dict.fromkeys(capture.values()))
    if split_every is None:
        w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
        out = df
        for name, src in capture.items():
            out = out.withColumn(name, F.lag(F.col(src)).over(w))
        return out
    _check_chunkable_dtype(df, order[0], "first order column")
    _check_reserved(df, ["__chunk", "__rn", "__carry"], "_with_prev")
    chunk = _chunk_of(_seconds(df, order[0]), split_every)
    base = df.withColumn("__chunk", chunk)
    wc = Window.partitionBy(*keys, "__chunk").orderBy(*[F.col(c) for c in order])
    out = base.withColumn("__rn", F.row_number().over(wc))
    for name, src in capture.items():
        out = out.withColumn(name, F.lag(F.col(src)).over(wc))
    last = _last_row_struct(order, srcs).alias("__last")
    ws = Window.partitionBy(*keys).orderBy(F.col("__chunk"))
    summ = (
        base.groupBy(*keys, "__chunk")
        .agg(last)
        .select(
            *keys,
            "__chunk",
            F.lag(F.col("__last.__cap")).over(ws).alias("__carry"),
        )
    )
    out = _nullsafe_equi_join(out, summ, keys + ["__chunk"], "left")
    for name, src in capture.items():
        out = out.withColumn(
            name,
            F.when(F.col("__rn") == 1, F.col(f"__carry.{src}")).otherwise(
                F.col(name)
            ),
        )
    return out.drop("__chunk", "__rn", "__carry")


def _first_row_struct(order_cols: Sequence[str], capture_cols: Sequence[str]):
    """``min()`` operand picking the row with the SMALLEST
    ``order_cols`` tuple — the mirror of ``_last_row_struct`` for
    lead-shaped stitches. Spark struct comparison puts NULL fields
    lowest, so a NULL-order row wins the min exactly as it sorts FIRST
    under the window's ASC default — kernel and window agree on which
    row is "first"."""
    return F.min(
        F.struct(
            *[F.col(c).alias(c) for c in order_cols],
            F.struct(*[F.col(c).alias(c) for c in capture_cols]).alias("__cap"),
        )
    )


def _with_next(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    capture: dict,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Attach, for every row, values captured from the NEXT row of the
    same key in ``order_cols`` order — the ``lead`` mirror of
    ``_with_prev``: ``capture`` maps output column name -> source
    column name; the last row of a key gets NULLs. Powers
    ``cdc.scd2_history`` (validity-interval close) and
    ``time_weighted_average`` (segment duration).

    Unsplit: one ``lead`` window — one shuffle on the key, O(1) window
    state, external per-key sort (a hot key is slow, never OOM).

    ``split_every`` bounds a hot key's sort symmetrically to
    ``_with_prev``: rows chunk on ``floor(order_cols[0] /
    split_every)``, lead runs per (key, chunk), and each chunk's LAST
    row takes its next from the FOLLOWING chunk's first-row summary —
    ``_first_row_struct`` per (key, chunk) plus a per-chunk row count
    to identify the last in-chunk row (the multi-column order tuple
    cannot be reversed generically, so "last" comes from ``__rn ==
    count`` rather than a descending rank). Equal first-order values
    always share a chunk, so chunked order == global order and the
    output is identical to the unsplit path (pytest-asserted)."""
    _check_split_every(split_every)
    keys = list(key_cols)
    order = list(order_cols)
    srcs = list(dict.fromkeys(capture.values()))
    if split_every is None:
        w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
        out = df
        for name, src in capture.items():
            out = out.withColumn(name, F.lead(F.col(src)).over(w))
        return out
    _check_chunkable_dtype(df, order[0], "first order column")
    _check_reserved(df, ["__chunk", "__rn", "__cnt", "__carry"], "_with_next")
    chunk = _chunk_of(_seconds(df, order[0]), split_every)
    base = df.withColumn("__chunk", chunk)
    wc = Window.partitionBy(*keys, "__chunk").orderBy(*[F.col(c) for c in order])
    out = base.withColumn("__rn", F.row_number().over(wc))
    for name, src in capture.items():
        out = out.withColumn(name, F.lead(F.col(src)).over(wc))
    first = _first_row_struct(order, srcs).alias("__first")
    ws = Window.partitionBy(*keys).orderBy(F.col("__chunk"))
    summ = (
        base.groupBy(*keys, "__chunk")
        .agg(first, F.count(F.lit(1)).alias("__cnt"))
        .select(
            *keys,
            "__chunk",
            "__cnt",
            F.lead(F.col("__first.__cap")).over(ws).alias("__carry"),
        )
    )
    out = _nullsafe_equi_join(out, summ, keys + ["__chunk"], "left")
    for name, src in capture.items():
        out = out.withColumn(
            name,
            F.when(F.col("__rn") == F.col("__cnt"), F.col(f"__carry.{src}")).otherwise(
                F.col(name)
            ),
        )
    return out.drop("__chunk", "__rn", "__cnt", "__carry")


def time_weighted_average(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    order_cols: Optional[Sequence[str]] = None,
    end_ts: Optional[float] = None,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Time-weighted average of a piecewise-constant signal per key —
    the TWAP/utilization primitive a plain ``avg`` gets wrong whenever
    observations are unevenly spaced (a sensor that reports on change,
    a price feed, a gauge metric): each observation holds from its own
    timestamp until the NEXT observation of the same key, so its weight
    is that duration, not 1. The reference has only unweighted
    describe-stats (field_analyzer min/max/mean); this is the
    north-rule temporal extension of the same per-column statistic.

    ``end_ts`` (epoch seconds) extends the LAST observation of every
    key to a known horizon (a day boundary, "now"); without it the
    last segment has unknown duration and is excluded — the
    conventional closed-interval TWAP over [first_ts, last_ts]. A key
    whose last observation is AFTER ``end_ts`` has that one segment
    masked out (a negative duration would silently subtract coverage).

    Rows with a NULL value are masked out of BOTH sums (their segment
    is "signal unknown", not "signal zero"); a NULL timestamp sorts
    first and yields NULL durations that likewise drop out. Ties on the
    order tuple make segment attribution nondeterministic — append a
    unique id via ``order_cols`` (defaults to ``[ts_col]``).

    Output: one row per key — ``weighted_sum`` (sum of value x
    seconds), ``covered_seconds``, ``twa = weighted_sum /
    covered_seconds`` (NULL when nothing is covered, via try_divide —
    ANSI mode would otherwise abort on a single-observation key).

    Scale: one ``_with_next`` lead (one shuffle, O(1) state,
    ``split_every`` caps hot-key sorts) + one algebraic groupBy that
    partial-aggregates map-side. Exactness: with integer-valued value
    and whole-second timestamps every product and both sums are exact
    integers in doubles, so the single final division is deterministic
    and engine-replayable (the oracle strategy)."""
    keys = list(key_cols)
    order = list(order_cols) if order_cols is not None else [ts_col]
    if order[0] != ts_col:
        # durations are next_ts - ts along the order; any other leading
        # order column can make them negative and silently poison the
        # sums — same fence shape as interval_overlaps' start-major rule
        raise ValueError(
            f"order_cols must lead with ts_col ({ts_col!r}); got "
            f"{order[0]!r} — append tiebreaks after it instead"
        )
    _check_reserved(df, ["__next_ts"], "time_weighted_average")
    out = _with_next(df, keys, order, {"__next_ts": ts_col}, split_every)
    sec = _seconds(out, ts_col)
    nxt = _seconds(out, "__next_ts")
    if end_ts is not None:
        nxt = F.coalesce(nxt, F.lit(float(end_ts)))
    # an end_ts earlier than a key's last observation would make that
    # segment NEGATIVE and silently subtract from both sums — mask it
    # out instead (ts-major order guarantees every in-sequence segment
    # is >= 0, so only the end_ts segment can trip this)
    dur = F.when(F.col(value_col).isNotNull() & (nxt >= sec), nxt - sec)
    wsum = F.sum(F.col(value_col) * dur).alias("weighted_sum")
    cov = F.sum(dur).alias("covered_seconds")
    return (
        out.groupBy(*keys)
        .agg(wsum, cov)
        .withColumn(
            "twa", F.try_divide(F.col("weighted_sum"), F.col("covered_seconds"))
        )
    )


def interval_overlaps(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    order_cols: Optional[Sequence[str]] = None,
    touching_ok: bool = True,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Double-booking detection — the complement of ``sequence_gaps``:
    per key, rows whose interval [start, end] overlaps ANY earlier
    interval of the same key (a session that started before the last
    one ended, a sensor reporting two readings for the same window).
    With the gap/overlap/monotonic trio a timeline's integrity is fully
    checkable: no holes, no double-cover, no regressions.

    Returns the violating rows plus ``prev_end`` — the latest end among
    all STRICTLY EARLIER intervals (ordered by ``order_cols``, default
    ``[start, end]``) — so the report shows what the row collided with.
    ``touching_ok=True`` (default) treats end == next start as clean
    (half-open interval semantics); ``False`` flags the touch too.
    ``order_cols`` MUST lead with ``start_col`` (fenced) — the running
    max is only a valid overlap test start-major; append tiebreaks
    (a unique id) after it for deterministic attribution. NULL starts
    and ends never violate AND never accuse: a NULL-start interval's
    end is masked out of the running max (its overlap is
    indeterminate).

    The check is a RUNNING MAX of the end column over the preceding
    rows — not a lag: an interval can overlap one that started long ago
    and outlasted everything since (the umbrella meeting), which a
    previous-row-only compare would miss. One shuffle by key, O(1)
    window state, external sort; at a hot key the sort is the cost,
    same as ``sequence_gaps``.

    ``split_every`` bounds a hot key's sort like its siblings, with a
    CHUNK-MAX carry instead of a last-row stitch: rows chunk on
    ``floor(start / split_every)`` (equal starts share a chunk, and
    start leads the order, so chunks respect the global order), the
    running max runs per (key, chunk), and each chunk's carry-in is the
    max of all EARLIER chunks' masked-end maxima — an O(keys x chunks)
    summary window. ``prev_end = greatest(in-chunk running max,
    carry-in)`` reproduces the unsplit answer exactly
    (pytest-asserted, hypothesis-differentialed)."""
    keys = list(key_cols)
    order = list(order_cols) if order_cols is not None else [start_col, end_col]
    if order[0] != start_col:
        # the running-max test is only a valid overlap check when rows
        # are start-major: any other leading order makes a LATER-
        # starting interval's end precede an earlier one and manufactures
        # false positives (review-found)
        raise ValueError(
            f"order_cols must lead with start_col ({start_col!r}); "
            f"got {order[0]!r} — append tiebreaks after it instead"
        )
    if "prev_end" in df.columns:
        raise ValueError(
            "input already has a 'prev_end' column — rename it; the "
            "report attaches its own"
        )
    _check_split_every(split_every)
    start = F.col(start_col)
    # a NULL-start interval's overlap is indeterminate: mask its end out
    # of the running max so it can't manufacture violations downstream
    # (three-valued logic, review-found); its own row never violates
    # either (NULL comparison below)
    masked_end = F.when(start.isNotNull(), F.col(end_col))
    if split_every is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*[F.col(c) for c in order])
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = df.withColumn("prev_end", F.max(masked_end).over(w))
    else:
        _check_chunkable_dtype(df, start_col, "start column")
        _check_reserved(
            df, ["__chunk", "__inmax", "__carry"], "interval_overlaps"
        )
        chunk = _chunk_of(_seconds(df, start_col), split_every)
        base = df.withColumn("__chunk", chunk)
        wc = (
            Window.partitionBy(*keys, "__chunk")
            .orderBy(*[F.col(c) for c in order])
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = base.withColumn("__inmax", F.max(masked_end).over(wc))
        ws = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__chunk"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        summ = (
            base.groupBy(*keys, "__chunk")
            .agg(F.max(masked_end).alias("__cmax"))
            .select(
                *keys,
                "__chunk",
                F.max(F.col("__cmax")).over(ws).alias("__carry"),
            )
        )
        out = _nullsafe_equi_join(out, summ, keys + ["__chunk"], "left")
        # greatest skips NULLs: first chunk (no carry) and all-masked
        # chunks degrade to the other operand
        out = out.withColumn(
            "prev_end", F.greatest(F.col("__inmax"), F.col("__carry"))
        ).drop("__chunk", "__inmax", "__carry")
    bad = (F.col("prev_end") > start) if touching_ok else (
        F.col("prev_end") >= start
    )
    return out.where(bad)


def _regression_predicate(prev, cur, strict: bool, decreasing: bool):
    """The monotonicity-violation predicate, defined ONCE for the batch
    and streaming twins (their union-of-sinks == batch contract depends
    on the semantics never desynchronizing). Three-valued: NULL prev or
    cur never violates."""
    if decreasing:
        return (prev < cur) if not strict else (prev <= cur)
    return (prev > cur) if not strict else (prev >= cur)


def monotonic_violations(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    strict: bool = False,
    decreasing: bool = False,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Ordering-invariant check: rows where ``value_col`` regresses
    against the previous row of the same key in ``order_cols`` order —
    the sequence form of a range constraint (a counter that reset, a
    timestamp that went backwards under clock skew, a version that got
    rolled back). Returns the violating rows (all input columns) plus
    ``prev_<value_col>``; non-violating keys drop out entirely.

    ``strict=True`` also flags plateaus (requires strictly increasing);
    ``decreasing=True`` mirrors the direction. NULL values never
    violate (three-valued comparison; nullability is ``null_rate``'s
    job, not a sequence check's) and NULL order values sort first
    (Spark's ASC default — note DuckDB defaults to NULLS LAST since
    v0.8, so an oracle replay over a NULLable order column must pin
    ``NULLS FIRST`` explicitly).

    Scale: the ``_with_prev`` kernel — one shuffle, no row buffering;
    ``split_every`` caps a hot key's task at one time-chunk of rows.
    The order tuple should be total per key (append a unique id) or
    prev is whichever tied row the sort emitted first."""
    prev_name = f"prev_{value_col}"
    _check_reserved(df, [prev_name], "monotonic_violations")
    out = _with_prev(df, key_cols, order_cols, {prev_name: value_col}, split_every)
    return out.where(
        _regression_predicate(F.col(prev_name), F.col(value_col), strict, decreasing)
    )


def sequence_gaps(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    min_gap_seconds: float,
    order_cols: Optional[Sequence[str]] = None,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Coverage-gap detection: per key, the holes in the event timeline
    — consecutive events more than ``min_gap_seconds`` apart. The
    freshness/completeness validator for feeds that are supposed to
    tick steadily (a sensor that went dark overnight, an ingest that
    skipped a day). One row per hole: key columns + ``gap_start`` /
    ``gap_end`` (the bracketing events' timestamps, original dtype) +
    ``gap_seconds`` (double, epoch-seconds difference).

    Ties on ``ts_col`` are harmless without a tiebreak: whichever tied
    row sorts first, the VALUES bracketing every hole are the same
    (equal timestamps produce a zero gap that never emits). Pass
    ``order_cols`` to pin a total order anyway when downstream wants
    deterministic row identity. NULL timestamps sort first and never
    emit a gap (NULL arithmetic), they just don't break the chain.

    Scale: identical to ``monotonic_violations`` — one shuffle, O(1)
    state, ``split_every`` bounds hot-key sorts; a chunk boundary
    cannot hide a hole because the carried last-row stitches the two
    bracketing events back together (pytest: split == unsplit)."""
    order = list(order_cols) if order_cols is not None else [ts_col]
    _check_reserved(df, ["gap_start", "gap_seconds"], "sequence_gaps")
    out = _with_prev(df, key_cols, order, {"gap_start": ts_col}, split_every)
    gap = _seconds(out, ts_col) - _seconds(out, "gap_start")
    out = out.withColumn("gap_seconds", gap)
    return out.where(F.col("gap_seconds") > F.lit(float(min_gap_seconds))).select(
        *key_cols,
        "gap_start",
        F.col(ts_col).alias("gap_end"),
        "gap_seconds",
    )


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    order_col: Optional[str] = None,
    max_fill: int = 100_000,
) -> DataFrame:
    """Regularize a per-key event stream onto a fixed time grid with
    forward-fill: one row per (key, interval bucket) from each key's
    first observation to its last, carrying the most recent observed
    value across empty buckets — the resample-and-ffill primitive that
    feeds drift/rolling monitors expecting an evenly spaced series.

    Output: (*key_cols, bucket_epoch:long, value, is_filled:boolean)
    where ``bucket_epoch`` is the bucket's epoch-second floor and
    ``is_filled`` marks rows synthesized into observation gaps.

    Semantics: the bucket's value is the observation with the MAXIMUM
    ``order_col`` inside it (``max_by`` — pass a unique id; it defaults
    to ``ts_col``, where intra-bucket ties pick an arbitrary row). Rows
    with NULL timestamps carry no timeline position and are dropped.
    The series neither back-fills before a key's first observation nor
    extrapolates past its last — gap-fill, not forecasting.

    Plan (no join, no UDF): ONE ``groupBy(key, bucket)`` collapses the
    corpus to at most timeline_span/interval rows per key (map-side
    partial combine — a year of hourly buckets is <=8760 rows per key
    no matter how many raw events hit it, so the subsequent per-key
    window sorts bounded data even for the hottest key), then a single
    ``lead`` window per key, then a row-local ``sequence``/``explode``
    that synthesizes each gap from its left-bracketing row. The
    per-row fanout is fenced IN-BAND at ``max_fill`` buckets
    (``raise_error`` inside the same job — no extra scan), so one
    pathological gap cannot OOM a task by exploding an unbounded
    array."""
    grid = _resample_grid(
        df, key_cols, ts_col, value_col, interval_seconds, order_col,
        max_fill, op="resample_ffill", with_next_value=False,
    )
    return grid.select(*key_cols, "bucket_epoch", value_col, "is_filled")


def _resample_grid(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    order_col: Optional[str],
    max_fill: int,
    op: str,
    with_next_value: bool,
) -> DataFrame:
    """Shared grid kernel of ``resample_ffill`` / ``resample_interpolate``:
    collapse to one row per (key, interval bucket) via ``max_by`` on
    ``order_col``, attach each bucket's successor with one ``lead``
    window per key, then synthesize the gap rows with a fenced row-local
    ``sequence``/``explode``. Returns the exploded frame still carrying
    ``__bucket``/``__next`` (and ``__nextval`` when ``with_next_value``)
    so each fill policy derives its value from the bracketing rows."""
    keys = list(key_cols)
    if not keys:
        raise ValueError(f"{op}: need at least one key column")
    if not isinstance(interval_seconds, int) or interval_seconds <= 0:
        raise ValueError(
            f"{op}: interval_seconds must be a positive int, "
            f"got {interval_seconds!r}"
        )
    if max_fill < 1:
        raise ValueError(f"{op}: max_fill must be >= 1, got {max_fill}")
    for c in keys + [ts_col, value_col]:
        if c not in df.columns:
            raise ValueError(f"{op}: column {c!r} missing")
    order = order_col if order_col is not None else ts_col
    if order not in df.columns:
        raise ValueError(f"{op}: order column {order!r} missing")
    _check_chunkable_dtype(df, ts_col, "timestamp column")
    _check_reserved(
        df,
        ["__bucket", "__next", "__nextval", "bucket_epoch", "is_filled"],
        op,
    )

    step = F.lit(int(interval_seconds)).cast("long")
    bucketed = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn(
            "__bucket",
            (F.floor(_seconds(df, ts_col) / step) * step).cast("long"),
        )
        .groupBy(*keys, "__bucket")
        .agg(F.max_by(F.col(value_col), F.col(order)).alias(value_col))
    )
    w = Window.partitionBy(*keys).orderBy("__bucket")
    laid = bucketed.withColumn("__next", F.lead("__bucket").over(w))
    if with_next_value:
        laid = laid.withColumn("__nextval", F.lead(F.col(value_col)).over(w))
    n_fill = (F.col("__next") - F.col("__bucket")) / step
    seq_end = F.when(
        n_fill > F.lit(int(max_fill)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"{op}: a single gap spans more than "
                    f"max_fill={max_fill} buckets ("
                ),
                n_fill.cast("long").cast("string"),
                F.lit(
                    ") — widen interval_seconds, raise max_fill, or "
                    "split the key's timeline"
                ),
            )
        ).cast("long"),
    ).otherwise(F.col("__next") - step)
    return laid.withColumn(
        "bucket_epoch",
        F.explode(
            F.sequence(F.col("__bucket"), F.coalesce(seq_end, F.col("__bucket")), step)
        ),
    ).withColumn("is_filled", F.col("bucket_epoch") != F.col("__bucket"))


def resample_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    order_col: Optional[str] = None,
    max_fill: int = 100_000,
) -> DataFrame:
    """Regularize a per-key event stream onto a fixed time grid with
    LINEAR interpolation across observation gaps — the numeric sibling
    of ``resample_ffill`` for metrics where a held value misleads
    (counters, gauges, sensor series) and the straight line between the
    bracketing observations is the honest estimate.

    Output: (*key_cols, bucket_epoch:long, value:double,
    is_filled:boolean). Observed buckets keep their observed value
    (cast to double, bit-exact for any float input); a synthesized
    bucket at epoch ``b`` between observations ``(t0, v0)`` and
    ``(t1, v1)`` gets ``v0 + (v1 - v0) * ((b - t0) / (t1 - t0))`` —
    exact integer epoch differences into one IEEE division, so the
    result is engine-reproducible bit-for-bit. A gap whose right
    bracket carries a NULL value interpolates to NULL (no silent hold);
    the series neither back-fills before the first observation nor
    extrapolates past the last, exactly like ``resample_ffill``.

    Plan: identical to ``resample_ffill`` (shared kernel) plus one more
    ``lead`` in the SAME window — one groupBy collapse, one per-key
    window over bounded bucket rows, one fenced row-local explode; no
    join, no UDF, and the hottest key's window sorts at most
    timeline_span/interval rows regardless of raw event count."""
    grid = _resample_grid(
        df, key_cols, ts_col, value_col, interval_seconds, order_col,
        max_fill, op="resample_interpolate", with_next_value=True,
    )
    v0 = F.col(value_col).cast("double")
    v1 = F.col("__nextval").cast("double")
    frac = (F.col("bucket_epoch") - F.col("__bucket")).cast("double") / (
        F.col("__next") - F.col("__bucket")
    ).cast("double")
    filled = v0 + (v1 - v0) * frac
    return grid.select(
        *key_cols,
        "bucket_epoch",
        F.when(F.col("is_filled"), filled).otherwise(v0).alias(value_col),
        "is_filled",
    )


def cusum_scores(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    target: float = 0.0,
    slack: float = 0.0,
    threshold: float = 25.0,
    order_col: Optional[str] = None,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Tabular CUSUM changepoint detection per key: the classic
    two-sided control statistic

        SH_i = max(0, SH_{i-1} + (x_i - target - slack))
        SL_i = max(0, SL_{i-1} + (target - slack - x_i))

    which accumulates evidence of a SUSTAINED mean shift (up / down)
    and resets whenever the series returns to band — the
    change-detection complement of ``rolling_zscore``'s point-anomaly
    flags. Adds ``cusum_high``/``cusum_low`` (doubles) and ``is_alert``
    (either statistic above ``threshold``; never NULL).

    The recurrence looks inherently sequential, but it has a closed
    window form: with prefix sums ``P_i = Σ_{j<=i} (x_j - target -
    slack)``, ``SH_i = P_i - min(0, min_{j<=i} P_j)`` (induction on the
    ``max(0, ·)`` reset; the 0 term is the empty prefix). So the whole
    operator is TWO stacked windows per key — a running sum, then a
    running min of it — over one shuffle and one sort, whole-stage
    codegen, no UDF and no iterative driver loop. With integer-valued
    inputs and integral ``target``/``slack`` every intermediate is an
    exact integer, so results are bit-identical on any engine and any
    partitioning.

    NULL values contribute nothing to either prefix (window sums skip
    NULLs on every engine); a NULL-valued row reads the running
    statistic of the prefix excluding it — "ignore missing points"
    semantics — and the statistic itself is never NULL (a row with no
    observed prefix reads the starting state, 0). Rows with NULL
    timestamps carry no timeline position and are dropped. Pass
    ``order_col`` (a unique id) to pin tie order when timestamps
    collide — without it, equal-timestamp rows accumulate in an
    arbitrary engine order.

    Scale: one hash partition by key; the per-key sort is external
    (spills, never OOMs), but a hot key is one task's sort.
    ``split_every`` (seconds) bounds that: prefix sums and running
    mins are computed per (key, time-chunk) and stitched through a
    per-chunk summary frame — a chunk's global prefix is the carried
    sum of all earlier chunks plus its local prefix, and the global
    running min is ``least(0, min over earlier chunks of their
    carried-adjusted min, carried sum + local running min)`` — exact,
    associative, O(keys x chunks) summary rows."""
    _check_split_every(split_every)
    for c in [key_col, ts_col, value_col]:
        if c not in events.columns:
            raise ValueError(f"cusum_scores: column {c!r} missing")
    if order_col is not None and order_col not in events.columns:
        raise ValueError(f"cusum_scores: order column {order_col!r} missing")
    _check_reserved(
        events,
        ["__t", "__chunk", "__ph", "__pl", "__mh", "__ml",
         "cusum_high", "cusum_low", "is_alert"],
        "cusum_scores",
    )
    v = F.col(value_col).cast("double")
    d_hi = v - F.lit(float(target) + float(slack))
    d_lo = F.lit(float(target) - float(slack)) - v
    base = events.where(F.col(ts_col).isNotNull()).withColumn(
        "__t", _seconds(events, ts_col)
    )
    order = [F.col("__t")] + ([F.col(order_col)] if order_col else [])

    if split_every is None:
        w = (
            Window.partitionBy(key_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            base.withColumn("__ph", F.sum(d_hi).over(w))
            .withColumn("__pl", F.sum(d_lo).over(w))
        )
        wm = (
            Window.partitionBy(key_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # coalesce: a row before any observed value reads prefix 0 (the
        # CUSUM starting state); F.least skips the NULL min the same way
        hi = F.coalesce(F.col("__ph"), F.lit(0.0)) - F.least(
            F.lit(0.0), F.min("__ph").over(wm)
        )
        lo = F.coalesce(F.col("__pl"), F.lit(0.0)) - F.least(
            F.lit(0.0), F.min("__pl").over(wm)
        )
    else:
        _check_reserved(
            events, ["__csh", "__csl", "__gmh", "__gml", "__carryh",
                     "__carryl", "__prevmh", "__prevml"],
            "cusum_scores(split_every)",
        )
        base = base.withColumn("__chunk", _chunk_of(F.col("__t"), split_every))
        wc = (
            Window.partitionBy(key_col, "__chunk")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        rows = (
            base.withColumn("__ph", F.sum(d_hi).over(wc))
            .withColumn("__pl", F.sum(d_lo).over(wc))
        )
        rows = rows.withColumn("__mh", F.min("__ph").over(wc)).withColumn(
            "__ml", F.min("__pl").over(wc)
        )
        # per-(key, chunk) summary: the chunk's delta total and its
        # minimum local prefix, both plain aggregates of the windowed
        # columns (sum of deltas == last local prefix, but summing the
        # deltas directly is NULL-safe when a chunk is all-NULL values)
        summ = rows.groupBy(key_col, "__chunk").agg(
            F.sum(d_hi).alias("__csh"),
            F.sum(d_lo).alias("__csl"),
            F.min("__ph").alias("__gmh"),
            F.min("__pl").alias("__gml"),
        )
        wprev = (
            Window.partitionBy(key_col)
            .orderBy("__chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        summ = (
            summ.withColumn(
                "__carryh", F.coalesce(F.sum("__csh").over(wprev), F.lit(0.0))
            )
            .withColumn(
                "__carryl", F.coalesce(F.sum("__csl").over(wprev), F.lit(0.0))
            )
            .withColumn(
                "__prevmh",
                F.min(F.col("__carryh") + F.col("__gmh")).over(wprev),
            )
            .withColumn(
                "__prevml",
                F.min(F.col("__carryl") + F.col("__gml")).over(wprev),
            )
            .select(key_col, "__chunk", "__carryh", "__carryl",
                    "__prevmh", "__prevml")
        )
        rows = _nullsafe_equi_join(rows, summ, [key_col, "__chunk"], "left")
        # F.least skips NULLs, so an absent prev-chunk min (first chunk)
        # or an all-NULL local min drops out instead of poisoning the
        # result — the remaining 0.0 term is always present
        hi = (
            F.col("__carryh") + F.coalesce(F.col("__ph"), F.lit(0.0))
        ) - F.least(
            F.lit(0.0), F.col("__prevmh"), F.col("__carryh") + F.col("__mh")
        )
        lo = (
            F.col("__carryl") + F.coalesce(F.col("__pl"), F.lit(0.0))
        ) - F.least(
            F.lit(0.0), F.col("__prevml"), F.col("__carryl") + F.col("__ml")
        )
        out = rows
    res = (
        out.withColumn("cusum_high", hi)
        .withColumn("cusum_low", lo)
        .withColumn(
            "is_alert",
            F.coalesce(
                (F.col("cusum_high") > F.lit(float(threshold)))
                | (F.col("cusum_low") > F.lit(float(threshold))),
                F.lit(False),
            ),
        )
    )
    drop = ["__t", "__ph", "__pl"]
    if split_every is not None:
        drop += ["__chunk", "__mh", "__ml", "__carryh", "__carryl",
                 "__prevmh", "__prevml"]
    return res.drop(*drop)


def duplicate_events(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    within_seconds: float,
    payload_cols: Optional[Sequence[str]] = None,
    order_cols: Optional[Sequence[str]] = None,
    split_every: Optional[float] = None,
) -> DataFrame:
    """At-least-once delivery audit: per key, events whose PREVIOUS
    event (in time order) landed within ``within_seconds`` AND carries
    an identical payload — the redelivered webhook / double-fired
    producer / retried insert an at-least-once pipeline leaks, caught
    before it inflates every downstream count. Returns the LATER row of
    each duplicate pair (all input columns) plus ``prev_<ts_col>`` and
    ``dup_gap_seconds``; clean keys drop out entirely.

    Payload equality is null-safe per column (NULL == NULL is a match
    — two retries of a half-filled event are still the same event);
    ``payload_cols`` defaults to every column except keys, the
    timestamp, and ``order_cols``. Back-to-back triplicates emit two
    rows (each compares to its immediate predecessor) — the count is
    "redeliveries", not "duplicate groups". Events exactly
    ``within_seconds`` apart count as duplicates (<=, retry jitter is
    bounded, not open). NULL timestamps sort first and never emit
    (NULL arithmetic), matching the other sequence validators.

    Scale: the ``_with_prev`` kernel — one shuffle on the key, O(1)
    window state (it captures the previous row's payload columns, a
    fixed-width struct, never a buffer), ``split_every`` caps a hot
    key's sort at one time chunk; a chunk boundary cannot hide a pair
    because the carried last row stitches the bracketing events
    (split == unsplit, pytest-asserted). The alternative — a
    self-join on key with a time-band predicate — is a range join
    that explodes on exactly the hot producers this audit exists to
    catch."""
    keys = list(key_cols)
    if payload_cols is None:
        skip = set(keys) | {ts_col} | set(order_cols or [])
        payload_cols = [c for c in df.columns if c not in skip]
    payload = list(payload_cols)
    if not payload:
        raise ValueError("payload_cols must be non-empty")
    missing = [c for c in payload + [ts_col] if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    order = list(order_cols) if order_cols is not None else [ts_col]
    prev_ts = f"prev_{ts_col}"
    cap_names = {prev_ts: ts_col}
    for c in payload:
        cap_names[f"__prev_{c}"] = c
    _check_reserved(df, list(cap_names) + ["dup_gap_seconds"], "duplicate_events")
    out = _with_prev(df, keys, order, cap_names, split_every)
    gap = _seconds(out, ts_col) - _seconds(out, prev_ts)
    same = F.lit(True)
    for c in payload:
        same = same & F.col(c).eqNullSafe(F.col(f"__prev_{c}"))
    out = out.withColumn("dup_gap_seconds", gap)
    return out.where(
        F.col("dup_gap_seconds").isNotNull()
        # lower bound matters when order_cols is not ts-led: an
        # out-of-time-order predecessor would give a NEGATIVE gap that
        # <= within_seconds alone would wrongly admit
        & (F.col("dup_gap_seconds") >= F.lit(0.0))
        & (F.col("dup_gap_seconds") <= F.lit(float(within_seconds)))
        & same
    ).drop(*[c for c in cap_names if c != prev_ts])


def trend_slope(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    min_points: int = 3,
) -> DataFrame:
    """Per-key least-squares trend of a metric over time: ``slope``
    (value units per second), ``intercept`` (fitted value at the key's
    FIRST observation) and ``r2``, from the closed-form moment sums —
    the monitoring question "is this metric drifting, and how fast"
    asked of every key at once. Rows with a NULL timestamp or NULL
    value are ignored; keys with fewer than ``min_points`` surviving
    points, or with all points at one timestamp (zero x-variance), are
    dropped.

    Mechanics: x is re-based per key (``sec - min(sec) over key``)
    BEFORE squaring, so ``sum(x^2)`` stays within exact-long range
    (epoch seconds squared would not); the window min and the moment
    groupBy hash-partition on the same keys, so Catalyst plans ONE
    Exchange. x-sums aggregate as longs (exact, associative —
    partition order can't perturb them); y enters as double, so y-sums
    are exact only while every partial sum is integer-valued below
    2^53 — the property the oracle fixtures plant, and the reason the
    emitted doubles are reproducible bit-for-bit across engines. The
    final slope/intercept/r2 are fixed IEEE expression trees over
    those sums. No UDF anywhere.

    Scale: one shuffle on the keys; the aggregate is algebraic, so
    map-side partial aggregation bounds the shuffle at
    O(distinct keys), never O(rows) — a hot key costs nothing extra.
    Overflow bound (ANSI mode raises loudly, never wraps):
    ``n_per_key * span_seconds^2 < 2^63`` — a year-long key
    (span 3.2e7 s) holds ~9e3 billion points before the fence.
    """
    if min_points < 2:
        raise ValueError("min_points must be >= 2 (a line needs 2 points)")
    keys = list(key_cols)
    _check_reserved(df, ["__t", "__xp", "__v"], "trend_slope")
    # output names fenced on the KEYS only: non-key input columns don't
    # survive the groupBy, but a key named n_points/slope/... would
    # collide with the emitted columns
    clash = set(keys) & {"n_points", "t0", "slope", "intercept", "r2"}
    if clash:
        raise ValueError(
            f"trend_slope: key columns {sorted(clash)} collide with "
            "output names — rename them"
        )
    sec = F.floor(_seconds(df, ts_col)).cast("long")
    v = F.col(value_col).cast("double")
    base = (
        df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .withColumn("__t", sec)
        .withColumn("__v", v)
    )
    w = Window.partitionBy(*[F.col(k) for k in keys])
    base = base.withColumn("__xp", F.col("__t") - F.min("__t").over(w))
    xp = F.col("__xp")
    vv = F.col("__v")
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(xp).alias("__sx"),
        F.sum(vv).alias("__sy"),
        F.sum(xp * xp).alias("__sxx"),
        F.sum(xp.cast("double") * vv).alias("__sxy"),
        F.sum(vv * vv).alias("__syy"),
        F.min("__t").alias("__t0"),
    )
    n_d = F.col("n_points").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy")
    syy = F.col("__syy")
    den_x = n_d * sxx - sx * sx
    den_y = n_d * syy - sy * sy
    num = n_d * sxy - sx * sy
    slope = num / den_x
    return (
        agg.where((F.col("n_points") >= min_points) & (den_x > 0))
        .withColumn("t0", F.col("__t0"))
        .withColumn("slope", slope)
        .withColumn("intercept", (sy - slope * sx) / n_d)
        .withColumn(
            "r2",
            F.when(den_y > 0, (num / den_x) * (num / den_y)).otherwise(
                F.lit(None).cast("double")
            ),
        )
        .drop("__sx", "__sy", "__sxx", "__sxy", "__syy", "__t0")
    )


def autocorr_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    lag: int = 1,
    min_pairs: int = 3,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key lag-``lag`` sample autocorrelation of a metric along its
    time order — the non-IID-ness detector the drift family assumes
    away: PSI/KS/W1 and the sampled Wilson certificate all treat rows
    as exchangeable, but a metric whose consecutive observations
    correlate (diurnal load, a stuck sensor pinned at yesterday's
    value, a bot replaying a script) violates that silently. ACF ≈ 1
    at lag 1 means a gauge that barely moves (effective sample size
    collapses — a "10k-row sample" carries far fewer independent
    observations); ACF ≈ 0 is white noise; ACF spiking at lag 24 on an
    hourly series is diurnal seasonality that a naive
    train/validation time split will leak across.

    Returns ``(keys..., n_pairs, acf)`` — Pearson correlation of the
    pairs ``(v_i, v_{i+lag})`` taken along each key's
    ``(ts, *order_cols)`` order (INDEX lag over observations, not a
    time-shift join — the standard sample-ACF pairing). Keys with
    fewer than ``min_pairs`` surviving pairs are dropped; a key whose
    paired series has zero variance on either side keeps its row with
    ``acf = NULL`` (a constant gauge has no defined autocorrelation,
    but the caller should see that it is constant, not lose the key).
    Rows with NULL timestamp or value are ignored. Ties in
    ``(ts, *order_cols)`` make the pairing ambiguous — pass a
    tiebreaker (e.g. the event id) for a fully deterministic result.

    Determinism discipline (the ``trend_slope`` contract): the moment
    sums are exact whenever values are integer-valued with partial
    sums below 2^53 (the oracle fixture plants hour-of-day integers),
    and the final statistic is ONE fixed IEEE tree over those sums —
    ``(n·Σxy − Σx·Σy) / (sqrt(n·Σxx − Σx²) · sqrt(n·Σyy − Σy²))`` —
    with division and sqrt correctly rounded, so the emitted doubles
    replay bit-for-bit on any engine (driver row ``autocorr_events``).

    Scale shape: the lag window partitions on the SAME keys as the
    moment groupBy, so Catalyst plans ONE Exchange; the aggregate is
    algebraic (map-side partials, O(distinct keys) shuffle rows). The
    window sort is per-key within a partition — a single key's whole
    history must fit one task's sort spill budget, the same
    split-unfriendly shape as ``rolling_zscore`` (an index-lag over a
    hot key cannot chunk-stitch without changing the pairing; cap or
    pre-bucket pathological keys upstream).
    """
    if lag < 1:
        raise ValueError(f"autocorr_by_key: lag must be >= 1, got {lag}")
    if min_pairs < 2:
        raise ValueError(
            f"autocorr_by_key: min_pairs must be >= 2, got {min_pairs}"
        )
    keys = list(key_cols)
    _check_reserved(df, ["__y", "__x"], "autocorr_by_key")
    clash = set(keys) & {"n_pairs", "acf"}
    if clash:
        raise ValueError(
            f"autocorr_by_key: key columns {sorted(clash)} collide with "
            "output names — rename them"
        )
    missing = [
        c
        for c in keys + [ts_col, value_col, *order_cols]
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"autocorr_by_key: frame lacks columns {missing}")

    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(ts_col), *[F.col(c) for c in order_cols])
    )
    base = (
        df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .withColumn("__y", F.col(value_col).cast("double"))
        .withColumn("__x", F.lag("__y", lag).over(w))
        .where(F.col("__x").isNotNull())
    )
    x, y = F.col("__x"), F.col("__y")
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n_d = F.col("n_pairs").cast("double")
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    den_x = n_d * sxx - sx * sx
    den_y = n_d * syy - sy * sy
    acf = F.when(
        (den_x > 0) & (den_y > 0),
        (n_d * sxy - sx * sy) / (F.sqrt(den_x) * F.sqrt(den_y)),
    ).otherwise(F.lit(None).cast("double"))
    return (
        agg.where(F.col("n_pairs") >= min_pairs)
        .withColumn("acf", acf)
        .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
    )


def lateness_census(
    df: DataFrame,
    ts_col: str,
    arrival_col: str,
    key_cols: Sequence[str] = (),
    thresholds: Sequence[int] = (60, 300, 3600, 86400),
) -> DataFrame:
    """Watermark-design census: if this stream ran through a watermark
    of delay ``d``, how many events would arrive too late and be
    dropped? Replays the stream's ARRIVAL order (``arrival_col`` — an
    ingest sequence, kafka offset, file index) against its EVENT time:
    an event's lateness is ``high_watermark_at_arrival − event_time``
    (0 for in-order events), and the census counts events whose
    lateness exceeds each candidate ``threshold`` (seconds), plus the
    max lateness seen — exactly the numbers a team needs BEFORE
    committing a `withWatermark` delay, answered from history instead
    of production incident reports.

    Returns per key (or one global row when ``key_cols`` is empty):
    ``(keys..., n_events, max_late_us, late_<t>s...)`` — all exact
    integers (event times compared in MICROSECONDS as longs, so both
    the running max and every threshold comparison are engine-exact;
    no float time arithmetic anywhere). Rows with NULL timestamp or
    arrival raise nothing and are EXCLUDED (they never reach a
    watermark operator either); ties in arrival order make the
    running max ambiguous only between equal instants, not in value.

    Scale shape: one cumulative-max window along arrival order + one
    fused conditional-sum groupBy on the SAME keys — Catalyst plans
    ONE Exchange. The window is a running max (no buffering beyond
    the sort), and the per-key sort is the standard hot-key caveat of
    the sequence family. Global mode (no keys) is a single-partition
    sort — fine for one topic's history, shard by key for a fleet.
    """
    if not thresholds:
        raise ValueError("lateness_census: thresholds must be non-empty")
    ths = [int(t) for t in thresholds]
    if any(t < 0 for t in ths):
        raise ValueError(f"lateness_census: thresholds must be >= 0: {ths}")
    if len(set(ths)) != len(ths):
        raise ValueError(f"lateness_census: duplicate thresholds: {ths}")
    keys = list(key_cols)
    _check_reserved(df, ["__ts_us", "__late"], "lateness_census")
    clash = set(keys) & (
        {"n_events", "max_late_us"} | {f"late_{t}s" for t in ths}
    )
    if clash:
        raise ValueError(
            f"lateness_census: key columns {sorted(clash)} collide with "
            "output names — rename them"
        )
    missing = [
        c for c in keys + [ts_col, arrival_col] if c not in df.columns
    ]
    if missing:
        raise ValueError(f"lateness_census: frame lacks columns {missing}")
    dtype = dict(df.dtypes)[ts_col]
    ts_us = (
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
        if dtype.startswith("timestamp")
        else (F.col(ts_col).cast("double") * F.lit(1000000.0)).cast("long")
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(arrival_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        df.where(F.col(ts_col).isNotNull() & F.col(arrival_col).isNotNull())
        .withColumn("__ts_us", ts_us)
        .withColumn("__late", F.max("__ts_us").over(w) - F.col("__ts_us"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.max("__late").alias("max_late_us"),
    ] + [
        F.sum((F.col("__late") > t * 1000000).cast("long")).alias(
            f"late_{t}s"
        )
        for t in ths
    ]
    if keys:
        return base.groupBy(*keys).agg(*aggs)
    return base.agg(*aggs)


def cadence_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    min_gaps: int = 3,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Inter-event cadence fingerprint per key — the bot/metronome
    triage the event-time family lacks: sort each key's events by
    time, take the gaps, and profile their REGULARITY. A script posting
    on a timer has coefficient-of-variation ≈ 0 (metronomic), Poisson
    arrivals sit near 1, bursty humans well above it — so ``cv_gap``
    orders a review queue by "how machine-like is this key's clock"
    using nothing but timestamps. ``n_zero_gaps`` (events in the same
    second) is the burst/bulk-insert tell alongside it.

    Returns ``(keys..., n_gaps, min_gap, max_gap, n_zero_gaps,
    mean_gap, cv_gap)`` — gaps in whole SECONDS (floored epoch, the
    ``trend_slope`` convention: squaring second-scale gaps keeps the
    moment sums in the exact range; microsecond cadence profiling is a
    different tool). ``mean_gap`` is one raw IEEE division;
    ``cv_gap = sqrt(n·Σg² − (Σg)²) / Σg`` (population CV) is one fixed
    IEEE tree over exact long sums — bit-replayable on any engine —
    and NULL when every gap is zero (no clock to profile, but the key
    keeps its row: all-zero gaps IS the finding). Keys with fewer than
    ``min_gaps`` gaps are dropped. NULL timestamps are ignored; ties
    in ``(ts, *order_cols)`` are harmless here (a zero gap either way).

    Scale shape: one lag window + one fused moment groupBy on the SAME
    keys — ONE Exchange, algebraic aggregate, O(distinct keys) shuffle
    rows; the per-key sort is the sequence family's hot-key caveat.
    Exactness bound (the ``trend_slope`` contract): Σg² stays exact
    below 2^53 — a year-spanning key (gaps ≤ 3.2e7 s) holds ~9M gaps
    before the bound, and both engines compute the identical IEEE tree
    beyond it anyway.
    """
    if min_gaps < 1:
        raise ValueError(
            f"cadence_profile: min_gaps must be >= 1, got {min_gaps}"
        )
    keys = list(key_cols)
    if not keys:
        raise ValueError("cadence_profile: key_cols must be non-empty")
    _check_reserved(df, ["__t", "__g"], "cadence_profile")
    clash = set(keys) & {
        "n_gaps", "min_gap", "max_gap", "n_zero_gaps", "mean_gap", "cv_gap"
    }
    if clash:
        raise ValueError(
            f"cadence_profile: key columns {sorted(clash)} collide with "
            "output names — rename them"
        )
    missing = [
        c for c in keys + [ts_col, *order_cols] if c not in df.columns
    ]
    if missing:
        raise ValueError(f"cadence_profile: frame lacks columns {missing}")

    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(ts_col), *[F.col(c) for c in order_cols])
    )
    base = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("__t", F.floor(_seconds(df, ts_col)).cast("long"))
        .withColumn("__g", F.col("__t") - F.lag("__t", 1).over(w))
        .where(F.col("__g").isNotNull())
    )
    g = F.col("__g")
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min(g).alias("min_gap"),
        F.max(g).alias("max_gap"),
        F.sum((g == 0).cast("long")).alias("n_zero_gaps"),
        F.sum(g).alias("__sg"),
        F.sum(g * g).alias("__sgg"),
    )
    n_d = F.col("n_gaps").cast("double")
    sg_d = F.col("__sg").cast("double")
    sgg_d = F.col("__sgg").cast("double")
    return (
        agg.where(F.col("n_gaps") >= min_gaps)
        .withColumn("mean_gap", sg_d / n_d)
        .withColumn(
            "cv_gap",
            F.when(
                F.col("__sg") > 0,
                F.sqrt(n_d * sgg_d - sg_d * sg_d) / sg_d,
            ).otherwise(F.lit(None).cast("double")),
        )
        .drop("__sg", "__sgg")
    )


def constancy_runs(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    min_run: int = 2,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Stuck-value audit — the failure mode `cadence_profile` (clock
    regularity) and `autocorr_by_key` (correlation) both under-report:
    a sensor PINNED at one reading, a feed replaying yesterday's
    price, a default value a broken upstream writes forever. Sorts
    each key's observations by ``(ts, *order_cols)``, segments them
    into maximal runs of IDENTICAL consecutive values (null-safe
    equality: a run of NULLs is a run — usually the worst one), and
    reports per key the longest run with its value and time span:
    ``(keys..., n_obs, n_runs, max_run_len, max_run_value,
    max_run_start, max_run_end)``. Keys whose longest run is below
    ``min_run`` are dropped (every healthy series is all runs of 1).

    Run segmentation is the classic gaps-and-islands fold: a change
    flag (``value <=> lag(value)`` negated) cumulative-summed along
    the order gives each run an id — two window passes over ONE sort,
    then one groupBy per (key, run) and one argmax per key
    (``max(struct(len, -run_id, ...))`` — no second window, the
    `label_majority_conflicts` struct-max election; the run id breaks
    exact-length ties DETERMINISTICALLY toward the earliest run).
    All counts exact longs; the value column must be exactly
    comparable (int/string/bool/date/timestamp) — floats are refused
    loudly because "identical consecutive doubles" is an
    engine-rendering question, not a data property (quantize first).

    Scale shape: the windows and both groupBys hash on the key prefix
    — Catalyst plans ONE Exchange for the windows and one for the
    (key, run) aggregate; shuffle rows are O(runs), which a stuck
    feed makes FEWER, not more. Per-key sort is the sequence family's
    hot-key caveat.
    """
    if min_run < 1:
        raise ValueError(
            f"constancy_runs: min_run must be >= 1, got {min_run}"
        )
    keys = list(key_cols)
    if not keys:
        raise ValueError("constancy_runs: key_cols must be non-empty")
    _check_reserved(
        df, ["__chg", "__run", "__t"], "constancy_runs"
    )
    clash = set(keys) & {
        "n_obs", "n_runs", "max_run_len", "max_run_value",
        "max_run_start", "max_run_end",
    }
    if clash:
        raise ValueError(
            f"constancy_runs: key columns {sorted(clash)} collide with "
            "output names — rename them"
        )
    missing = [
        c
        for c in keys + [ts_col, value_col, *order_cols]
        if c not in df.columns
    ]
    if missing:
        raise ValueError(f"constancy_runs: frame lacks columns {missing}")
    vt = dict(df.dtypes)[value_col]
    if vt in ("double", "float") or vt.startswith("decimal"):
        raise ValueError(
            f"constancy_runs: value column {value_col!r} is {vt} — "
            "'identical consecutive floats' is an engine-rendering "
            "question; quantize to an exact type first "
            "(e.g. CAST(x*100 AS LONG))"
        )

    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(ts_col), *[F.col(c) for c in order_cols])
    )
    v = F.col(value_col)
    chg = (~v.eqNullSafe(F.lag(value_col, 1).over(w))).cast("long")
    base = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("__chg", chg)
        .withColumn(
            "__run",
            F.sum("__chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    runs = base.groupBy(*keys, "__run").agg(
        F.count(F.lit(1)).alias("__len"),
        F.min(F.col(ts_col)).alias("__start"),
        F.max(F.col(ts_col)).alias("__end"),
        F.min(v).alias("__val"),
    )
    best = runs.groupBy(*keys).agg(
        F.sum("__len").alias("n_obs"),
        F.count(F.lit(1)).alias("n_runs"),
        F.max(
            F.struct(
                F.col("__len").alias("l"),
                (-F.col("__run")).alias("neg_run"),
                F.col("__val").alias("v"),
                F.col("__start").alias("s"),
                F.col("__end").alias("e"),
            )
        ).alias("__best"),
    )
    return best.select(
        *keys,
        "n_obs",
        "n_runs",
        F.col("__best.l").alias("max_run_len"),
        F.col("__best.v").alias("max_run_value"),
        F.col("__best.s").alias("max_run_start"),
        F.col("__best.e").alias("max_run_end"),
    ).where(F.col("max_run_len") >= min_run)


def interval_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    window_start: str,
    window_end: str,
) -> DataFrame:
    """Union coverage of time intervals per key — the uptime/SLA
    question `interval_overlaps` (pairwise conflicts) does not answer:
    what fraction of an audit window do this key's intervals COVER,
    once overlaps and duplicates are merged? "The heartbeat feed
    covered 99.2% of yesterday; its largest hole was 6 minutes" is the
    freshness verdict a coverage SLA needs, and it is NOT the sum of
    interval lengths (overlaps double-count) nor the count of gaps.

    Classic sweep: clip intervals to ``[window_start, window_end)``,
    sort by start per key, and a new ISLAND begins where an interval
    starts strictly after the running max of previous ends — one lag
    window + one cumulative-sum window over the SAME sort, then one
    groupBy per (key, island) and one per key (the `constancy_runs`
    plan shape). Returns ``(keys..., n_intervals, n_islands,
    covered_us, coverage_share, largest_gap_us)`` — all from
    MICROSECOND longs (``unix_micros``), so every merge decision and
    every length is engine-exact; ``coverage_share`` is one raw IEEE
    division by the window length. ``largest_gap_us`` includes the
    head gap (window start → first island) and tail gap (last island
    → window end) — a feed that died at 18:00 has its hole counted.
    Rows with NULL endpoints are ignored; zero-length and inverted
    intervals raise IN-BAND (an end before its start is corrupt data,
    not a modelling choice); keys whose intervals all fall outside
    the window simply produce no row.

    Scale shape: two window passes over one per-key sort, two
    map-side-combinable groupBys hashing on the key prefix; shuffle
    rows are O(islands) after the first aggregate. Per-key sort is
    the sequence family's hot-key caveat.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("interval_coverage: key_cols must be non-empty")
    _check_reserved(
        df, ["__s", "__e", "__new", "__isl"], "interval_coverage"
    )
    clash = set(keys) & {
        "n_intervals", "n_islands", "covered_us", "coverage_share",
        "largest_gap_us",
    }
    if clash:
        raise ValueError(
            f"interval_coverage: key columns {sorted(clash)} collide with "
            "output names — rename them"
        )
    missing = [
        c for c in keys + [start_col, end_col] if c not in df.columns
    ]
    if missing:
        raise ValueError(f"interval_coverage: frame lacks columns {missing}")
    import datetime as _dt

    try:
        _w0 = _dt.datetime.fromisoformat(window_start)
        _w1 = _dt.datetime.fromisoformat(window_end)
    except ValueError as exc:
        raise ValueError(
            "interval_coverage: window bounds must be ISO timestamps, got "
            f"{window_start!r} / {window_end!r}"
        ) from exc
    if _w1 <= _w0:
        raise ValueError(
            f"interval_coverage: window_end {window_end!r} must be after "
            f"window_start {window_start!r}"
        )

    def _us(col: str):
        dtype = dict(df.dtypes)[col]
        c = F.col(col)
        if dtype.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp_ltz"))
        return (c.cast("double") * F.lit(1000000.0)).cast("long")

    def _lit_us(v: str):
        return F.unix_micros(F.lit(v).cast("timestamp_ltz"))

    ws, we = _lit_us(window_start), _lit_us(window_end)
    s_raw, e_raw = _us(start_col), _us(end_col)
    fenced_e = F.when(e_raw > s_raw, e_raw).otherwise(
        F.raise_error(
            F.lit(
                f"interval_coverage: interval with {end_col} <= "
                f"{start_col} — an inverted or zero-length interval is "
                "corrupt data; filter or repair upstream"
            )
        )
    )
    base = (
        df.where(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .select(*keys, s_raw.alias("__s"), fenced_e.alias("__e"))
        .withColumn("__s", F.greatest(F.col("__s"), ws))
        .withColumn("__e", F.least(F.col("__e"), we))
        .where(F.col("__s") < F.col("__e"))
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("__s"), F.col("__e"))
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        base.withColumn(
            "__new",
            F.when(
                prev_max_end.isNull() | (F.col("__s") > prev_max_end),
                F.lit(1),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn("__isl", F.sum("__new").over(wcum))
        .groupBy(*keys, "__isl")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("__s").alias("__is"),
            F.max("__e").alias("__ie"),
        )
    )
    win_len = we - ws
    per_key = islands.groupBy(*keys).agg(
        F.sum("__n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("__ie") - F.col("__is")).alias("covered_us"),
        F.min("__is").alias("__first_s"),
        F.max("__ie").alias("__last_e"),
    )
    # interior gaps need island-adjacency: one more lag over the TINY
    # island frame (O(islands) rows), same key partitioning
    wi = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("__is")
    gaps = (
        islands.withColumn(
            "__gap", F.col("__is") - F.lag("__ie", 1).over(wi)
        )
        .groupBy(*keys)
        .agg(F.max(F.coalesce(F.col("__gap"), F.lit(0))).alias("__max_int"))
    )
    # null-safe: a NULL key is a real group (the unattributed feed is
    # usually the broken one) — a plain equi-join would silently drop it
    out = _nullsafe_equi_join(per_key, gaps, keys, "inner")
    head_gap = F.col("__first_s") - ws
    tail_gap = we - F.col("__last_e")
    return out.select(
        *keys,
        "n_intervals",
        "n_islands",
        "covered_us",
        (F.col("covered_us").cast("double") / win_len.cast("double")).alias(
            "coverage_share"
        ),
        F.greatest(F.col("__max_int"), head_gap, tail_gap).alias(
            "largest_gap_us"
        ),
    )


def transition_predictability(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    state_col: str,
    min_transitions: int = 3,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Behavioral-script detector — the STRUCTURAL lens after
    `cadence_profile` (clock) and `constancy_runs` (value): how
    predictable is each key's next action? Order each key's events by
    ``(ts, *order_cols)``, take consecutive ``state_col`` transitions
    (view→click, click→view, …), and report the key's dominant
    transition with its share of all transitions. A replaying script
    loops one edge of the behavior graph (``top_share`` ≈ 1 even when
    its CLOCK is jittered past `cadence_profile`); organic users
    spread across many transitions. `span_transition_matrix` counts
    the corpus-wide graph; this scores each KEY against its own.

    Returns ``(keys..., n_transitions, n_distinct_transitions,
    top_from, top_to, top_count, top_share)`` — counts exact longs,
    ``top_share`` one raw IEEE division, the dominant transition
    elected deterministically (highest count, then lexicographic
    (from, to) — the ``min(struct(-count, …))`` election of
    `majority_label`). Rows with a NULL state are EXCLUDED before
    pairing (a NULL state is a data defect `null_pattern_census`
    owns, not a behavior); keys with fewer than ``min_transitions``
    transitions are dropped.

    Scale shape: one lag window + one (key, from, to) groupBy + one
    per-key election groupBy, all hashing on the key prefix; shuffle
    rows are O(observed transition kinds) after the first aggregate.
    Per-key sort is the sequence family's hot-key caveat.
    """
    if min_transitions < 1:
        raise ValueError(
            "transition_predictability: min_transitions must be >= 1, "
            f"got {min_transitions}"
        )
    keys = list(key_cols)
    if not keys:
        raise ValueError(
            "transition_predictability: key_cols must be non-empty"
        )
    _check_reserved(
        df, ["__from", "__to", "__tc"], "transition_predictability"
    )
    clash = set(keys) & {
        "n_transitions", "n_distinct_transitions", "top_from", "top_to",
        "top_count", "top_share",
    }
    if clash:
        raise ValueError(
            f"transition_predictability: key columns {sorted(clash)} "
            "collide with output names — rename them"
        )
    missing = [
        c
        for c in keys + [ts_col, state_col, *order_cols]
        if c not in df.columns
    ]
    if missing:
        raise ValueError(
            f"transition_predictability: frame lacks columns {missing}"
        )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(ts_col), *[F.col(c) for c in order_cols])
    )
    pairs = (
        df.where(F.col(ts_col).isNotNull() & F.col(state_col).isNotNull())
        .withColumn("__to", F.col(state_col).cast("string"))
        .withColumn("__from", F.lag("__to", 1).over(w))
        .where(F.col("__from").isNotNull())
    )
    tc = pairs.groupBy(*keys, "__from", "__to").agg(
        F.count(F.lit(1)).alias("__tc")
    )
    best = tc.groupBy(*keys).agg(
        F.sum("__tc").alias("n_transitions"),
        F.count(F.lit(1)).alias("n_distinct_transitions"),
        F.min(
            F.struct(
                (-F.col("__tc")).alias("neg"),
                F.col("__from").alias("f"),
                F.col("__to").alias("t"),
            )
        ).alias("__best"),
    )
    return (
        best.where(F.col("n_transitions") >= min_transitions)
        .select(
            *keys,
            "n_transitions",
            "n_distinct_transitions",
            F.col("__best.f").alias("top_from"),
            F.col("__best.t").alias("top_to"),
            (-F.col("__best.neg")).alias("top_count"),
            (
                (-F.col("__best.neg")).cast("double")
                / F.col("n_transitions").cast("double")
            ).alias("top_share"),
        )
    )


# ------------------------------------------------------ survival table

def survival_table(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    horizon_seconds: float,
    cohort_col: Optional[str] = None,
    order_cols: Optional[Sequence[str]] = None,
    bucket_seconds: float = 86400.0,
) -> DataFrame:
    """Kaplan-Meier-style life table over an event stream: per entity
    (``key_cols``), lifetime = last event - first event, bucketed to
    ``bucket_seconds`` days; an entity whose last event is within
    ``horizon_seconds`` of the stream's end is CENSORED (still alive —
    we just stopped looking), otherwise its lifetime ended (churn).
    Output per (cohort, day): ``n_deaths``, ``n_censored``,
    ``n_at_risk`` — the integer at-risk table a KM curve is computed
    from (the survival product itself is a trivial driver-side fold of
    these ints; emitting the table keeps every column exact BIGINT,
    mergeable, and re-aggregatable across partitions/epochs).

    ``cohort_col`` assigns each entity the value of that column on its
    FIRST event (deterministic under ``order_cols``; defaults to
    ``ts_col`` alone) — acquisition-channel / first-touch cohorting.
    Omit it for a single-cohort table (cohort = '').

    Retention_cohorts answers "how many came back in week k";
    this answers the censoring-aware version — "of those still
    observable at day k, what fraction died" — the correct statistic
    when the observation window cuts lives short, which at a rolling
    100 TB event lake is ALWAYS.

    Scale shape: one groupBy(key) with min/max/first-by-order partial
    aggregation (the only data-proportional shuffle, keyed on the
    entity — the same key the raw lake is usually bucketed by), a
    1-row global-max frame broadcast via crossJoin, then a groupBy on
    (cohort, day) whose cardinality is cohorts x observed days — KB,
    not data — and a window over that tiny frame. No window ever
    touches raw-event-proportional rows."""
    if horizon_seconds < 0:
        raise ValueError(
            f"survival_table: horizon_seconds must be >= 0, got "
            f"{horizon_seconds}"
        )
    if bucket_seconds <= 0:
        raise ValueError(
            f"survival_table: bucket_seconds must be > 0, got "
            f"{bucket_seconds}"
        )
    _check_reserved(
        df, ["__sec", "__first", "__last", "__coh", "__rn"], "survival_table"
    )
    keys = list(key_cols)
    base = df.where(F.col(ts_col).isNotNull()).withColumn(
        "__sec", _seconds(df, ts_col)
    )
    aggs = [
        F.min("__sec").alias("__first"),
        F.max("__sec").alias("__last"),
    ]
    if cohort_col is not None:
        order = [F.col(c).asc() for c in (order_cols or [ts_col])]
        # min_by over a struct of the order columns: first-event value
        # without a per-entity window (partial-aggregatable, unlike
        # row_number which would sort every entity's full history)
        aggs.append(
            F.min_by(
                F.col(cohort_col), F.struct(*[F.col(c) for c in (order_cols or [ts_col])])
            ).alias("__coh")
        )
    per_key = base.groupBy(*keys).agg(*aggs)
    if cohort_col is None:
        per_key = per_key.withColumn("__coh", F.lit(""))
    cutoff = base.agg(F.max("__sec").alias("__cutoff"))
    lives = per_key.crossJoin(F.broadcast(cutoff)).select(
        F.col("__coh").alias("cohort"),
        F.floor((F.col("__last") - F.col("__first")) / F.lit(float(bucket_seconds)))
        .cast("long")
        .alias("day"),
        F.when(
            F.col("__last") <= F.col("__cutoff") - F.lit(float(horizon_seconds)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__death"),
    )
    tab = lives.groupBy("cohort", "day").agg(
        F.sum("__death").cast("long").alias("n_deaths"),
        F.sum(F.lit(1) - F.col("__death")).cast("long").alias("n_censored"),
    )
    exits = (F.col("n_deaths") + F.col("n_censored")).cast("long")
    w_all = Window.partitionBy("cohort")
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tab.withColumn(
        "n_at_risk",
        (F.sum(exits).over(w_all) - F.sum(exits).over(w_cum) + exits).cast(
            "long"
        ),
    ).select("cohort", "day", "n_deaths", "n_censored", "n_at_risk")


# ---------------------------------------------------- Theil-Sen trend

def theil_sen(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    max_points: int = 1000,
) -> DataFrame:
    """Per-key Theil-Sen robust trend: the MEDIAN of all pairwise
    slopes — the estimator :func:`trend_slope`'s least squares is not.
    One wild outlier (a sensor glitch, a backfill spike) drags an OLS
    slope arbitrarily; the pairwise-slope median has a 29.3% breakdown
    point, so the monitoring verdict "this metric is drifting" stays
    correct under exactly the dirty data a validation engine exists
    for.

    Output per key: ``n_points``, ``n_pairs``, and the median as TWO
    integer order statistics — ``slope_lo_micro`` / ``slope_hi_micro``,
    the lower/upper middle of the sorted micro-quantized slopes
    (``floor(dy/dx * 1e6)``; equal when ``n_pairs`` is odd). Emitting
    both middles instead of averaging keeps every column an exact
    BIGINT — no engine-dependent midpoint IEEE tree — and the caller
    averages if it wants the classical estimator. Pairs share a
    timestamp contribute nothing (dx = 0 is undefined slope, the
    classical treatment); keys with no valid pair emit no row.

    The pair join is inherently O(n_k^2) per key — that is the
    ESTIMATOR, not an implementation accident — so it is fenced, not
    hidden: a key exceeding ``max_points`` observations raises IN-BAND
    (the cooccurrence_pmi discipline, fence multiplied into the join
    key so column pruning cannot delete it); aggregate first (e.g.
    daily means via time_rollup) to bring a hot key under the fence.
    At the default 1000 the worst key costs ~5e5 pair rows — one
    task's work. Shuffle: ONE hash exchange of both join sides on the
    keys; the median windows partition on the same keys (no second
    exchange of data-proportional rows beyond the pair frame itself).
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("theil_sen: key_cols must be non-empty")
    if max_points < 2:
        raise ValueError(
            f"theil_sen: max_points must be >= 2, got {max_points}"
        )
    _check_reserved(
        df, ["__t", "__v", "__n", "__s", "__rn", "__np"], "theil_sen"
    )
    clash = set(keys) & {
        "n_points", "n_pairs", "slope_lo_micro", "slope_hi_micro"
    }
    if clash:
        raise ValueError(
            f"theil_sen: key columns {sorted(clash)} collide with output "
            "names — rename them"
        )
    base = (
        df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            *keys,
            F.floor(_seconds(df, ts_col)).cast("long").alias("__t"),
            F.col(value_col).cast("double").alias("__v"),
        )
    )
    wk = Window.partitionBy(*[F.col(k) for k in keys])
    fenced = base.withColumn("__np", F.count(F.lit(1)).over(wk)).withColumn(
        # the fence rides the JOIN-side time column: prune-proof
        "__t",
        F.when(F.col("__np") <= max_points, F.col("__t")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "theil_sen: a key exceeds max_points="
                        f"{max_points} observations (quadratic pair "
                        "blow-up) — aggregate per time bucket first; "
                        "key count: "
                    ),
                    F.col("__np").cast("string"),
                )
            )
        ),
    )
    a = fenced.select(
        *keys,
        F.col("__t").alias("__ta"),
        F.col("__v").alias("__va"),
        F.col("__np"),
    )
    b = fenced.select(
        *[F.col(k).alias(f"__kb_{i}") for i, k in enumerate(keys)],
        F.col("__t").alias("__tb"),
        F.col("__v").alias("__vb"),
    )
    cond = None
    for i, k in enumerate(keys):
        t = a[k].eqNullSafe(b[f"__kb_{i}"])
        cond = t if cond is None else (cond & t)
    pairs = a.join(b, cond & (F.col("__tb") > F.col("__ta"))).select(
        *keys,
        F.col("__np"),
        F.floor(
            (F.col("__vb") - F.col("__va"))
            / (F.col("__tb") - F.col("__ta")).cast("double")
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("__s"),
    )
    ws = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("__s")
    ranked = pairs.withColumn("__rn", F.row_number().over(ws)).withColumn(
        "__n", F.count(F.lit(1)).over(wk)
    )
    lo = F.floor((F.col("__n") + 1) / 2)
    hi = F.floor(F.col("__n") / 2) + 1
    return (
        ranked.groupBy(*keys)
        .agg(
            F.first("__np").alias("n_points"),
            F.max("__n").cast("long").alias("n_pairs"),
            F.min(F.when(F.col("__rn") == lo, F.col("__s"))).alias(
                "slope_lo_micro"
            ),
            F.min(F.when(F.col("__rn") == hi, F.col("__s"))).alias(
                "slope_hi_micro"
            ),
        )
        .withColumn("n_points", F.col("n_points").cast("long"))
    )


def decayed_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    half_life_days: float = 7.0,
    horizon: int = 20,
) -> DataFrame:
    """Exponentially-decayed activity per key — the freshness signal
    a plain count cannot give: a domain that produced 10^6 documents
    in 2019 and nothing since should NOT outweigh one producing 10^3
    a day now when sampling weights or liveness verdicts are derived.
    Each event contributes 2^-(age in half-lives), so activity halves
    every ``half_life_days``.

    Exactness: base 2 is the whole trick. age_hl = floor(age_seconds
    / (86400 * half_life_days)) clamped to [0, horizon], and the
    event's weight is the INTEGER 2^(horizon - age_hl) — shiftleft,
    no pow(), no float. Per key: ``n_events`` and ``decayed_units``
    (exact BIGINT; an age-0 event is worth 2^horizon units, a
    horizon-old one 1 unit) plus ``decayed_now`` = decayed_units /
    2^horizon — current-event equivalents through ONE IEEE division
    by an exact power of two. Events older than horizon half-lives
    clamp to weight 1 rather than vanish (they still prove the key
    existed; pick horizon so 2^-horizon is your "dead" threshold).

    The reference instant is max(ts) over the frame (1-row broadcast
    — deterministic and replayable, where now() would make every run
    disagree); NULL timestamps drop.

    Overflow fence: decayed_units <= n_key * 2^horizon must stay
    under 2^63 — at horizon 20 that is ~8.8e12 events per key; raise
    ``half_life_days`` (coarser ages) before raising ``horizon``
    (finer resolution) at the extreme. Guarded by an in-band check on
    the SUM being non-negative (a wrap flips the sign before it lies
    quietly... it can land positive too — the real fence is the
    documented contract; the sign check catches the common case).

    Scale shape: one 1-row max(ts) broadcast, ONE map-side-partial
    groupBy on the keys. No window, no join beyond the broadcast, no
    UDF."""
    keys = list(group_cols)
    if not keys:
        raise ValueError("decayed_counts: group_cols must be non-empty")
    if float(half_life_days) <= 0:
        raise ValueError(
            f"decayed_counts: half_life_days must be > 0, got {half_life_days}"
        )
    if not (0 < int(horizon) <= 40):
        raise ValueError(
            f"decayed_counts: horizon must be in 1..40, got {horizon}"
        )
    missing = [c for c in keys + [ts_col] if c not in df.columns]
    if missing:
        raise ValueError(f"decayed_counts: frame lacks columns {missing}")
    _check_reserved(df, ["__sec", "__ref", "__age", "__w"], "decayed_counts")
    h = int(horizon)
    base = df.where(F.col(ts_col).isNotNull()).withColumn(
        "__sec", _seconds(df, ts_col)
    )
    ref = F.broadcast(base.agg(F.max("__sec").alias("__ref")))
    unit = 86400.0 * float(half_life_days)
    age = F.least(
        F.greatest(
            F.floor((F.col("__ref") - F.col("__sec")) / F.lit(unit)).cast(
                "long"
            ),
            F.lit(0),
        ),
        F.lit(h),
    )
    weighted = (
        base.crossJoin(ref)
        .withColumn("__age", age)
        .withColumn(
            "__w",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({h} - __age AS INT))"),
        )
    )
    out = weighted.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__w").alias("decayed_units"),
    )
    wrap_guard = F.when(
        F.col("decayed_units") < 0,
        F.raise_error(
            F.lit(
                "decayed_counts: decayed_units overflowed int64 — lower "
                "horizon or raise half_life_days (see docstring fence)"
            )
        ).cast("long"),
    ).otherwise(F.col("decayed_units"))
    return out.select(
        *keys,
        "n_events",
        wrap_guard.alias("decayed_units"),
        (
            F.col("decayed_units").cast("double")
            / F.lit(float(1 << h))
        ).alias("decayed_now"),
    )


def silent_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    silence_buckets: int = 1,
    lookback_buckets: int = 28,
    bucket_seconds: int = 86400,
    min_events: int = 3,
) -> DataFrame:
    """Keys that WENT DARK: recently active, now absent — the absence
    half of the arrival-volume story (``volume_anomalies`` scores the
    buckets that arrived; a key with NO row today produces no bucket
    to score, and a per-key gap detector fires only once the key
    eventually returns). "Which of yesterday's 40k active feeds sent
    nothing today" is a one-aggregate question and THE on-call page
    that matters for ingest.

    Mechanics: bucket = floor(epoch/bucket_seconds); the reference
    bucket is the TABLE's max (1-row broadcast, replayable); one
    groupBy over the keys keeps each key's last active bucket, total
    events and distinct active buckets. A key is silent iff
    ``silence_buckets <= ref - last_bucket <= lookback_buckets`` (the
    upper bound separates "went dark" from "retired long ago" — a key
    dead for a year is churn, not an incident) and it has
    ``min_events``+ events and 2+ active buckets (a key seen in ONE
    bucket ever has no established cadence to violate).

    Output per silent key: key cols, ``last_seen_bucket_start``
    (epoch seconds, long), ``buckets_silent`` (exact long),
    ``n_events``, ``n_active_buckets``. NULL timestamps drop; NULL
    keys group like any value (a silent NULL-keyed feed is still a
    silent feed).

    Scale shape: ONE map-side-partial groupBy on the keys (count/max/
    distinct-bucket), a 1-row broadcast of the global max, one filter.
    O(keys) output, no window, no UDF."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("silent_keys: key_cols must be non-empty")
    if int(silence_buckets) < 1:
        raise ValueError(
            f"silent_keys: silence_buckets must be >= 1, got {silence_buckets}"
        )
    if int(lookback_buckets) < int(silence_buckets):
        raise ValueError(
            "silent_keys: lookback_buckets must be >= silence_buckets, got "
            f"{lookback_buckets} < {silence_buckets}"
        )
    if int(bucket_seconds) < 1:
        raise ValueError(
            f"silent_keys: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    missing = [c for c in keys + [ts_col] if c not in df.columns]
    if missing:
        raise ValueError(f"silent_keys: frame lacks columns {missing}")
    _check_reserved(df, ["__b", "__ref"], "silent_keys")
    bs = int(bucket_seconds)
    base = df.where(F.col(ts_col).isNotNull()).withColumn(
        "__b", F.floor(_seconds(df, ts_col) / F.lit(float(bs))).cast("long")
    )
    ref = F.broadcast(base.agg(F.max("__b").alias("__ref")))
    per_key = base.groupBy(*keys).agg(
        F.max("__b").alias("__last"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("__b").alias("n_active_buckets"),
    )
    gap = F.col("__ref") - F.col("__last")
    return (
        per_key.crossJoin(ref)
        .where(
            (gap >= int(silence_buckets))
            & (gap <= int(lookback_buckets))
            & (F.col("n_events") >= int(min_events))
            & (F.col("n_active_buckets") >= 2)
        )
        .select(
            *keys,
            (F.col("__last") * F.lit(bs)).alias("last_seen_bucket_start"),
            gap.alias("buckets_silent"),
            "n_events",
            "n_active_buckets",
        )
    )


# --------------------------------------------- lagged cross-correlation

def cross_correlation(
    df: DataFrame,
    time_col: str,
    a_pred: Column,
    b_pred: Column,
    bucket_seconds: int = 3600,
    max_lag: int = 6,
) -> DataFrame:
    """Lagged cross-correlation between two event streams: bucket the
    timeline, count rows matching ``a_pred`` and ``b_pred`` per
    bucket, and compute the Pearson correlation of (a_t, b_{t+lag})
    for every lag 0..max_lag. The pipeline question this answers:
    does signal A LEAD signal B (clicks precede purchases? ingest
    errors precede validation failures?) and by how many buckets —
    the peak lag is the causal-direction hint monitoring dashboards
    want.

    Determinism: the per-bucket counts and all five Pearson moments
    are EXACT integer sums (longs), so the single final expression —
    one division and one sqrt, both correctly-rounded IEEE — is
    bit-identical on any engine and any partitioning. No rounding
    convention needed, unlike float-sum correlation.

    Scale shape: one corpus-sized groupBy to the bucket series
    (map-side partials; the series is timeline-sized, not
    corpus-sized); the lag alignment is an explode of max_lag+1 rows
    per bucket joined back to the series on bucket id (series-sized
    shuffle); one tiny groupBy(lag) for the moments. Buckets with no
    rows are ABSENT, so each lag correlates only co-present bucket
    pairs (n_pairs says over how many).

    Output per lag: ``lag, n_pairs, corr`` (NULL corr when either
    stream is constant over the aligned pairs).
    """
    if int(max_lag) < 0:
        raise ValueError(f"cross_correlation: max_lag must be >= 0, got {max_lag}")
    if int(bucket_seconds) < 1:
        raise ValueError(
            f"cross_correlation: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    if time_col not in df.columns:
        raise ValueError(f"cross_correlation: column {time_col!r} missing")
    t = F.floor(
        F.unix_timestamp(F.col(time_col)) / F.lit(int(bucket_seconds))
    ).alias("__t")
    series = df.groupBy(t).agg(
        F.sum(a_pred.cast("long")).alias("__a"),
        F.sum(b_pred.cast("long")).alias("__b"),
    )
    lags = F.explode(
        F.sequence(F.lit(0), F.lit(int(max_lag)))
    ).alias("lag")
    left = series.select(
        F.col("__t"), F.col("__a"), lags
    ).withColumn("__tb", F.col("__t") + F.col("lag"))
    right = series.select(
        F.col("__t").alias("__tb"), F.col("__b")
    )
    joined = left.join(right, "__tb")
    mo = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("__a").alias("__sa"),
        F.sum("__b").alias("__sb"),
        F.sum(F.col("__a") * F.col("__b")).alias("__sab"),
        F.sum(F.col("__a") * F.col("__a")).alias("__saa"),
        F.sum(F.col("__b") * F.col("__b")).alias("__sbb"),
    )
    k = F.col("n_pairs").cast("double")
    cov = k * F.col("__sab").cast("double") - F.col("__sa").cast(
        "double"
    ) * F.col("__sb").cast("double")
    va = k * F.col("__saa").cast("double") - F.col("__sa").cast(
        "double"
    ) * F.col("__sa").cast("double")
    vb = k * F.col("__sbb").cast("double") - F.col("__sb").cast(
        "double"
    ) * F.col("__sb").cast("double")
    return mo.select(
        "lag",
        "n_pairs",
        F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb)).alias("corr"),
    )


# ------------------------------------------------- runs test (batching)

def runs_test(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: Sequence[str],
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Wald-Wolfowitz runs test per group over the bucketed timeline:
    is the per-bucket volume's above/below-median sequence RANDOM, or
    does it clump (batched ingestion, replays, day/night periodicity
    the cadence checks didn't declare)? A healthy stream wanders
    around its median; a loader that flushes every 6 hours produces
    long runs and a z-score far below 0; an alternating artifact
    (dedup ping-pong) lands far above.

    Per group: bucket counts of rows where ``value_col`` is not null
    -> median of the bucket series (exact interpolated percentile)
    -> boolean sequence b_t = count_t > median (ties sit OUT of the
    sequence: a bucket exactly AT the median is dropped, the
    textbook treatment) -> R = observed runs via one lag window, and

        mu = 2·n1·n0/n + 1
        sigma² = (mu-1)·(mu-2)/(n-1)
        z = (R - mu)/sigma

    (public: Wald & Wolfowitz 1940). Counts, runs and n are exact
    integers; mu/sigma/z are a single fixed-order float expression
    with one correctly-rounded sqrt — bit-deterministic cross-engine,
    no rounding convention needed.

    Scale shape: one corpus-sized groupBy to the bucket series; the
    per-group median and the lag window run over the SERIES (timeline
    × groups, never corpus-sized). Groups whose sequence is shorter
    than 2, or all-above/all-below (n1·n0 = 0), report NULL z.

    Output per group: ``group_cols..., n_buckets, n_above, n_below,
    runs, z``.
    """
    if int(bucket_seconds) < 1:
        raise ValueError(
            f"runs_test: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    for c in (time_col, value_col, *group_cols):
        if c not in df.columns:
            raise ValueError(f"runs_test: column {c!r} missing")
    if not group_cols:
        raise ValueError("runs_test: group_cols must be non-empty")
    for __c in ("__t", "__c", "__med", "__b", "__new_run"):
        if __c in df.columns:
            raise ValueError(
                f"runs_test: input column {__c!r} collides with an "
                "internal working name — rename it"
            )
    t = F.floor(
        F.unix_timestamp(F.col(time_col)) / F.lit(int(bucket_seconds))
    ).alias("__t")
    series = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, t)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wmed = Window.partitionBy(*[F.col(c) for c in group_cols])
    med = series.withColumn(
        "__med",
        F.expr("percentile(__c, 0.5)").over(wmed),
    )
    seq = med.where(F.col("__c") != F.col("__med")).withColumn(
        "__b", (F.col("__c") > F.col("__med")).cast("int")
    )
    worder = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("__t").asc()
    )
    runs = seq.withColumn(
        "__new_run",
        F.when(
            F.lag("__b").over(worder).isNull()
            | (F.lag("__b").over(worder) != F.col("__b")),
            1,
        ).otherwise(0),
    )
    agg = runs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("__b").cast("long").alias("n_above"),
        F.sum(F.lit(1) - F.col("__b")).cast("long").alias("n_below"),
        F.sum("__new_run").cast("long").alias("runs"),
    )
    n = F.col("n_buckets").cast("double")
    n1 = F.col("n_above").cast("double")
    n0 = F.col("n_below").cast("double")
    mu = F.lit(2.0) * n1 * n0 / n + F.lit(1.0)
    var = (mu - 1) * (mu - 2) / (n - 1)
    z = F.when(
        (F.col("n_buckets") >= 2)
        & (F.col("n_above") > 0)
        & (F.col("n_below") > 0)
        & (var > 0),
        (F.col("runs").cast("double") - mu) / F.sqrt(var),
    )
    return agg.select(
        *group_cols, "n_buckets", "n_above", "n_below", "runs", z.alias("z")
    )


# ------------------------------------------------------ SPRT monitor

def sprt_monitor(
    df: DataFrame,
    time_col: str,
    group_cols: Sequence[str],
    success_pred: Column,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (public: Wald 1945)
    per group over the bucketed timeline: is the success rate p0
    (H0, healthy) or p1 (H1, degraded)? After each bucket the
    cumulative log-likelihood ratio

        LLR = k·ln(p1/p0) + (n-k)·ln((1-p1)/(1-p0))

    (k successes of n trials so far) is checked against the Wald
    boundaries ``ln(beta/(1-alpha))`` and ``ln((1-beta)/alpha)``; the
    FIRST crossing decides. This is the earliest-stopping monitor for
    a rate regression — fixed-horizon tests either wait too long or
    peek and inflate alpha; SPRT's thresholds price the peeking in.

    Scale shape: one corpus-sized groupBy to per-bucket (trials,
    successes) counts; the cumulative LLR and first-crossing election
    are windows over the SERIES (timeline × groups). All counts are
    exact integers; the four ln constants are computed once in Python
    and enter as literals, so the LLR is integer-weighted literal
    arithmetic — the only cross-engine wobble is the windowed
    cumulative float sum, and the decision compares against constants
    (a crossing within one ulp of a boundary is the measure-zero
    caveat, said out loud).

    Output per group: ``group_cols..., n_buckets, trials, successes,
    llr_final, decision ('h0'|'h1'|'continue'), decided_bucket`` (the
    1-based bucket index of the first crossing; NULL if none).
    """
    if not (0.0 < float(p0) < 1.0 and 0.0 < float(p1) < 1.0):
        raise ValueError(f"sprt_monitor: p0/p1 must be in (0,1), got {p0}, {p1}")
    if float(p0) == float(p1):
        raise ValueError("sprt_monitor: p0 and p1 must differ")
    if not (0.0 < float(alpha) < 1.0 and 0.0 < float(beta) < 1.0):
        raise ValueError("sprt_monitor: alpha/beta must be in (0,1)")
    if int(bucket_seconds) < 1:
        raise ValueError(
            f"sprt_monitor: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    for c in (time_col, *group_cols):
        if c not in df.columns:
            raise ValueError(f"sprt_monitor: column {c!r} missing")
    if not group_cols:
        raise ValueError("sprt_monitor: group_cols must be non-empty")
    for __c in ("__t", "__n", "__k", "__idx", "__ck", "__cn", "__llr", "__cross"):
        if __c in df.columns:
            raise ValueError(
                f"sprt_monitor: input column {__c!r} collides with an "
                "internal working name — rename it"
            )
    import math as _m

    w_succ = _m.log(float(p1) / float(p0))
    w_fail = _m.log((1.0 - float(p1)) / (1.0 - float(p0)))
    lo = _m.log(float(beta) / (1.0 - float(alpha)))
    hi = _m.log((1.0 - float(beta)) / float(alpha))
    t = F.floor(
        F.unix_timestamp(F.col(time_col)) / F.lit(int(bucket_seconds))
    ).alias("__t")
    series = df.groupBy(*group_cols, t).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(success_pred.cast("long")).alias("__k"),
    )
    worder = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("__t").asc()
    )
    cum = (
        series.withColumn("__idx", F.row_number().over(worder))
        .withColumn("__ck", F.sum("__k").over(worder))
        .withColumn("__cn", F.sum("__n").over(worder))
        .withColumn(
            "__llr",
            F.col("__ck").cast("double") * F.lit(w_succ)
            + (F.col("__cn") - F.col("__ck")).cast("double") * F.lit(w_fail),
        )
        .withColumn(
            "__cross",
            F.when(F.col("__llr") >= F.lit(hi), F.lit("h1")).when(
                F.col("__llr") <= F.lit(lo), F.lit("h0")
            ),
        )
    )
    first = cum.where(F.col("__cross").isNotNull()).groupBy(*group_cols).agg(
        F.min(F.col("__idx")).alias("decided_bucket")
    )
    first_d = (
        cum.join(first, list(group_cols))
        .where(F.col("__idx") == F.col("decided_bucket"))
        .select(*group_cols, "decided_bucket", F.col("__cross").alias("__dec"))
    )
    total = cum.groupBy(*group_cols).agg(
        F.max("__idx").cast("long").alias("n_buckets"),
        F.max("__cn").cast("long").alias("trials"),
        F.max("__ck").cast("long").alias("successes"),
    )
    final_llr = cum.withColumn(
        "__last", F.row_number().over(
            Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
                F.col("__idx").desc()
            )
        )
    ).where(F.col("__last") == 1).select(
        *group_cols, F.col("__llr").alias("llr_final")
    )
    return (
        total.join(final_llr, list(group_cols))
        .join(first_d, list(group_cols), "left")
        .select(
            *group_cols,
            "n_buckets",
            "trials",
            "successes",
            "llr_final",
            F.coalesce(F.col("__dec"), F.lit("continue")).alias("decision"),
            F.col("decided_bucket").cast("long").alias("decided_bucket"),
        )
    )


# --------------------------------------------------- seasonal strength

def seasonal_strength(
    df: DataFrame,
    time_col: str,
    group_cols: Sequence[str],
    bucket_seconds: int = 3600,
    season: int = 24,
) -> DataFrame:
    """Forecast-error seasonality strength per group: over the
    bucketed volume series, compare the SEASONAL-naive forecast
    (bucket t predicted by bucket t−season) against the plain naive
    one (predicted by t−1):

        strength = 1 − MAE_seasonal / MAE_naive

    (the M4-competition-style relative-MAE framing; public). Positive
    means yesterday-same-hour beats the-previous-hour — real,
    exploitable seasonality that volume monitors must deseasonalize
    before alerting; ~0 means no daily shape; negative means the
    series is dominated by short-term momentum. This single number
    decides whether seasonal_volume_anomalies' phase-median model is
    the right alarm for a stream.

    Exact arithmetic: bucket counts are integers, both MAEs are sums
    of integer absolute differences over EXPLICIT lag joins (a bucket
    missing its lag contributes to neither sum — the pair counts are
    emitted), and the one division at the end makes the statistic
    bit-identical cross-engine. One corpus-sized groupBy to the
    series; two series-sized self-joins.

    Output per group: ``group_cols..., n_naive_pairs,
    n_seasonal_pairs, mae_naive, mae_seasonal, strength`` (MAEs as
    exact ratios of BIGINT sums; NULL strength when either pair set
    is empty or MAE_naive is 0).
    """
    if int(season) < 2:
        raise ValueError(f"seasonal_strength: season must be >= 2, got {season}")
    if int(bucket_seconds) < 1:
        raise ValueError(
            f"seasonal_strength: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    for c in (time_col, *group_cols):
        if c not in df.columns:
            raise ValueError(f"seasonal_strength: column {c!r} missing")
    if not group_cols:
        raise ValueError("seasonal_strength: group_cols must be non-empty")
    t = F.floor(
        F.unix_timestamp(F.col(time_col)) / F.lit(int(bucket_seconds))
    ).alias("__t")
    series = df.groupBy(*group_cols, t).agg(
        F.count(F.lit(1)).alias("__c")
    )
    gkeys = [F.col(c) for c in group_cols]

    def lag_pairs(lag: int, tag: str) -> DataFrame:
        cur = series.select(
            *gkeys, F.col("__t"), F.col("__c").alias("__cur")
        )
        prev = series.select(
            *gkeys,
            (F.col("__t") + lag).alias("__t"),
            F.col("__c").alias("__prev"),
        )
        return (
            cur.join(prev, [*group_cols, "__t"])
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"n_{tag}_pairs"),
                F.sum(F.abs(F.col("__cur") - F.col("__prev")))
                .cast("long")
                .alias(f"__ae_{tag}"),
            )
        )
    naive = lag_pairs(1, "naive")
    seas = lag_pairs(int(season), "seasonal")
    j = naive.join(seas, list(group_cols), "outer")
    mae_n = F.when(
        F.col("n_naive_pairs") > 0,
        F.col("__ae_naive").cast("double") / F.col("n_naive_pairs").cast("double"),
    )
    mae_s = F.when(
        F.col("n_seasonal_pairs") > 0,
        F.col("__ae_seasonal").cast("double")
        / F.col("n_seasonal_pairs").cast("double"),
    )
    return j.select(
        *group_cols,
        "n_naive_pairs",
        "n_seasonal_pairs",
        mae_n.alias("mae_naive"),
        mae_s.alias("mae_seasonal"),
        F.when(
            mae_n.isNotNull() & mae_s.isNotNull() & (mae_n > 0),
            F.lit(1.0) - mae_s / mae_n,
        ).alias("strength"),
    )


# ------------------------------------------------------- mann-kendall

def mann_kendall(
    df: DataFrame,
    time_col: str,
    group_cols: Sequence[str],
    bucket_seconds: int = 3600,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Mann-Kendall monotone-trend test per group over the bucketed
    volume series (public nonparametric statistics): S = Σ_{i<j}
    sign(c_j − c_i) over all bucket pairs, tie-corrected variance

        var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18

    and the continuity-corrected z. The significance half of the
    Theil-Sen story: the slope says how fast, Mann-Kendall says
    whether the drift is real at all — distribution-free, outlier-
    robust, exactly what a volume trend alert should gate on before
    paging anyone about "growth".

    Exact arithmetic throughout: S and the tie term are integer
    sums; var(S) is one /18 division; z is one fixed-order
    expression with a correctly-rounded sqrt — bit-identical
    cross-engine, everything ships raw. Scale shape: one corpus-
    sized groupBy to the series; the pair fold is a SERIES self-join
    (T²/2 pairs per group — a 30-day hourly series is ~260k pairs,
    said out loud; this is a timeline statistic, not a row
    statistic).

    Output per group: ``group_cols..., n_buckets, s, var_s, z,
    trend`` ('increasing' | 'decreasing' | 'none'; NULL z when
    var(S) is 0).
    """
    if int(bucket_seconds) < 1:
        raise ValueError(
            f"mann_kendall: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    for c in (time_col, *group_cols):
        if c not in df.columns:
            raise ValueError(f"mann_kendall: column {c!r} missing")
    if not group_cols:
        raise ValueError("mann_kendall: group_cols must be non-empty")
    t = F.floor(
        F.unix_timestamp(F.col(time_col)) / F.lit(int(bucket_seconds))
    ).alias("__t")
    series = df.groupBy(*group_cols, t).agg(F.count(F.lit(1)).alias("__c"))
    a = series.select(
        *[F.col(c) for c in group_cols],
        F.col("__t").alias("__ta"),
        F.col("__c").alias("__ca"),
    )
    b = series.select(
        *[F.col(c) for c in group_cols],
        F.col("__t").alias("__tb"),
        F.col("__c").alias("__cb"),
    )
    pairs = a.join(b, list(group_cols)).where(F.col("__ta") < F.col("__tb"))
    s_agg = pairs.groupBy(*group_cols).agg(
        F.sum(
            F.signum((F.col("__cb") - F.col("__ca")).cast("double"))
        )
        .cast("long")
        .alias("s")
    )
    counts = series.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets")
    )
    ties = (
        series.groupBy(*group_cols, "__c")
        .agg(F.count(F.lit(1)).alias("__tt"))
        .where(F.col("__tt") > 1)
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.col("__tt") * (F.col("__tt") - 1) * (2 * F.col("__tt") + 5)
            )
            .cast("long")
            .alias("__tie_term")
        )
    )
    j = (
        counts.join(s_agg, list(group_cols), "left")
        .join(ties, list(group_cols), "left")
        .na.fill({"s": 0, "__tie_term": 0})
    )
    n = F.col("n_buckets").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("__tie_term").cast("double")
    ) / F.lit(18.0)
    s_d = F.col("s").cast("double")
    z = F.when(
        var_s > 0,
        F.when(F.col("s") > 0, (s_d - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (s_d + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    return j.select(
        *group_cols,
        "n_buckets",
        "s",
        var_s.alias("var_s"),
        z.alias("z"),
        F.when(z.isNull(), F.lit("none"))
        .when(z > F.lit(float(z_crit)), F.lit("increasing"))
        .when(z < -F.lit(float(z_crit)), F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )
