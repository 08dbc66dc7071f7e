"""Changelog (CDC) compaction: latest-record-per-key resolution and
changelog application onto a base snapshot.

The upstream shape every warehouse ingest eventually meets: a mutable
source emits an append-only stream of keyed change records (inserts,
updates, deletes, each stamped with an ordering column), and the engine
must materialize "the current state" — per key, the payload of the
newest change, with deleted keys gone. The reference validates static
snapshots (pandera-forge profiles one table at a time); this module is
the operator that PRODUCES the snapshot the validators then profile,
and the companion of ``validator.snapshot_diff`` (which audits two such
snapshots against each other).

Spark-first design — both operators are aggregate/join shaped, never
windowed row_number-over-everything:

- ``latest_by_key`` is ONE ``max(struct(order..., payload))`` groupBy:
  the lexicographic struct max IS "row with the greatest order tuple",
  and because max is algebraic it partial-aggregates map-side — each
  input partition reduces to at most one candidate row per key BEFORE
  the shuffle, so the exchange carries ~|keys| rows no matter how many
  change generations piled up. The textbook window alternative
  (``row_number() over (partition by key order by ord desc) = 1``)
  shuffles and sorts EVERY change record; at 10^12 changes that is the
  difference between a working job and a dead one.
- ``apply_changelog`` = compact the changes (above) + one null-safe
  left-anti join to drop superseded/deleted base rows + unionByName of
  the surviving upserts. Two shuffles total on the key; with base and
  changes bucketed on the key both collapse to zero extra Exchange.

Skew: both shuffle on the entity key; AQE skew-join handles a hot key
on the anti-join side, and the map-side partial max already levels a
hot key's aggregation (each task emits one candidate for it).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import (
    _last_row_struct,
    _nullsafe_equi_join,
    _with_next,
)


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One row per key: the payload of the record with the greatest
    ``order_cols`` tuple — changelog compaction / upsert resolution.

    Output columns: ``key_cols + order_cols + payload_cols`` (payload
    defaults to every remaining column). Deterministic when the order
    tuple is total per key (make it so — append a unique id as the last
    order column); if the full order tuple ever ties, the payload
    struct itself breaks the tie lexicographically, which is still
    deterministic but rarely what you meant. NULL order values sort
    lowest (a NULL timestamp loses to any real one) — Spark struct
    ordering; a DuckDB ``ORDER BY ... DESC`` replay agrees because both
    engines put NULLs last under DESC, but DuckDB's ASC default is
    NULLS LAST since v0.8, so pin null placement explicitly in any SQL
    replay over NULLable order columns.

    Scale: one algebraic aggregate — map-side partial max reduces each
    input partition to <= 1 row per key before the exchange; no sort,
    no window, no row buffering. A hot key costs one struct comparison
    per row, distributed."""
    keys = list(key_cols)
    order = list(order_cols)
    if payload_cols is None:
        taken = set(keys) | set(order)
        payload = [c for c in df.columns if c not in taken]
    else:
        payload = list(payload_cols)
        overlap = sorted(set(payload) & (set(keys) | set(order)))
        if overlap:
            # the select would emit the column TWICE (once from the
            # order tuple, once from the payload struct) — a frame with
            # duplicate names that crashes any downstream reference
            raise ValueError(
                f"payload_cols {overlap} are already key/order columns "
                "and would duplicate in the output — drop them from "
                "payload_cols (they are returned anyway)"
            )
        if len(set(payload)) != len(payload):
            raise ValueError(f"payload_cols has duplicates: {payload}")
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        _last_row_struct(order, payload).alias("__latest")
    )
    return agg.select(
        *keys,
        *[F.col(f"__latest.{c}").alias(c) for c in order],
        *[F.col(f"__latest.__cap.{c}").alias(c) for c in payload],
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_values: Sequence[str] = ("D",),
    payload_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Materialize the next snapshot: ``base`` with ``changes`` applied.

    Each change row carries the key, an ordering tuple, an ``op_col``
    marker and the new payload. Per key, only the NEWEST change counts
    (older generations are compacted away first); a newest-change op in
    ``delete_values`` removes the key, anything else upserts the row
    (insert if the key is absent from base, update otherwise — the two
    are the same operation here). Base rows whose key never appears in
    the changes pass through untouched. NULL keys are matched
    null-safely: a NULL-key change replaces/deletes the NULL-key base
    rows rather than silently duplicating them. A NULL ``op_col`` is an
    upsert (ANSI three-valued logic would otherwise make ``NOT IN``
    silently swallow the row — a delete-by-accident).

    Output schema == ``base`` schema; changes must therefore carry
    every base column (plus ``op_col``). A delete row's payload values
    are irrelevant (NULLs are fine).

    Scale: compaction is the ``latest_by_key`` aggregate; the base scan
    pays one left-anti hash join against the compacted (one row per
    changed key) frame — broadcastable whenever a day's distinct
    changed keys fit, and AQE makes that call at runtime from the real
    size. Nothing here is proportional to the raw changelog length
    after the map-side partial max."""
    keys = list(key_cols)
    out_cols = list(base.columns)
    if op_col in out_cols:
        raise ValueError(
            f"op_col {op_col!r} collides with a base column: the change "
            "marker and the data column would be indistinguishable — pass "
            "a differently-named op_col"
        )
    if payload_cols is None:
        taken = set(keys) | set(order_cols) | {op_col}
        payload = [c for c in changes.columns if c not in taken]
    else:
        payload = list(payload_cols)
    missing = [c for c in out_cols if c not in set(keys) | set(order_cols) | set(payload)]
    if missing:
        raise ValueError(
            f"changes cannot rebuild base columns {missing}: pass them in "
            "payload_cols (or include them in the changes frame)"
        )
    compact = latest_by_key(
        changes,
        keys,
        order_cols,
        list(payload) + ([op_col] if op_col not in payload else []),
    )
    survivors = _nullsafe_equi_join(
        base, compact.select(*keys), keys, "left_anti"
    )
    upserts = compact.where(
        ~F.col(op_col).isin(list(delete_values)) | F.col(op_col).isNull()
    ).select(*out_cols)
    return survivors.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    op_col: Optional[str] = None,
    delete_values: Sequence[str] = ("D",),
    payload_cols: Optional[Sequence[str]] = None,
    split_every: Optional[float] = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an append-only
    changelog: one VALIDITY INTERVAL per surviving change — the row's
    payload held from its own timestamp (``valid_from``) until the next
    change of the same key (``valid_to``, NULL while still open), with
    ``is_current`` marking the open row. The companion of
    ``latest_by_key`` (which keeps only the newest state) and the shape
    every as-of auditing/"what did the record say on date X" question
    needs; the reference profiles a single static snapshot
    (generator.py:59-94) and has no history notion — this is the
    north-rule lineage extension that PRODUCES the as-of snapshots its
    validators then profile.

    Delete semantics: a change whose ``op_col`` is in ``delete_values``
    CLOSES the previous interval at its timestamp (it is the previous
    row's ``valid_to`` via lead) but emits no interval row itself — a
    deleted key has no current row. With ``op_col=None`` every change
    is an upsert. A NULL op is an upsert (same 3VL rule as
    ``apply_changelog`` — ``isin`` would otherwise silently delete).

    Determinism: ``(ts_col, *tiebreak_cols)`` must be total per key
    (append a unique change id); a tie makes interval attribution
    nondeterministic. NULL timestamps sort first (Spark ASC; pin NULLS
    FIRST in any DuckDB replay) and open an interval whose
    ``valid_from`` is NULL.

    Output: ``key_cols + payload + (valid_from, valid_to, is_current)``
    where valid_from/valid_to keep ``ts_col``'s dtype.

    Scale: exactly one lead window (the ``_with_next`` kernel — one
    shuffle on the key, O(1) state, external sort) and a filter; no
    joins, nothing proportional to history depth beyond the sort.
    ``split_every`` bounds a hot key's sort at one time chunk, output
    identical to the unsplit path (pytest-asserted)."""
    keys = list(key_cols)
    order = [ts_col] + list(tiebreak_cols)
    for c in ("valid_from", "valid_to", "is_current"):
        if c in changes.columns:
            raise ValueError(
                f"input already has a {c!r} column — rename it; the "
                "history attaches its own"
            )
    if payload_cols is None:
        taken = set(keys) | set(order) | ({op_col} if op_col else set())
        payload = [c for c in changes.columns if c not in taken]
    else:
        payload = list(payload_cols)
    out = _with_next(changes, keys, order, {"valid_to": ts_col}, split_every)
    if op_col is not None:
        out = out.where(
            ~F.col(op_col).isin(list(delete_values)) | F.col(op_col).isNull()
        )
    return out.select(
        *keys,
        *payload,
        F.col(ts_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def golden_records(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    field_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Survivorship / golden-record assembly: one row per entity where
    EACH field independently carries its latest NON-NULL value by the
    order tuple — the master-data primitive ``latest_by_key`` is not:
    latest-row-wins propagates the newest record's NULLs over older
    real values, while a golden record fills each attribute from
    whichever generation last knew it (phone from Tuesday's record,
    email from March's).

    Per field the winner is ``max(struct(order*, field))`` with every
    order component masked to NULL when the field is NULL — Spark
    struct comparison puts NULL fields lowest, so any row that HAS the
    field beats every row that lacks it, and among those the greatest
    order tuple wins; an all-NULL field stays NULL. Ties on the full
    order tuple fall to the field value itself (deterministic; make
    the order total per key — append a unique id — if that matters).
    Also emits ``n_records`` (generations seen per key).

    Scale: ONE algebraic aggregate for all fields together — every
    masked struct-max partial-aggregates map-side, so each input task
    emits one candidate row per key regardless of history depth; no
    window, no sort, no per-field pass. The per-field window
    formulation (FIRST_VALUE ... IGNORE NULLS) sorts every key's whole
    history once per field."""
    keys = list(key_cols)
    order = list(order_cols)
    if field_cols is None:
        taken = set(keys) | set(order)
        fields = [c for c in df.columns if c not in taken]
    else:
        fields = list(field_cols)
        overlap = sorted(set(fields) & (set(keys) | set(order)))
        if overlap:
            raise ValueError(
                f"field_cols {overlap} are key/order columns — a column "
                "cannot be both the ordering and the survivorship payload"
            )
    if not fields:
        raise ValueError("no field_cols to survive: pass at least one")
    if "n_records" in set(keys) | set(fields):
        raise ValueError(
            "output name 'n_records' collides with a key/field column — "
            "rename it"
        )
    aggs = []
    for f in fields:
        present = F.col(f).isNotNull()
        aggs.append(
            F.max(
                F.struct(
                    *[
                        F.when(present, F.col(c)).alias(f"__o{i}")
                        for i, c in enumerate(order)
                    ],
                    F.col(f).alias("__v"),
                )
            )[
                "__v"
            ].alias(f)
        )
    aggs.append(F.count(F.lit(1)).alias("n_records"))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
