"""Re-identification risk audits: k-anonymity and l-diversity.

The reference validates per-column shape (dtype/nullable/range/regex —
reference: validators/data_validator.py); a release gate for a 10^12-doc
corpus additionally needs COMBINATION checks: how small do the groups
get when rows are bucketed by a set of quasi-identifier (QI) columns,
and how concentrated is a sensitive attribute inside each group. These
are the standard k-anonymity (Sweeney) and l-diversity (Machanavajjhala
et al.) audits, both public-textbook definitions, re-expressed as plain
distributed aggregations:

- ``k_anonymity_violations`` — ONE ``groupBy(qi).count()`` (map-side
  partial combine) filtered to ``count < k``. Output is proportional to
  the number of RISKY groups, never the corpus.
- ``k_anonymity_summary`` — a second, tiny aggregate over the group
  frame (n_groups rows, orders of magnitude below n_rows), the
  ``skew_report`` shape: min group size IS the table's k-anonymity.
- ``l_diversity_violations`` — two-STAGE distinct: ``groupBy(qi,
  sensitive).count()`` then ``groupBy(qi)``, so the distinct count is
  computed by composable partial aggregation instead of a
  ``countDistinct`` expand — the second stage reduces a frame already
  collapsed to one row per (group, value).

Skew: all three shuffle once on the QI key; the hot-group case is not a
hazard here but the SUBJECT — a heavily-populated QI combination is by
definition k-anonymous, and the partial combine collapses it map-side
before the shuffle, so the reducer sees one row per (partition, group).
Generalization levels (coarser QI buckets) are the caller's projection:
derive the bucketed column first (e.g. ``floor(acctbal / 1000)``), then
audit — the audit itself never rewrites values.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_cols(df: DataFrame, cols: Sequence[str], op: str) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{op}: columns {missing} missing from the frame")


def _check_threshold(value: int, name: str) -> None:
    if not isinstance(value, int) or value < 1:
        raise ValueError(f"{name} must be an integer >= 1, got {value!r}")


def k_anonymity_violations(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Groups of rows identical on ``qi_cols`` with fewer than ``k``
    members: (*qi_cols, group_size). An empty result means the table is
    k-anonymous at this generalization level.

    NULL QI values group together (Spark and ANSI SQL ``GROUP BY``
    agree), i.e. an all-NULL combination is a group like any other —
    a row with suppressed identifiers still belongs to a cohort.
    """
    qi = list(qi_cols)
    if not qi:
        raise ValueError("k_anonymity_violations: need at least one QI column")
    _check_cols(df, qi, "k_anonymity_violations")
    _check_threshold(k, "k")
    return (
        df.groupBy(*qi)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
    )


def k_anonymity_summary(
    df: DataFrame, qi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One-row release-gate verdict: (n_rows, n_groups, k_anonymity,
    risky_groups, risky_rows, risky_row_ratio) where ``k_anonymity`` is
    the minimum group size (the largest k the table satisfies) and the
    ``risky_*`` columns count groups/rows below the requested ``k``.

    Two aggregates: the wide groupBy, then a 1-row reduce over the
    group frame — the same two-stage shape as ``validator.skew_report``.
    An empty input yields the zero row (k_anonymity 0 by convention,
    ratio 0.0) rather than an all-NULL aggregate row.
    """
    qi = list(qi_cols)
    if not qi:
        raise ValueError("k_anonymity_summary: need at least one QI column")
    _check_cols(df, qi, "k_anonymity_summary")
    _check_threshold(k, "k")
    groups = df.groupBy(*qi).agg(F.count(F.lit(1)).alias("__n"))
    risky = (F.col("__n") < k).cast("long")
    return groups.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(F.min("__n"), F.lit(0)).alias("k_anonymity"),
        F.coalesce(F.sum(risky), F.lit(0)).alias("risky_groups"),
        F.coalesce(F.sum(F.col("__n") * risky), F.lit(0)).alias("risky_rows"),
        F.coalesce(
            F.sum(F.col("__n") * risky) / F.sum("__n"), F.lit(0.0)
        ).alias("risky_row_ratio"),
    )


def l_diversity_violations(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """QI groups whose ``sensitive_col`` takes fewer than ``l`` DISTINCT
    values: (*qi_cols, group_size, distinct_sensitive). A k-anonymous
    group can still leak (everyone in the cohort shares the same
    diagnosis); this is the complementary check.

    Rows with NULL sensitive values are excluded first (a NULL is a
    suppressed value, not a diversity contribution — and this matches
    SQL ``COUNT(DISTINCT ...)`` semantics so the DuckDB oracle replays
    exactly). ``group_size`` therefore counts non-NULL-sensitive rows.

    Plan: groupBy(qi + sensitive) then groupBy(qi) — both stages
    partial-aggregate map-side; no countDistinct expand, no collect.
    """
    qi = list(qi_cols)
    if not qi:
        raise ValueError("l_diversity_violations: need at least one QI column")
    _check_cols(df, qi + [sensitive_col], "l_diversity_violations")
    _check_threshold(l, "l")
    if sensitive_col in qi:
        raise ValueError(
            "l_diversity_violations: the sensitive column cannot be a QI "
            "column — every group would trivially have diversity 1"
        )
    per_value = (
        df.where(F.col(sensitive_col).isNotNull())
        .groupBy(*qi, sensitive_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        per_value.groupBy(*qi)
        .agg(
            F.sum("__n").alias("group_size"),
            F.count(F.lit(1)).alias("distinct_sensitive"),
        )
        .where(F.col("distinct_sensitive") < l)
    )


def tokenize_columns(
    df: DataFrame,
    cols: Sequence[str],
    salt: str,
    scope: str = "column",
    length: int = 0,
) -> DataFrame:
    """Deterministic pseudonymization: each value in ``cols`` is
    replaced IN PLACE by ``sha256(salt : [column :] value)`` hex — the
    standard keyed-tokenization release pattern (public material;
    HMAC-style keyed hashing, GDPR's "pseudonymisation"): equal inputs
    get equal tokens, so groupBy/joins/uniqueness checks still work on
    the released table, while raw identifiers never leave.
    ``operators.pii.redact`` destroys the value; this PRESERVES its
    algebra — run uniqueness or RI audits on tokens with the same
    verdicts as on the originals.

    ``scope='column'`` (default) mixes the column name into the hash:
    the same email in two different columns gets two unrelated tokens
    (no cross-column correlation for an attacker). ``scope='value'``
    omits it, keeping tokens JOINABLE across columns/tables — the mode
    for tokenized foreign keys; choose it deliberately.

    Caveats said out loud: determinism itself leaks equality (row
    counts per token are visible — that is the point, and also the
    risk: a low-cardinality column is brute-forceable from token
    frequencies unless the salt stays secret; keep the salt OUT of the
    released artifact). ``length`` truncates the 64-hex token (0 =
    full); 16 hex = 64 bits means birthday collisions around 2^32
    distinct values — leave 0 for uniqueness-critical audits.

    NULL stays NULL (missingness is not an identity). Values hash
    through their string cast (cross-width-stable for ints, the
    join_key_candidates convention); float columns are refused —
    representation-sensitive casts would silently fork tokens.

    Scale: a pure per-row projection — no shuffle, no UDF,
    whole-stage-codegen sha256."""
    cols = list(cols)
    if not cols:
        raise ValueError("tokenize_columns: cols must be non-empty")
    if not salt:
        raise ValueError("tokenize_columns: salt must be non-empty")
    if scope not in ("column", "value"):
        raise ValueError(
            f"tokenize_columns: scope must be 'column' or 'value', "
            f"got {scope!r}"
        )
    if int(length) < 0 or int(length) > 64:
        raise ValueError(
            f"tokenize_columns: length must be in [0, 64], got {length}"
        )
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"tokenize_columns: frame lacks columns {missing}")
    floats = [c for c in cols if dtypes[c] in ("float", "double")]
    if floats:
        raise ValueError(
            f"tokenize_columns: float columns {floats} have "
            "representation-sensitive string casts — cast or quantize "
            "them deliberately first"
        )
    out = df
    for c in cols:
        prefix = f"{salt}:{c}:" if scope == "column" else f"{salt}:"
        tok = F.sha2(
            F.concat(F.lit(prefix), F.col(c).cast("string")), 256
        )
        if int(length) > 0:
            tok = F.substring(tok, 1, int(length))
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(tok)
        )
    return out
