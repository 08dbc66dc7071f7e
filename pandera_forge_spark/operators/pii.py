"""PII detection, reporting, and redaction over free-text columns.

A training-data curation pass the reference cannot express: its pattern
detector (reference: pattern_detector.py:26-80) classifies a COLUMN as
"is an email column" via anchored whole-value matches on a driver-side
sample; a web corpus instead needs to find PII embedded INSIDE document
text (an SSN in the middle of a crawled page) and either report or
scrub it. These operators run the unanchored scan distributed, as pure
``rlike`` / ``regexp_replace`` column expressions — JVM-side,
whole-stage codegen, zero Python UDFs, zero shuffle for the flag/redact
projections and ONE aggregate reduce for the corpus report.

The regex dialect is kept to the Java-regex / RE2 common subset
(character classes, \\b, non-capturing groups) so the same pattern
strings drive both the Spark scan and a DuckDB oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered for redaction: more-specific digit shapes before looser ones
# so a credit card is not half-eaten by the phone pattern first.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone_us": r"\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_flag_expr(col: Column, pattern: str) -> Column:
    """Boolean: ``col`` contains a substring matching ``pattern``
    (null-safe: null text flags false)."""
    return F.coalesce(col.cast("string").rlike(pattern), F.lit(False))


def pii_scan(
    df: DataFrame,
    cols: Sequence[str],
    patterns: Optional[dict[str, str]] = None,
) -> DataFrame:
    """Corpus PII report: one row per (column, pattern) with the count
    and ratio of rows containing a match —
    (column, pattern, rows, hits, hit_ratio).

    ONE job: every (column x pattern) flag is a boolean projection
    evaluated in the same whole-stage-codegen scan, reduced by a single
    1-row aggregate (algebraic sums, map-side combine — the fused-agg
    shape of profiler.py JOB 1), then pivoted to long form driver-side
    from that single row. Adding patterns widens the codegen stage, it
    never adds a scan.
    """
    pats = patterns or PII_PATTERNS
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        for name, rx in pats.items():
            aggs.append(
                F.sum(pii_flag_expr(F.col(c), rx).cast("long")).alias(
                    f"{c}__{name}"
                )
            )
    row = df.agg(*aggs).collect()[0]
    total = row["__rows"]
    out = [
        (c, name, total, row[f"{c}__{name}"],
         (row[f"{c}__{name}"] / total) if total else 0.0)
        for c in cols
        for name in pats
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, pattern string, rows long, hits long, hit_ratio double"
    )


def pii_flagged_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: Optional[dict[str, str]] = None,
) -> DataFrame:
    """Violation rows: (id, pii_kinds) for every row whose text contains
    at least one PII match, with ``pii_kinds`` the sorted array of
    pattern names that hit.

    Row-local flags + filter — narrow plan, predicate evaluated in the
    scan stage, no shuffle; at 10^12 docs the output is proportional to
    the PII incidence, never the corpus.
    """
    pats = patterns or PII_PATTERNS
    col = F.col(text_col)
    kinds = F.array_compact(
        F.array(
            *[
                F.when(pii_flag_expr(col, rx), F.lit(name))
                for name, rx in pats.items()
            ]
        )
    )
    return (
        df.select(F.col(id_col), F.sort_array(kinds).alias("pii_kinds"))
        .where(F.size("pii_kinds") > 0)
    )


def redact_expr(
    col: Column, patterns: Optional[dict[str, str]] = None, token: str = "[PII:{name}]"
) -> Column:
    """Scrubbed copy of ``col``: every PII match replaced by the token,
    applied in PII_PATTERNS order (specific digit shapes first).
    A chain of JVM ``regexp_replace`` calls — one codegen projection."""
    pats = patterns or PII_PATTERNS
    out = col.cast("string")
    for name, rx in pats.items():
        out = F.regexp_replace(out, rx, token.format(name=name))
    return out


def redact(
    df: DataFrame,
    cols: Sequence[str],
    patterns: Optional[dict[str, str]] = None,
    token: str = "[PII:{name}]",
) -> DataFrame:
    """Corpus scrubbing pass: rewrite ``cols`` in place with PII
    replaced. Pure projection — partitioning preserved, no shuffle, the
    write after this is the only job."""
    out = df
    for c in cols:
        out = out.withColumn(c, redact_expr(F.col(c), patterns, token))
    return out


def redact_spans(
    df: DataFrame,
    spans_col: str = "spans",
    patterns: Optional[dict[str, str]] = None,
    token: str = "[PII:{name}]",
) -> DataFrame:
    """PII scrubbing for the INTERLEAVED document shape — the north-rule
    input column ``spans: array<struct<kind, text, media_ref,
    offset>>``: every ``kind='text'`` span's text runs the same
    ``redact_expr`` regexp chain :func:`redact` applies to flat
    columns, INSIDE one JVM ``transform`` over the array — no explode,
    no re-assembly shuffle, no UDF; a million-span document is one
    row's projection.

    Span-sequence preservation is the contract (the reference's
    per-row invariant: kind, media_ref, order): kind, media_ref, and
    offset pass through BIT-IDENTICAL, array length and order
    unchanged — only text content of text spans can differ, so
    ``spans.span_sequence_mismatches`` against the input flags exactly
    the redacted docs and nothing else. Media spans keep whatever text
    field they carry (NULL by schema); their payload references are
    never touched (image PII is a decode-side concern, out of scope by
    the multimodal stub contract)."""
    if spans_col not in df.columns:
        raise ValueError(f"redact_spans: column {spans_col!r} missing")
    dt = df.schema[spans_col].dataType
    import pyspark.sql.types as T

    if not (
        isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType)
    ):
        raise ValueError(
            f"redact_spans: {spans_col!r} must be array<struct<...>>, "
            f"got {dt.simpleString()}"
        )
    fields = [f.name for f in dt.elementType.fields]
    for need in ("kind", "text"):
        if need not in fields:
            raise ValueError(
                f"redact_spans: span struct lacks field {need!r} "
                f"(has {fields})"
            )

    def scrub(s):
        return F.struct(
            *[
                (
                    F.when(
                        s["kind"] == "text",
                        redact_expr(s["text"], patterns, token),
                    )
                    .otherwise(s["text"])
                    .alias("text")
                    if name == "text"
                    else s[name].alias(name)
                )
                for name in fields
            ]
        )

    return df.withColumn(
        spans_col, F.transform(F.col(spans_col), scrub)
    )
