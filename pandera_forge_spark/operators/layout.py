"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

At 100 TB the scan you avoid is worth more than the scan you speed up.
Sorting a table on ONE column gives parquet min/max (and Iceberg
lower/upper bound) pruning on that column only; range queries that
constrain TWO OR MORE columns (time × user, price × quantity) read
almost every file under a single-column sort. Z-ordering interleaves
the bits of the dimensions so rows close in the multi-dimensional box
land in the same files — every dimension's per-file min/max range
shrinks, and a box predicate prunes on all of them at once. This is
the same layout lever Delta OPTIMIZE ZORDER BY and Iceberg's
sort-order rewrite expose; here it is plain column algebra plus
``repartitionByRange``, so it works on any parquet sink.

Everything is JVM bitwise expressions — no UDF, no shuffle beyond the
one range-repartition that IS the clustering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_dim(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Min-max quantize a numeric column to an integer code in
    ``[0, 2^bits)`` for Z-value interleaving: ``floor((x - lo) /
    (hi - lo) * 2^bits)`` clamped to the code range (values at/beyond
    ``hi`` take the top code). Pure double arithmetic + floor —
    engine-exact for oracle replay.

    NULL inputs stay NULL (guarded explicitly — Spark's
    ``least``/``greatest`` SKIP null arguments, so without the guard a
    null would silently clamp to the TOP code and cluster as if it
    equaled ``hi``); a null code nulls the whole Morton value, and
    ``repartitionByRange`` groups the null rows together instead of
    hiding them in the max corner."""
    if hi <= lo:
        raise ValueError("hi must exceed lo")
    n_codes = float(1 << bits)
    code = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_codes))
    clamped = F.greatest(
        F.lit(0).cast("long"),
        F.least(code.cast("long"), F.lit((1 << bits) - 1).cast("long")),
    )
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(clamped)


def zorder_value(codes: list[Column], bits: int = 16) -> Column:
    """Morton (Z-curve) value: interleave the low ``bits`` bits of each
    integer code column — bit ``i`` of dimension ``d`` lands at output
    position ``i * D + d``. With D dimensions of ``bits`` bits the
    result occupies ``D * bits`` bits; it must fit a signed long, so
    ``D * bits <= 62``.

    Built as a sum of ``(code >> i & 1) << (i*D + d)`` terms — ``D *
    bits`` bitwise expressions, all whole-stage-codegen; the terms are
    disjoint powers of two, so integer addition is exact and
    order-free (engine-identical).

    Codes are range-checked AT RUNTIME: a negative code (arithmetic
    shift yields 1-bits everywhere) or one at/above ``2^bits`` (high
    bits silently dropped) would interleave garbage — distant rows
    aliasing to the same z-value with no error and no pruning benefit.
    Out-of-range codes raise loudly instead (:func:`quantize_dim` is
    the sanctioned clamped producer); NULL codes pass through and
    null the Morton value."""
    d_n = len(codes)
    if d_n < 2:
        raise ValueError("zorder needs at least 2 dimensions")
    if d_n * bits > 62:
        raise ValueError("D * bits must be <= 62 to fit a signed long")
    terms = []
    for d, c in enumerate(codes):
        raw = c.cast("long")
        ok = raw.isNull() | ((raw >= 0) & (raw < (1 << bits)))
        cl = F.when(ok, raw).otherwise(
            F.raise_error(
                F.lit(
                    f"zorder_value: dimension {d} code out of [0, 2^{bits}) "
                    "— quantize_dim is the sanctioned producer"
                )
            ).cast("long")
        )
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * d_n + d)
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def cluster_by_zorder(
    df: DataFrame,
    codes: list[Column],
    n_partitions: int,
    bits: int = 16,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster rows along the Z-curve: compute the Morton value, range-
    repartition on it (one shuffle — the clustering itself), and sort
    within partitions so parquet row groups are also Z-contiguous.
    Write the result and every dimension's per-file min/max tightens,
    enabling multi-column pruning.

    ``repartitionByRange`` samples to pick boundaries — the FILE
    ASSIGNMENT is therefore not byte-deterministic (Spark's own
    contract), but the CONTENT is; pair with
    :func:`file_minmax_stats` to measure the layout. The Z column is
    dropped from the output; a pre-existing column with that name
    would be silently destroyed, so collisions raise instead."""
    if z_col in df.columns:
        raise ValueError(
            f"z_col {z_col!r} already exists on the input frame — pass a "
            "different z_col"
        )
    z = zorder_value(codes, bits)
    return (
        df.withColumn(z_col, z)
        .repartitionByRange(n_partitions, F.col(z_col))
        .sortWithinPartitions(z_col)
        .drop(z_col)
    )


def file_minmax_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` for a parquet directory — the
    pruning-relevance report: a box query must read a file iff the box
    intersects every column's [min, max]. One scan, groupBy file name
    (O(files) rows out)."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
    )


def pruned_file_fraction(
    stats: DataFrame, box: dict[str, tuple[float, float]]
) -> float:
    """Fraction of files a box query can SKIP given
    :func:`file_minmax_stats` output — the measurable payoff of a
    layout. ``box`` maps column name to (lo, hi). Driver-side over
    O(files) rows by construction."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"max_{c}") >= F.lit(lo)) & (
            F.col(f"min_{c}") <= F.lit(hi)
        )
    total = stats.count()
    hit = stats.where(cond).count()
    return 1.0 - hit / total if total else 0.0
