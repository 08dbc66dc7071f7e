"""Streaming cardinality monitor: per-key running distinct counts,
continuously, over mergeable KMV sketch state.

The streaming member of the sketch family (``sketches.py``: HLL =
profiler distinct, KMV = overlap/containment, CMS = frequency,
histogram = drift): each micro-batch sketches its own rows
(``kmv_partition_sketch``), merges with every prior epoch's sketch,
and writes one census row per key per epoch — "distinct users per
event type SO FAR" — the unique-visitors monitor that a
``COUNT(DISTINCT)`` over a growing stream cannot be (state would be
the full value set; the sketch is k longs per key, forever).

State discipline is the package's epoch-keyed parquet contract
(``streaming/sequence.py``): this epoch's BATCH-LOCAL sketch lands at
``<state_dir>/kmv_epochs/__epoch=<id>`` (overwrite), a batch reads
only committed (``_SUCCESS``) epochs strictly below its own id, and
the census goes to ``<sink>/__epoch=<id>`` (overwrite) — exactly-once
per epoch, replay-safe.

Correctness contract — STRONGER than the sequence monitors': KMV
merge is the k-smallest of a set union, a commutative idempotent
monoid, so there is NO ordered-ingest assumption at all. However the
stream cuts its epochs, the epoch-N census equals the batch sketch of
epochs 0..N concatenated (pytest-asserted); while each key's running
distinct count stays below k the census column ``distinct_exact`` is
the EXACT count (the sketch holds the key's whole hash set), and past
k it goes NULL with ``distinct_est`` carrying the (k-1)*2^48/h_k
estimate (~1/sqrt(k-2) relative error).

Scale: per trigger, one (group, hash)-distinct shuffle over the batch
(the shuffle any distinct-count needs) plus a merge over
O(keys x epochs) k-long state rows; compact ``kmv_epochs`` offline by
rewriting the merged sketch as one epoch dir when epoch count grows
(``kmv_merge`` output IS a valid epoch — the same hygiene as the
dedup band index).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandera_forge_spark.operators.temporal import _check_reserved
from pandera_forge_spark.sketches import (
    kmv_estimate,
    kmv_merge,
    kmv_partition_sketch,
)


def _prior_sketches(spark, state_dir: str, below_epoch: int):
    """Every prior epoch's sketch rows (committed dirs only, loud when
    markers are disabled — the ``_prior_state`` discipline); None when
    no prior epoch exists. No reduce here: ``kmv_merge`` downstream
    groups by key and ignores the ``__epoch`` partition column."""
    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    root = f"{state_dir}/kmv_epochs"
    if not fs.exists(root):
        return None
    below = [
        n
        for n in fs.listdir(root)
        if n.startswith("__epoch=")
        and int(n.split("=", 1)[1]) < int(below_epoch)
    ]
    dirs = [n for n in below if fs.exists(f"{root}/{n}/_SUCCESS")]
    if below and not dirs:
        raise RuntimeError(
            f"{root}: {len(below)} prior-epoch state dirs exist but none "
            "has a _SUCCESS marker — success markers disabled on this "
            "filesystem? The monitors rely on them to skip torn writes"
        )
    if not dirs:
        return None
    return spark.read.option("basePath", root).parquet(
        *[f"{root}/{n}" for n in dirs]
    )


def stream_cardinality(
    stream_df: DataFrame,
    state_dir: str,
    sink: str,
    key_cols: Sequence[str],
    value_col: str,
    k: int = 256,
    seed: str = "kmv",
    checkpoint: Optional[str] = None,
    on_batch: Optional[Callable] = None,
):
    """Continuous running-distinct monitoring: one census row per key
    per epoch at ``<sink>/__epoch=<id>`` with ``sketch_size`` (int),
    ``distinct_exact`` (BIGINT — the exact running distinct count
    while it is still below ``k``, NULL once the sketch saturates) and
    ``distinct_est`` (double — always present; equals the exact count
    in the unsaturated regime). Keys seen in ANY prior epoch keep
    reporting even in batches where they are absent — a monitor that
    drops quiet keys reads as a cardinality crash.

    NULL values never count (the ``kmv_hash`` contract — nullability
    is the profiler's job); NULL KEYS group null-safely like every
    groupBy. Returns the unstarted ``writeStream`` writer."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("stream_cardinality: key_cols must be non-empty")
    missing = [c for c in keys + [value_col] if c not in stream_df.columns]
    if missing:
        raise ValueError(
            f"stream_cardinality: frame lacks columns {missing}"
        )
    _check_reserved(
        stream_df,
        ["__kmv", "__kmv_k", "__kmv_seed", "__epoch"],
        "stream_cardinality",
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        bs = kmv_partition_sketch(
            batch_df, value_col, keys, k=k, seed=seed
        )
        prior = _prior_sketches(batch_df.sparkSession, state_dir, e)
        all_sk = (
            bs
            if prior is None
            else bs.unionByName(prior.select(*bs.columns))
        )
        merged = kmv_merge(all_sk, keys)
        census = kmv_estimate(merged).select(
            *keys,
            "sketch_size",
            F.when(
                F.col("sketch_size") < F.col("__kmv_k"),
                F.col("sketch_size").cast("long"),
            ).alias("distinct_exact"),
            "distinct_est",
        )
        census.write.mode("overwrite").parquet(f"{sink}/__epoch={e}")
        # state after sink (crash => replay rewrites both identically;
        # reads only epochs < e, so partials are invisible)
        bs.write.mode("overwrite").parquet(
            f"{state_dir}/kmv_epochs/__epoch={e}"
        )
        if on_batch is not None:
            on_batch(census, e)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
