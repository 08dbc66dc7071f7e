"""Streaming near-deduplication over a persisted MinHash band index.

The streaming twin of ``operators/dedup.near_duplicates_incremental``:
each micro-batch of arriving documents (1) probes the standing band
index for near-duplicates of everything ingested before it, (2) writes
the verified ``(new_id, corpus_id, jaccard)`` matches to a per-epoch
sink, and (3) appends its own band + shingle rows to the index so later
batches match against it. ``streaming/stateful.duplicate_ids_stream``
covers EXACT duplicate keys with store-backed state; this completes the
story for NEAR duplicates, whose state (the band index) is too large
and too structural for the state store and lives as a parquet artifact
instead — the same artifact batch probes (``probe_band_index``) and
daily-ingest jobs share.

Exactly-once: every side effect is keyed by epoch id —
matches land in ``<match_sink>/__epoch=<id>`` (overwrite), the index
append lands in ``bands_epochs/__epoch=<id>`` (overwrite), and a probe
only reads epochs strictly BELOW its own id. A replayed micro-batch
(foreachBatch retry, restart from checkpoint) therefore re-derives
byte-identical output and can never match against its own partial
append — each planted cross-batch near-dup pair is reported exactly
once, in the epoch its second member arrived.

Scale: per trigger the cost is O(batch x bands) band rows joined
against the pruned index partitions plus shingle lookups for actual
candidates — never a rescan of corpus text; identical to the batch
incremental path, which SCALE.md grades for 10^12 docs.
"""

from __future__ import annotations

import json
from typing import Callable, Optional

from pyspark.sql import DataFrame

from pandera_forge_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    append_band_index_epoch,
    probe_band_index,
    write_band_index,
)


def stream_near_dedup(
    stream_df: DataFrame,
    index_path: str,
    match_sink: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_bucket: Optional[int] = DEFAULT_MAX_BUCKET,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    checkpoint: Optional[str] = None,
    on_batch: Optional[Callable] = None,
):
    """Returns the unstarted ``writeStream`` writer (caller picks the
    trigger, like every foreachBatch surface in this package).

    If no index exists at ``index_path``, the FIRST micro-batch
    initializes it (those documents become the standing corpus; they
    emit no matches — there is nothing earlier to match). The
    initializing epoch id is recorded in a sidecar so a replay of that
    epoch re-initializes instead of probing itself. Pass an index
    pre-built with ``write_band_index`` to match from the first batch
    onward.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from pandera_forge_spark.sources.fs import DriverFS

        spark = batch_df.sparkSession
        fs = DriverFS(spark)
        init_sidecar = f"{index_path}/_stream_init.json"
        init_epoch = (
            json.loads(fs.read_bytes(init_sidecar).decode())["epoch"]
            if fs.exists(init_sidecar)
            else None
        )
        if not fs.exists(f"{index_path}/_band_meta.json") or init_epoch == int(
            epoch_id
        ):
            # sidecar FIRST: if the process dies between the two writes,
            # the replayed epoch sees init_epoch == itself and
            # re-initializes; the reverse order would leave a complete
            # index with no sidecar, and the replay would probe the
            # index built from itself (a self-match for every doc)
            fs.write_bytes(
                init_sidecar, json.dumps({"epoch": int(epoch_id)}).encode()
            )
            # A restart with a FRESH checkpoint restarts epoch ids at 0,
            # which re-enters this init path against an index that may
            # carry a prior stream's per-epoch appends; write_band_index
            # overwrites only bands/ and shingles/, so stale
            # bands_epochs/__epoch=N dirs would silently union into
            # later probes. Clear them before (re)initializing.
            fs.delete(f"{index_path}/bands_epochs", recursive=True)
            fs.delete(f"{index_path}/shingles_epochs", recursive=True)
            write_band_index(
                batch_df, index_path, text_col, id_col,
                num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
                seed=seed,
            )
            if on_batch is not None:
                on_batch(None, epoch_id)
            return
        # shingle the batch ONCE (with the index's own parameters) and
        # share the frame between the probe and the epoch append — the
        # shingling projection dominates per-epoch CPU
        from pyspark.sql import functions as F

        from pandera_forge_spark.operators.dedup import hashed_shingles

        meta = json.loads(
            fs.read_bytes(f"{index_path}/_band_meta.json").decode()
        )
        sh = batch_df.select(
            F.col(id_col),
            hashed_shingles(F.col(text_col), meta["shingle_n"]).alias("__sh"),
        ).persist()
        try:
            matches = probe_band_index(
                spark, index_path, batch_df, text_col, id_col,
                threshold=threshold, max_bucket=max_bucket,
                max_epoch=int(epoch_id), new_shingles=sh,
            )
            try:
                matches.write.mode("overwrite").parquet(
                    f"{match_sink}/__epoch={int(epoch_id)}"
                )
                append_band_index_epoch(
                    batch_df, index_path, int(epoch_id), text_col, id_col,
                    shingles=sh,
                )
                if on_batch is not None:
                    on_batch(matches, epoch_id)
            finally:
                matches.unpersist()
        finally:
            sh.unpersist()

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
