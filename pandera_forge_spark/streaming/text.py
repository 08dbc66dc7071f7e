"""Stateless streaming text screens.

``stream_contamination`` is deliberately NOT a foreachBatch operator:
the Bloom-filter leak probe is pure per-row column algebra (shingle
the document, test each shingle against a broadcast bit array), so the
Spark-first shape is a stream-static broadcast join + projection — a
plain transformed STREAMING DataFrame that runs in append mode with
any sink, no state store, no custom epoch handling, and watermark-free
(nothing accumulates). Contrast with the stateful twins in
``streaming/dedup.py`` (cross-batch identity needs state) — leak
screening per document needs none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandera_forge_spark.operators.text import bloom_filter_words, bloom_hit_expr


def stream_contamination(
    stream_df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    fp_rate: float = 0.01,
) -> DataFrame:
    """Per-document benchmark-leak screen over a STREAM: returns a
    streaming frame ``(id, n_shingles, n_contaminated,
    contamination_ratio)`` — the same columns and the same Bloom bits
    as the batch ``operators.text.contamination_bloom`` (shared
    builder), but with the per-doc counts computed ROW-LOCALLY
    (``size``/``filter`` over the shingle array) instead of
    explode+groupBy, so the plan is stateless and append-mode-safe.

    Semantics are PER ARRIVING ROW: each document emits exactly one
    output row in its own micro-batch. When ``id_col`` is unique
    across the stream (the normal ingest contract) this equals the
    batch operator row for row; if the same id can RE-ARRIVE (replays,
    late re-ingest), the batch groupBy would merge those texts into
    one row while this screen emits one row per arrival — dedupe
    downstream if your sink is keyed by id (statelessness is exactly
    the property that makes cross-arrival merging impossible here).

    The static ``benchmark`` frame is collapsed to its packed filter
    once at plan time (~1.2 bytes per benchmark shingle at 1% fp) and
    broadcast; each micro-batch is then a narrow map stage. Bloom
    semantics carry over: no false negatives, ~``fp_rate`` false
    positives, so the ratio is an upper bound of the exact operator's.
    """
    from pandera_forge_spark.operators.dedup import shingles

    packed, m_bits, k = bloom_filter_words(benchmark, text_col, n, fp_rate)
    bloom = stream_df.sparkSession.createDataFrame(
        [(packed,)], "__bloom array<long>"
    )
    joined = stream_df.join(F.broadcast(bloom))
    sh = shingles(F.col(text_col), n)
    # sh appears three times below (two sizes + the filter input), so
    # the shingle pipeline is evaluated up to ~3x per ROW — a constant
    # factor, unlike the per-ELEMENT recompute the HOF-capture trap
    # causes (see winnow_fingerprints). Do NOT count on whole-stage-
    # codegen subexpression elimination collapsing them: higher-order
    # functions are CodegenFallback expressions outside its reach.
    # The filter lambda itself touches only its element and the cheap
    # broadcast __bloom column reference.
    contaminated = F.size(F.filter(sh, lambda s: bloom_hit_expr(s, m_bits, k)))
    return joined.select(
        F.col(id_col),
        F.size(sh).cast("long").alias("n_shingles"),
        contaminated.cast("long").alias("n_contaminated"),
        F.round(contaminated / F.size(sh), 6).alias("contamination_ratio"),
    )


# ------------------------------------------------ stream token entropy

def _prior_census(spark, state_dir: str, below_epoch: int):
    """Committed prior-epoch token-census rows (the ``_prior_state``
    discipline from streaming/cardinality.py — loud when success
    markers are missing); None when no prior epoch exists."""
    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    root = f"{state_dir}/census_epochs"
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


def stream_token_entropy(
    stream_df: DataFrame,
    state_dir: str,
    sink: str,
    group_cols,
    text_col: str = "text",
    checkpoint=None,
    on_batch=None,
):
    """Continuous corpus-concentration monitor: per group per epoch,
    the running token count, distinct vocabulary, Shannon entropy and
    effective vocabulary of EVERYTHING ingested so far — the streaming
    twin of ``operators/text.py token_entropy``, and the alarm that
    catches a generation/scraping degeneration (effective vocabulary
    collapsing) while the ingest is still running rather than at the
    next nightly batch.

    State is the token census itself — a COUNT-MONOID: epoch e's
    batch-local census lands at ``<state_dir>/census_epochs/
    __epoch=e`` (overwrite — a replayed epoch rewrites the same rows,
    so the sum never double-counts), each batch merges every
    committed epoch strictly below its own id by plain count
    addition, and the census row per group goes to
    ``<sink>/__epoch=e`` (overwrite). Because count addition is
    commutative and the epoch contract is exactly-once, epoch N's
    output MUST equal the batch ``token_entropy`` of epochs 0..N
    concatenated — the pytest-asserted equivalence.

    Scale: per trigger, one batch-sized explode + census groupBy plus
    a merge over O(vocabulary × epochs) state rows; compact
    ``census_epochs`` offline by rewriting the merged census as one
    epoch dir when the epoch count grows (merged census IS a valid
    epoch — the dedup-band-index hygiene). Returns the unstarted
    ``writeStream`` writer."""
    from pandera_forge_spark.operators.temporal import _check_reserved
    from pandera_forge_spark.operators.text import tokens

    keys = list(group_cols)
    if not keys:
        raise ValueError("stream_token_entropy: group_cols must be non-empty")
    missing = [c for c in keys + [text_col] if c not in stream_df.columns]
    if missing:
        raise ValueError(
            f"stream_token_entropy: frame lacks columns {missing}"
        )
    _check_reserved(
        stream_df, ["__t", "__c", "__epoch"], "stream_token_entropy"
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        bs = (
            batch_df.select(
                *[F.col(c) for c in keys],
                F.explode(tokens(F.col(text_col))).alias("__t"),
            )
            .where(F.col("__t") != "")
            .groupBy(*keys, "__t")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        prior = _prior_census(batch_df.sparkSession, state_dir, e)
        all_rows = (
            bs if prior is None else bs.unionByName(prior.select(*bs.columns))
        )
        merged = all_rows.groupBy(*keys, "__t").agg(
            F.sum("__c").alias("__c")
        )
        agg = merged.groupBy(*keys).agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(
                F.col("__c").cast("double")
                * F.log(F.col("__c").cast("double"))
            ).alias("__sum_clnc"),
        )
        n = F.col("n_tokens").cast("double")
        h = F.when(
            F.col("n_tokens") > 0, F.log(n) - F.col("__sum_clnc") / n
        )
        census = agg.select(
            *keys,
            "n_tokens",
            "n_distinct",
            h.alias("entropy"),
            F.when(h.isNotNull(), F.exp(h)).alias("eff_vocab"),
        )
        census.write.mode("overwrite").parquet(f"{sink}/__epoch={e}")
        bs.write.mode("overwrite").parquet(
            f"{state_dir}/census_epochs/__epoch={e}"
        )
        if on_batch is not None:
            on_batch(census, e)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
