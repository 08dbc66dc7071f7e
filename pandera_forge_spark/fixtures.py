"""Deterministic generators for the north-rule interleaved-documents
table (FIXTURES.md F1) and its mutated twin.

Everything is generated DISTRIBUTED and SEEDED — `spark.range` plus
hash-derived pseudo-randomness (`xxhash64(id, seed)`), no driver-side
loops and no `rand()` (which is nondeterministic across retries). The
same (n_docs, seed) always yields byte-identical tables at any
parallelism, which is what makes the two-cluster-size scaling runs and
the oracle comparisons meaningful.

Shape (BASELINE.json input_hint):
    doc_id : string  — unique, skewed prefix distribution (~90% share a
                       hot prefix, exercising salting / AQE skew paths)
    spans  : array<struct<kind:string, text:string, media_ref:string,
                          offset:int>>
             — 1..24 spans, long-tail length; ~90% kind='text';
               text non-null iff kind='text'; media_ref non-null iff
               kind!='text' (uri-like "media://<sha>/<n>");
               offset strictly increasing within a doc
    bucket : int     — partition key for per-partition verdicts /
                       checkpoint-resume tests
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ("image", "audio", "video")


def _h(*cols):
    """Deterministic 64-bit hash column."""
    return F.xxhash64(*cols)


def make_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_buckets: int = 8,
    hot_fraction: float = 0.9,
) -> DataFrame:
    """Generate the interleaved-documents table, fully distributed."""
    df = spark.range(n_docs)
    h = _h(F.col("id"), F.lit(seed))

    # skewed doc_id prefixes: hot_fraction of docs share prefix "hot",
    # the rest spread over p0..p6 — uniqueness comes from the id suffix
    prefix = F.when(
        F.pmod(h, F.lit(100)) < int(hot_fraction * 100), F.lit("hot")
    ).otherwise(F.concat(F.lit("p"), F.pmod(h, F.lit(7)).cast("string")))
    doc_id = F.concat(prefix, F.lit("-"), F.lpad(F.col("id").cast("string"), 12, "0"))

    # long-tail span count: mostly 1..8, ~8% of docs get 17..24
    base = (F.pmod(_h(F.col("id"), F.lit(seed + 1)), F.lit(8)) + 1).cast("int")
    n_spans = F.when(
        F.pmod(_h(F.col("id"), F.lit(seed + 2)), F.lit(13)) == 0, base + 16
    ).otherwise(base)

    def span(i):
        hk = F.pmod(_h(F.col("id"), i, F.lit(seed + 3)), F.lit(10))
        kind = F.when(hk < 9, F.lit("text")).otherwise(
            F.element_at(
                F.array(*[F.lit(k) for k in KINDS]),
                (F.pmod(_h(F.col("id"), i, F.lit(seed + 4)), F.lit(3)) + 1).cast("int"),
            )
        )
        text = F.when(
            kind == "text",
            F.concat(
                F.lit("tok"),
                F.pmod(_h(F.col("id"), i, F.lit(seed + 5)), F.lit(9973)).cast("string"),
                F.lit(" word"),
                F.pmod(_h(F.col("id"), i, F.lit(seed + 6)), F.lit(997)).cast("string"),
            ),
        )
        media_ref = F.when(
            kind != "text",
            F.concat(
                F.lit("media://"),
                F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))),
                F.lit("/"),
                i.cast("string"),
            ),
        )
        # strictly increasing: i*100 + jitter in [0, 50)
        offset = (
            i * 100 + F.pmod(_h(F.col("id"), i, F.lit(seed + 7)), F.lit(50))
        ).cast("int")
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return df.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("bucket"),
    )


# Mutation moduli — a doc is corrupted when its generator id hits one of
# these; tests recover the expected violation sets from the same ids.
MUT_REORDER = 101  # spans reversed (breaks offset order when >1 span)
MUT_KIND = 103  # first span's kind swapped text<->image
MUT_TEXT = 107  # first span's text altered (text spans only)
MUT_DROP_REF = 109  # first span's media_ref nulled (media spans only)
MUT_DUP = 113  # doc duplicated (doc_id uniqueness violation)


def mutate_documents(docs: DataFrame, seed: int = 42) -> DataFrame:
    """Plant deterministic corruptions into a `make_documents` output.

    Corruption classes follow FIXTURES.md F1 `documents_interleaved_
    mutated`: reordered spans, swapped kind, altered text, dropped
    media_ref, duplicated doc_id. Selection is keyed on the numeric id
    embedded in doc_id, so expected violation sets are recomputable."""
    num = F.substring_index(F.col("doc_id"), "-", -1).cast("long")

    first = F.element_at(F.col("spans"), 1)
    mut_first = F.struct(
        F.when(num % MUT_KIND == 0, F.when(first["kind"] == "text", "image").otherwise(F.lit("text")))
        .otherwise(first["kind"])
        .alias("kind"),
        F.when((num % MUT_TEXT == 0) & first["text"].isNotNull(), F.concat(first["text"], F.lit(" CORRUPTED")))
        .otherwise(first["text"])
        .alias("text"),
        F.when((num % MUT_DROP_REF == 0) & first["media_ref"].isNotNull(), F.lit(None).cast("string"))
        .otherwise(first["media_ref"])
        .alias("media_ref"),
        first["offset"].alias("offset"),
    )
    patched = F.concat(F.array(mut_first), F.slice(F.col("spans"), 2, F.size(F.col("spans")) - 1))
    patched = F.when(F.size(F.col("spans")) > 1, patched).otherwise(F.array(mut_first))

    reordered = F.when(num % MUT_REORDER == 0, F.reverse(patched)).otherwise(patched)

    out = docs.withColumn("spans", reordered)
    dups = out.where(num % MUT_DUP == 0)
    return out.unionByName(dups)
