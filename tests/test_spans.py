"""Interleaved-document fixture + span operators (north-rule heart)."""

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.fixtures import (
    MUT_DROP_REF,
    MUT_DUP,
    MUT_KIND,
    MUT_REORDER,
    MUT_TEXT,
    make_documents,
    mutate_documents,
)
from pandera_forge_spark.spans import (
    profile_spans,
    span_invariant_violations,
    span_order_violations,
    span_sequence_mismatches,
)
from pandera_forge_spark.validator import duplicate_keys

N = 600


@pytest.fixture(scope="module")
def docs(spark):
    return make_documents(spark, N, seed=42).cache()


@pytest.fixture(scope="module")
def mutated(docs):
    return mutate_documents(docs).cache()


def test_fixture_shape_and_determinism(spark, docs):
    assert docs.count() == N
    f = {x.name: x.dataType.simpleString() for x in docs.schema.fields}
    assert f["doc_id"] == "string"
    assert f["spans"].startswith("array<struct<kind:string,text:string,media_ref:string,offset:int")
    # unique doc_ids
    assert docs.select("doc_id").distinct().count() == N
    # deterministic regardless of parallelism
    again = make_documents(spark, N, seed=42).repartition(13)
    assert span_sequence_mismatches(again, docs).count() == 0
    # different seed -> different data
    other = make_documents(spark, N, seed=7)
    assert span_sequence_mismatches(other, docs).count() > 0


def test_fixture_invariants_hold(docs):
    assert span_order_violations(docs).count() == 0
    assert span_invariant_violations(docs).count() == 0
    p = profile_spans(docs)
    assert p["docs"] == N
    assert p["min_spans"] >= 1 and p["max_spans"] <= 24
    assert set(p["by_kind"]) <= {"text", "image", "audio", "video"}
    # ~90% text spans
    text_n = p["by_kind"]["text"]["n"]
    assert 0.8 < text_n / p["total_spans"] <= 0.97
    assert p["by_kind"]["text"]["media_refs"] == 0


def _ids(df, col="doc_id"):
    return sorted(r[col] for r in df.select(col).distinct().collect())


def test_order_violations_exact(spark, docs, mutated):
    # expected: docs with id % MUT_REORDER == 0 AND >1 span AND whose
    # reversal actually breaks order (always, since offsets strictly increase)
    num = F.substring_index(F.col("doc_id"), "-", -1).cast("long")
    expect = _ids(docs.where((num % MUT_REORDER == 0) & (F.size("spans") > 1)))
    got = _ids(span_order_violations(mutated))
    assert got == expect and len(expect) > 0


def test_invariant_violations_exact(docs, mutated):
    # kind swap makes text/media_ref inconsistent with the new kind;
    # dropped media_ref breaks consistency for media first-spans
    num = F.substring_index(F.col("doc_id"), "-", -1).cast("long")
    first = F.element_at(F.col("spans"), 1)
    kind_swapped = docs.where(num % MUT_KIND == 0)
    ref_dropped = docs.where((num % MUT_DROP_REF == 0) & (first["media_ref"].isNotNull()))
    expect = sorted(set(_ids(kind_swapped)) | set(_ids(ref_dropped)))
    got = _ids(span_invariant_violations(mutated))
    assert got == expect and len(expect) > 0


def test_sequence_equality_exact(docs, mutated):
    num = F.substring_index(F.col("doc_id"), "-", -1).cast("long")
    first = F.element_at(F.col("spans"), 1)
    reordered = docs.where((num % MUT_REORDER == 0) & (F.size("spans") > 1))
    kind_swapped = docs.where(num % MUT_KIND == 0)
    text_altered = docs.where((num % MUT_TEXT == 0) & first["text"].isNotNull())
    ref_dropped = docs.where((num % MUT_DROP_REF == 0) & first["media_ref"].isNotNull())
    expect = sorted(
        set(_ids(reordered)) | set(_ids(kind_swapped)) | set(_ids(text_altered)) | set(_ids(ref_dropped))
    )
    mm = span_sequence_mismatches(mutated.dropDuplicates(["doc_id"]), docs)
    got = _ids(mm)
    assert got == expect and len(expect) > 0
    kinds = {r["mismatch"] for r in mm.collect()}
    assert kinds == {"sequence"}


def test_sequence_missing_and_extra(spark, docs):
    some = docs.limit(10)
    dropped = docs.join(some.select("doc_id"), "doc_id", "left_anti")
    mm = span_sequence_mismatches(dropped, docs)
    assert mm.count() == 10
    assert {r["mismatch"] for r in mm.collect()} == {"missing"}
    mm2 = span_sequence_mismatches(docs, dropped)
    assert {r["mismatch"] for r in mm2.collect()} == {"extra"}


def test_duplicate_doc_ids_found(docs, mutated):
    num = F.substring_index(F.col("doc_id"), "-", -1).cast("long")
    expect = _ids(docs.where(num % MUT_DUP == 0))
    got = _ids(duplicate_keys(mutated, ["doc_id"]))
    assert got == expect and len(expect) > 0


def test_no_shuffle_in_row_local_checks(docs):
    plan = span_order_violations(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- span refs

def test_span_ref_violations_finds_dangling_refs(spark):
    from pandera_forge_spark.spans import span_ref_violations

    docs = make_documents(spark, n_docs=200, seed=7)
    # catalog = every ref actually used, minus refs of docs 0 mod 3
    all_refs = docs.select(
        F.explode(
            F.filter(F.col("spans"), lambda s: s["media_ref"].isNotNull()).getField(
                "media_ref"
            )
        ).alias("media_ref"),
        "doc_id",
    )
    catalog = all_refs.where(~(F.substring("doc_id", -12, 12).cast("long") % 3 == 0)).select(
        "media_ref"
    )
    out = span_ref_violations(docs, catalog)
    expected = {
        (r["doc_id"], r["media_ref"])
        for r in all_refs.where(F.substring("doc_id", -12, 12).cast("long") % 3 == 0).collect()
    }
    got = {(r["doc_id"], r["media_ref"]) for r in out.collect()}
    assert got == expected and len(got) > 0


def test_span_ref_violations_empty_when_catalog_complete(spark):
    from pandera_forge_spark.spans import span_ref_violations

    docs = make_documents(spark, n_docs=60, seed=7)
    catalog = docs.select(
        F.explode(
            F.filter(F.col("spans"), lambda s: s["media_ref"].isNotNull()).getField(
                "media_ref"
            )
        ).alias("media_ref")
    )
    assert span_ref_violations(docs, catalog, broadcast_catalog=True).count() == 0


def test_span_ref_violations_text_spans_never_explode(spark):
    from pandera_forge_spark.spans import span_ref_violations

    docs = make_documents(spark, n_docs=30, seed=7)
    catalog = docs.sparkSession.createDataFrame([("media://x",)], "media_ref string")
    plan = (
        span_ref_violations(docs, catalog, broadcast_catalog=True)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the explode input is the pre-filtered media_ref array, so the
    # optimized plan filters inside the array before generating rows
    assert "filter(" in plan and "Generate explode" in plan


def test_span_transition_matrix_sorts_by_offset(spark):
    from pandera_forge_spark.spans import span_transition_matrix

    def s(kind, off, ref=None):
        return (kind, "t" if kind == "text" else None, ref, off)

    rows = [
        # stored OUT of offset order: sorted -> text, image, text
        (1, [s("image", 100, "m1"), s("text", 200), s("text", 0)]),
        (2, [s("text", 0), s("text", 50)]),
        (3, [s("text", 0)]),        # single span: no transitions
        (4, []),                    # empty: no transitions
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        (r["kind_from"], r["kind_to"]): (r["n"], r["n_docs"])
        for r in span_transition_matrix(df).collect()
    }
    assert got == {
        ("text", "image"): (1, 1),
        ("image", "text"): (1, 1),
        ("text", "text"): (1, 1),
    }


def test_chunk_interleaved_span_preserving(spark):
    from pandera_forge_spark.spans import chunk_interleaved

    def s(kind, off, text=None, ref=None):
        return (kind, text, ref, off)

    rows = [
        # doc 1: text(4) image text(4) text(4) with capacity 8:
        # prefix costs 0,4,4,8 -> chunks [0,0,0], [1]
        (1, [s("text", 0, "aaaa"), s("image", 10, None, "m1"),
             s("text", 20, "bbbb"), s("text", 30, "cccc")]),
        # doc 2: one text span LONGER than capacity -> kept whole
        (2, [s("text", 0, "x" * 20), s("text", 10, "yy")]),
        # doc 3: stored out of order; sort must restore offsets
        (3, [s("text", 100, "22"), s("text", 0, "11"), s("image", 50, None, "m3")]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_interleaved(df, capacity=8).collect()
    }
    c10, c11 = got[(1, 0)], got[(1, 1)]
    assert c10["chunk_text"] == "aaaabbbb" and c10["media_refs"] == ["m1"]
    assert c10["n_spans"] == 3
    assert c11["chunk_text"] == "cccc" and c11["media_refs"] == []
    # long span owns chunk 0 whole; the next span starts the NEXT chunk
    assert got[(2, 0)]["chunk_text"] == "x" * 20
    assert got[(2, 1)]["chunk_text"] == "yy"
    assert (2, 2) not in got  # greedy: no empty chunk gap
    # hard capacity invariant: every chunk is <= capacity unless it
    # holds a single oversize span
    for r in got.values():
        assert r["text_len"] <= 8 or r["n_spans"] == 1
    # out-of-order storage: offsets 0,50,100 -> text "11" then "22",
    # image ref rides chunk 0 (cost 0)
    c3 = got[(3, 0)]
    assert c3["chunk_text"] == "1122" and c3["media_refs"] == ["m3"]
    # no text lost anywhere
    for doc_id, text_total in ((1, 12), (2, 22), (3, 4)):
        assert sum(
            r["text_len"] for (d, _), r in got.items() if d == doc_id
        ) == text_total
