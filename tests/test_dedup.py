import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    hamming64,
    hashed_shingles,
    jaccard,
    lsh_candidate_pairs,
    near_duplicates_minhash,
    near_duplicates_simhash,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
OTHER = "completely unrelated text about spark distributed query engines and parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, NEAR),  # near dup of 1
        (4, OTHER),
        (5, "short text"),
        (6, BASE.upper() + "!!"),  # exact dup of 1 after normalization
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_duplicates(corpus):
    groups = exact_duplicate_groups(corpus, "text", "id").collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2, 6]

    kept = sorted(r["id"] for r in dedup_exact(corpus, "text", "id").collect())
    assert kept == [1, 3, 4, 5]


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame([(BASE, NEAR)], "a string, b string")
    row = df.select(
        F.size(shingles(F.col("a"))).alias("n"),
        jaccard(hashed_shingles(F.col("a")), hashed_shingles(F.col("b"))).alias("j"),
        jaccard(hashed_shingles(F.col("a")), hashed_shingles(F.col("a"))).alias("self"),
    ).collect()[0]
    assert row["n"] == len(BASE.split()) - 2
    assert row["self"] == 1.0
    assert 0.5 < row["j"] < 1.0

    # short text fallback: fewer tokens than n -> single shingle
    short = spark.createDataFrame([("one two",)], "a string")
    assert short.select(F.size(shingles(F.col("a"))).alias("n")).collect()[0]["n"] == 1


def test_minhash_lsh_finds_near_dups(corpus):
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(corpus, "text", "id").collect()}
    assert (1, 2) in cands and (1, 3) in cands and (2, 3) in cands
    assert (1, 4) not in cands

    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in near_duplicates_minhash(corpus, "text", "id", threshold=0.5).collect()
    }
    assert verified[(1, 2)] == 1.0
    assert 0.5 <= verified[(1, 3)] < 1.0
    assert all(a != 4 and b != 4 for a, b in verified)


def test_simhash(spark, corpus):
    df = spark.createDataFrame([(BASE, NEAR, OTHER)], "a string, b string, c string")
    row = df.select(
        hamming64(simhash64(F.col("a")), simhash64(F.col("b"))).alias("near"),
        hamming64(simhash64(F.col("a")), simhash64(F.col("c"))).alias("far"),
        hamming64(simhash64(F.col("a")), simhash64(F.col("a"))).alias("self"),
    ).collect()[0]
    assert row["self"] == 0
    assert row["near"] < row["far"]

    pairs = {(r["id_a"], r["id_b"]) for r in near_duplicates_simhash(corpus, "text", "id", max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs


def test_ngram_jaccard_pairs(corpus):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, "text", "id", threshold=0.4).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got
    assert all(b != 4 for _, b in got if _ != 4)


def test_ngram_guard(spark):
    big = spark.range(20001).select(F.col("id"), F.lit("x y z").alias("text"))
    with pytest.raises(ValueError, match="O\\(n²\\)|max_rows"):
        ngram_jaccard_pairs(big, "text", "id")


def test_minhash_viral_bucket_capped(spark):
    """A 300-copy viral cluster must not expand O(size²) pairs: past
    max_bucket a bucket emits the O(size) star around its min id, every
    member stays connected to the cluster representative, and honest
    near-dup pairs elsewhere are unaffected."""
    rows = [(i, BASE) for i in range(300)]
    rows += [(1000, NEAR), (1001, NEAR + " extra")]
    rows += [(2000 + i, f"{OTHER} variant {i}") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, text string")

    capped = lsh_candidate_pairs(df, "text", "id", max_bucket=50).count()
    # exhaustive expansion of the viral bucket alone is C(300,2)=44850
    assert capped < 2000

    got = {
        (r["id_a"], r["id_b"])
        for r in near_duplicates_minhash(
            df, "text", "id", threshold=0.5, max_bucket=50
        ).collect()
    }
    # unchanged recall: every viral member pairs with the hub...
    assert {(0, i) for i in range(1, 300)} <= got
    # ...and the small planted near-dup pair is still found
    assert (1000, 1001) in got


def test_pairs_to_clusters_transitive(spark):
    """A~B, B~C, C~D chained pairs (A~C etc never emitted) must form
    ONE cluster labeled by the min id; disjoint pairs stay separate."""
    from pandera_forge_spark.operators.dedup import pairs_to_clusters

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (100, 200), (7, 8)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster_id"] for r in pairs_to_clusters(pairs).collect()
    }
    assert got == {
        10: 10, 20: 10, 30: 10, 40: 10,
        100: 100, 200: 100,
        7: 7, 8: 7,
    }


def test_pairs_to_clusters_star_and_bridge(spark):
    """Two capped viral stars joined by one bridge pair collapse into
    one component — exactly the case pair-level dedup misses."""
    from pandera_forge_spark.operators.dedup import pairs_to_clusters

    star1 = [(0, i) for i in range(1, 50)]
    star2 = [(1000, 1000 + i) for i in range(1, 50)]
    bridge = [(49, 1000)]
    pairs = spark.createDataFrame(star1 + star2 + bridge, "id_a long, id_b long")
    rows = pairs_to_clusters(pairs).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 100


def test_exact_duplicate_pairs_and_clusters(corpus):
    from pandera_forge_spark.operators.dedup import (
        exact_duplicate_pairs,
        pairs_to_clusters,
    )

    pairs = {(r["id_a"], r["id_b"]) for r in exact_duplicate_pairs(corpus, "text", "id").collect()}
    assert pairs == {(1, 2), (1, 6)}
    got = {r["id"]: r["cluster_id"] for r in pairs_to_clusters(
        exact_duplicate_pairs(corpus, "text", "id")).collect()}
    assert got == {1: 1, 2: 1, 6: 1}


def test_pairs_to_clusters_string_ids(spark):
    """doc_id is a STRING in the north-rule table — min-label
    propagation must order/least over strings identically."""
    from pandera_forge_spark.operators.dedup import pairs_to_clusters

    pairs = spark.createDataFrame(
        [("docB", "docC"), ("docA", "docB")], "id_a string, id_b string"
    )
    got = {r["id"]: r["cluster_id"] for r in pairs_to_clusters(pairs).collect()}
    assert got == {"docA": "docA", "docB": "docA", "docC": "docA"}


def test_simhash_viral_bucket_capped(spark):
    """300 identical docs agree on ALL four SimHash bands — uncapped
    that is ~4·C(300,2) join rows. With max_bucket the hot buckets emit
    the O(size) star around the min-id hub, membership is preserved,
    and small honest buckets are untouched."""
    rows = [(i, BASE) for i in range(300)]
    rows += [(1000, OTHER), (1001, OTHER)]  # small honest dup pair
    rows += [(2000 + i, f"noise doc {i} about {i*7} unrelated things") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, text string")

    got = {
        (r["id_a"], r["id_b"])
        for r in near_duplicates_simhash(df, "text", "id", max_bucket=50).collect()
    }
    # every viral member stays connected to the hub...
    assert {(0, i) for i in range(1, 300)} <= got
    # ...the small pair survives the cap untouched...
    assert (1000, 1001) in got
    # ...and the fan-out is linear, not C(300,2)=44850 quadratic
    assert len(got) < 400

    uncapped = near_duplicates_simhash(df, "text", "id", max_bucket=None).count()
    assert uncapped >= 44850  # the blowup the cap exists to prevent


def test_exact_pairs_linear_no_array_buffer(spark):
    """A 10^5-copy exact-dup group: pairs stream out as a hash join
    (O(group) OUTPUT rows, constant-size aggregation buffer) — the
    scale path never materializes a 10^5-element id array."""
    from pandera_forge_spark.operators.dedup import exact_duplicate_pairs

    big = spark.range(100_000).select(
        F.col("id"), F.lit(BASE).alias("text")
    )
    extra = spark.createDataFrame(
        [(200_000, OTHER), (200_001, "a unique doc")], "id long, text string"
    )
    df = big.unionByName(extra)

    pairs = exact_duplicate_pairs(df, "text", "id")
    assert pairs.count() == 99_999
    # star shape: every pair hangs off the min-id hub
    assert pairs.where(F.col("id_a") != 0).count() == 0
    # no collect_list anywhere in the executed plan
    from pandera_forge_spark.plans.inspect import executed_plan

    assert "collect_list" not in executed_plan(pairs)


def test_exact_duplicate_groups_max_ids_slices_output(corpus):
    g = exact_duplicate_groups(corpus, "text", "id", max_ids=2).collect()
    assert len(g) == 1
    assert g[0]["n_docs"] == 3          # true population still reported
    assert g[0]["doc_ids"] == [1, 2]    # display array sliced


def test_pairs_to_clusters_reliable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir mode (reliable checkpoint, warehouse scale) must
    produce exactly the labels localCheckpoint mode does."""
    from pandera_forge_spark.operators.dedup import pairs_to_clusters

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (100, 200), (7, 8), (40, 41)],
        "id_a long, id_b long",
    )
    local = {r["id"]: r["cluster_id"] for r in pairs_to_clusters(pairs).collect()}
    reliable = {
        r["id"]: r["cluster_id"]
        for r in pairs_to_clusters(
            pairs, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert local == reliable
    assert reliable[41] == 10
    # the reliable mode actually wrote checkpoint data
    import os

    assert any(os.scandir(str(tmp_path / "ckpt")))


def test_dedup_near_composite(spark):
    """The one-call pipeline: pairs -> clusters -> min-id survivor.
    A~B, B~C chained near-dups (A~C possibly never paired) keep ONLY
    the min id; unrelated docs pass through; mapping covers every
    cluster member including the survivor."""
    from pandera_forge_spark.operators.dedup import dedup_near

    rows = [
        (1, BASE),
        (2, BASE + " x"),          # near dup of 1
        (3, BASE + " x y"),        # near dup of 2 (chain)
        (10, OTHER),
        (11, "entirely different content with many extra words to shingle on"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    survivors, mapping = dedup_near(df, "text", "id", threshold=0.5)
    assert sorted(r["id"] for r in survivors.collect()) == [1, 10, 11]
    got = {r["id"]: r["cluster_id"] for r in mapping.collect()}
    assert got == {1: 1, 2: 1, 3: 1}

    # simhash flavor: exact copies collapse the same way
    sv2, _ = dedup_near(
        spark.createDataFrame(
            [(1, BASE), (2, BASE), (7, OTHER)], "id long, text string"
        ),
        "text", "id", method="simhash",
    )
    assert sorted(r["id"] for r in sv2.collect()) == [1, 7]

    # threshold is Jaccard-only: passing it with simhash raises rather
    # than being silently ignored (round-3 advisor finding)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="simhash"):
        dedup_near(df, "text", "id", threshold=0.95, method="simhash")


def test_incremental_near_dup(spark):
    """New docs match the standing corpus through the band-index probe:
    planted copies are found with jaccard 1.0 / >= threshold, unrelated
    new docs match nothing, and new-vs-new pairs are NOT emitted (the
    operator only joins across the two frames)."""
    from pandera_forge_spark.operators.dedup import near_duplicates_incremental

    corpus = spark.createDataFrame(
        [(1, BASE), (2, OTHER), (3, "short text")], "id long, text string"
    )
    new = spark.createDataFrame(
        [
            (100, BASE),                  # exact copy of corpus 1
            (101, NEAR),                  # near copy of corpus 1
            (102, "fresh unseen content about entirely new topics"),
            (103, BASE),                  # also a copy — but 100~103 must NOT pair
        ],
        "id long, text string",
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in near_duplicates_incremental(
            corpus, new, "text", "id", threshold=0.5
        ).collect()
    }
    assert got[(100, 1)] == 1.0
    assert got[(103, 1)] == 1.0
    assert (101, 1) in got and got[(101, 1)] >= 0.5
    assert all(n != 102 for n, _ in got)
    assert all(c in (1, 2, 3) for _, c in got)  # never new-vs-new


def test_incremental_viral_corpus_capped(spark):
    """A new doc probing a viral corpus bucket (300 identical corpus
    docs) meets only the min-id hub representative, not all 300 —
    join fan-out stays linear in the new side."""
    from pandera_forge_spark.operators.dedup import near_duplicates_incremental

    corpus_rows = [(i, BASE) for i in range(300)] + [(1000, OTHER)]
    corpus = spark.createDataFrame(corpus_rows, "id long, text string")
    new = spark.createDataFrame([(5000, BASE)], "id long, text string")
    got = {
        (r["new_id"], r["corpus_id"])
        for r in near_duplicates_incremental(
            corpus, new, "text", "id", threshold=0.9, max_bucket=50
        ).collect()
    }
    assert got == {(5000, 0)}
    # uncapped finds all 300 (test scale only)
    un = near_duplicates_incremental(
        corpus, new, "text", "id", threshold=0.9, max_bucket=None
    ).count()
    assert un == 300


def test_cross_group_duplicates(spark):
    """Shared fingerprints are counted per group PAIR; normalization
    (case/punctuation) applies; within-group dups don't inflate."""
    from pandera_forge_spark.operators.dedup import cross_group_duplicates

    df = spark.createDataFrame(
        [
            (1, "Hello World", "a"),
            (2, "hello, world!", "b"),   # same fp as 1 after normalization
            (3, "hello world", "c"),     # same fp again
            (4, "unique to a", "a"),
            (5, "Hello World", "a"),     # duplicate within a: no self-pair
        ],
        "id long, text string, src string",
    )
    got = {
        (r["group_a"], r["group_b"]): r["n_shared"]
        for r in cross_group_duplicates(df, "text", "src").collect()
    }
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_band_index_probe_matches_incremental(spark, tmp_path):
    """write_band_index + probe_band_index must reproduce EXACTLY the
    (new_id, corpus_id, jaccard) set the raw-frame incremental path
    computes — the stored artifact changes cost, never semantics.
    Probes also must band with the sidecar's parameters, not the
    caller's."""
    from pandera_forge_spark.operators.dedup import (
        near_duplicates_incremental,
        probe_band_index,
        write_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    new = (
        docs.where(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 500000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )

    want = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in near_duplicates_incremental(
            docs, new, "text", "doc_id", threshold=0.6
        ).collect()
    }

    idx = str(tmp_path / "bandidx")
    write_band_index(docs, idx, "text", "doc_id")
    got = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in probe_band_index(
            spark, idx, new, "text", "doc_id", threshold=0.6
        ).collect()
    }
    assert got == want and len(got) > 0

    # every planted (corpus doc -> mutated copy) pair surfaces
    planted = {r["doc_id"] for r in docs.where(F.col("doc_id") % 10 == 0).collect()}
    assert {c for (n, c, _j) in got if n - c == 500000} == planted


def test_dedup_near_winnow_method(spark):
    """dedup_near(method='winnow') plugs the character-level
    fingerprint pairs into the same clusters->survivors flow: a
    word-boundary-edited copy (token shingles fragment, winnow
    fingerprints don't) is dropped; distinct docs survive."""
    import hashlib

    from pandera_forge_spark.operators.dedup import dedup_near

    def body(i):
        return " ".join(
            hashlib.md5(f"w-{i}-{j}".encode()).hexdigest()[:10] for j in range(12)
        )

    base = [(i, body(i)) for i in range(6)]
    # copy of doc 0 with word boundaries MOVED (same chars, different
    # token shingles): insert spaces mid-word
    moved = base[0][1].replace(" ", "", 3).replace("a", "a ", 2)
    df = spark.createDataFrame(
        base + [(100, moved)], "doc_id long, text string"
    )
    survivors, mapping = dedup_near(
        df, "text", "doc_id", method="winnow", threshold=0.5
    )
    kept = sorted(r["doc_id"] for r in survivors.collect())
    assert kept == [0, 1, 2, 3, 4, 5]  # min-id representative kept
    m = {r["id"]: r["cluster_id"] for r in mapping.collect()}
    assert m.get(100) == 0


def test_with_epochs_missing_markers_is_loud(spark, tmp_path):
    """review-found: with success markers disabled, every epoch dir
    looks torn and the probe silently matched nothing — now loud when a
    committed-range dir lacks its marker; a torn dir at/above the probe
    epoch (the legitimate replay case) stays silent."""
    import os

    from pandera_forge_spark.operators.dedup import _with_epochs

    root = str(tmp_path / "idx")
    base = spark.createDataFrame([(1,)], "x int")
    spark.createDataFrame([(2,)], "x int").write.parquet(
        f"{root}/bands_epochs/__epoch=0"
    )
    os.remove(f"{root}/bands_epochs/__epoch=0/_SUCCESS")
    # torn dir >= max_epoch: the replayed epoch itself — silent base
    got = _with_epochs(spark, base, root, "bands_epochs", max_epoch=0)
    assert [r["x"] for r in got.collect()] == [1]
    # torn dir BELOW the probe epoch: markers missing — loud
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        _with_epochs(spark, base, root, "bands_epochs", max_epoch=1)


def test_similarity_join_prefix_matches_allpairs(spark):
    """Completeness + precision proof: the prefix-filter scale path
    emits row-for-row the same (id_a, id_b, jaccard) set as the O(n²)
    all-pairs truth on a real-text corpus with planted near-dups."""
    from pandera_forge_spark.operators.dedup import (
        ngram_jaccard_pairs,
        similarity_join_prefix,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    planted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail")).alias("text"),
    )
    corpus = docs.unionByName(planted)
    for t in (0.5, 0.8):
        truth = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                corpus, "text", "doc_id", threshold=t
            ).collect()
        }
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in similarity_join_prefix(
                corpus, "text", "doc_id", threshold=t
            ).collect()
        }
        assert got == truth
        assert len(truth) >= 20  # the planted pairs are actually in scope


def test_similarity_join_prefix_threshold_one_is_exact_dup(spark):
    from pandera_forge_spark.operators.dedup import similarity_join_prefix

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma delta zeta"),
        ],
        "doc_id long, text string",
    )
    out = similarity_join_prefix(df, "text", "doc_id", threshold=1.0).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_similarity_join_prefix_validates_args(spark):
    from pandera_forge_spark.operators.dedup import similarity_join_prefix

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        similarity_join_prefix(df, "text", "doc_id", threshold=0.0)
    with pytest.raises(ValueError, match="missing"):
        similarity_join_prefix(df, "body", "doc_id")
