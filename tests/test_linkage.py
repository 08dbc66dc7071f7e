"""Edit-distance record linkage (operators/linkage.py).

The load-bearing property is LOSSLESSNESS of the symmetric-delete
block: fuzzy_pairs must equal the brute-force all-pairs Levenshtein
filter exactly, at d=1 and d=2, on a corpus with planted typo
clusters, identical keys, unicode, empties, and nulls.
"""

import random

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.linkage import (
    delete_variants,
    fuzzy_join,
    fuzzy_pairs,
)
from pandera_forge_spark.plans.inspect import has_python_udf


def _mutate(rng: random.Random, s: str) -> str:
    """One random edit: substitute, insert, or delete."""
    alphabet = "abcdefg"
    op = rng.choice(["sub", "ins", "del"] if s else ["ins"])
    i = rng.randrange(len(s) + (op == "ins"))
    if op == "sub":
        return s[:i] + rng.choice(alphabet) + s[i + 1 :]
    if op == "ins":
        return s[:i] + rng.choice(alphabet) + s[i:]
    return s[:i] + s[i + 1 :]


def _corpus(n: int, seed: int = 7):
    """Seeded corpus of base words plus 0-2-edit mutants — dense in
    true pairs at every distance, plus exact duplicates."""
    rng = random.Random(seed)
    alphabet = "abcdefg"
    rows = []
    for i in range(n):
        base = "".join(rng.choice(alphabet) for _ in range(rng.randrange(3, 9)))
        rows.append((i * 10, base))
        m = base
        for k in range(rng.randrange(0, 3)):
            m = _mutate(rng, m)
            rows.append((i * 10 + k + 1, m))
        if rng.random() < 0.3:
            rows.append((i * 10 + 9, base))  # exact duplicate
    return rows


def _brute(df, d):
    a = df.where(F.col("k").isNotNull()).select(
        F.col("id").alias("id_a"), F.col("k").alias("ka")
    )
    b = df.where(F.col("k").isNotNull()).select(
        F.col("id").alias("id_b"), F.col("k").alias("kb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("ka", "kb"))
        .where(F.col("distance") <= d)
    )


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_pairs_equals_brute_force(spark, d):
    rows = _corpus(40)
    df = spark.createDataFrame(rows, "id bigint, k string")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_pairs(df, "k", "id", max_distance=d).collect()
    }
    want = {(r.id_a, r.id_b, r.distance) for r in _brute(df, d).collect()}
    assert got == want and want  # non-vacuous: the corpus plants pairs


def test_edge_keys_null_empty_unicode(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a"), (4, "é"), (5, "éx"), (6, "")],
        "id bigint, k string",
    )
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_pairs(df, "k", "id", max_distance=1).collect()
    }
    # null matches nothing; ""~"" d0, ""~"a" d1, ""~"é" d1, "é"~"éx" d1,
    # "a"~"é" d1 (substitution), "éx"~"" is d2 — out
    assert got == {
        (2, 6, 0),
        (2, 3, 1),
        (2, 4, 1),
        (3, 4, 1),
        (4, 5, 1),
        (3, 6, 1),
        (4, 6, 1),
    }


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex"), (3, "initech")],
        "id bigint, name string",
    )
    right = spark.createDataFrame(
        [(100, "acme c0rp"), (101, "globexx"), (102, "umbrella")],
        "rid bigint, rname string",
    )
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_join(
            left,
            right,
            "name",
            "id",
            right_key_col="rname",
            right_id_col="rid",
            max_distance=1,
        ).collect()
    }
    assert got == {(1, 100, 1), (2, 101, 1)}


def test_delete_variants_counts(spark):
    df = spark.createDataFrame([("abcd",)], "k string")
    [r0] = df.select(delete_variants(F.col("k"), 0).alias("v")).collect()
    [r1] = df.select(delete_variants(F.col("k"), 1).alias("v")).collect()
    [r2] = df.select(delete_variants(F.col("k"), 2).alias("v")).collect()
    assert r0.v == ["abcd"]
    assert sorted(r1.v) == sorted(["abcd", "bcd", "acd", "abd", "abc"])
    # d=2: original + 4 singles + C(4,2)=6 distinct doubles
    assert len(r2.v) == 11 and "ab" in r2.v and "cd" in r2.v


def test_max_key_length_fence_is_loud(spark):
    df = spark.createDataFrame([(1, "x" * 100), (2, "ok")], "id bigint, k string")
    # the fence is in-band (raise_error in the key projection, zero
    # extra jobs) so it fires at action time, not construction time
    with pytest.raises(Exception, match="max_key_length"):
        fuzzy_pairs(df, "k", "id", max_distance=1, max_key_length=64).count()
    # opting out deliberately works
    assert (
        fuzzy_pairs(df, "k", "id", max_distance=1, max_key_length=None).count()
        == 0
    )
    # no offenders: construction AND action succeed without a probe job
    ok = spark.createDataFrame([(1, "abc"), (2, "abd")], "id bigint, k string")
    assert fuzzy_pairs(ok, "k", "id", max_distance=1, max_key_length=64).count() == 1


def test_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id bigint, k string")
    assert not has_python_udf(fuzzy_pairs(df, "k", "id", max_distance=1))


# --- best_match_pairs -----------------------------------------------------

from pandera_forge_spark.operators.linkage import best_match_pairs


@pytest.fixture(scope="module")
def scored_pairs(spark):
    # l1's best is r1 (0.9) and r1's best is l1 -> mutual.
    # l2's best is r1 (0.8) but r1 prefers l1 -> not mutual.
    # l3's best is r3 (0.7) and r3's best is l3 -> mutual.
    # tie case: l4 scores 0.5 on both r4 and r5 -> smallest id (r4)
    # wins; r4's best is l4 -> mutual.
    rows = [
        ("l1", "r1", 0.9), ("l1", "r3", 0.2),
        ("l2", "r1", 0.8), ("l2", "r3", 0.1),
        ("l3", "r3", 0.7), ("l3", "r1", 0.3),
        ("l4", "r4", 0.5), ("l4", "r5", 0.5),
        ("l5", "r4", 0.4),
        (None, "r9", 1.0), ("l9", None, 1.0), ("l9", "r9", None),
    ]
    return spark.createDataFrame(rows, "left string, right string, score double")


def test_mutual_best_matches(scored_pairs):
    got = {
        (r["left"], r["right"]): r["score"]
        for r in best_match_pairs(scored_pairs, "left", "right", "score").collect()
    }
    assert got == {("l1", "r1"): 0.9, ("l3", "r3"): 0.7, ("l4", "r4"): 0.5}


def test_non_mutual_top1(scored_pairs):
    got = {
        r["left"]: (r["right"], r["score"])
        for r in best_match_pairs(
            scored_pairs, "left", "right", "score", mutual=False
        ).collect()
    }
    # every non-null left appears once with its best right
    assert got == {
        "l1": ("r1", 0.9),
        "l2": ("r1", 0.8),
        "l3": ("r3", 0.7),
        "l4": ("r4", 0.5),  # tie broken to smallest right id
        "l5": ("r4", 0.4),
    }


def test_best_match_missing_column(scored_pairs):
    with pytest.raises(ValueError, match="missing"):
        best_match_pairs(scored_pairs, "left", "right", "nope")


# ----------------------------------------------------------- value_variants


from pandera_forge_spark.operators.linkage import value_variants


@pytest.fixture(scope="module")
def messy(spark):
    # 'building' dominant with two distance-1 variants that are
    # distance 2 from EACH OTHER (must still share a canonical via the
    # component), 'auto' clean-only, plus a hapax typo and NULLs.
    rows = (
        [("building",)] * 20
        + [("buildin",)] * 3      # truncation (d1 from building)
        + [("buildings",)] * 2    # suffix typo (d1 from building, d2 from buildin)
        + [("auto",)] * 10
        + [("autoo",)] * 1        # hapax — pruned at min_count=2
        + [(None,)] * 2
    )
    return spark.createDataFrame(rows, "seg string")


def test_value_variants_mapping(messy):
    out = {
        r["value"]: r.asDict()
        for r in value_variants(messy, "seg", min_count=2).collect()
    }
    # the star cluster: both variants map to the dominant form, and the
    # canonical row itself is in the mapping (joinable repair table)
    assert set(out) == {"building", "buildin", "buildings"}
    for v in ("building", "buildin", "buildings"):
        r = out[v]
        assert r["canonical"] == "building"
        assert r["canonical_rows"] == 20
        assert r["cluster_size"] == 3
        assert r["cluster_rows"] == 25
    assert out["buildin"]["n_rows"] == 3
    # 'auto' has no surviving neighbor (hapax pruned): not a finding
    assert "auto" not in out


def test_value_variants_hapax_included_at_min_count_1(messy):
    out = {
        r["value"]: r.asDict()
        for r in value_variants(messy, "seg", min_count=1).collect()
    }
    assert out["autoo"]["canonical"] == "auto"
    assert out["auto"]["cluster_size"] == 2 and out["auto"]["cluster_rows"] == 11


def test_value_variants_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame(
        [("abc",)] * 5 + [("abd",)] * 5, "v string"
    )
    out = {r["value"]: r for r in value_variants(df, "v").collect()}
    assert out["abc"]["canonical"] == "abc" == out["abd"]["canonical"]


def test_value_variants_eager_lazy_agree(messy):
    key = lambda rows: sorted(tuple(r) for r in rows)
    e = value_variants(messy, "seg", min_count=2).collect()
    l = value_variants(messy, "seg", min_count=2, eager=False).collect()
    assert key(e) == key(l)


def test_value_variants_fences_and_no_udf(messy):
    from pandera_forge_spark.plans.inspect import has_python_udf

    with pytest.raises(ValueError, match="missing"):
        value_variants(messy, "nope")
    with pytest.raises(ValueError, match="min_count"):
        value_variants(messy, "seg", min_count=0)
    assert not has_python_udf(value_variants(messy, "seg", eager=False))


def test_value_variants_partition_independent(messy):
    key = lambda rows: sorted(tuple(r) for r in rows)
    a = value_variants(messy.repartition(1), "seg").collect()
    b = value_variants(messy.repartition(6), "seg").collect()
    assert key(a) == key(b)


# --------------------------------------------------------- blocking_quality


def test_blocking_quality_self_dedup_counts(spark):
    from pandera_forge_spark.operators.linkage import blocking_quality

    # 10 records; truth = 4 pairs; blocker found 6 candidates of
    # which 3 are true (one truth pair stored reversed + duplicated)
    cand = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8), (2, 9), (1, 10)],
        "id_a long, id_b long",
    )
    truth = spark.createDataFrame(
        [(2, 1), (1, 2), (4, 3), (6, 5), (9, 10)], "id_a long, id_b long"
    )
    r = blocking_quality(cand, truth, n_records=10).first()
    assert r["n_candidates"] == 6
    assert r["n_truth"] == 4  # reversed duplicate collapsed
    assert r["n_found"] == 3  # (1,2),(3,4),(5,6); (9,10) missed
    assert r["n_possible"] == 45
    assert r["pairs_completeness"] == 3 / 4
    assert r["reduction_ratio"] == 1.0 - 6 / 45.0


def test_blocking_quality_two_table_and_hygiene(spark):
    from pandera_forge_spark.operators.linkage import blocking_quality

    # self-pairs and NULL sides are dropped before counting
    cand = spark.createDataFrame(
        [(1, 1), (None, 2), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame([(2, 1)], "id_a long, id_b long")
    r = blocking_quality(cand, truth, n_left=4, n_right=5).first()
    assert r["n_candidates"] == 2 and r["n_found"] == 1
    assert r["n_possible"] == 20
    assert r["reduction_ratio"] == 1.0 - 2 / 20.0


def test_blocking_quality_end_to_end_with_fuzzy_pairs(spark):
    from pandera_forge_spark.operators.linkage import (
        blocking_quality,
        fuzzy_pairs,
    )

    names = [
        (1, "acme corp"), (2, "acme korp"),      # lev 1 — true dup
        (3, "globex"), (4, "globex"),            # lev 0 — true dup
        (5, "initech"), (6, "initrode"),         # lev 3 — NOT a dup at d=1
        (7, "umbrella"), (8, "wayne ent"),
    ]
    df = spark.createDataFrame(names, "rid long, name string")
    cand = fuzzy_pairs(df, "name", "rid", max_distance=1).select(
        F.col("id_a"), F.col("id_b")
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    r = blocking_quality(cand, truth, n_records=8).first()
    # symmetric-delete blocking at d=1 is LOSSLESS for lev<=1 pairs
    assert r["pairs_completeness"] == 1.0
    assert r["n_possible"] == 28
    assert r["reduction_ratio"] > 0.8


def test_blocking_quality_contracts(spark):
    from pandera_forge_spark.operators.linkage import blocking_quality

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="exactly one"):
        blocking_quality(pairs, pairs)
    with pytest.raises(ValueError, match="exactly one"):
        blocking_quality(pairs, pairs, n_records=5, n_left=2, n_right=2)
    with pytest.raises(ValueError, match="n_records"):
        blocking_quality(pairs, pairs, n_records=1)
    with pytest.raises(ValueError, match="BOTH"):
        blocking_quality(pairs, pairs, n_left=3)
    with pytest.raises(ValueError, match="lacks"):
        blocking_quality(
            pairs.withColumnRenamed("id_a", "x"), pairs, n_records=5
        )


def test_fs_u_probabilities_hand_computed(spark):
    """seg: counts 3,2 of N=5 -> u = (3*2 + 2*1)/(5*4) = 0.4;
    flag: counts 4,1 -> (12+0)/20 = 0.6; nulls excluded (N drops)."""
    from pandera_forge_spark.operators.linkage import fs_u_probabilities

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"),
         (None, None)],
        "seg string, flag string",
    )
    r = fs_u_probabilities(df, ["seg", "flag"]).collect()[0]
    assert abs(r.u_seg - 0.4) < 1e-12
    assert abs(r.u_flag - 0.6) < 1e-12


def test_fs_score_pairs_hand_computed(spark):
    import math

    from pandera_forge_spark.operators.linkage import (
        fs_score_pairs,
        fs_u_probabilities,
    )

    base = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), ("c",)], "seg string"
    )
    u_row = fs_u_probabilities(base, ["seg"])  # u = (2+2+0)/20 = 0.2
    pairs = spark.createDataFrame(
        [(1, 2, True), (1, 3, False), (1, 4, None)],
        "id_a long, id_b long, seg boolean",
    )
    out = {(r.id_a, r.id_b): r.fs_weight for r in fs_score_pairs(
        pairs, ["seg"], {"seg": 0.9}, u_row
    ).collect()}
    agree_w = math.log2(0.9 / 0.2)
    disagree_w = math.log2(0.1 / 0.8)
    assert abs(out[(1, 2)] - agree_w) < 1e-9
    assert abs(out[(1, 3)] - disagree_w) < 1e-9
    assert abs(out[(1, 4)] - disagree_w) < 1e-9   # NULL = disagreement


def test_fs_score_pairs_fences(spark):
    import pytest

    from pandera_forge_spark.operators.linkage import (
        fs_score_pairs,
        fs_u_probabilities,
    )

    base = spark.createDataFrame([("a",), ("b",)], "seg string")
    u_row = fs_u_probabilities(base, ["seg"])
    pairs = spark.createDataFrame(
        [(1, 2, True)], "id_a long, id_b long, seg boolean"
    )
    with pytest.raises(ValueError, match="m probability"):
        fs_score_pairs(pairs, ["seg"], {}, u_row)
    with pytest.raises(ValueError, match="must be in"):
        fs_score_pairs(pairs, ["seg"], {"seg": 1.0}, u_row)
    with pytest.raises(ValueError, match="agree_cols"):
        fs_score_pairs(pairs, [], {"seg": 0.9}, u_row)
    with pytest.raises(ValueError, match="missing"):
        fs_u_probabilities(base, ["ghost"])
