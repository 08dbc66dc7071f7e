"""PageRank — exact-integer python replay, fences, checkpoint parity."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.graph import pagerank


def _replay(edges, iters, num=85, den=100, scale=10**12):
    """Bit-exact python replay of the quantized algorithm — the same
    integer ops in the same order-free form."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = Counter(u for u, _ in edges)
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    tele = ((den - num) * scale) // (den * n)
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if outdeg[v] == 0)
        contrib = defaultdict(int)
        for u, v in edges:
            contrib[v] += (num * r[u]) // (den * outdeg[u])
        r = {
            v: tele + (num * dang) // (den * n) + contrib[v] for v in nodes
        }
    return r, dict(outdeg)


EDGES = [
    # a 3-cycle feeding a hub, a dangling sink, parallel edges
    (1, 2), (2, 3), (3, 1),
    (1, 4), (2, 4), (3, 4),
    (4, 5),           # 5 is dangling (no out-edges)
    (1, 4),           # parallel edge: doubles 1's traffic to the hub
]


def _edges_df(spark, edges=EDGES):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_matches_integer_replay(spark):
    for iters in (1, 3, 7):
        got = {
            r["node"]: (r["outdeg"], r["rank"])
            for r in pagerank(_edges_df(spark), iters=iters).collect()
        }
        want_r, want_d = _replay(EDGES, iters)
        assert set(got) == set(want_r)
        for v in want_r:
            assert got[v] == (want_d.get(v, 0), want_r[v]), (iters, v)


def test_pagerank_hub_ranks_highest_and_mass_conserved(spark):
    rows = pagerank(_edges_df(spark), iters=10).collect()
    by_rank = sorted(rows, key=lambda r: -r["rank"])
    # 5 drains the hub (4 -> 5 is 4's only out-edge), so the sink and
    # the hub dominate the 3-cycle members
    assert {by_rank[0]["node"], by_rank[1]["node"]} == {4, 5}
    total = sum(r["rank"] for r in rows)
    # floors only drop mass, never add
    assert 0.98 * 10**12 < total <= 10**12


def test_pagerank_checkpoint_dir_parity(spark, tmp_path):
    a = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark), iters=4).collect()
    }
    b = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges_df(spark), iters=4, checkpoint_dir=str(tmp_path / "ck")
        ).collect()
    }
    assert a == b


def test_pagerank_null_endpoint_raises_in_band(spark):
    df = spark.createDataFrame([(1, 2), (None, 3)], "src long, dst long")
    with pytest.raises(Exception, match="NULL source endpoint"):
        pagerank(df, iters=1).collect()
    df2 = spark.createDataFrame([(1, 2), (3, None)], "src long, dst long")
    with pytest.raises(Exception, match="NULL destination endpoint"):
        pagerank(df2, iters=1).collect()


def test_pagerank_parameter_fences(spark):
    df = _edges_df(spark)
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping_num=100, damping_den=100)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping_num=0)
    with pytest.raises(ValueError, match="scale"):
        pagerank(df, scale=10)
    with pytest.raises(ValueError, match="scale"):
        pagerank(df, scale=2**62)
    with pytest.raises(ValueError, match="lacks columns"):
        pagerank(df.withColumnRenamed("src", "s"))


def test_pagerank_empty_edges_empty_result(spark):
    df = _edges_df(spark).where(F.col("src") < 0)
    out = pagerank(df, iters=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "outdeg", "rank"]


def test_pagerank_string_nodes_and_no_udf(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    out = pagerank(df, iters=2)
    rows = {r["node"]: r["rank"] for r in out.collect()}
    want, _ = _replay([("a", "b"), ("b", "a"), ("a", "c")], 2)
    assert rows == want
    from pandera_forge_spark.plans.inspect import has_python_udf

    assert not has_python_udf(out)


def test_pagerank_partition_independence(spark):
    one = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges_df(spark).repartition(1), iters=3
        ).collect()
    }
    many = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges_df(spark).repartition(7), iters=3
        ).collect()
    }
    assert one == many


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def _tri_replay(edges):
    """Exact python replay: undirected simple graph, per-node triangle
    count + lcc."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in und:
        for _c in adj[a] & adj[b]:
            tri[a] += 1
            tri[b] += 1
    # corner x of triangle {x,y,z} is credited by edges (x,y) and (x,z)
    # -> exactly twice
    tri = {v: t // 2 for v, t in tri.items()}
    out = {}
    for v in adj:
        d = len(adj[v])
        lcc = 2.0 * tri[v] / (d * (d - 1)) if d >= 2 else 0.0
        out[v] = (d, tri[v], lcc)
    return out


def test_triangle_count_k4(spark):
    from pandera_forge_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src long, dst long")
    got = {r["node"]: r for r in triangle_count(df).collect()}
    for v in range(4):
        assert got[v]["degree"] == 3
        assert got[v]["triangles"] == 3
        assert got[v]["lcc"] == 1.0


def test_triangle_count_matches_replay_messy_input(spark):
    """Directed duplicates, reversed edges, self-loops — all collapsed;
    mixed topology (triangle + tail + square + isolated-by-loop)."""
    from pandera_forge_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (2, 1), (2, 3), (3, 1), (1, 2),   # triangle 1-2-3, dups
        (3, 4),                                   # tail
        (5, 6), (6, 7), (7, 8), (8, 5),           # square, no triangle
        (9, 9),                                   # self-loop only: dropped
        (2, 4), (4, 1),                           # second triangle 1-2-4
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["lcc"])
        for r in triangle_count(df).collect()
    }
    want = _tri_replay(edges)
    assert got == want
    assert 9 not in got  # self-loop-only node has no simple edges


def test_triangle_count_fences_and_no_udf(spark):
    import pytest as _pytest

    from pandera_forge_spark.operators.graph import triangle_count
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="lacks columns"):
        triangle_count(df.withColumnRenamed("dst", "d"))
    bad = spark.createDataFrame([(1, None)], "src long, dst long")
    with _pytest.raises(Exception, match="NULL destination"):
        triangle_count(bad).collect()
    assert not has_python_udf(triangle_count(df))


def test_triangle_count_partition_independence(spark):
    from pandera_forge_spark.operators.graph import triangle_count

    edges = [(a, b) for a in range(8) for b in range(8) if a < b and (a + b) % 3]
    df = spark.createDataFrame(edges, "src long, dst long")
    one = sorted(map(tuple, triangle_count(df.repartition(1)).collect()))
    many = sorted(map(tuple, triangle_count(df.repartition(7)).collect()))
    assert one == many


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------


def _hits_replay(edges, iters, scale=10**12):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    a = {v: scale // n for v in nodes}
    h = None
    for _ in range(iters):
        hr = {v: 0 for v in nodes}
        for u, v in edges:
            hr[u] += a[v]
        q = max(sum(hr.values()) // scale, 1)
        h = {v: hr[v] // q for v in nodes}
        ar = {v: 0 for v in nodes}
        for u, v in edges:
            ar[v] += h[u]
        q = max(sum(ar.values()) // scale, 1)
        a = {v: ar[v] // q for v in nodes}
    return h, a


HITS_EDGES = [
    # hub node 0 points at authorities 1, 2, 3; 4 also points at 1, 2;
    # 3 points back at 0; a stray 5 -> 6 edge
    (0, 1), (0, 2), (0, 3),
    (4, 1), (4, 2),
    (3, 0),
    (5, 6),
    (0, 1),  # parallel edge counts twice
]


def test_hits_matches_integer_replay(spark):
    from pandera_forge_spark.operators.graph import hits

    df = spark.createDataFrame(HITS_EDGES, "src long, dst long")
    for iters in (1, 3):
        got = {
            r["node"]: (r["hub"], r["authority"])
            for r in hits(df, iters=iters).collect()
        }
        want_h, want_a = _hits_replay(HITS_EDGES, iters)
        assert got == {v: (want_h[v], want_a[v]) for v in want_h}, iters


def test_hits_semantics(spark):
    from pandera_forge_spark.operators.graph import hits

    df = spark.createDataFrame(HITS_EDGES, "src long, dst long")
    got = {r["node"]: r for r in hits(df, iters=4).collect()}
    # 0 is the strongest hub (3 distinct targets + a parallel edge);
    # 1 the strongest authority (0 twice + 4)
    assert got[0]["hub"] == max(r["hub"] for r in got.values())
    assert got[1]["authority"] == max(r["authority"] for r in got.values())
    # pure sink 6: no out-edges -> hub 0; 5 is never pointed at -> auth 0
    assert got[6]["hub"] == 0
    assert got[5]["authority"] == 0


def test_hits_fences_and_no_udf(spark):
    from pandera_forge_spark.operators.graph import hits
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame(HITS_EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        hits(df, iters=0)
    with pytest.raises(ValueError, match="scale"):
        hits(df, scale=0)
    with pytest.raises(ValueError, match="lacks columns"):
        hits(df.withColumnRenamed("src", "s"))
    bad = spark.createDataFrame([(None, 1)], "src long, dst long")
    with pytest.raises(Exception, match="NULL source"):
        hits(bad, iters=1).collect()
    assert not has_python_udf(hits(df, iters=1))


def test_hits_partition_independence_and_checkpoint_parity(spark, tmp_path):
    from pandera_forge_spark.operators.graph import hits

    df = spark.createDataFrame(HITS_EDGES, "src long, dst long")
    one = sorted(map(tuple, hits(df.repartition(1), iters=2).collect()))
    many = sorted(map(tuple, hits(df.repartition(5), iters=2).collect()))
    ck = sorted(
        map(
            tuple,
            hits(df, iters=2, checkpoint_dir=str(tmp_path / "ck")).collect(),
        )
    )
    assert one == many == ck


# ------------------------------------------------- common_neighbor_pairs


from itertools import combinations as _pairs

from pandera_forge_spark.operators.graph import common_neighbor_pairs


def _cn_replay(edges, min_shared=1, cap=None):
    """Python replay: dedupe, drop self-loops, cap pivots, pair."""
    adj = {(s, t) for s, t in edges if s != t}
    deg = Counter(s for s, _ in adj)
    pivots = Counter(t for _, t in adj)
    kept = {
        (s, t) for s, t in adj if cap is None or pivots[t] <= cap
    }
    out_sets = defaultdict(set)
    for s, t in kept:
        out_sets[s].add(t)
    rows = {}
    for a, b in _pairs(sorted(out_sets), 2):
        shared = len(out_sets[a] & out_sets[b])
        if shared >= min_shared:
            rows[(a, b)] = {
                "shared": shared,
                "degree_a": deg[a],
                "degree_b": deg[b],
                "overlap": shared / min(deg[a], deg[b]),
                "jaccard": shared / (deg[a] + deg[b] - shared),
            }
    return rows


CN_EDGES = [
    # 1 and 2 are mirrors (identical targets), 3 shares one of them,
    # plus a self-loop, a duplicate edge, and a reversed pair.
    (1, 10), (1, 11), (1, 12),
    (2, 10), (2, 11), (2, 12),
    (3, 10), (3, 99),
    (4, 4),            # self-loop: dropped
    (1, 10),           # exact duplicate: deduped
    (10, 1),           # reversed edge: a DIFFERENT adjacency entry
]


def test_common_neighbors_exact_replay(spark):
    df = _edges_df(spark, CN_EDGES)
    got = {
        (r["node_a"], r["node_b"]): r.asDict()
        for r in common_neighbor_pairs(df, min_shared=1, max_pivot_degree=None).collect()
    }
    want = _cn_replay(CN_EDGES, min_shared=1)
    assert set(got) == set(want)
    for k, w in want.items():
        for field, v in w.items():
            assert got[k][field] == v, (k, field, got[k][field], v)


def test_common_neighbors_mirror_semantics(spark):
    out = {
        (r["node_a"], r["node_b"]): r
        for r in common_neighbor_pairs(
            _edges_df(spark, CN_EDGES), min_shared=2, max_pivot_degree=None
        ).collect()
    }
    # the mirrors share all 3 targets: containment and jaccard 1.0
    assert out[(1, 2)]["shared"] == 3
    assert out[(1, 2)]["overlap"] == 1.0 and out[(1, 2)]["jaccard"] == 1.0
    # 3 shares only node 10 with each mirror — filtered at min_shared=2
    assert (1, 3) not in out and (2, 3) not in out


def test_common_neighbors_hub_cap(spark):
    # node 10 is pointed at by 1, 2, 3 (and is itself a source to 1):
    # capping pivots at in-degree 2 removes it, so pair (1,3) (whose
    # only shared neighbor is 10) vanishes while (1,2) survives on
    # 11/12; full degrees stay uncapped so ratios keep their bound.
    got = {
        (r["node_a"], r["node_b"]): r.asDict()
        for r in common_neighbor_pairs(
            _edges_df(spark, CN_EDGES), min_shared=1, max_pivot_degree=2
        ).collect()
    }
    want = _cn_replay(CN_EDGES, min_shared=1, cap=2)
    assert set(got) == set(want)
    assert got[(1, 2)]["shared"] == 2  # 11, 12 — 10 excluded
    assert got[(1, 2)]["degree_a"] == 3  # full out-degree, not capped
    assert (1, 3) not in got
    for k, w in want.items():
        for field, v in w.items():
            assert got[k][field] == v


def test_cocitation_is_coupling_reversed(spark):
    df = _edges_df(spark, CN_EDGES)
    rev = df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    key = lambda rows: sorted(tuple(r) for r in rows)
    co = common_neighbor_pairs(df, min_shared=1, mode="cocitation").collect()
    coup = common_neighbor_pairs(rev, min_shared=1, mode="coupling").collect()
    assert key(co) == key(coup)
    assert len(co) > 0  # 10/11/12 are co-cited by the mirrors


def test_common_neighbors_fences_and_no_udf(spark):
    from pandera_forge_spark.plans.inspect import has_python_udf
    from py4j.protocol import Py4JJavaError

    df = _edges_df(spark, CN_EDGES)
    with pytest.raises(ValueError, match="min_shared"):
        common_neighbor_pairs(df, min_shared=0)
    with pytest.raises(ValueError, match="max_pivot_degree"):
        common_neighbor_pairs(df, max_pivot_degree=0)
    with pytest.raises(ValueError, match="mode"):
        common_neighbor_pairs(df, mode="both")
    with pytest.raises(ValueError, match="lacks columns"):
        common_neighbor_pairs(df.select(F.col("src").alias("s"), "dst"))
    nulled = spark.createDataFrame([(1, None), (1, 2)], "src long, dst long")
    with pytest.raises(Py4JJavaError, match="NULL neighbor endpoint"):
        common_neighbor_pairs(nulled, min_shared=1).collect()
    assert not has_python_udf(common_neighbor_pairs(df))


def test_common_neighbors_partition_independence(spark):
    df = _edges_df(spark, CN_EDGES)
    key = lambda rows: sorted(tuple(r) for r in rows)
    a = common_neighbor_pairs(df.repartition(1), min_shared=1).collect()
    b = common_neighbor_pairs(df.repartition(7, "dst"), min_shared=1).collect()
    assert key(a) == key(b)


# ---------------------------------------------------------------------------
# kcore
# ---------------------------------------------------------------------------

def _kcore_replay(edges, k, rounds):
    """Exact python replay of the synchronous peel: each round drops
    ALL nodes with residual degree < k at once."""
    E = set()
    for s, t in edges:
        if s != t:
            E.add((min(s, t), max(s, t)))
    for _ in range(rounds):
        deg = Counter()
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        dead = {n for n, d in deg.items() if d < k}
        E = {(a, b) for a, b in E if a not in dead and b not in dead}
    deg = Counter()
    for a, b in E:
        deg[a] += 1
        deg[b] += 1
    return dict(deg)


# onion: a K5 core (every node degree 4), a pendant chain hanging off
# node 0, a triangle hanging off node 1 by a bridge, plus messy input
# (duplicates, reversed duplicates, a self-loop)
ONION_EDGES = (
    [(a, b) for a in range(5) for b in range(5) if a < b]  # K5 on 0..4
    + [(0, 10), (10, 11), (11, 12)]  # pendant chain
    + [(1, 20), (20, 21), (21, 22), (22, 20)]  # bridge + triangle
    + [(2, 1), (0, 1), (3, 3)]  # reversed dup, dup, self-loop
)


def test_kcore_onion_matches_replay(spark):
    from pandera_forge_spark.operators.graph import kcore

    df = spark.createDataFrame(ONION_EDGES, "src long, dst long")
    # k=3: chain peels (needs 3 sequential rounds: 12, then 11, then
    # 10), bridge triangle ALSO peels (20 has degree 3 only until 1's
    # side stays; after chain gone the triangle nodes have deg 2) —
    # only K5 survives, every survivor at degree 4
    got = {
        r["node"]: r["degree"]
        for r in kcore(df, k=3, rounds=6).collect()
    }
    assert got == _kcore_replay(ONION_EDGES, 3, 6)
    assert got == {n: 4 for n in range(5)}
    # k=2: the hanging triangle survives too (it is a 2-core), the
    # chain still peels
    got2 = {
        r["node"]: r["degree"]
        for r in kcore(df, k=2, rounds=6).collect()
    }
    assert got2 == _kcore_replay(ONION_EDGES, 2, 6)
    assert set(got2) == {0, 1, 2, 3, 4, 20, 21, 22}


def test_kcore_intermediate_onion_per_round(spark):
    """Each rounds=r budget reproduces the replay's r-round onion
    exactly (strict off — intermediate states are legal to inspect)."""
    from pandera_forge_spark.operators.graph import kcore

    df = spark.createDataFrame(ONION_EDGES, "src long, dst long")
    for r in (1, 2, 3):
        got = {
            row["node"]: row["degree"]
            for row in kcore(df, k=3, rounds=r, strict=False).collect()
        }
        assert got == _kcore_replay(ONION_EDGES, 3, r), r


def test_kcore_strict_raises_under_budget(spark):
    from pandera_forge_spark.operators.graph import kcore

    df = spark.createDataFrame(ONION_EDGES, "src long, dst long")
    # 1 round is not enough for the 3-deep pendant chain
    with pytest.raises(Exception, match="NOT converged"):
        kcore(df, k=3, rounds=1).collect()


def test_kcore_empty_and_fences(spark):
    from pandera_forge_spark.operators.graph import kcore
    from pandera_forge_spark.plans.inspect import has_python_udf

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    # k=2 on a single edge: everything peels — empty result, stable schema
    out = kcore(df, k=2, rounds=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "degree"]
    with pytest.raises(ValueError, match="k must be >= 1"):
        kcore(df, k=0)
    with pytest.raises(ValueError, match="rounds must be >= 1"):
        kcore(df, rounds=0)
    with pytest.raises(ValueError, match="lacks columns"):
        kcore(df.withColumnRenamed("dst", "d"))
    bad = spark.createDataFrame([(1, None)], "src long, dst long")
    with pytest.raises(Exception, match="NULL destination"):
        kcore(bad, k=1, rounds=1).collect()
    assert not has_python_udf(kcore(df, k=1, rounds=1))


def test_kcore_partition_independence_and_checkpoint_parity(spark, tmp_path):
    from pandera_forge_spark.operators.graph import kcore

    df = spark.createDataFrame(ONION_EDGES, "src long, dst long")
    one = sorted(map(tuple, kcore(df.repartition(1), k=2, rounds=5).collect()))
    many = sorted(map(tuple, kcore(df.repartition(7), k=2, rounds=5).collect()))
    assert one == many
    ckpt = sorted(
        map(
            tuple,
            kcore(
                df, k=2, rounds=5, checkpoint_dir=str(tmp_path / "ck")
            ).collect(),
        )
    )
    assert ckpt == one
