"""Link-graph centrality for crawl curation — integer-quantized PageRank.

Why this lives in a training-data engine: link-based centrality is the
classic page-quality prior for web-crawl corpora (the original
CommonCrawl curation signal) — "keep documents whose host/page
accumulates rank from many well-ranked referrers" is a filter the
text-quality family (`quality_score`, `lm_score`) cannot express,
because it is a property of the GRAPH, not of any one document's bytes.
The reference has no graph operators at all (it is a single-table
profiler — see SURVEY.md §1.1, `generator.py:59-94`); this module is a
north-rule scale extension in the same family as the dedup cluster
propagation (`operators/dedup.py:pairs_to_clusters`).

Determinism discipline (the BM25/MI micro-unit trick, applied to the
whole algorithm): ranks are BIGINT micro-units of a fixed total mass
``scale`` and the damping factor is the exact rational
``damping_num/damping_den``, so every per-edge contribution is one
integer multiply + one integer floor-division and every per-node rank
is a SUM of longs — order-independent across partitions, bit-identical
on any engine with 64-bit integers. A float PageRank would differ
between Spark and an oracle in the last ulp on the first iteration and
diverge from there; the quantized one is replayable value-for-value
(driver row ``pagerank_orders``). The quantization bias is strictly
downward (floors drop mass) and bounded by ``(edges + 2·nodes)/scale``
per iteration — at the default ``scale=10^12`` that is noise far below
the estimator's own meaning.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "common_neighbor_pairs",
    "hits",
    "kcore",
    "pagerank",
    "triangle_count",
]

# 85/100 — the canonical damping factor, kept as an exact rational so
# the arithmetic stays in integers end-to-end
DEFAULT_DAMPING_NUM = 85
DEFAULT_DAMPING_DEN = 100
DEFAULT_SCALE = 10**12


def _fenced_endpoint(col: str, side: str):
    """NULL edge endpoints raise IN-BAND (inside the job, at the row
    that is wrong) — a silent drop would quietly delete the edge and
    every rank downstream of it, and a driver-side pre-scan would pay a
    full extra pass. House style: the fence rides the projection."""
    c = F.col(col)
    return F.when(c.isNotNull(), c).otherwise(
        F.raise_error(
            F.lit(
                f"graph operator: NULL {side} endpoint in edge column "
                f"'{col}' — an edge with a missing endpoint is "
                "meaningless; filter or repair upstream"
            )
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping_num: int = DEFAULT_DAMPING_NUM,
    damping_den: int = DEFAULT_DAMPING_DEN,
    scale: int = DEFAULT_SCALE,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """PageRank over a directed edge list, exact-integer arithmetic.

    Returns ``(node, outdeg, rank)`` — one row per node that appears as
    either endpoint; ``rank`` is a BIGINT in units of ``1/scale`` of
    the total mass (sum of ranks ≈ ``scale``, minus floor dust).

    Semantics per iteration (all BIGINT, all floor division, so the
    result is a pure function of the edge multiset — duplicate edges
    count as parallel edges, dedup upstream if that is not wanted):

    - each node ``u`` with ``outdeg > 0`` sends every out-neighbor
      ``(damping_num · rank(u)) div (damping_den · outdeg(u))``,
    - dangling mass (ranks of outdeg-0 nodes) redistributes uniformly:
      ``(damping_num · Σ dangling) div (damping_den · n)``,
    - plus the constant teleport
      ``((damping_den − damping_num) · scale) div (damping_den · n)``.

    Scale shape (the `pairs_to_clusters` pattern): per iteration one
    hash join of the edge list with the node-sized rank frame on the
    SAME key both rounds (src, then groupBy dst) — two shuffles, both
    map-side combinable because contributions are plain long sums; the
    dangling term is a 1-row broadcast crossJoin, never a rescan; the
    rank frame is O(nodes), edges are never materialized beyond the
    join. Lineage is truncated every round (``localCheckpoint``, or a
    RELIABLE ``checkpoint`` when ``checkpoint_dir`` is given — the
    multi-executor mode where losing an executor mid-iteration must not
    replay the whole propagation). Hot dst keys (hub pages) are
    ordinary aggregation skew: partial aggregation collapses each map
    task's contribution to one row per (task, dst) before the exchange.

    ``iters`` is a fixed budget, not a convergence loop — rank queries
    want a deterministic, replayable artifact; convergence monitoring
    at scale is one extra `sum(abs(delta))` the caller can run between
    rounds if desired.

    NOTE: ``checkpoint_dir`` calls ``sc.setCheckpointDir`` — a
    SparkContext-GLOBAL setting that stays in effect after this call
    (the same contract as ``dedup.pairs_to_clusters``); an application
    that checkpoints elsewhere should re-set its own directory
    afterwards.
    """
    if iters < 1:
        raise ValueError(f"pagerank: iters must be >= 1, got {iters}")
    if not (0 < damping_num < damping_den):
        raise ValueError(
            "pagerank: need 0 < damping_num < damping_den, got "
            f"{damping_num}/{damping_den}"
        )
    # damping_num * rank and damping_den * n must both stay inside
    # int64 for any rank <= scale and any plausible n — fence the
    # parameter space rather than overflow silently (ANSI mode would
    # raise mid-job; non-ANSI would wrap and corrupt every rank)
    if scale < damping_den or scale * damping_den >= 2**62:
        raise ValueError(
            f"pagerank: scale {scale} out of range [{damping_den}, "
            f"2^62/damping_den) — ranks are BIGINT micro-units"
        )
    missing = [c for c in (src_col, dst_col) if c not in edges.columns]
    if missing:
        raise ValueError(f"pagerank: edge frame lacks columns {missing}")

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = edges.select(
        _fenced_endpoint(src_col, "source").alias("src"),
        _fenced_endpoint(dst_col, "destination").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    base = _truncate(
        nodes.join(outdeg, "node", "left").select(
            "node", F.coalesce(F.col("outdeg"), F.lit(0)).alias("outdeg")
        )
    )
    n = base.count()
    if n == 0:
        # empty edge frame: empty result, same schema — not a crash
        # (an upstream filter that matched nothing is the caller's
        # bug to notice via .count(), matching the dedup family)
        return base.withColumn("rank", F.lit(None).cast("long"))

    r0 = scale // n
    teleport = ((damping_den - damping_num) * scale) // (damping_den * n)
    ranks = base.withColumn("rank", F.lit(r0).cast("long"))

    send = F.expr(
        f"({damping_num} * rank) div ({damping_den} * outdeg)"
    ).alias("__c")
    for _ in range(iters):
        dang = ranks.where(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("__dang")
        )
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select(F.col("dst"), send)
            .groupBy("dst")
            .agg(F.sum("__c").alias("__sum"))
        )
        # damping_den * n is folded in PYTHON: as two int SQL literals
        # Spark would multiply them in int32 and overflow past ~21.4M
        # nodes (ARITHMETIC_OVERFLOW under ANSI, silent wrap otherwise)
        ranks = _truncate(
            base.crossJoin(F.broadcast(dang))
            .join(contrib, base.node == contrib.dst, "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(teleport).cast("long")
                    + F.expr(
                        f"({damping_num} * __dang) div "
                        f"{damping_den * n}"
                    )
                    + F.coalesce(F.col("__sum"), F.lit(0))
                ).alias("rank"),
            )
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    UNDIRECTED simple graph induced by the edge list (direction,
    duplicate edges and self-loops are collapsed/dropped internally —
    the standard triangle-counting contract). Returns
    ``(node, degree, triangles, lcc)`` with
    ``lcc = 2·triangles / (degree·(degree−1))`` (0.0 when degree < 2).

    Why in a curation engine: clustering structure separates organic
    link neighborhoods (high lcc) from spam farms and scraped link
    lists (star-shaped, lcc ≈ 0) — the graph-shape complement of
    :func:`pagerank`'s flow-based score. All counts are exact integers;
    lcc is one IEEE division of exact ints — replayable everywhere.

    Scale shape (degree-ordered orientation — the MapReduce-classic
    trick): each undirected edge is oriented from its lower
    (degree, node) endpoint to the higher, which caps every node's
    out-degree at O(sqrt(m)) regardless of how skewed the real degree
    distribution is, so the wedge self-join (the only superlinear step)
    generates Σ outdeg² = O(m^1.5) candidate rows worst-case instead of
    the Σ deg² a naive wedge join pays at a celebrity node. Three hash
    joins + one groupBy, all on key columns; no windows, no UDFs, no
    collect. Each triangle materializes exactly once (its endpoints
    appear in strict orientation order) and credits all three corners.
    NULL endpoints raise in-band (same fence as :func:`pagerank`)."""
    missing = [c for c in (src_col, dst_col) if c not in edges.columns]
    if missing:
        raise ValueError(f"triangle_count: edge frame lacks columns {missing}")
    e = edges.select(
        _fenced_endpoint(src_col, "source").alias("s"),
        _fenced_endpoint(dst_col, "destination").alias("t"),
    ).where(F.col("s") != F.col("t"))
    und = e.select(
        F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("__db"))
    lower_first = F.struct(F.col("__da"), F.col("a")) < F.struct(
        F.col("__db"), F.col("b")
    )
    # carry the HIGHER endpoint's degree so wedges are generated in
    # orientation-consistent order only — the closing edge can only
    # ever exist as v→w with (deg_v, v) < (deg_w, w), so emitting both
    # (v, w) and (w, v) would double the shuffle of the one
    # superlinear step for rows that cannot match
    eor = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("__db"))
            .otherwise(F.col("__da"))
            .alias("__dv"),
        )
    )
    e1 = eor.select(F.col("u"), F.col("v").alias("__v"), F.col("__dv").alias("__dvv"))
    e2 = eor.select(F.col("u"), F.col("v").alias("__w"), F.col("__dv").alias("__dvw"))
    wedges = e1.join(e2, "u").where(
        F.struct(F.col("__dvv"), F.col("__v"))
        < F.struct(F.col("__dvw"), F.col("__w"))
    )
    closing = eor.select(
        F.col("u").alias("__v"), F.col("v").alias("__w")
    )
    tri = wedges.join(closing, ["__v", "__w"])
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("__v").alias("node")))
        .unionAll(tri.select(F.col("__w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = deg.join(corners, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
    )
    lcc = F.when(
        F.col("degree") >= 2,
        F.lit(2.0)
        * F.col("triangles").cast("double")
        / (
            F.col("degree").cast("double")
            * (F.col("degree").cast("double") - F.lit(1.0))
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("lcc", lcc)


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = DEFAULT_SCALE,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """HITS hubs & authorities over a directed edge list — the third
    graph lens after :func:`pagerank` (flow) and :func:`triangle_count`
    (shape): authorities are pages many good hubs point AT (content
    worth keeping), hubs are pages that point at many good authorities
    (link lists — often boilerplate to DROP). Returns
    ``(node, hub, authority)`` as BIGINT scores summing to ≈ ``scale``
    each.

    Integer L1-normalized variant (Kleinberg's algorithm normalizes by
    L2; L1 keeps every step in exact BIGINT arithmetic — same ordering,
    different constant): per iteration

    - ``h'(u) = Σ_{u→v} a(v)``   (sum over u's out-neighbors),
    - ``h(u) = h'(u) div q_h`` with ``q_h = max(Σh' div scale, 1)``,
    - ``a'(v) = Σ_{u→v} h(u)``, normalized the same way.

    Every value is an integer sum of integers plus one floor division
    by a broadcast scalar — order-independent across partitions and
    replayable value-for-value (driver row ``hits_orders``). Duplicate
    edges count as parallel edges (dedup upstream if unwanted); nodes
    with no out-edges have hub 0, no in-edges authority 0 — the HITS
    semantics, no dangling redistribution.

    Scale shape: per iteration two edge⋈score hash joins + two
    map-side-combinable long-sum groupBys + two 1-row broadcast
    normalizers; score frames are O(nodes); lineage truncated per round
    (``localCheckpoint`` / reliable ``checkpoint_dir`` — see
    :func:`pagerank`, including its note that ``checkpoint_dir``
    mutates the SparkContext-global checkpoint directory). Intermediate
    sums are bounded by max_indegree·scale; at the default
    ``scale=10^12`` that overflows int64 only past ~9M parallel
    in-edges on one node, where ANSI mode raises loudly rather than
    wrapping."""
    if iters < 1:
        raise ValueError(f"hits: iters must be >= 1, got {iters}")
    if not (1 <= scale <= 10**15):
        raise ValueError(f"hits: scale must be in [1, 10^15], got {scale}")
    missing = [c for c in (src_col, dst_col) if c not in edges.columns]
    if missing:
        raise ValueError(f"hits: edge frame lacks columns {missing}")

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = edges.select(
        _fenced_endpoint(src_col, "source").alias("src"),
        _fenced_endpoint(dst_col, "destination").alias("dst"),
    )
    nodes = _truncate(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return (
            nodes.withColumn("hub", F.lit(None).cast("long"))
            .withColumn("authority", F.lit(None).cast("long"))
        )

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        """score div max(Σscore div scale, 1) — Σ and q ride one 1-row
        broadcast; a zero-sum side (e.g. hubs of a sink-only graph)
        divides by 1 and stays all-zero."""
        # integer div, NOT float-divide-then-cast: past 2^53 a double
        # quotient loses ulps and diverges from an engine's exact //
        tot = raw.agg(
            F.expr(
                f"greatest(coalesce(sum({col}), cast(0 as bigint)) "
                f"div {scale}, cast(1 as bigint))"
            ).alias("__q")
        )
        return raw.crossJoin(F.broadcast(tot)).select(
            "node",
            F.expr(f"{col} div __q").alias(col),
        )

    auth = nodes.withColumn("authority", F.lit(scale // n).cast("long"))
    hub = None
    for _ in range(iters):
        h_raw = (
            e.join(auth, e.dst == auth.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        h_full = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce(F.col("hub"), F.lit(0)).alias("hub")
        )
        hub = _truncate(_norm(h_full, "hub"))
        a_raw = (
            e.join(hub, e.src == hub.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        a_full = nodes.join(a_raw, "node", "left").select(
            "node",
            F.coalesce(F.col("authority"), F.lit(0)).alias("authority"),
        )
        auth = _truncate(_norm(a_full, "authority"))
    return hub.join(auth, "node").select("node", "hub", "authority")


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    strict: bool = True,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """k-core membership via synchronous peeling — the fifth graph lens
    (flow = :func:`pagerank`, role = :func:`hits`, shape =
    :func:`triangle_count`, similarity = :func:`common_neighbor_pairs`,
    COHESION = this): the k-core is the maximal subgraph where every
    node keeps at least ``k`` neighbors, the standard density filter
    separating an organically interlinked cluster from pendant chains,
    scraped link lists and drive-by spam pages — a pendant page can buy
    one link into a good neighborhood, but it cannot buy its way into a
    3-core without the neighborhood linking back densely.

    Works on the UNDIRECTED SIMPLE graph induced by the edge list
    (direction, duplicate edges, self-loops collapse/drop — the
    :func:`triangle_count` contract). Returns ``(node, degree)`` — the
    surviving nodes with their residual degree inside the core.

    Synchronous peeling: each round computes degrees over the REMAINING
    edge set and removes ALL nodes below ``k`` at once. Every round's
    survivor set is a pure function of the input (no removal-order
    dependence, unlike sequential peeling), so a DuckDB oracle replays
    it round-for-round (driver row ``kcore_orders``), and the fixpoint
    — when a round removes nobody — IS the k-core (Seidman 1983; the
    peel is monotone, so the fixpoint is unique and synchronous /
    sequential peeling agree there).

    ``rounds`` is a fixed budget, not a convergence loop (the
    :func:`pagerank` contract — a deterministic, replayable artifact
    beats a data-dependent number of driver round-trips). With
    ``strict=True`` (default) a survivor whose residual degree is still
    below ``k`` raises IN-BAND — under-budget peeling is loud, never a
    silently-too-large "core". Peel depth is bounded by the graph's
    degeneracy ordering depth; web graphs converge in a handful of
    rounds, while an adversarial path graph needs O(n) — callers
    peeling pathological topologies pass a bigger budget or
    ``strict=False`` to inspect the intermediate onion.

    Scale shape: per round one map-side-combinable long-count groupBy
    (degrees) + two hash semi-joins (drop edges touching dead nodes) —
    no windows, no UDFs, no collect; the edge frame only ever SHRINKS.
    Lineage is truncated each round (``localCheckpoint``, or reliable
    ``checkpoint`` under ``checkpoint_dir`` — which, as with
    :func:`pagerank`, sets the SparkContext-GLOBAL checkpoint dir).
    Hot nodes are ordinary aggregation skew (partial aggregation
    collapses per-task counts before the exchange).
    """
    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"kcore: rounds must be >= 1, got {rounds}")
    missing = [c for c in (src_col, dst_col) if c not in edges.columns]
    if missing:
        raise ValueError(f"kcore: edge frame lacks columns {missing}")

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    und = _truncate(
        edges.select(
            _fenced_endpoint(src_col, "source").alias("s"),
            _fenced_endpoint(dst_col, "destination").alias("t"),
        )
        .where(F.col("s") != F.col("t"))
        .select(
            F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b")
        )
        .distinct()
    )

    def _degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    for _ in range(rounds):
        kept = _degrees(und).where(F.col("degree") >= k).select("node")
        und = _truncate(
            und.join(kept.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(kept.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
        )

    out = _degrees(und)
    if strict:
        out = out.select(
            "node",
            F.when(F.col("degree") >= k, F.col("degree"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"kcore: node with residual degree < k={k} "
                            f"after rounds={rounds} peel budget — the "
                            "peel has NOT converged; raise rounds or "
                            "pass strict=False to inspect the "
                            "intermediate onion (node="
                        ),
                        F.col("node").cast("string"),
                        F.lit(")"),
                    )
                )
            )
            .alias("degree"),
        )
    return out


def common_neighbor_pairs(
    edges: DataFrame,
    min_shared: int = 2,
    max_pivot_degree: Optional[int] = 1000,
    mode: str = "coupling",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Node pairs sharing at least ``min_shared`` neighbors — the
    fourth graph lens (flow = :func:`pagerank`, role = :func:`hits`,
    shape = :func:`triangle_count`, SIMILARITY = this): two pages whose
    outgoing links largely coincide are mirrors, template clones, or a
    link farm stamping the same target list — near-duplicate structure
    the text-side MinHash cannot see when the page BODIES differ.

    ``mode="coupling"`` (bibliographic coupling, Kessler 1963): pairs
    share OUT-neighbors — "these two pages cite the same things".
    ``mode="cocitation"`` (Small 1973): pairs share IN-neighbors —
    "the same pages cite these two"; exactly coupling over the
    reversed edge list, and implemented as that.

    Returns ``(node_a, node_b, shared, degree_a, degree_b, overlap,
    jaccard)`` with ``node_a < node_b``, ``degree_*`` the full deduped
    out-degree (in-degree for cocitation), ``overlap = shared /
    min(degree_a, degree_b)`` (containment — 1.0 means one
    neighborhood nests in the other) and ``jaccard = shared /
    (degree_a + degree_b − shared)``; each ratio ONE raw IEEE division
    of exact longs. Exact-duplicate edges collapse first (an adjacency
    is a set); self-loops drop (a page "citing itself" is structural
    noise); direction otherwise matters — (a→b) and (b→a) are
    different adjacency entries.

    Scale shape: the one superlinear step pivots on the SHARED
    neighbor — group the edge list by pivot node and pair the nodes
    pointing at it, Σ pivot_indegree² candidate rows. A mega-hub pivot
    (every page links example.com/about) is quadratic AND carries no
    similarity signal, so pivots above ``max_pivot_degree`` are
    EXCLUDED from pair generation — the document-frequency stop-filter
    discipline of ``fingerprint_overlap``/``strip_boilerplate``;
    ``shared`` then counts shared NON-HUB neighbors (documented bias:
    strictly downward, never inflating a pair). ``degree_*`` stay full
    degrees, so overlap/jaccard keep their ≤ 1 bound. Pass ``None`` to
    disable the cap (exact, quadratic at hubs). Everything is two hash
    joins + two groupBys + one self-join on the pivot key; no windows,
    no UDFs, no collect; NULL endpoints raise in-band (shared graph
    fence).
    """
    if min_shared < 1:
        raise ValueError(
            f"common_neighbor_pairs: min_shared must be >= 1, got {min_shared}"
        )
    if max_pivot_degree is not None and max_pivot_degree < 1:
        raise ValueError(
            "common_neighbor_pairs: max_pivot_degree must be >= 1 or None, "
            f"got {max_pivot_degree}"
        )
    if mode not in ("coupling", "cocitation"):
        raise ValueError(
            "common_neighbor_pairs: mode must be 'coupling' or 'cocitation', "
            f"got {mode!r}"
        )
    missing = [c for c in (src_col, dst_col) if c not in edges.columns]
    if missing:
        raise ValueError(
            f"common_neighbor_pairs: edge frame lacks columns {missing}"
        )
    # node = the side being compared, pivot = the shared neighbor;
    # cocitation is coupling over the reversed edge list.
    node_col, pivot_col = (
        (src_col, dst_col) if mode == "coupling" else (dst_col, src_col)
    )
    e = (
        edges.select(
            _fenced_endpoint(node_col, "node").alias("n"),
            _fenced_endpoint(pivot_col, "neighbor").alias("p"),
        )
        .where(F.col("n") != F.col("p"))
        .distinct()
    )
    deg = e.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
    if max_pivot_degree is not None:
        pivot_deg = e.groupBy("p").agg(F.count(F.lit(1)).alias("__pd"))
        kept = e.join(
            pivot_deg.where(F.col("__pd") <= max_pivot_degree).select("p"), "p"
        )
    else:
        kept = e
    a = kept.select(F.col("n").alias("node_a"), "p")
    b = kept.select(F.col("n").alias("node_b"), "p")
    shared = (
        a.join(b, "p")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    da = deg.select(F.col("n").alias("node_a"), F.col("degree").alias("degree_a"))
    db = deg.select(F.col("n").alias("node_b"), F.col("degree").alias("degree_b"))
    return (
        shared.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "shared",
            "degree_a",
            "degree_b",
            (F.col("shared") / F.least("degree_a", "degree_b")).alias("overlap"),
            (
                F.col("shared")
                / (F.col("degree_a") + F.col("degree_b") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
