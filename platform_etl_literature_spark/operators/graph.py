"""Distributed graph statistics: co-occurrence edges, degrees,
triangle counting, clustering coefficient, k-core decomposition.

Triangle counting is the canonical "curse of the last reducer" problem
(Suri & Vassilvitskii, WWW'11): the naive wedge join generates
``Σ deg(v)²`` candidates, so one celebrity node melts a reducer.  The
fix is DEGREE ORIENTATION: direct every undirected edge from its
(degree, id)-smaller endpoint to its larger one — a total order, so
each triangle has exactly ONE node with two out-edges and is counted
exactly once — and generate wedges only from out-neighbors.  Max
out-degree under this orientation is O(√m), so the wedge join's skew
is bounded by construction, not by luck.

Pipeline (all DataFrame equijoins, no cross product):

1. edges → degrees (explode endpoints, hash agg with map-side combine)
2. orient: join degrees onto both endpoints, src = (deg,id)-smaller
3. wedges: self-equijoin of oriented edges on src, dst₁ <(deg,id) dst₂
4. close: equijoin wedges against oriented edges on (dst₁, dst₂)

Global clustering coefficient = 3·triangles / Σ C(deg,2) — the share
of open wedges that close.

``pair_edges`` builds the co-occurrence graph (items sharing a group:
parts co-ordered, docs co-cited, …).  Its self-join is quadratic in
group size, so a ``max_group`` valve EXCLUDES pathological groups
(a group with 10⁵ items would emit 5·10⁹ pairs — at 100 TB that is a
deliberate policy decision, not a default); the cap is part of the
operator's declared semantics so an oracle replays it exactly.

Reference parity note: the reference's co-occurrence evidence
(Evidence.scala pair stats) stops at pair counting; the triangle /
clustering layer is the graph-structure extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group: int = 64,
) -> DataFrame:
    """Undirected co-occurrence edges (u, v), u < v, deduplicated.

    Groups larger than ``max_group`` distinct items are EXCLUDED
    before the pair self-join (the skew valve — see module
    docstring)."""
    # Key the whole chain by _g ONCE (round 10): the natural
    # `.distinct()` partitions on (_g, _i), which satisfies neither the
    # size aggregation nor the pair self-join — each leg then re-paid a
    # full exchange of the membership table (two extra corpus-sized
    # shuffle writes in the sf0.1 profile).  hashpartitioning(_g) is a
    # subset of the distinct's (_g, _i) clustering, so one advisory
    # REPARTITION_BY_COL exchange feeds the distinct, the size count,
    # the valve semi-join AND both self-join legs (7 exchanges → 5 in
    # the physical plan; the survivors are this one, the sizes
    # broadcast builds, and the final pair dedup).
    m = (
        df.select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i"))
        .repartition("_g")
        .distinct()
    )
    sizes = m.groupBy("_g").agg(F.count(F.lit(1)).alias("_sz"))
    kept = m.join(
        sizes.filter(F.col("_sz") <= max_group).select("_g"), "_g"
    )
    a = kept.select("_g", F.col("_i").alias("u"))
    b = kept.select("_g", F.col("_i").alias("v"))
    return (
        a.join(b, "_g")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from undirected (u, v) edges."""
    ends = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))


def _oriented(edges: DataFrame) -> DataFrame:
    """Degree-oriented edges (src, dst, sdeg, ddeg): src is the
    (deg, id)-smaller endpoint."""
    deg = degrees(edges)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("_dv"))
    e = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("_du")).otherwise(F.col("_dv")).alias("sdeg"),
        F.when(u_first, F.col("_dv")).otherwise(F.col("_du")).alias("ddeg"),
    )


# rounds the last k_core call took to reach its fixpoint — the
# measured peel depth, read by tests and the suite-oracle unroll bound
last_peel_rounds: int = 0


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    broadcast_keep: bool = True,
) -> DataFrame:
    """The k-core: the maximal subgraph in which every node has degree
    ≥ k (Seidman 1983, "Network structure and minimum degree") — the
    standard graph-side quality cut for citation / co-occurrence
    graphs (peripheral low-engagement nodes peel away; the dense core
    survives).  Returns (node, core_deg): the surviving nodes with
    their degree INSIDE the core.

    Iterative peel, all DataFrame equijoins: each round recomputes
    degrees (one map-side-combined shuffle), keeps nodes with
    degree ≥ k, and semi-joins the edge list against the survivor set
    on both endpoints.  With ``broadcast_keep`` (default) the
    node-sized survivor frame broadcasts into both joins, so the only
    per-round exchange is the degree aggregation — set it False on a
    graph whose NODE set alone exceeds broadcast room (the pagerank
    ``broadcast_ranks`` rule; edges then shuffle per round instead).
    The peel is monotone (the survivor set only shrinks), so the
    fixpoint test is free: a round drops a node iff it drops that
    node's edges, so EDGE COUNT UNCHANGED ⟺ every degree was already
    ≥ k ⟺ fixpoint.  Each round therefore runs exactly ONE action —
    the eager checkpoint of the peeled edge list (whose job computes
    the degree aggregation once, as the broadcast keep side) — and
    compares row counts of the already-materialized checkpoints
    (round 10; the previous shape ran a separate degree-stats action
    BEFORE the checkpoint, so every round computed the degree shuffle
    twice — two actions and two aggregations per round for the same
    peel).  Rounds are checkpointed, not persisted (the components.py
    rule: checkpoint for iteration), and the loop runs under
    loop-scoped shuffle settings (the pagerank lesson — this loop is
    join-heavy like pagerank's, and unlike the star contraction it
    measurably benefits: 6.9 → 4.2 s at sf0.1; BENCH_NOTES.md records
    both experiments).

    Round complexity is the peel depth of the graph — O(n) worst case
    (a path with k=2 peels two endpoints per round), but real
    co-occurrence graphs peel in a handful of rounds; ``max_rounds``
    raises rather than silently returning a non-core.  Sets
    :data:`last_peel_rounds` (the suite oracle unrolls the same peel
    a fixed number of rounds — extra rounds are idempotent at the
    fixpoint, so the unroll bound only needs to be ≥ the measured
    depth, which this global makes checkable).
    """
    global last_peel_rounds
    if k < 1:
        raise ValueError("k must be >= 1")
    e = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = e.sparkSession
    n_edges = e.count()  # cached count on the checkpoint — no recompute
    loop_parts = max(8, n_edges // 50_000)  # edge-proportional
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        for rounds in range(1, max_rounds + 1):
            keep = degrees(e).filter(F.col("deg") >= k).select("node")
            if broadcast_keep:
                keep = F.broadcast(keep)
            e2 = (
                e.join(keep.withColumnRenamed("node", "u"), "u")
                .join(keep.withColumnRenamed("node", "v"), "v")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
            n2 = e2.count()
            if n2 == n_edges:  # nothing peeled ⟺ every degree ≥ k
                last_peel_rounds = rounds
                deg = degrees(e2)
                return deg.select("node", F.col("deg").alias("core_deg"))
            e, n_edges = e2, n2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_shuf)
    raise RuntimeError(f"k_core: no fixpoint in {max_rounds} rounds")


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan,
    Albert & Kumara 2007, Phys. Rev. E 76) made deterministic: every
    node starts labeled with its own id; each round every node
    simultaneously adopts the label that is most frequent among its
    neighbors, ties broken by the SMALLEST label.  Classic async LPA
    is order-dependent (its results vary run to run); the synchronous
    + min-tie variant is a pure function of (edges, rounds), so an
    oracle replays it label-for-label — the same determinism trade
    pagerank and k_core make.  Runs a FIXED number of rounds rather
    than to a fixpoint because synchronous LPA can 2-cycle on
    bipartite-ish regions (Raghavan §IV) — "labels after R rounds" is
    the well-defined, replayable semantics.  Returns (node, community).

    Per round (all DataFrame ops, no cross product):
      1. join neighbor labels onto the adjacency list — the node-sized
         label frame BROADCASTS (``broadcast_labels``) so the
         edge-sized side never shuffles for the join;
      2. count (node, label) votes — one map-side-combined exchange;
      3. argmax with the min-label tie-break via ``max(struct(cnt,
         -label))`` — a second, strictly smaller exchange (one row per
         node × distinct neighbor label in, one per node out).
    Labels are checkpointed each round (the iteration rule: truncate
    lineage, don't stack 2R joins into one plan), and the loop runs
    under loop-scoped shuffle confs — join-heavy over node-sized
    frames, the shape where BENCH_NOTES.md measured the scoping to
    pay (pagerank, k_core) as opposed to job-floor-bound loops
    (star contraction, BPE) where it doesn't.

    At 100 TB: state is one (node, label) row per node — the pagerank
    envelope; per-round volume is one edge-sized projection into a
    count whose key space is bounded by Σ deg distinct (node, label)
    pairs.  A celebrity node's vote count concentrates onto few labels
    (counts combine map-side), so the argmax never sees degree-sized
    groups.  Set ``broadcast_labels=False`` when the NODE set alone
    exceeds broadcast room; the joins then hash-partition both sides
    on the same key and AQE reuses the exchange.

    Labels must be numeric (the ``-label`` tie-break trick); node ids
    here are BIGINTs by construction throughout the repo."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # one-pass symmetrize (round 10): the unionAll form read ``e`` --
    # and with it the whole upstream pair-generation chain -- TWICE
    # (two ~6 MB map stages in the sf0.1 profile; exchange reuse did
    # not cover the union branches).  explode emits both arcs from one
    # scan; same rows.
    adj = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("node"), F.col("v").alias("nbr")),
                    F.struct(F.col("v").alias("node"), F.col("u").alias("nbr")),
                )
            ).alias("_a")
        )
        .select("_a.node", "_a.nbr")
        .localCheckpoint(eager=True)
    )
    spark = adj.sparkSession
    loop_parts = max(8, adj.count() // 50_000)  # edge-proportional
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        labels = (
            adj.select("node")
            .distinct()
            .select("node", F.col("node").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        for _ in range(rounds):
            nbr_lbl = labels.select(
                F.col("node").alias("nbr"), F.col("lbl")
            )
            if broadcast_labels:
                nbr_lbl = F.broadcast(nbr_lbl)
            votes = (
                adj.join(nbr_lbl, "nbr")
                .groupBy("node", "lbl")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            labels = (
                votes.groupBy("node")
                .agg(
                    F.max(
                        F.struct(
                            F.col("cnt").alias("c"),
                            (-F.col("lbl")).alias("nl"),
                        )
                    ).alias("_m")
                )
                .select("node", (-F.col("_m.nl")).alias("lbl"))
                .localCheckpoint(eager=True)
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_shuf)
    return labels.select("node", F.col("lbl").alias("community"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row graph summary: n_nodes, n_edges, max_degree, n_wedges
    (Σ C(deg,2), the open-wedge count), n_candidates, max_out_degree,
    n_triangles, clustering (3T / wedges, rounded 6; 0.0 for a
    wedge-free graph).

    ``n_candidates`` = Σ_src C(outdeg(src), 2) over the ORIENTED
    edges — the exact number of wedge pairs the join actually
    generates, i.e. the operator's intermediate volume.  It is the
    accountability column for scale cells: candidate volume grows
    with out-degree², so a super-linear wall-clock cell is
    value-verified against the measured candidate count instead of
    hand-waved.  ``max_out_degree`` is the realized orientation bound
    (O(√m) by Suri-Vassilvitskii; a graph pushing it toward its
    theoretical ceiling is the signal to valve upstream via
    ``pair_edges(max_group=…)``).

    The edge list (often an expensive pair-generation chain) is read
    four ways and the oriented set three (both wedge legs + the
    closing join) — persist both for DAG reuse (the persist-vs-
    checkpoint rule; AQE exchange reuse alone doesn't cover separate
    actions).  Caches release on the session's next clearCache."""
    edges = edges.persist()
    deg = degrees(edges)
    o = _oriented(edges).persist()

    # triangle count via adjacency intersection (round-8 rewrite): for
    # an acyclically oriented graph each triangle has exactly one
    # source node with both out-edges, so T = Σ_{(a,b)∈E⃗} |N⁺(a) ∩
    # N⁺(b)| — the same integer the wedge-generate + closing-join form
    # computes, at a fraction of the shuffle: the old plan
    # materialized Σ C(outdeg,2) wedge ROWS (657 M at the 16× SCALE
    # cell) and shuffled them into a (w1, w2) join; this plan shuffles
    # only the m oriented edges into two node-keyed equijoins against
    # the collected out-adjacency arrays (bounded by the orientation's
    # O(√m) out-degree cap) and intersects per edge inside codegen.
    # Total bytes are comparable (Σ outdeg² array elements), but the
    # per-row shuffle/sort machinery drops by ~outdeg× — measured
    # 52.7 s → well under the 40 s target at 16× (SCALE.md).
    # n_candidates below still reports the wedge-pair volume Σ
    # C(outdeg,2) — the accountability contract is the intermediate
    # VOLUME, which the intersection plan pays in array cells.
    adj = o.groupBy("src").agg(
        F.array_sort(F.collect_list("dst")).alias("_nbrs")
    )
    tri = (
        o.join(adj.select("src", F.col("_nbrs").alias("_na")), "src")
        .join(
            adj.select(
                F.col("src").alias("dst"), F.col("_nbrs").alias("_nb")
            ),
            "dst",
        )
        .select(
            F.size(F.array_intersect("_na", "_nb")).cast("long").alias("_c")
        )
        .agg(
            F.coalesce(F.sum("_c"), F.lit(0).cast("long")).alias(
                "n_triangles"
            )
        )
    )

    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("deg").alias("max_degree"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # realized join volume + orientation bound (see docstring): one
    # slim agg over the persisted oriented set, map-side combined
    cand = (
        o.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_od"))
        .agg(
            (F.sum(F.col("_od") * (F.col("_od") - 1)) / 2)
            .cast("long")
            .alias("n_candidates"),
            F.max("_od").alias("max_out_degree"),
        )
    )

    return (
        summary.crossJoin(n_edges)
        .crossJoin(F.broadcast(cand))
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "max_degree",
            "n_wedges",
            "n_candidates",
            "max_out_degree",
            "n_triangles",
            F.when(F.col("n_wedges") > 0,
                   F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def link_prediction_scores(
    edges: DataFrame,
    max_center_degree: int = 64,
    broadcast_degrees: bool = True,
) -> DataFrame:
    """Common-neighbor link prediction over undirected (u, v) edges:
    score every NON-edge pair at distance 2 by neighborhood overlap —
    the classical local similarity indices of Liben-Nowell & Kleinberg
    ("The link-prediction problem for social networks", CIKM'03) and
    Adamic & Adar ("Friends and neighbors on the web", 2003).

    Returns (u, v, cn, deg_u, deg_v, jaccard, aa_micro) with u < v:

    * ``cn`` — common-neighbor count |Γ(u) ∩ Γ(v)|;
    * ``jaccard`` — cn / |Γ(u) ∪ Γ(v)| (round 6; one division over
      exact integers — the engine-portable float contract);
    * ``aa_micro`` — Adamic-Adar in exact integer micro-units:
      Σ_w round(10^6 / ln(deg(w))) over the common neighbors w.  Each
      term is rounded to an integer BEFORE the sum (the lm.py
      micro-nat precedent), so the reduction is order-free and an SQL
      oracle replays it bit for bit; every wedge center has deg ≥ 2,
      so ln(deg) > 0 always.

    Scale shape: common-neighbor counting needs wedges from the FULL
    neighbor list of each center (unlike the triangle census, whose
    degree orientation works because each triangle is counted at
    exactly one node — a wedge has no such canonical representative),
    so the candidate volume is Σ C(deg(w), 2).  The declared-semantics
    valve is ``max_center_degree``: wedge CENTERS above the cap are
    excluded before the neighbor self-join (the pair_edges max_group
    rule — a celebrity hub connects everything to everything and
    carries no pairwise signal; at the default 64 a center emits at
    most ~2k candidates).  Endpoint DEGREES are computed on the full
    uncapped graph, so reported jaccard/aa use true degrees; the cap
    only bounds which centers may witness a pair.  The existing-edge
    subtraction is a left_anti equijoin on (u, v) — shuffled, since
    the edge set is corpus-scale.  The degree frame is NODE-sized, so
    with ``broadcast_degrees`` (default) its three appearances (the
    center cap and both endpoint-degree attachments) broadcast
    instead of shuffling — the pagerank ``broadcast_ranks`` rule; set
    it False on a graph whose node set alone exceeds broadcast room.
    """
    if max_center_degree < 2:
        raise ValueError(
            f"max_center_degree must be >= 2, got {max_center_degree}"
        )
    e = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = degrees(e).persist()

    # bidirectional (center x, neighbor y); drop over-cap centers
    nbrs = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    # degree-1 centers are dropped HERE, not just implied by the wedge
    # join: they witness no pair anyway (one neighbor), and their
    # Adamic-Adar term would be 1/log(1) — a division by zero that
    # ANSI mode turns into a runtime error whenever the physical plan
    # evaluates the projection before the (join-implied) elimination;
    # observed order-dependently in CI before this guard.
    keep = deg.filter(
        (F.col("deg") <= max_center_degree) & (F.col("deg") >= 2)
    ).select(F.col("node").alias("x"), F.col("deg").alias("_dx"))
    if broadcast_degrees:
        keep = F.broadcast(keep)
    nbrs = nbrs.join(keep, "x")
    # per-wedge Adamic-Adar term: a pure function of the CENTER's
    # degree, attached before the self-join so the pair aggregation
    # sums ready-made integers; the when() keeps the expression total
    # (NULL for a sub-2 degree) even if a future caller re-plans the
    # filter away
    nbrs = nbrs.select(
        "x", "y",
        F.when(
            F.col("_dx") >= 2,
            F.round(F.lit(1000000.0) / F.log(F.col("_dx")), 0),
        )
        .cast("long")
        .alias("_aa"),
    )
    n1 = nbrs.select("x", F.col("y").alias("u"), "_aa")
    n2 = nbrs.select("x", F.col("y").alias("v"), "_aa")
    cand = (
        n1.join(n2.drop("_aa"), "x")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("_aa").alias("aa_micro"),
        )
        .join(e, ["u", "v"], "left_anti")
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    if broadcast_degrees:
        du, dv = F.broadcast(du), F.broadcast(dv)
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u", "v", "cn", "deg_u", "deg_v",
            F.round(
                F.col("cn")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
            "aa_micro",
        )
    )


# hops the last bfs_distances call actually expanded — read by tests
# and the suite-oracle unroll bound (the last_peel_rounds pattern)
last_bfs_hops: int = 0


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    broadcast_frontier: bool = True,
    edges_distinct: bool = False,
) -> DataFrame:
    """Hop distance from the nearest SEED node over an undirected
    graph, exact, bounded at ``max_hops`` — multi-source breadth-first
    search, the landmark-distance primitive (how far is every node
    from the curated trust set?) that complements the census
    (triangles), the peel (k_core) and the flow (pagerank) members of
    the graph family.

    ``seeds`` is a one-column frame ``(node)``.  Returns
    ``(node, dist)`` for every node within ``max_hops`` of a seed
    (seeds themselves at dist 0).  Unreached nodes are absent — the
    caller left-joins and fills if it wants sentinel distances.

    Level-synchronous frontier expansion, all DataFrame equijoins:
    each hop joins the frontier against the symmetrized edge list,
    anti-joins the already-settled set (BFS settles a node at its
    FIRST discovery — that hop count IS the minimum distance), and
    checkpoints the new frontier (the components.py rule: checkpoint
    for iteration, lineage must not grow with hop count).  With
    ``broadcast_frontier`` (default) the frontier and settled frames
    broadcast into the expansion joins, so no per-hop shuffle of the
    edge list happens at all — right for landmark queries whose
    reached set stays node-sized; set it False when the frontier
    itself outgrows broadcast room (the k_core ``broadcast_keep``
    rule; edges then hash-shuffle per hop).

    The per-hop fixpoint test (empty frontier → stop early) is one
    count on the hop's OWN checkpoint — no extra job.  Sets
    :data:`last_bfs_hops` to the number of expansion hops that found
    at least one new node, so the suite oracle's recursive-CTE unroll
    bound is checkable against the measured depth.
    """
    global last_bfs_hops
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    # canonicalize + dedup the UNDIRECTED edge once; the symmetrized
    # union of two column-swapped projections of a deduped u<v list
    # cannot collide, so NO post-union distinct (a full edge shuffle)
    # is ever needed.  Callers whose edge list is ALREADY distinct
    # with u < v (pair_edges output) pass ``edges_distinct=True`` and
    # skip the canonicalization shuffle too — duplicate edges would
    # only multiply join output, never change distances, so this is a
    # performance contract, not a correctness one.
    e = edges.select("u", "v")
    if not edges_distinct:
        e = (
            e.select(
                F.least("u", "v").alias("u"),
                F.greatest("u", "v").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
    sym = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint(eager=True)
    )
    settled = (
        seeds.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = settled.select("node")
    last_bfs_hops = 0
    for hop in range(1, max_hops + 1):
        fr = F.broadcast(frontier) if broadcast_frontier else frontier
        st = (
            F.broadcast(settled.select("node"))
            if broadcast_frontier
            else settled.select("node")
        )
        nxt = (
            sym.join(fr.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(st, "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        last_bfs_hops = hop
        # settled is a UNION of already-checkpointed per-hop frames —
        # the plan grows by one branch per hop (bounded by max_hops),
        # every branch is materialized, so NO re-checkpoint is needed
        # (3 fewer eager jobs than checkpointing the growing union).
        settled = settled.unionAll(nxt)
        frontier = nxt.select("node")
    return settled
