"""PageRank with exact integer mass — iterative graph scoring whose
result is bit-reproducible in ANY engine.

PageRank (Page et al., 1999) over float ranks is notoriously
non-portable: each iteration sums contributions per node, and
multi-row float sums depend on accumulation order.  This
implementation keeps ALL mass in integer nano-units (``scale`` = 1e9
per unit of probability), so every iteration is exact integer
arithmetic — sums are order-free, and a SQL engine replaying the same
recurrence produces the identical ranks, iteration for iteration:

    tp        = ((100 - dp) * scale) // (100 * N)         (teleport)
    contrib(v)= Σ_{(u,v) ∈ E} rank(u) // outdeg(u)
    D         = Σ_{u dangling} rank(u)                    (no out-edges)
    rank'(v)  = tp + (dp * (contrib(v) + D // N)) // 100

Floor division deliberately DROPS remainder mass (at most
``outdeg + N + 1`` nano-units per node per iteration) — the standard
price of fixed-point iteration; total mass stays within
``n_iter · (|E| + N)`` nano-units of 1.0, negligible at nano scale,
and the SEMANTICS are exactly defined, which is what makes the result
an oracle-checkable contract rather than a float race.

Integer division is computed as ``(a - a % b) / b`` : the numerator is
an exact multiple of ``b``, so the one double division is exact
(operands stay far below 2^52) — never ``floor(a / b)``, whose double
quotient can round UP across an integer boundary.

Scale shape — three structural rules, each measured (sf0.1,
2.4 M edges, 20 k nodes: 9.2 s → 3.9 s end to end):

1. **Static structure is hoisted OUT of the loop.**  The
   dangling-node set is a pure function of the edge list, so it is
   computed ONCE — and in the SAME single edge-sized shuffle that
   yields the node list and outdeg (outdeg(u) = count of src
   occurrences, so one map-side-combined sum over tagged endpoints
   replaces the naive outdeg-groupBy + endpoint-distinct + flag-join
   trio).  In the common case — a graph with NO dangling nodes
   (every symmetrized graph, since each node then carries an
   out-arc) — the per-iteration dangling aggregation and the
   broadcast of its scalar are skipped entirely: D ≡ 0 by
   construction, which is exactly what the recurrence reduces to.

2. **The rank frame is node-sized; broadcast it.**  ``contrib`` is a
   broadcast-hash join of the persisted edge spine against the slim
   (node, rank) frame — no edge-sized shuffle anywhere in the loop;
   the only shuffle is the map-side-combined groupBy whose traffic
   is bounded by N, not |E|.  When the node frame outgrows broadcast
   range (billions of nodes) pass ``broadcast_ranks=False`` to fall
   back to a shuffled join — edges and ranks then co-partition on
   the join key.

3. **The loop runs under loop-scoped shuffle settings.**  Every
   shuffle inside the iteration is node-bounded (partial aggregation
   collapses the edge-sized input map-side), so the right partition
   count scales with N — NOT with the session default sized for
   corpus-scale scans.  The loop temporarily sets
   ``spark.sql.shuffle.partitions`` to ``max(8, N // 50_000)`` and
   disables AQE (whose per-stage re-planning barriers cost more than
   they save on sub-second node-sized stages); both settings are
   restored in a ``finally``.  Setup work (edge distinct, outdeg,
   persist materialization) runs BEFORE the flip, under the
   session's corpus-scale settings.

The rank frame is eagerly ``localCheckpoint``ed every iteration —
the components.py / bpe.py rule: persist is for DAG reuse,
CHECKPOINT is for iteration, otherwise analysis time grows
geometrically with rounds.

Reference parity note: the reference engine has no iterative graph
scoring; this extends the graph family (operators.graph,
operators.components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 10**9

# One reduce partition per this many nodes in the loop's node-sized
# shuffles (floor 8): 20 k nodes → 8 partitions; 10⁹ nodes → 20 k.
_NODES_PER_LOOP_PARTITION = 50_000


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor division for non-negative longs (see module
    docstring for why not floor(a / b))."""
    return ((a - (a % b)) / b).cast("long")


def symmetrize(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Undirected (u, v) edge list → both directed arcs (src, dst).

    One-pass explode, not a self-union (round 11; the graph.py
    label_propagation precedent): a union's two branches each read
    ``edges`` — and with it the whole upstream pair-generation chain —
    TWICE while the consumer's cache is still cold (the sf0.1 profile
    showed the pair chain's exchanges computed once per branch).
    explode emits both arcs from one scan; same rows."""
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col(u).alias("src"), F.col(v).alias("dst")),
                F.struct(F.col(v).alias("src"), F.col(u).alias("dst")),
            )
        ).alias("_a")
    ).select("_a.src", "_a.dst")


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
    broadcast_ranks: bool = True,
    seeds: list | None = None,
) -> DataFrame:
    """Exact-integer PageRank over directed (src, dst) edges.

    Returns (node, rank_nano, rank): ``rank_nano`` is the exact
    integer state after ``n_iter`` iterations; ``rank`` is
    ``rank_nano / scale`` rounded to 6 dp for reading.

    ``damping_pct`` is an integer percentage (85 = the classic 0.85)
    so the recurrence stays in integer arithmetic end to end.
    ``broadcast_ranks=False`` switches the contrib join to a shuffled
    join for node frames too large to broadcast (see module
    docstring, rule 2).

    ``seeds`` switches to PERSONALIZED PageRank (Page et al. §6;
    the random surfer restarts at the seed set instead of uniformly):
    teleport mass — and redistributed dangling mass — lands only on
    the seeds, each getting ``((100-dp)·scale) // (100·|S∩V|)`` per
    iteration, and the initial mass sits entirely on the seeds.  The
    recurrence stays pure integer arithmetic, so the seeded variant
    is exactly as oracle-replayable as the uniform one; ranks decay
    with graph distance from the seeds — the "related to THESE
    entities" relevance propagation.  ``seeds`` is a small python
    list by contract (the filter-words/BPE-top-pairs bounded-collect
    rule); seeds absent from the graph are ignored (mass conserves
    over the present ones) and an entirely-absent seed set raises.
    """
    if not (0 <= damping_pct <= 100):
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    if seeds is not None and not seeds:
        raise ValueError("seeds must be a non-empty list (or None)")
    spark = edges.sparkSession

    # ---- setup: edge-sized work, session-scale shuffle settings ----
    # The edge list may be an expensive pair-generation chain; it is
    # read three ways below — persist (DAG reuse, not iteration: the
    # persist/checkpoint rule).
    edges = edges.persist()
    # ONE edge-sized shuffle yields the node list, outdeg, AND the
    # dangling flag together: outdeg(u) is the count of rows where u
    # appears as src, so a map-side-combined sum over tagged
    # endpoints replaces the outdeg groupBy + endpoint distinct +
    # flag join of the naive formulation (two edge shuffles → one).
    # Tagged endpoints via ONE explode, not a self-union (round 11):
    # the union's two branches each recomputed the edge chain while
    # this first action was still populating the cache above — the
    # sf0.1 profile showed the whole pair-generation chain paid twice
    # inside the node_stats stage.  Same rows, one scan.
    node_stats = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("node"), F.lit(1).alias("_s")
                    ),
                    F.struct(
                        F.col("dst").alias("node"), F.lit(0).alias("_s")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.node", "_e._s")
        .groupBy("node")
        .agg(F.sum("_s").alias("outdeg"))
        .persist()
    )
    # Static structure, computed ONCE: a node is dangling iff it has
    # no out-edges; only its rank MASS changes per iteration.
    nodes = node_stats.select(
        "node", (F.col("outdeg") == 0).alias("is_dangling")
    )
    if seeds is not None:
        nodes = nodes.withColumn("is_seed", F.col("node").isin(list(seeds)))
    outdeg = node_stats.filter(F.col("outdeg") > 0).select(
        F.col("node").alias("src"), "outdeg"
    )
    edges_deg = edges.join(F.broadcast(outdeg), "src").persist()
    # Two scalars to the driver in one job (the ranking.py offsets
    # precedent): N parameterizes the teleport constant, and an empty
    # dangling set lets the loop skip the D machinery entirely.
    st = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_dangling").cast("long")).alias("nd"),
        *(
            [F.sum(F.col("is_seed").cast("long")).alias("ns")]
            if seeds is not None
            else []
        ),
    ).collect()[0]
    n, n_dangling = st["n"], int(st["nd"] or 0)
    if seeds is None:
        ns = None
        tp = ((100 - damping_pct) * scale) // (100 * n)
    else:
        ns = int(st["ns"] or 0)
        if ns == 0:
            raise ValueError("no seed is present in the graph")
        tp = ((100 - damping_pct) * scale) // (100 * ns)

    # ---- loop: node-sized work, loop-scoped shuffle settings ----
    loop_parts = max(8, n // _NODES_PER_LOOP_PARTITION)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        keep_static = ["node"]
        if n_dangling:
            keep_static.append("is_dangling")
        if seeds is not None:
            keep_static.append("is_seed")
        base = nodes.select(*keep_static)
        init = (
            F.lit(scale // n)
            if seeds is None
            else F.when(F.col("is_seed"), F.lit(scale // ns)).otherwise(
                F.lit(0)
            )
        )
        ranks = base.withColumn(
            "rank", init.cast("long")
        ).localCheckpoint(eager=True)

        for _ in range(n_iter):
            rank_side = ranks.select(F.col("node").alias("src"), "rank")
            if broadcast_ranks:
                rank_side = F.broadcast(rank_side)
            contrib = (
                edges_deg.join(rank_side, "src")
                .select(
                    F.col("dst").alias("node"),
                    _idiv(F.col("rank"), F.col("outdeg")).alias("_c"),
                )
                .groupBy("node")
                .agg(F.sum("_c").alias("_contrib"))
            )
            if broadcast_ranks:
                contrib = F.broadcast(contrib)
            new_rank_mass = F.coalesce(F.col("_contrib"), F.lit(0))
            if n_dangling:
                # Dangling mass: filter + sum over the slim rank
                # frame — the SET is static (hoisted), no join.
                dangling = ranks.filter(F.col("is_dangling")).agg(
                    F.coalesce(F.sum("rank"), F.lit(0)).alias("_d")
                )
                joined = (
                    ranks.select(*keep_static)
                    .join(contrib, "node", "left")
                    .crossJoin(F.broadcast(dangling))
                )
                redist = _idiv(F.col("_d"), F.lit(n if ns is None else ns))
                if seeds is not None:
                    redist = F.when(F.col("is_seed"), redist).otherwise(
                        F.lit(0)
                    )
                new_rank_mass = new_rank_mass + redist
            else:
                joined = ranks.select(*keep_static).join(
                    contrib, "node", "left"
                )
            tp_term = (
                F.lit(tp)
                if seeds is None
                else F.when(F.col("is_seed"), F.lit(tp)).otherwise(F.lit(0))
            )
            ranks = joined.select(
                *keep_static,
                (
                    tp_term
                    + _idiv(F.lit(damping_pct) * new_rank_mass, F.lit(100))
                ).alias("rank"),
            ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_shuf)

    edges_deg.unpersist()
    node_stats.unpersist()
    edges.unpersist()
    return ranks.select(
        "node",
        F.col("rank").alias("rank_nano"),
        F.round(F.col("rank") / F.lit(float(scale)), 6).alias("rank"),
    )
