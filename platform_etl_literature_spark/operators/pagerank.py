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

Scale shape: ranks are one slim row per node; each iteration is one
equijoin of edges⋈ranks on src (the only corpus-sized shuffle), a
hash agg by dst with map-side combine, and a left join back onto the
node list.  The rank frame is eagerly ``localCheckpoint``ed every
iteration — the components.py / bpe.py rule: persist is for DAG
reuse, CHECKPOINT is for iteration, otherwise analysis time grows
geometrically with rounds.

Reference parity note: the reference engine has no iterative graph
scoring; this extends the graph family (operators.graph,
operators.components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 10**9


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer floor division for non-negative longs (see module
    docstring for why not floor(a / b))."""
    return ((a - (a % b)) / b).cast("long")


def symmetrize(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Undirected (u, v) edge list → both directed arcs (src, dst)."""
    return edges.select(
        F.col(u).alias("src"), F.col(v).alias("dst")
    ).unionAll(edges.select(F.col(v).alias("src"), F.col(u).alias("dst")))


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """Exact-integer PageRank over directed (src, dst) edges.

    Returns (node, rank_nano, rank): ``rank_nano`` is the exact
    integer state after ``n_iter`` iterations; ``rank`` is
    ``rank_nano / scale`` rounded to 6 dp for reading.

    ``damping_pct`` is an integer percentage (85 = the classic 0.85)
    so the recurrence stays in integer arithmetic end to end.
    """
    if not (0 <= damping_pct <= 100):
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    # The edge list may be an expensive pair-generation chain; it is
    # read three ways below (nodes, outdeg, the join spine) and outdeg
    # again every iteration — persist both (DAG reuse, not iteration:
    # the persist/checkpoint rule).
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    )
    # One scalar to the driver (the ranking.py offsets precedent): N
    # parameterizes the teleport constant; everything mass-dependent
    # stays in-plan.
    n = nodes.count()
    tp = ((100 - damping_pct) * scale) // (100 * n)

    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    ranks = ranks.localCheckpoint(eager=True)
    edges_deg = edges.join(outdeg, "src").persist()

    for _ in range(n_iter):
        contrib = (
            edges_deg.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                _idiv(F.col("rank"), F.col("outdeg")).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_contrib"))
        )
        dangling = (
            ranks.join(
                outdeg.withColumnRenamed("src", "node"), "node", "left_anti"
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("_d"))
        )
        ranks = (
            ranks.select("node")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(tp)
                    + _idiv(
                        F.lit(damping_pct)
                        * (
                            F.coalesce(F.col("_contrib"), F.lit(0))
                            + _idiv(F.col("_d"), F.lit(n))
                        ),
                        F.lit(100),
                    )
                ).alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)

    edges_deg.unpersist()
    outdeg.unpersist()
    edges.unpersist()
    return ranks.select(
        "node",
        F.col("rank").alias("rank_nano"),
        F.round(F.col("rank") / F.lit(float(scale)), 6).alias("rank"),
    )
