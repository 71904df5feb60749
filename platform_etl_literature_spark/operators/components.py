"""Connected components over candidate-pair edges — the stage that
turns near-duplicate PAIRS into duplicate CLUSTERS so a curation pass
can keep one survivor per cluster.

Spark-first design (100 TB scale)
---------------------------------
``connected_components`` implements the alternating **large-star /
small-star** algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): each node carries a current label
(the smallest node id it has seen); large-star hangs every
larger-than-center neighbor under the center's minimum neighbor,
small-star hangs the center and its smaller neighbors under the
overall minimum.  Both steps are pure DataFrame group-bys/joins —
no driver-side graph, no RDDs — and the edge set provably shrinks
toward the star forest in O(log² n) rounds (O(log n) observed), so
a 100 TB candidate graph converges in a handful of shuffles, each
keyed by node id (AQE handles the skewed hub nodes).

Convergence is detected by an edge-set fixpoint (count of changed
edges == 0) — one small aggregate per round, the standard price of an
iterative algorithm (same pattern as Word2Vec training).  Each round
is materialized with ``localCheckpoint(eager=True)``: unlike
``persist``, a checkpoint TRUNCATES the logical plan, and for a loop
that feeds its output back in that is load-bearing — with persist the
plan doubles every round and Catalyst analysis time grows
exponentially (measured: round 2 of a 3-edge graph took 27 s
persist-based, milliseconds checkpoint-based).  This is the inverse
of the candidate-pair case in dedup.py, where the plan is one level
deep and persist wins; the rule is: persist for DAG reuse,
checkpoint for iteration.

Oracle: min-reachable-id labeling is exactly what a recursive
transitive-closure CTE computes, so the suite checks this
value-for-value against DuckDB (suite.py: dedup_components /
dedup_survivors).

Reference parity note: the reference pipeline has no clustering stage
(its only dedup is distinct/dropDuplicates — Grounding.scala:547,560);
this extends the dedup family (SURVEY.md §7.6) to the full
pair→cluster→survivor curation chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, a: str, b: str) -> DataFrame:
    """(u, v) with u < v, deduped — the undirected edge set."""
    u = F.least(F.col(a), F.col(b))
    v = F.greatest(F.col(a), F.col(b))
    return (
        edges.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node, connect every strictly-larger neighbor to the
    node's minimum neighborhood label (including itself).

    Deliberately does NOT dedup its output: the only consumer is
    ``_small_star``, whose min-aggregation is duplicate-idempotent and
    whose own final dedup restores the canonical edge SET — so the
    (u, v)-keyed dedup exchange this used to pay per round bought
    nothing but a smaller intermediate (bounded ≤ 2|E| either way)."""
    nbrs = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    m = nbrs.groupBy("x").agg(F.min(F.least("x", "y")).alias("mn"))
    return (
        nbrs.join(m, "x")
        .filter(F.col("y") > F.col("x"))
        .select(
            F.least("y", "mn").alias("u"), F.greatest("y", "mn").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node, connect itself and every smaller-or-equal
    neighbor to the minimum of that set."""
    # orient edges toward the smaller endpoint: x is the center,
    # y ≤ x are its small neighbors (plus the center itself)
    nbrs = e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    withself = nbrs.unionAll(nbrs.select(F.col("x").alias("x"), F.col("x").alias("y")))
    m = withself.groupBy("x").agg(F.min("y").alias("mn"))
    return (
        withself.join(m, "x")
        .select(F.least("y", "mn").alias("u"), F.greatest("y", "mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def connected_components(
    edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every node appearing in ``edges`` with the smallest node
    id in its connected component.  Returns (id, component).

    Nodes with no edges are absent (callers add singletons with a left
    join — see :func:`dedup_survivors`).  Raises if the edge set has
    not reached the star-forest fixpoint within ``max_rounds``
    (alternating rounds converge in O(log² n) worst case; 25 covers
    any corpus that fits on hardware).
    """
    e = _canon_edges(edges, a, b).localCheckpoint(eager=True)

    # Per-round fixpoint trigger: the COUNT of the just-materialized
    # checkpoint (a near-free cached-RDD job — round 10 dropped the
    # previous (count, hash-sum) aggregation job here, one full
    # cache-scan action per round).  Equal counts do NOT declare the
    # fixpoint — they only decide when to pay for the exact proof
    # below — so a same-size-different-set round costs one wasted
    # exceptAll job, never a wrong answer.
    n_e = e.count()
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        n2 = e2.count()
        # exact fixpoint = set equality: no NEW edges (exceptAll empty)
        # AND no edges LOST (equal counts) — a round can strictly
        # shrink the set (e.g. a triangle loses its redundant edge),
        # and subset-only detection would declare a premature fixpoint
        # on a state that may not be a star forest yet.  The expensive
        # exceptAll scan runs only when the counts say the sets MIGHT
        # be equal (in practice: on the final round, rarely earlier);
        # both frames are materialized checkpoints, so the proof is
        # one slim scan when it does run.
        if n2 == n_e and e2.exceptAll(e).limit(1).count() == 0:
            e = e2
            break
        e, n_e = e2, n2
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    # star forest: every edge now points (component-min, member)
    return (
        e.select(F.col("u").alias("component"), F.col("v").alias("id"))
        .unionAll(e.select(F.col("u").alias("component"), F.col("u").alias("id")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
        .select("id", "component")
    )


def dedup_clusters(
    pairs: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """(component, cluster_size, member_ids sorted) per duplicate
    cluster — the human-auditable view of what near-dup detection
    found."""
    comp = connected_components(pairs, a, b)
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sort_array(F.collect_list("id")).alias("member_ids"),
        )
    )


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Resolve near-duplicate pairs to a curated corpus: every row of
    ``df`` keeps ``component`` (= its own id when untouched by any
    pair) and ``is_survivor`` — true iff the row is its component's
    minimum id.  Filtering on is_survivor keeps exactly one document
    per duplicate cluster plus all singletons.

    The component table is tiny (ids only), so the join back to the
    corpus broadcasts at any reasonable cluster count; the corpus
    itself is scanned once, map-side.
    """
    comp = connected_components(pairs, a, b)
    idc = F.col(id_col)
    return (
        df.join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("component", F.coalesce(F.col("component"), idc))
        .withColumn("is_survivor", (idc == F.col("component")).cast("boolean"))
    )


def dedup_survivors_by(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Quality-aware survivor resolution: like :func:`dedup_survivors`,
    but each cluster keeps its BEST document — highest ``score_col``,
    ties broken by lowest id — instead of blindly keeping the minimum
    id.  This is the policy real curation uses (drop the truncated or
    boilerplate-padded copy, keep the clean one).

    The ranking window partitions by component; cluster sizes are
    near-dup group sizes (small by construction — a corpus where one
    component is half the data is an input problem, not a plan
    problem), so the window shuffle is keyed as finely as the data
    allows.
    """
    from pyspark.sql.window import Window as W

    comp = connected_components(pairs, a, b)
    idc = F.col(id_col)
    labeled = (
        df.join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("component", F.coalesce(F.col("component"), idc))
    )
    rank = F.row_number().over(
        W.partitionBy("component").orderBy(F.col(score_col).desc(), idc.asc())
    )
    return labeled.withColumn("is_survivor", (rank == 1).cast("boolean"))


def cluster_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every document in a
    near-duplicate cluster inherits the split of its CLUSTER (hashed on
    the component id), so two near-copies can never straddle the
    train/eval boundary — the contamination mode a row-wise
    ``hash_split`` cannot prevent.  Singletons hash on their own id
    (their component), so the assignment stays stable as the corpus
    grows and is reproducible across engines (md5 bucket, no RNG).

    Composition: near-dup pairs → :func:`connected_components` →
    broadcast-join the tiny component table back to the corpus →
    map-side :func:`~platform_etl_literature_spark.operators.dedup.hash_split`
    on the component key.  Returns (id_col, component, split).
    """
    from platform_etl_literature_spark.operators.dedup import hash_split

    labeled = dedup_survivors(df, pairs, id_col, a, b)
    return hash_split(labeled, "component", weights, salt).select(
        id_col, "component", "split"
    )
