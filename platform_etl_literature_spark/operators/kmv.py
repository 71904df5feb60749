"""KMV (k minimum values) distinct-count sketches — the mergeable
cardinality estimator that, unlike HLL, is fully ORACLE-CHECKABLE.

Bar-Yossef et al. (RANDOM'02) / Beyer et al. (SIGMOD'07): hash every
value to a uniform point in [0, 1); the k-th smallest hash u_k of n
distinct values concentrates around k/n, so ``(k-1)/u_k`` is an
(unbiased, Beyer et al.) estimate of n.  The sketch IS the bottom-k
set of distinct hashes — a relational value (≤ k rows per group, like
the count-min grid), and:

* **exactly mergeable**: bottom-k of a union == bottom-k of the union
  of bottom-k sets (any hash among the union's k smallest is among its
  own part's k smallest) — so per-partition / per-day sketches roll up
  with NO approximation beyond the one already taken;
* **exact below k**: fewer than k distinct hashes means every distinct
  value is in the sketch — the estimator returns the true count;
* **engine-portable**: the hash is the md5-prefix integer used across
  this repo (here 15 hex digits = 60 bits, positive in any BIGINT),
  so a SQL engine replays sketch, merge, and estimate bit-for-bit —
  the HLL family's `hll_rollup` is rows-only for exactly this reason;
  KMV closes that gap.

Theta-sketch set operations (Dasgupta et al., the Apache DataSketches
theta model) come free: with theta = min(u_k^A, u_k^B), the hashes
below theta form a uniform sample of each set, so
``|A∩B sample below theta| / theta`` estimates the intersection —
the DISTINCT-overlap question, complementing ``sketch.cms_join_size``
(join multiplicity).

Scale shape: build is distinct → hash → per-group bottom-k window
(the distinct collapses duplicates map-side; the window sorts ≤ the
group's distinct hashes, and only k rows survive per group).  Merge
and estimate touch only sketch-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from platform_etl_literature_spark.operators.retrieval import ranked_topk

# 15 hex digits = 60 bits: positive in signed 64-bit in every engine
HASH_SPACE = float(16**15)


def _bottom_k(hashed: DataFrame, k: int, keys: list[str]) -> DataFrame:
    """(*keys, h, pos): the k smallest distinct hashes per group.

    Grouped: a window partitioned by the keys (sorts each group's
    distinct hashes).  Ungrouped: TakeOrderedAndProject via
    ranked_topk — NOT an unpartitioned window (single-reducer sort of
    every distinct hash; a literal partition key doesn't help, constant
    folding erases it before the physical check)."""
    if keys:
        w = Window.partitionBy(*keys).orderBy("h")
        return (
            hashed.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= k)
        )
    return ranked_topk(hashed, [F.col("h").asc()], k).withColumnRenamed(
        "rank", "pos"
    )


def _kmv_hash(col: str) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame, col: str, k: int, key_cols: list[str] | None = None
) -> DataFrame:
    """Bottom-k distinct-hash sketch per key group:
    (*key_cols, h, pos) with pos = 1..k by ascending hash."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = list(key_cols or [])
    hashed = (
        df.filter(F.col(col).isNotNull())
        .select(*keys, _kmv_hash(col).alias("h"))
        .distinct()
    )
    return _bottom_k(hashed, k, keys)


def kmv_merge(
    *sketches: DataFrame, k: int, key_cols: list[str] | None = None
) -> DataFrame:
    """Merge sketches built with the same hash: bottom-k of the union
    of the bottom-k sets — EXACTLY the sketch of the unioned data."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    keys = list(key_cols or [])
    out = sketches[0].select(*keys, "h")
    for s in sketches[1:]:
        out = out.unionByName(s.select(*keys, "h"))
    return _bottom_k(out.distinct(), k, keys)


def kmv_estimate(
    sketch: DataFrame, k: int, key_cols: list[str] | None = None
) -> DataFrame:
    """(*key_cols, n_sampled, est_distinct) per group: the true count
    when the group holds fewer than k hashes (everything was kept),
    else round((k-1) / u_k) with u_k = h_k / 2^60.  One division on
    identical operands — bit-identical cross-engine before the round."""
    keys = list(key_cols or [])
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.max(F.when(F.col("pos") == k, F.col("h"))).alias("_hk"),
    )
    est = F.when(
        F.col("n_sampled") < k, F.col("n_sampled").cast("double")
    ).otherwise(
        F.round((k - 1) * F.lit(HASH_SPACE) / F.col("_hk"), 0)
    )
    return agg.select(
        *keys, "n_sampled", est.cast("long").alias("est_distinct")
    )


def kmv_intersect_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int
) -> DataFrame:
    """Theta-model distinct-intersection estimate from two ungrouped
    sketches: one row (theta_h, n_common, est_intersection).

    theta = the smaller side's k-th hash (or the max kept hash when a
    side is exact — everything below it was kept); hashes below theta
    present in BOTH sketches are a uniform sample of A∩B at rate
    theta/2^60, so est = n_common · 2^60 / theta_h.
    """
    def _theta(s: DataFrame) -> DataFrame:
        # kth hash if the sketch is full, else +inf sentinel (exact
        # side imposes no threshold below the hash-space top)
        return s.agg(
            F.coalesce(
                F.max(F.when(F.col("pos") == k, F.col("h"))),
                F.lit(16**15).cast("long"),
            ).alias("t")
        )

    theta = (
        _theta(sketch_a).crossJoin(
            _theta(sketch_b).withColumnRenamed("t", "t2")
        )
        .select(F.least("t", "t2").alias("theta_h"))
    )
    common = (
        sketch_a.select("h")
        .join(sketch_b.select("h"), "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta_h"))
        .groupBy("theta_h")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # a join with zero surviving rows loses the theta row — restore it
    return (
        theta.join(common, "theta_h", "left")
        .select(
            "theta_h",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.round(
                F.coalesce("n_common", F.lit(0))
                * F.lit(HASH_SPACE)
                / F.col("theta_h"),
                0,
            )
            .cast("long")
            .alias("est_intersection"),
        )
    )


def kmv_pairwise_jaccard(
    sketch: DataFrame, k: int, group_col: str
) -> DataFrame:
    """All-pairs cross-group overlap matrix from ONE grouped KMV
    sketch — the operator that answers "how much do my corpus sources
    duplicate each other?" at 100 TB WITHOUT any data-sized pairwise
    join: each source is reduced to its bottom-k sketch (one pass,
    map-side combinable), and every pair estimate is computed on the
    k-row sketches alone.

    ``sketch`` is :func:`kmv_sketch` output ``(group_col, h, pos)``.
    For a pair (a, b) with thresholds theta_a, theta_b (the group's
    k-th hash, or the hash-space top when the group kept everything):

    * ``theta = min(theta_a, theta_b)`` — below it BOTH sketches hold
      ALL their group's hashes, a uniform sample of each set at rate
      theta/2^60 (Bar-Yossef et al., RANDOM'02; the theta-sketch
      set-operation model);
    * ``n_common`` / ``n_union`` = distinct hashes below theta in
      both / either sketch — exact integers;
    * ``jaccard = n_common / n_union`` (one division, rounded 6) and
      ``est_intersection = n_common · 2^60 / theta`` — an unbiased
      estimate of |A∩B|.

    Returns ``(g_a, g_b, theta_h, n_common, n_union, jaccard,
    est_intersection)`` for g_a < g_b.  Everything downstream of the
    sketch build is sketch-sized (n_groups · k rows); the pair frame
    is broadcast into the hash-equijoin that finds commons — no
    cartesian over data.
    """
    g = F.col(group_col)
    # ONE materialization of the sketch: every downstream frame (stats,
    # both below-counts, the common equijoin) re-references it, and
    # without the checkpoint each reference would replay the full
    # data-sized sketch build — the one pass that actually costs at
    # 100 TB.  Sketch size is n_groups · k rows; the checkpoint is free.
    sketch = sketch.select(group_col, "h", "pos").localCheckpoint(
        eager=True
    )
    stats = sketch.groupBy(group_col).agg(
        F.coalesce(
            F.max(F.when(F.col("pos") == k, F.col("h"))),
            F.lit(16**15).cast("long"),
        ).alias("_t")
    )
    pa = stats.select(g.alias("g_a"), F.col("_t").alias("_ta"))
    pb = stats.select(g.alias("g_b"), F.col("_t").alias("_tb"))
    pairs = (
        pa.join(pb, F.col("g_a") < F.col("g_b"))
        .select("g_a", "g_b", F.least("_ta", "_tb").alias("theta_h"))
        .localCheckpoint(eager=True)
    )
    sa = sketch.select(g.alias("g_a"), "h")
    sb = sketch.select(g.alias("g_b"), "h")
    # hashes below the pair's theta on each side
    below_a = (
        sa.join(F.broadcast(pairs), "g_a")
        .filter(F.col("h") < F.col("theta_h"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("_ka"))
    )
    below_b = (
        sb.join(F.broadcast(pairs), "g_b")
        .filter(F.col("h") < F.col("theta_h"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("_kb"))
    )
    common = (
        sa.join(sb, "h")
        .join(
            F.broadcast(pairs.select("g_a", "g_b", "theta_h")),
            ["g_a", "g_b"],
        )
        .filter(F.col("h") < F.col("theta_h"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("_kc"))
    )
    out = (
        pairs.join(F.broadcast(below_a), ["g_a", "g_b"], "left")
        .join(F.broadcast(below_b), ["g_a", "g_b"], "left")
        .join(F.broadcast(common), ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            "theta_h",
            F.coalesce("_kc", F.lit(0)).alias("n_common"),
            (
                F.coalesce("_ka", F.lit(0))
                + F.coalesce("_kb", F.lit(0))
                - F.coalesce("_kc", F.lit(0))
            ).alias("n_union"),
        )
    )
    jac = F.when(
        F.col("n_union") > 0,
        F.round(F.col("n_common") / F.col("n_union"), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        "g_a",
        "g_b",
        "theta_h",
        "n_common",
        "n_union",
        jac.alias("jaccard"),
        F.round(F.col("n_common") * F.lit(HASH_SPACE) / F.col("theta_h"), 0)
        .cast("long")
        .alias("est_intersection"),
    )
