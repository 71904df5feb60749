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
