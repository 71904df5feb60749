"""Interval-overlap range join without a theta join.

Finds every pair of intervals that overlap — the classic range join
(genomics overlap, ad-slot conflicts, session collision) that SQL
engines run as an inequality join (DuckDB's IEJoin) and Spark, lacking
one, would execute as BroadcastNestedLoop or CartesianProduct: O(n²)
comparisons and a plan that dies at scale.

The Spark-first shape is bin-and-conquer (the standard partitioned
spatial-join construction, 1-D case):

1. pick a bin width ``w`` and explode each interval to the bins it
   covers — ``explode(sequence(floor(s/w), floor(e/w)))``, generated
   lazily INSIDE the task that owns the row, never on the driver;
2. hash-equijoin on the bin id — candidates are only pairs that share
   a bin, and the shuffle is a plain hash exchange that AQE can
   re-plan for skewed bins;
3. verify the exact overlap predicate in the join condition, and
4. dedup pairs spanning several shared bins WITHOUT a distinct: emit a
   pair only in its "meeting bin" ``floor(max(s_a, s_b)/w)`` — the
   first bin both cover — so each overlapping pair appears exactly
   once and no post-join shuffle is needed.

Losslessness: overlapping intervals satisfy max(s) <= min(e), so the
meeting bin is covered by BOTH intervals and the pair is found there;
non-overlapping pairs fail the verify predicate wherever they collide.
``tests/test_operators.py`` pins equality against a brute-force theta
join on randomized intervals (negative coordinates included — hence
``floor``, not integer division truncation).

Tuning ``w``: replication per interval is ~len/w + 1 rows, candidate
pressure per bin grows with w, so set w near the median interval
length.  A single giant interval replicates into len/w bins but each
bin-task verifies only its local candidates — the skew valve is the
same AQE skew-join split every hash join here gets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Bin ids use exact floor division in LONG arithmetic: F.floor(col/w)
# routes through double division, which misrounds near bin boundaries
# once the axis approaches 2^53 (epoch micros).  pmod >= 0, so
# (col - pmod(col, w)) is exactly divisible and `div` truncation == floor.


def _binned(iv: DataFrame, id_col: str, s: str, e: str, w: int, tag: str) -> DataFrame:
    return iv.select(
        F.col(id_col).alias(f"{tag}_id"),
        F.col(s).cast("long").alias(f"{tag}_s"),
        F.col(e).cast("long").alias(f"{tag}_e"),
    ).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"({tag}_s - pmod({tag}_s, {w})) div {w}"),
                F.expr(f"({tag}_e - pmod({tag}_e, {w})) div {w}"),
            )
        ),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "x",
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
    bin_width: int = 16,
) -> DataFrame:
    """Asymmetric range join: every point joined to each closed
    interval [s, e] containing it.  Returns all point columns plus the
    interval id as ``iv_id``.

    The shape that matters at 100 TB: only the (small) interval side
    explodes to its covering bins; each point maps to exactly ONE bin
    — a plain column, no Generate — so the corpus-sized side is
    shuffled once by bin and never replicated, and no dedup is needed
    (a containing interval covers the point's bin, and each pair meets
    in exactly that one bin).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = bin_width
    iv = _binned(
        intervals.where(F.col(start_col) <= F.col(end_col)),
        id_col,
        start_col,
        end_col,
        w,
        "iv",
    )
    px = points.withColumn(
        "_bin", F.expr(f"({point_col} - pmod({point_col}, {w})) div {w}")
    )
    return (
        px.join(
            iv,
            on=[
                px["_bin"] == iv["_bin"],
                F.col(point_col) >= F.col("iv_s"),
                F.col(point_col) <= F.col("iv_e"),
            ],
        )
        .select(*points.columns, F.col("iv_id"))
    )


def interval_overlap_join(
    intervals: DataFrame,
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
    bin_width: int = 16,
    min_overlap: int = 0,
) -> DataFrame:
    """Self-join: all pairs (a_id < b_id) of closed intervals [s, e]
    that overlap by at least ``min_overlap`` units.  Returns
    (a_id, b_id, overlap) with overlap = min(e) - max(s) (>= 0; closed
    endpoints touching count as 0-length overlap).

    Intervals must satisfy s <= e (rows violating it are dropped, they
    denote empty intervals); coordinates are cast to long — bin the
    axis yourself (epoch days/seconds) for timestamps.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    iv = intervals.where(F.col(start_col) <= F.col(end_col))
    a = _binned(iv, id_col, start_col, end_col, bin_width, "a")
    b = _binned(iv, id_col, start_col, end_col, bin_width, "b")
    w = bin_width
    meet = F.expr(
        f"(greatest(a_s, b_s) - pmod(greatest(a_s, b_s), {w})) div {w}"
    )
    overlap = F.least(F.col("a_e"), F.col("b_e")) - F.greatest(
        F.col("a_s"), F.col("b_s")
    )
    return (
        a.join(
            b,
            on=[
                a["_bin"] == b["_bin"],
                F.col("a_id") < F.col("b_id"),
                F.col("a_s") <= F.col("b_e"),
                F.col("b_s") <= F.col("a_e"),
                meet == a["_bin"],
                overlap >= F.lit(min_overlap),
            ],
        )
        .select("a_id", "b_id", overlap.alias("overlap"))
    )
