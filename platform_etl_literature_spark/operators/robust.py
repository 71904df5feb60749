"""Robust per-group outlier detection: exact median / MAD z-scores.

The classic robust alternative to mean/stddev z-scores (Iglewicz &
Hoaglin, "How to Detect and Handle Outliers", ASQC 1993): center on the
MEDIAN, scale by the MEDIAN ABSOLUTE DEVIATION, and flag
``|0.6745 * (x - med) / mad| > cutoff`` (0.6745 = Φ⁻¹(3/4) makes MAD a
consistent σ estimator under normality).  Mean/σ break down exactly
when outliers are present — each outlier inflates σ and masks itself;
the 50%-breakdown median/MAD pair does not.

Exact distributed median WITHOUT a per-group full sort of raw rows:
the value stream is first collapsed to ``(keys, value) → count`` by a
hash aggregate (map-side partial combine — duplicate-heavy columns
collapse before the exchange), then one window pass over the DISTINCT
values per group computes running counts, and the median ranks
``lo = floor((n+1)/2)``, ``hi = ceil((n+1)/2)`` are located inside the
running-count intervals — at most two distinct values survive per
group, and ``med = Σ(value · weight) / 2`` with weight = how many of
{lo, hi} fall in the value's interval.  The window sort is over
*distinct* values, so a million copies of a hot value cost one row.
For continuous doubles (distinct ≈ rows) this degrades gracefully to
the per-group sort every exact-selection algorithm needs; callers with
hot groups and no exactness requirement should reach for
``approx_percentile`` instead.

Float parity: the median sum folds at most TWO doubles (IEEE addition
is commutative — order-free), ``/2`` is exact in binary floating
point, and every downstream expression is per-row fixed-order
arithmetic — so a SQL oracle replaying the same rank selection matches
bit-for-bit, no rounding contract needed before the final output
rounding.

Reference parity note: the reference engine has no outlier operator;
this is the data-quality extension surface (cf. the reference's hard
count thresholds in Processing.scala's filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MAD_SIGMA = 0.6745  # Φ⁻¹(0.75): MAD → σ consistency constant


def grouped_median(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str = "med"
) -> DataFrame:
    """Exact per-group median via distinct-value rank selection.

    Returns one row per key group: (*key_cols, out_col).  NULL values
    are excluded (SQL aggregate convention); empty groups don't appear.
    """
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*key_cols)
    cum = F.sum("_cnt").over(w_cum)
    n = F.sum("_cnt").over(w_all)
    lo = F.floor((n + 1) / 2)
    hi = F.ceil((n + 1) / 2)
    lo_in = (cum - F.col("_cnt") + 1 <= lo) & (lo <= cum)
    hi_in = (cum - F.col("_cnt") + 1 <= hi) & (hi <= cum)
    sel = (
        g.withColumn("_w", lo_in.cast("int") + hi_in.cast("int"))
        .filter(F.col("_w") > 0)
    )
    return sel.groupBy(*key_cols).agg(
        (F.sum(F.col(value_col) * F.col("_w")) / F.lit(2.0)).alias(out_col)
    )


def robust_stats(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group robust location/scale: (*keys, n, med, mad)."""
    med = grouped_median(df, key_cols, value_col, "med")
    dev = df.join(med, key_cols).withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = grouped_median(dev, key_cols, "_dev", "mad")
    n = df.filter(F.col(value_col).isNotNull()).groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n")
    )
    return n.join(med, key_cols).join(mad, key_cols)


def robust_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    cutoff: float = 3.5,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Rows whose robust z-score exceeds ``cutoff`` in magnitude.

    Returns (*id_cols, *key_cols, value, med, mad, z) with ``z``
    rounded to 6 dp for output (the flag itself is decided on the
    unrounded value, identically in any engine replaying the same
    arithmetic).  Groups with ``mad = 0`` (over half the group at one
    value) have no defined robust scale and flag nothing — the
    Iglewicz-Hoaglin convention; a caller who wants the degenerate
    groups can read them off :func:`robust_stats`.

    Plan shape: two median passes (each: hash agg with map-side
    combine → one window over distinct values → slim agg) joined back
    to the full rows — the corpus crosses the wire once per join, the
    medians are one slim row per group (broadcast-size for any
    realistic key cardinality; AQE picks the broadcast).
    """
    ids = list(id_cols or [])
    stats = robust_stats(df, key_cols, value_col)
    z = (
        F.lit(MAD_SIGMA)
        * (F.col(value_col) - F.col("med"))
        / F.col("mad")
    )
    return (
        df.join(F.broadcast(stats), key_cols)
        .filter((F.col("mad") > 0) & (F.abs(z) > cutoff))
        .select(
            *ids,
            *key_cols,
            F.col(value_col),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(z, 6).alias("z"),
        )
    )


def weighted_median(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
    out_col: str = "wmed",
) -> DataFrame:
    """Exact per-group WEIGHTED (lower) median: the smallest value v
    whose cumulative weight in value order reaches half the group's
    total — the estimator aggregation pipelines want when rows carry
    multiplicities (a document row weighted by its token count, a
    file row by its bytes) and replicating rows weight-many times is
    not an option at scale.

    Weights must be POSITIVE INTEGERS (longs) by contract — the
    half-total comparison is then the exact integer test
    ``2·cum ≥ W`` with no division, so the selection is
    engine-portable bit-for-bit (fixed-point scale fractional weights
    first, the repo-wide float policy).  Rows with NULL or < 1
    weights raise rather than silently skewing the estimate.

    Same scale shape as :func:`grouped_median`: values collapse to
    (keys, value) → weight-sum cells map-side, the window pass runs
    over DISTINCT values per group, and exactly one row per group
    survives the rank test (the lower median needs no two-value
    averaging, so the output type is the VALUE's own type,
    undisturbed)."""
    bad = f"`{weight_col}` IS NULL OR `{weight_col}` < 1"
    guarded = df.withColumn(
        "_wv",
        F.expr(
            f"CASE WHEN {bad} THEN CAST(raise_error('weighted_median: "
            f"weights must be positive integers') AS BIGINT) "
            f"ELSE CAST(`{weight_col}` AS BIGINT) END"
        ),
    )
    g = (
        guarded.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, value_col)
        .agg(F.sum("_wv").alias("_w"))
    )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*key_cols)
    cum = F.sum("_w").over(w_cum)
    tot = F.sum("_w").over(w_all)
    sel = g.withColumn("_hit", (2 * cum >= tot) & (2 * (cum - F.col("_w")) < tot))
    return (
        sel.filter("_hit")
        .select(*key_cols, F.col(value_col).alias(out_col))
    )
