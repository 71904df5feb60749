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
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "med",
    count_col: str | None = None,
) -> DataFrame:
    """Exact per-group median via distinct-value rank selection.

    Returns one row per key group: (*key_cols, out_col).  NULL values
    are excluded (SQL aggregate convention); empty groups don't appear.
    ``count_col`` additionally emits the group's non-null value count —
    it rides the rank-selection window that is computed anyway, so a
    caller that needs (median, n) gets both from ONE pass instead of
    re-aggregating the (possibly expensive) input a second time (round
    10: grouped_theil_sen's pair join was computed twice, once under
    the median's exchange and once under a separate count).
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
    sel = g.withColumn("_w", lo_in.cast("int") + hi_in.cast("int"))
    if count_col is not None:
        # the same w_all window value the rank bounds already use — no
        # extra pass, just kept as a column through the filter
        sel = sel.withColumn("_n_all", n)
    sel = sel.filter(F.col("_w") > 0)
    aggs = [(F.sum(F.col(value_col) * F.col("_w")) / F.lit(2.0)).alias(out_col)]
    if count_col is not None:
        aggs.append(F.min("_n_all").alias(count_col))
    return sel.groupBy(*key_cols).agg(*aggs)


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


def ks_2samp(
    df: DataFrame,
    value_col: str,
    side_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance per key group —
    the distribution-free drift test over RAW values that complements
    the sketch-space PSI monitor (operators.sketch.psi_drift): KS
    needs no binning choice and is sensitive to any distributional
    change, at the cost of touching the data instead of a persisted
    sketch.

    ``side_col`` is a boolean column: True rows form sample A, False
    rows sample B.  Returns one row per key group:
    ``(*key_cols, n_a, n_b, d_num, ks_d, ks_lambda)`` where

    * ``d_num = max over values |cum_a * n_b - cum_b * n_a|`` — the
      KS supremum in EXACT integer cross-multiplied form (the ECDF
      difference ``cum_a/n_a - cum_b/n_b`` over the common
      denominator ``n_a * n_b``), so the statistic itself is
      engine-portable bit-for-bit with NO float accumulation;
    * ``ks_d = d_num / (n_a * n_b)`` rounded at 6 — one division on
      identical integer operands;
    * ``ks_lambda = sqrt(n_a*n_b/(n_a+n_b)) * ks_d_unrounded`` — the
      scaled statistic compared against Kolmogorov-distribution
      critical values (1.358 for alpha=0.05); sqrt and one multiply
      are IEEE-correctly-rounded on identical operands.

    Scale shape: values collapse to ``(keys, value) → (count_a,
    count_b)`` cells by one hash aggregate (map-side combine — hot
    values cost one cell), the window pass sorts DISTINCT values per
    group, and the final max is another hash aggregate.  Overflow
    bound: ``cum * n`` products need ``n_a * n_b < 2^63`` — holds to
    ~3e9 rows per side per group; beyond that, pre-collapse or
    sample.
    """
    keys = list(key_cols or [])
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(
            F.sum(F.when(F.col(side_col), 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(F.col(side_col), 0).otherwise(1)).alias("_cb"),
        )
    )
    return _ks_fold(cells, value_col, keys)


def ks_from_counts(
    cells_a: DataFrame,
    cells_b: DataFrame,
    value_col: str,
    count_col: str = "cnt",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """:func:`ks_2samp` on PRE-AGGREGATED per-value counts — the
    composition entry point for stream-maintained state
    (streaming.sketches.cell_counts_maintain_writer lands per-batch
    (keys, value, cnt) grids; their bucket-wise merge is EXACTLY the
    direct build, so KS on the merged state equals KS on the raw
    stream bit-for-bit).  Each side is a (keys, value, cnt) frame;
    overlapping values align through the union-fold, absent values
    count zero on the missing side."""
    keys = list(key_cols or [])
    a = cells_a.select(
        *keys,
        value_col,
        F.col(count_col).cast("long").alias("_ca"),
        F.lit(0).cast("long").alias("_cb"),
    )
    b = cells_b.select(
        *keys,
        value_col,
        F.lit(0).cast("long").alias("_ca"),
        F.col(count_col).cast("long").alias("_cb"),
    )
    cells = (
        a.unionByName(b)
        .groupBy(*keys, value_col)
        .agg(F.sum("_ca").alias("_ca"), F.sum("_cb").alias("_cb"))
    )
    return _ks_fold(cells, value_col, keys)


def _ks_fold(
    cells: DataFrame, value_col: str, keys: list[str]
) -> DataFrame:
    """The shared KS supremum fold over (keys, value, _ca, _cb)
    cells: window cumsums, exact integer cross-multiplied max, one
    rounded division + sqrt at the boundary."""
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    stepped = cells.select(
        *keys,
        F.sum("_ca").over(w_cum).alias("_cuma"),
        F.sum("_cb").over(w_cum).alias("_cumb"),
        F.sum("_ca").over(w_all).alias("n_a"),
        F.sum("_cb").over(w_all).alias("n_b"),
    )
    agg = stepped.groupBy(*keys).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.max(
            F.abs(
                F.col("_cuma") * F.col("n_b") - F.col("_cumb") * F.col("n_a")
            )
        ).alias("d_num"),
    )
    d_raw = F.col("d_num") / (F.col("n_a") * F.col("n_b"))
    lam = F.sqrt(
        (F.col("n_a") * F.col("n_b"))
        / (F.col("n_a") + F.col("n_b")).cast("double")
    ) * d_raw
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        "d_num",
        F.round(d_raw, 6).alias("ks_d"),
        F.round(lam, 6).alias("ks_lambda"),
    )


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit ``y = intercept +
    slope * x`` from EXACT INTEGER sufficient statistics — the trend
    detector a metrics pipeline runs per entity (is this source's
    daily volume drifting up?) without any per-group sort or collect:
    one hash aggregate computes ``(n, Σx, Σy, Σxy, Σx², Σy²)`` with
    map-side partial combine, and the closed-form estimates are
    per-row arithmetic on the exact integers.

    ``x_col`` and ``y_col`` must be INTEGRAL columns by contract
    (longs; fixed-point scale doubles first — the repo-wide float
    policy), which makes every sufficient statistic an exact BIGINT:
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) is ONE double division of
    exact integers, r² squares the covariance AFTER casting the exact
    integer to double (the integer square would overflow first).
    Overflow bound: ``n·Σ|xy| < 2^63`` — with day-index x ≤ 31 and
    cent-scaled y this holds to ~10^14 cent-units per group; document
    or rescale beyond.

    Returns ``(*key_cols, n, slope, intercept, r2)``; slope/r2 NULL
    for degenerate groups (zero x-variance; r2 additionally NULL for
    zero y-variance), rounded at 6.
    """
    keys = list(key_cols or [])
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("_sx"),
            F.sum(y).alias("_sy"),
            F.sum(x * y).alias("_sxy"),
            F.sum(x * x).alias("_sxx"),
            F.sum(y * y).alias("_syy"),
        )
    )
    cov_n = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx_n = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary_n = F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.when(
        varx_n != 0, cov_n.cast("double") / varx_n.cast("double")
    )
    intercept = (F.col("_sy").cast("double") - slope * F.col("_sx")) / F.col(
        "n"
    )
    r2 = F.when(
        (varx_n != 0) & (vary_n != 0),
        (cov_n.cast("double") * cov_n.cast("double"))
        / (varx_n.cast("double") * vary_n.cast("double")),
    )
    return agg.select(
        *keys,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def grouped_theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: list[str] | None = None,
    max_group_points: int = 1024,
) -> DataFrame:
    """Per-group Theil-Sen robust slope (Theil '50 / Sen, JASA '68):
    the MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i), x_i < x_j —
    the 29.3%-breakdown trend estimator that shrugs off the outlier
    days that drag :func:`grouped_ols` (whose breakdown is 0%).  The
    intercept is the median of ``y_i − slope·x_i`` (Sen's standard
    companion estimator).

    Exactness: each pairwise slope is ONE division of exact integers
    (``x``/``y`` must be integral by contract — fixed-point scale
    first) — bit-identical cross-engine — and the median is the exact
    rank selection of :func:`grouped_median` over those doubles (at
    most two distinct values averaged, IEEE-exact), so a SQL oracle
    replaying the same pairs matches bit-for-bit before the final
    6 dp rounding.

    Scale shape: the pair join is per-group quadratic BY DESIGN
    (pairwise slopes ARE the estimator) — right for per-entity
    series of bounded length (days of a month, weeks of a year),
    guarded by ``max_group_points`` (groups above it are EXCLUDED,
    loudly countable by comparing output keys; the OLS fit is the
    escape hatch for unbounded groups).  Duplicate x positions
    within a group contribute no pair (vertical slope undefined).
    Returns (*key_cols, n, n_pairs, slope, intercept).
    """
    keys = list(key_cols or [])
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(*keys, x.alias("_x"), y.alias("_y"))
    )
    sizes = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    kept = base.join(
        F.broadcast(
            sizes.filter(F.col("_n") <= max_group_points).select(*keys)
        ),
        keys,
    )
    a = kept.select(*keys, F.col("_x").alias("_xa"), F.col("_y").alias("_ya"))
    b = kept.select(*keys, F.col("_x").alias("_xb"), F.col("_y").alias("_yb"))
    pairs = a.join(b, keys).filter(F.col("_xa") < F.col("_xb"))
    slopes = pairs.select(
        *keys,
        (
            (F.col("_yb") - F.col("_ya")).cast("double")
            / (F.col("_xb") - F.col("_xa")).cast("double")
        ).alias("_s"),
    )
    # ONE pass over the (quadratic) slopes frame: the median's rank
    # windows carry the pair count, so no second aggregation re-runs
    # the pair join (round 10; see grouped_median count_col)
    med = grouped_median(
        slopes, keys, "_s", out_col="_slope", count_col="n_pairs"
    )
    resid = kept.join(F.broadcast(med), keys).select(
        *keys,
        (F.col("_y").cast("double") - F.col("_slope") * F.col("_x")).alias(
            "_r"
        ),
    )
    icpt = grouped_median(resid, keys, "_r", out_col="_icpt")
    return (
        sizes.filter(F.col("_n") <= max_group_points)
        .join(F.broadcast(med), keys)
        .join(F.broadcast(icpt), keys)
        .select(
            *keys,
            F.col("_n").alias("n"),
            "n_pairs",
            F.round(F.col("_slope"), 6).alias("slope"),
            F.round(F.col("_icpt"), 6).alias("intercept"),
        )
    )


def gini(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Exact per-group Gini coefficient of a NON-NEGATIVE integral
    value column, via the rank form (Sen 1973):

        G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n      (x sorted ascending)

    Inequality/concentration readout: revenue per user, tokens per
    document, traffic per source.

    Float parity: ranks come from row_number over the value order —
    ties need no tiebreak because permuting equal values leaves
    Σ i·xᵢ unchanged — and both Σx and Σ i·xᵢ are exact order-free
    BIGINT sums; the two closing divisions are a fixed double
    sequence rounded at 6.  Overflow bound: per-group n·max(x)·n
    < 2⁶³ (10⁶ rows of 10⁶-cent values is 10¹⁸ — at the bound;
    shift the fixed point for wider groups).

    Scale shape: one partitioned window (rank within group) + one
    map-side-combinable hash aggregate — group-parallel.  Groups with
    Σx = 0 or n = 0 report NULL.

    Returns (*key, n, total, gini).
    """
    keys = list(key_cols or [])
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(v.asc())
    ranked = df.filter(v.isNotNull() & (v >= 0)).select(
        *keys,
        v.alias("_v"),
        F.row_number().over(w).cast("long").alias("_i"),
    )
    st = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").alias("total"),
        F.sum(F.col("_i") * F.col("_v")).alias("_si"),
    )
    n = F.col("n").cast("long")
    g = F.when(
        (F.col("total") > 0) & (n > 0),
        (F.lit(2.0) * F.col("_si").cast("double"))
        / (n.cast("double") * F.col("total").cast("double"))
        - (n + 1).cast("double") / n.cast("double"),
    )
    return st.select(*keys, "n", "total", F.round(g, 6).alias("gini"))


def mann_kendall(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: list[str] | None = None,
    max_group_points: int = 1024,
) -> DataFrame:
    """Per-group Mann-Kendall trend test (Mann '45 / Kendall '75) —
    the nonparametric significance companion to
    :func:`grouped_theil_sen`: S = Σ_{i<j} sign(y_j − y_i) over the
    x-ordered series, the tie-corrected variance

        Var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18

    and the continuity-corrected normal score Z = (S∓1)/√Var(S).
    Theil-Sen answers "how steep"; Mann-Kendall answers "is it real".

    Exactness: S and both variance numerators are pure BIGINT
    arithmetic (counts of sign pairs; tie-group cubes), so the one
    √ and division are per-row doubles on identical operands —
    engine-portable, SQL-replayable.  ``x``/``y`` integral by
    contract.

    Scale shape: the pair join is per-group quadratic BY DESIGN
    (S is a pairwise statistic), guarded by the same
    ``max_group_points`` loud-exclusion valve as Theil-Sen; tie
    correction is one extra value-keyed aggregate.  Duplicate x
    positions within a group COLLAPSE first by summing y (the
    cusum_changepoint cell-collapse discipline) — so n counts
    distinct positions, every retained pair has strict x order, and
    the n(n−1)(2n+5) variance term is consistent with the computed S
    (pairing-with-exclusion under the full-n variance understates
    |z| when x ties exist).

    Returns (*key, n, s, var_s_x18, z) — ``var_s_x18`` is the exact
    integer 18·Var(S); z is NULL when Var(S) = 0 (all values tied,
    or a single distinct position — such groups surface with s = 0
    rather than vanishing).
    """
    keys = list(key_cols or [])
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(*keys, x.alias("_x"))
        .agg(F.sum(y).alias("_y"))
    )
    sizes = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    kept = base.join(
        F.broadcast(
            sizes.filter(F.col("_n") <= max_group_points).select(*keys)
        ),
        keys,
    )
    a = kept.select(*keys, F.col("_x").alias("_xa"), F.col("_y").alias("_ya"))
    b = kept.select(*keys, F.col("_x").alias("_xb"), F.col("_y").alias("_yb"))
    pairs = a.join(b, keys).filter(F.col("_xa") < F.col("_xb"))
    s_agg = pairs.groupBy(*keys).agg(
        F.sum(
            F.when(F.col("_yb") > F.col("_ya"), 1)
            .when(F.col("_yb") < F.col("_ya"), -1)
            .otherwise(0)
        ).alias("s")
    )
    ties = (
        kept.groupBy(*keys, "_y")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tie_x18")
        )
    )
    n = F.col("_n").cast("long")
    var18 = n * (n - 1) * (2 * n + 5) - F.col("_tie_x18")
    z = F.when(
        (var18 > 0) & (F.col("s") > 0),
        (F.col("s") - 1).cast("double")
        / F.sqrt(var18.cast("double") / 18.0),
    ).when(
        (var18 > 0) & (F.col("s") < 0),
        (F.col("s") + 1).cast("double")
        / F.sqrt(var18.cast("double") / 18.0),
    ).when(var18 > 0, F.lit(0.0))
    return (
        sizes.filter(F.col("_n") <= max_group_points)
        # LEFT join: a single-position group produces no pairs row —
        # it must surface with s = 0, not vanish
        .join(F.broadcast(s_agg), keys, "left")
        .withColumn("s", F.coalesce(F.col("s"), F.lit(0).cast("long")))
        .join(F.broadcast(ties), keys)
        .select(
            *keys,
            n.alias("n"),
            "s",
            var18.alias("var_s_x18"),
            F.round(z, 6).alias("z"),
        )
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: list[str] | None = None,
    max_group_points: int = 1024,
) -> DataFrame:
    """Per-group Kendall rank correlation τ-b (Kendall, Biometrika
    1938; τ-b tie treatment per Kendall '45) — the rank-association
    companion to :func:`mann_kendall` (which tests ONE series against
    its x-order; τ-b measures agreement between TWO metrics):

        τ_b = (C − D) / √((n0 − n1)(n0 − n2))

    with C/D the concordant/discordant pair counts, n0 = n(n−1)/2,
    n1 = Σ_x-ties t(t−1)/2, n2 = Σ_y-ties t(t−1)/2.

    Exactness: C, D, n0, n1, n2 are pure BIGINT pair counts — the one
    √ and the division are per-row doubles on identical operands, so
    a SQL oracle replaying the same pair filter matches bit-for-bit
    before the 6 dp rounding.  ``x``/``y`` integral by contract
    (fixed-point scale first — the theil_sen rule).

    Scale shape: pairs are enumerated ONCE per unordered pair by the
    strict total order (_xa, _ya, _ia) < (_xb, _yb, _ib) over an
    in-group dense index — per-group quadratic BY DESIGN (τ IS a
    pairwise statistic), guarded by the same ``max_group_points``
    loud-exclusion valve as Theil-Sen / Mann-Kendall.  Unlike
    mann_kendall, duplicate x positions do NOT collapse: x-ties are
    part of τ-b's definition and land in n1.

    Returns (*key, n, concordant, discordant, tau_b) — tau_b is NULL
    when either tie product term is zero (all x or all y tied).
    """
    keys = list(key_cols or [])
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*keys, x.alias("_x"), y.alias("_y"))
    sizes = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    kept = base.join(
        F.broadcast(
            sizes.filter(F.col("_n") <= max_group_points).select(*keys)
        ),
        keys,
    )
    # dense in-group index: makes the pair enumeration a strict total
    # order even when whole (x, y) rows repeat (ties on BOTH columns
    # must still contribute n1 AND n2 pairs exactly once)
    from pyspark.sql.window import Window

    idx = F.row_number().over(
        Window.partitionBy(*(keys or [F.lit(1)])).orderBy("_x", "_y")
    )
    kept = kept.withColumn("_i", idx)
    a = kept.select(
        *keys,
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
        F.col("_i").alias("_ia"),
    )
    b = kept.select(
        *keys,
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        F.col("_i").alias("_ib"),
    )
    pairs = a.join(b, keys).filter(F.col("_ia") < F.col("_ib"))
    conc = (
        ((F.col("_xa") < F.col("_xb")) & (F.col("_ya") < F.col("_yb")))
        | ((F.col("_xa") > F.col("_xb")) & (F.col("_ya") > F.col("_yb")))
    )
    disc = (
        ((F.col("_xa") < F.col("_xb")) & (F.col("_ya") > F.col("_yb")))
        | ((F.col("_xa") > F.col("_xb")) & (F.col("_ya") < F.col("_yb")))
    )
    cd = pairs.groupBy(*keys).agg(
        F.sum(conc.cast("long")).alias("concordant"),
        F.sum(disc.cast("long")).alias("discordant"),
    )
    tx = (
        kept.groupBy(*keys, "_x")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*keys)
        .agg(
            (F.sum(F.col("_t") * (F.col("_t") - 1)) / 2)
            .cast("long")
            .alias("_n1")
        )
    )
    ty = (
        kept.groupBy(*keys, "_y")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*keys)
        .agg(
            (F.sum(F.col("_t") * (F.col("_t") - 1)) / 2)
            .cast("long")
            .alias("_n2")
        )
    )
    n = F.col("_n").cast("long")
    n0 = (n * (n - 1) / 2).cast("long")
    denom2 = (n0 - F.col("_n1")) * (n0 - F.col("_n2"))
    tau = F.when(
        denom2 > 0,
        (F.col("concordant") - F.col("discordant")).cast("double")
        / F.sqrt(denom2.cast("double")),
    )
    return (
        sizes.filter(F.col("_n") <= max_group_points)
        # LEFT: a 1-row group has no pairs — surface with zero counts
        .join(F.broadcast(cd), keys, "left")
        .withColumn(
            "concordant", F.coalesce("concordant", F.lit(0).cast("long"))
        )
        .withColumn(
            "discordant", F.coalesce("discordant", F.lit(0).cast("long"))
        )
        .join(F.broadcast(tx), keys)
        .join(F.broadcast(ty), keys)
        .select(
            *keys,
            n.alias("n"),
            "concordant",
            "discordant",
            F.round(tau, 6).alias("tau_b"),
        )
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    trim_pct: int = 5,
) -> DataFrame:
    """Per-group winsorized and trimmed means at ``trim_pct``% per
    tail (Tukey & McLaughlin, Sankhyā 1963) — the bounded-influence
    location estimates between the mean (0% breakdown) and
    :func:`grouped_median` (50%):

    * g = floor(n · trim_pct / 100) values are clipped (winsorized)
      or dropped (trimmed) from EACH tail, by exact rank;
    * winsorized mean replaces each clipped value with the nearest
      kept order statistic (rank g+1 low, rank n−g high);
    * trimmed mean averages ranks g+1 .. n−g only.

    Output columns name the clip count ``g_clip`` (not ``g``) so a
    caller's group-key alias never collides.

    Exactness: ``value_col`` integral by contract (fixed-point scale
    first); rank selection + integer sums make both numerators exact
    BIGINTs, so the two divisions are per-row doubles on identical
    operands — SQL-replayable bit-for-bit before the 6 dp rounding.

    Scale shape: ONE per-group sort window (rank + two order
    statistics via conditional aggregation) — group-parallel, no
    global sort, no pair join.  Returns
    (*key, n, g_clip, lo_clip, hi_clip, winsorized_mean,
    trimmed_mean).
    """
    from pyspark.sql.window import Window

    keys = list(key_cols or [])
    v = F.col(value_col).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *keys, v.alias("_v")
    )
    w = Window.partitionBy(*(keys or [F.lit(1)])).orderBy("_v")
    r = base.withColumn("_r", F.row_number().over(w))
    sz = r.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    g = F.floor(F.col("_n") * trim_pct / 100).cast("long")
    j = r.join(F.broadcast(sz), keys).withColumn("_g", g)
    lo = F.max(F.when(F.col("_r") == F.col("_g") + 1, F.col("_v")))
    hi = F.max(F.when(F.col("_r") == F.col("_n") - F.col("_g"), F.col("_v")))
    mid_sum = F.sum(
        F.when(
            (F.col("_r") > F.col("_g"))
            & (F.col("_r") <= F.col("_n") - F.col("_g")),
            F.col("_v"),
        )
    )
    agg = j.groupBy(*keys).agg(
        F.max("_n").alias("n"),
        F.max("_g").alias("g_clip"),
        lo.alias("lo_clip"),
        hi.alias("hi_clip"),
        mid_sum.alias("_mid_sum"),
    )
    n_l = F.col("n").cast("long")
    g_l = F.col("g_clip").cast("long")
    win_num = (
        F.col("_mid_sum") + g_l * F.col("lo_clip") + g_l * F.col("hi_clip")
    )
    trim_n = n_l - 2 * g_l
    return agg.select(
        *keys,
        "n",
        "g_clip",
        "lo_clip",
        "hi_clip",
        F.round(win_num.cast("double") / n_l.cast("double"), 6).alias(
            "winsorized_mean"
        ),
        F.round(
            F.col("_mid_sum").cast("double") / trim_n.cast("double"), 6
        ).alias("trimmed_mean"),
    )


def corr_matrix(
    df: DataFrame,
    value_cols: list[str],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group Pearson correlation matrix over M metric columns —
    every pairwise r from ONE aggregate pass (the multi-metric
    completion of :func:`grouped_ols`, which fits one (x, y) pair).

    All sufficient statistics (n, Σxᵢ, Σxᵢ², Σxᵢxⱼ for every i < j)
    are exact BIGINT sums out of a single map-side-combined aggregate;
    each r is then

        r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))

    — two sqrts and one division per pair on identical integer
    operands, engine-portable, SQL-replayable bit-for-bit before the
    6 dp rounding.  NULL handling is listwise: rows with ANY null
    metric are dropped (the standard complete-case matrix, and the
    only convention where one shared n makes the matrix consistent).

    ``value_cols`` integral by contract, scaled so n·max|xᵢ|·max|xⱼ|
    stays under 2⁶³ (dollars not cents for corpus-scale event values —
    the BIGINT-squaring trap: n·Σxy is the binding term).

    Scale shape: one hash aggregate keyed by the group (M(M+3)/2
    accumulators wide, never row-shaped) feeding an M²-sized unpivot —
    no window, no join, no second scan.  Returns
    (*key, x, y, n, corr) for i < j; ``corr`` NULL when either
    variance is 0.
    """
    if len(value_cols) < 2:
        raise ValueError("corr_matrix needs at least two value columns")
    keys = list(key_cols or [])
    cond = F.lit(True)
    for c in value_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        *keys, *[F.col(c).cast("long").alias(c) for c in value_cols]
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, ci in enumerate(value_cols):
        aggs.append(F.sum(F.col(ci)).alias(f"_s{i}"))
        aggs.append(F.sum(F.col(ci) * F.col(ci)).alias(f"_q{i}"))
        for j in range(i + 1, len(value_cols)):
            aggs.append(
                F.sum(F.col(ci) * F.col(value_cols[j])).alias(f"_c{i}_{j}")
            )
    stats = base.groupBy(*keys).agg(*aggs)
    n = F.col("_n")
    pair_rows = []
    for i, ci in enumerate(value_cols):
        for j in range(i + 1, len(value_cols)):
            cj = value_cols[j]
            num = n * F.col(f"_c{i}_{j}") - F.col(f"_s{i}") * F.col(f"_s{j}")
            vx = n * F.col(f"_q{i}") - F.col(f"_s{i}") * F.col(f"_s{i}")
            vy = n * F.col(f"_q{j}") - F.col(f"_s{j}") * F.col(f"_s{j}")
            r = F.when(
                (vx > 0) & (vy > 0),
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            )
            pair_rows.append(
                F.struct(
                    F.lit(ci).alias("x"),
                    F.lit(cj).alias("y"),
                    F.round(r, 6).alias("corr"),
                )
            )
    return stats.select(
        *keys,
        F.col("_n").alias("n"),
        F.explode(F.array(*pair_rows)).alias("_p"),
    ).select(*keys, "_p.x", "_p.y", "n", "_p.corr")


def corr_matrix_from_cells(
    cells: DataFrame,
    value_cols: list[str],
    count_col: str = "cnt",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """:func:`corr_matrix` on PRE-AGGREGATED joint value cells — the
    composition entry point for stream-maintained state (the
    ks_from_counts / benford_from_counts pattern):
    ``streaming.sketches.cell_counts_maintain_writer`` lands per-batch
    (keys, x₁..x_M, cnt) grids; their cell-wise merge is EXACTLY the
    direct build, and every sufficient statistic here is an integer
    Σ cnt·(term) — so the matrix computed from merged state equals
    the batch :func:`corr_matrix` bit-for-bit.

    Same output contract and overflow bound as :func:`corr_matrix`
    (the binding term gains a factor only if cells are coarser than
    rows — they are not: Σ cnt·x·y over cells == Σ x·y over rows).
    """
    if len(value_cols) < 2:
        raise ValueError("corr_matrix needs at least two value columns")
    keys = list(key_cols or [])
    cond = F.lit(True)
    for c in value_cols:
        cond = cond & F.col(c).isNotNull()
    w = F.col(count_col).cast("long")
    base = cells.filter(cond).select(
        *keys,
        w.alias("_w"),
        *[F.col(c).cast("long").alias(c) for c in value_cols],
    )
    aggs = [F.sum("_w").alias("_n")]
    for i, ci in enumerate(value_cols):
        aggs.append(F.sum(F.col("_w") * F.col(ci)).alias(f"_s{i}"))
        aggs.append(
            F.sum(F.col("_w") * F.col(ci) * F.col(ci)).alias(f"_q{i}")
        )
        for j in range(i + 1, len(value_cols)):
            aggs.append(
                F.sum(
                    F.col("_w") * F.col(ci) * F.col(value_cols[j])
                ).alias(f"_c{i}_{j}")
            )
    stats = base.groupBy(*keys).agg(*aggs)
    n = F.col("_n")
    pair_rows = []
    for i, ci in enumerate(value_cols):
        for j in range(i + 1, len(value_cols)):
            cj = value_cols[j]
            num = n * F.col(f"_c{i}_{j}") - F.col(f"_s{i}") * F.col(f"_s{j}")
            vx = n * F.col(f"_q{i}") - F.col(f"_s{i}") * F.col(f"_s{i}")
            vy = n * F.col(f"_q{j}") - F.col(f"_s{j}") * F.col(f"_s{j}")
            r = F.when(
                (vx > 0) & (vy > 0),
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            )
            pair_rows.append(
                F.struct(
                    F.lit(ci).alias("x"),
                    F.lit(cj).alias("y"),
                    F.round(r, 6).alias("corr"),
                )
            )
    return stats.select(
        *keys,
        F.col("_n").alias("n"),
        F.explode(F.array(*pair_rows)).alias("_p"),
    ).select(*keys, "_p.x", "_p.y", "n", "_p.corr")


#: Poisson(1) CDF cutoffs (k = 0..8), rounded to 12 dp — the inverse-CDF
#: table for deterministic bootstrap weights.  LITERALS by design: both
#: engines compare the same md5-uniform against the same constants, so
#: the weight draw is bit-identical (the hash_split rule); P(w > 9) ≈
#: 1.1e-7 is folded into w = 9.
POISSON1_CDF: tuple[float, ...] = (
    0.367879441171, 0.735758882343, 0.919698602929, 0.981011843124,
    0.996340153173, 0.999405815182, 0.999916758851, 0.999989750803,
    0.999998874797,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    n_boot: int = 50,
    alpha_pct: int = 5,
    salt: str = "boot",
) -> DataFrame:
    """Percentile bootstrap confidence interval for each group's mean
    via the POISSON bootstrap (Hanley & MacGibbon, '06; the
    one-pass-per-replicate resampling that works when n is unknown
    and rows are distributed — each row enters replicate b with a
    Poisson(1) multiplicity instead of a global n-draw, which is the
    only bootstrap a shared-nothing engine can run without
    materializing resamples).

    DETERMINISTIC by construction (no RNG): row i's weight in
    replicate b inverts the Poisson(1) CDF at the md5-uniform
    u = token_hash(salt‖b‖':'‖id) / 2³² — the hash_split discipline —
    so runs, engines, and repartitionings agree draw-for-draw, and the
    SQL oracle replays every weight exactly.

    Exactness: replicate sums are BIGINT Σ w·x (``value_col`` integral
    by contract); each replicate mean is one division; the CI bounds
    are EXACT nearest-rank order statistics over the B replicate means
    (lo = rank ⌈B·α/200⌉ from each end) — no interpolation, no float
    accumulation anywhere.

    Scale shape: the explode is rows × B (B bounded, default 50) into
    a map-side-combined (keys, b) aggregate — shuffle carries
    groups × B cells; the rank window runs over B rows per group.
    Returns (*key, n_rows, mean, ci_lo, ci_hi, n_boot) — one row per
    group; replicates that draw an empty resample (probability
    ~e^{-n·B}) are excluded from the rank order, with ranks over the
    surviving count.
    """
    from platform_etl_literature_spark.operators.dedup import token_hash

    if n_boot < 4:
        raise ValueError(f"n_boot must be >= 4, got {n_boot}")
    keys = list(key_cols or [])
    x = F.col(value_col).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *keys, F.col(id_col).cast("string").alias("_id"), x.alias("_x")
    )
    point = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum("_x").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean"),
    )
    rep = base.withColumn("_b", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))))
    u = token_hash(
        F.concat(
            F.lit(salt),
            F.col("_b").cast("string"),
            F.lit(":"),
            F.col("_id"),
        )
    ) / F.lit(4294967296.0)
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    cells = (
        rep.withColumn("_w", w.cast("long"))
        .groupBy(*keys, "_b")
        .agg(
            F.sum(F.col("_w") * F.col("_x")).alias("_ws"),
            F.sum("_w").alias("_wn"),
        )
        .filter(F.col("_wn") > 0)
        .withColumn(
            "_rm", F.col("_ws").cast("double") / F.col("_wn").cast("double")
        )
    )
    wr = Window.partitionBy(*(keys or [F.lit(1)])).orderBy("_rm", "_b")
    wc = Window.partitionBy(*(keys or [F.lit(1)]))
    ranked = cells.withColumn("_r", F.row_number().over(wr)).withColumn(
        "_bn", F.count(F.lit(1)).over(wc)
    )
    lo_rank = F.ceil(F.col("_bn") * alpha_pct / 200).cast("long")
    sel = ranked.withColumn("_lo_r", lo_rank).filter(
        (F.col("_r") == F.col("_lo_r"))
        | (F.col("_r") == F.col("_bn") + 1 - F.col("_lo_r"))
    )
    ci = sel.groupBy(*keys).agg(
        F.round(F.min("_rm"), 6).alias("ci_lo"),
        F.round(F.max("_rm"), 6).alias("ci_hi"),
    )
    return point.join(ci, keys).select(
        *keys,
        "n_rows",
        "mean",
        "ci_lo",
        "ci_hi",
        F.lit(n_boot).alias("n_boot"),
    )
