"""Declarative data-quality verification (the Deequ pattern).

Schelter et al., "Automating Large-Scale Data Quality Verification"
(VLDB'18): quality constraints are DECLARED (completeness, uniqueness,
compliance, bounds, referential integrity), translated to aggregate
METRICS computed by the engine, and judged against thresholds — the
report is itself a DataFrame, so a 100 TB table's health check is one
job, not a notebook of ad-hoc counts.

Metric passes:

* All single-row metrics (completeness / distinctness / compliance /
  min / max) compile into ONE ``agg`` over the table — a single scan
  with map-side partial aggregation; ``count(distinct)`` columns ride
  the same pass via Spark's Expand (one extra shuffle leg per distinct
  column, still no second scan of the parquet).
* Deequ-``uniqueness`` (share of values occurring exactly once) needs
  per-value counts — one ``groupBy(col)`` pass per checked column,
  shuffling only the column itself (column pruning keeps the scan
  slim).
* Referential integrity is a left join against the DISTINCT dimension
  keys (dimension side deduplicated first — at 100 TB the fact side
  crosses the wire once; a broadcast is AQE's call when the distinct
  key set is small).

The report schema is fixed: (check, target, metric, threshold,
passed).  ``metric`` is a DOUBLE: ratios are exact two-BIGINT
divisions (bit-identical in any engine), bounds are the raw column
value — rounded to 6 dp at the edge per the suite float policy.

Reference parity note: the reference engine hard-codes its quality
gates (e.g. the section allow-list and match-count thresholds in
Processing.scala / Grounding.scala); this operator is the declarative
generalization for the curation surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

REPORT_FIELDS = ("check", "target", "metric", "threshold", "passed")


def _report_struct(
    check: str, target: str, metric: Column, threshold: float, passed: Column
) -> Column:
    return F.struct(
        F.lit(check).alias("check"),
        F.lit(target).alias("target"),
        F.round(metric.cast("double"), 6).alias("metric"),
        F.lit(float(threshold)).cast("double").alias("threshold"),
        passed.alias("passed"),
    )


def verify(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run declarative checks against ``df``; returns the report frame.

    Each check is a dict with ``check`` in {completeness, distinctness,
    uniqueness, compliance, min, max} plus:

    * completeness/distinctness/uniqueness: ``column``, ``min_ratio``
    * compliance: ``name``, ``predicate`` (SQL boolean), ``min_ratio``
    * min / max: ``column``, ``bound`` (numeric; min checks ``>=``,
      max checks ``<=``)

    Degenerate inputs (zero rows, all-NULL columns) yield NULL
    metrics — ratio divisions use ``try_divide`` so 0/0 is NULL under
    ANSI mode rather than an error — and a NULL metric makes
    ``passed`` NULL = UNKNOWN; consumers must treat unknown as failed
    (main.run_dq's gate coalesces NULL to False).
    """
    single: list[Column] = []  # report structs over the one-row agg
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    uniq_cols: list[tuple[str, float]] = []

    for i, c in enumerate(checks):
        kind = c["check"]
        if kind == "completeness":
            aggs.append(F.count(c["column"]).alias(f"_m{i}"))
            metric = F.try_divide(F.col(f"_m{i}"), F.col("_n"))
            single.append(_report_struct(
                kind, c["column"], metric, c["min_ratio"],
                metric >= c["min_ratio"],
            ))
        elif kind == "distinctness":
            aggs.append(F.countDistinct(c["column"]).alias(f"_m{i}"))
            metric = F.try_divide(F.col(f"_m{i}"), F.col("_n"))
            single.append(_report_struct(
                kind, c["column"], metric, c["min_ratio"],
                metric >= c["min_ratio"],
            ))
        elif kind == "compliance":
            pred = F.expr(c["predicate"])
            aggs.append(
                F.sum(F.when(pred, 1).otherwise(0)).alias(f"_m{i}")
            )
            metric = F.try_divide(F.col(f"_m{i}"), F.col("_n"))
            single.append(_report_struct(
                kind, c["name"], metric, c["min_ratio"],
                metric >= c["min_ratio"],
            ))
        elif kind in ("min", "max"):
            agg = F.min(c["column"]) if kind == "min" else F.max(c["column"])
            aggs.append(agg.alias(f"_m{i}"))
            metric = F.col(f"_m{i}")
            passed = (
                metric >= c["bound"] if kind == "min" else metric <= c["bound"]
            )
            single.append(_report_struct(
                kind, c["column"], metric, c["bound"], passed
            ))
        elif kind == "uniqueness":
            uniq_cols.append((c["column"], c["min_ratio"]))
        else:
            raise ValueError(f"unknown check kind: {kind}")

    parts: list[DataFrame] = []
    if single:
        base = df.agg(*aggs)
        parts.append(
            base.select(F.explode(F.array(*single)).alias("_r"))
            .select("_r.*")
        )
    for col, min_ratio in uniq_cols:
        parts.append(uniqueness(df, col, min_ratio))
    if not parts:
        raise ValueError("no checks given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def uniqueness(df: DataFrame, column: str, min_ratio: float) -> DataFrame:
    """Deequ uniqueness: |values occurring exactly once| / |rows with a
    value| — 1.0 iff the column is a key.  One groupBy pass over the
    pruned column."""
    per = (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    agg = per.agg(
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).alias("_once"),
        F.sum("_c").alias("_n"),
    )
    metric = F.try_divide(F.col("_once"), F.col("_n"))
    return agg.select(
        _report_struct(
            "uniqueness", column, metric, min_ratio, metric >= min_ratio
        ).alias("_r")
    ).select("_r.*")


def referential_integrity(
    df: DataFrame,
    column: str,
    dim: DataFrame,
    dim_column: str,
    min_ratio: float = 1.0,
) -> DataFrame:
    """Share of non-null foreign keys present in the dimension.

    Left join against the deduplicated dimension keys; the metric is
    matched / non-null.  Append to a :func:`verify` report with
    ``unionByName``.
    """
    keys = dim.select(F.col(dim_column).alias("_dk")).distinct()
    fact = df.filter(F.col(column).isNotNull()).select(
        F.col(column).alias("_fk")
    )
    joined = fact.join(keys, fact["_fk"] == keys["_dk"], "left")
    agg = joined.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count("_dk").alias("_hit"),
    )
    metric = F.try_divide(F.col("_hit"), F.col("_n"))
    return agg.select(
        _report_struct(
            "referential", column, metric, min_ratio, metric >= min_ratio
        ).alias("_r")
    ).select("_r.*")


def metric_drift(
    history: DataFrame,
    current: DataFrame,
    cutoff: float = 3.5,
    min_history: int = 5,
) -> DataFrame:
    """Deequ-style metric ANOMALY gate: flag a run's metrics against
    the robust envelope of their own history — the temporal layer on
    top of :func:`verify`'s static thresholds (a completeness of 0.97
    can pass the static bound yet be a six-sigma collapse for THIS
    table).  ``history`` holds past report rows (check, target,
    metric) across runs; ``current`` holds one run's rows.

    Per (check, target): median + MAD over the history metrics (the
    Iglewicz-Hoaglin 0.6745 z, operators.robust's exact rank-selection
    medians — no sketch, engine-replayable), then

      passed = |0.6745·(metric − med)/mad| ≤ cutoff
      mad == 0  →  passed = (metric == med)   (degenerate history)
      fewer than ``min_history`` points → passed NULL = UNKNOWN
      (the run_dq gate coalesces NULL to failed — new metrics must
      earn their history before the gate trusts them).

    Returns (check, target, metric, med, mad, z, n_history, passed).
    Everything is metric-table-sized — the history frame is one slim
    row per (run × check), never data-sized."""
    from platform_etl_literature_spark.operators.robust import (
        grouped_median,
    )

    keys = ["check", "target"]
    h = history.select(*keys, F.col("metric").cast("double").alias("_x"))
    med = grouped_median(h, keys, "_x", out_col="_med")
    dev = h.join(med, keys).select(
        *keys, F.abs(F.col("_x") - F.col("_med")).alias("_d")
    )
    mad = grouped_median(dev, keys, "_d", out_col="_mad")
    nh = h.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_history"))
    cur = current.select(
        *keys, F.col("metric").cast("double").alias("metric")
    )
    j = (
        cur.join(F.broadcast(med), keys, "left")
        .join(F.broadcast(mad), keys, "left")
        .join(F.broadcast(nh), keys, "left")
    )
    z = F.round(
        0.6745 * (F.col("metric") - F.col("_med")) / F.col("_mad"), 6
    )
    passed = (
        F.when(
            F.coalesce(F.col("n_history"), F.lit(0)) < min_history,
            F.lit(None).cast("boolean"),
        )
        .when(F.col("_mad") == 0.0, F.col("metric") == F.col("_med"))
        .otherwise(F.abs(z) <= cutoff)
    )
    return j.select(
        *keys,
        F.round("metric", 6).alias("metric"),
        F.round("_med", 6).alias("med"),
        F.round("_mad", 6).alias("mad"),
        F.when(F.col("_mad") != 0.0, z).alias("z"),
        F.coalesce(F.col("n_history"), F.lit(0)).alias("n_history"),
        passed.alias("passed"),
    )


def chi2_drift(
    df: DataFrame,
    cat_col: str,
    side_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample chi-squared homogeneity test per key group over a
    CATEGORICAL column — the drift member for discrete distributions
    (language mix, source mix, label mix), completing the drift
    family: PSI (sketch-space, binned), KS (continuous, exact),
    chi-squared (categorical, exact counts).

    ``side_col`` is boolean: True rows are sample A, False sample B.
    Per category c with counts (a_c, b_c) and side totals (N_a, N_b),
    the expected counts under homogeneity are
    ``e_a = (a_c + b_c) * N_a / N``, ``e_b = (a_c + b_c) * N_b / N``
    and the statistic sums ``(a_c − e_a)²/e_a + (b_c − e_b)²/e_b``
    over categories.

    Exactness contract (the psi_drift pattern): every per-category
    term is per-row fixed-order double arithmetic on exact BIGINT
    counts — bit-identical cross-engine — then rounded to integer
    NANO-units; the cross-category reduction is an INTEGER sum, so
    accumulation order cannot perturb the result.  Returns
    ``(*key_cols, n_a, n_b, n_cats, dof, chi2_nano, chi2)``.

    Scale shape: one hash aggregate to (keys, category) count cells
    (map-side combine), one window for side totals, one hash
    aggregate for the fold — no sort, no join.
    """
    keys = list(key_cols or [])
    cells = (
        df.filter(F.col(cat_col).isNotNull())
        .groupBy(*keys, cat_col)
        .agg(
            F.sum(F.when(F.col(side_col), 1).otherwise(0)).alias("_a"),
            F.sum(F.when(F.col(side_col), 0).otherwise(1)).alias("_b"),
        )
    )
    return _chi2_fold(cells, keys)


def chi2_from_counts(
    cells_a: DataFrame,
    cells_b: DataFrame,
    cat_col: str,
    count_col: str = "cnt",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """:func:`chi2_drift` on PRE-AGGREGATED per-category counts — the
    composition entry point for stream-maintained state (per-batch
    (keys, cat, cnt) grids merge bucket-wise into EXACTLY the direct
    counts, so the integer nano-unit chi2 fold on merged state equals
    the raw-stream statistic bit-for-bit).  Categories absent on one
    side count zero there."""
    keys = list(key_cols or [])
    a = cells_a.select(
        *keys,
        cat_col,
        F.col(count_col).cast("long").alias("_a"),
        F.lit(0).cast("long").alias("_b"),
    )
    b = cells_b.select(
        *keys,
        cat_col,
        F.lit(0).cast("long").alias("_a"),
        F.col(count_col).cast("long").alias("_b"),
    )
    cells = (
        a.unionByName(b)
        .groupBy(*keys, cat_col)
        .agg(F.sum("_a").alias("_a"), F.sum("_b").alias("_b"))
    )
    return _chi2_fold(cells, keys)


def _chi2_fold(cells: DataFrame, keys: list[str]) -> DataFrame:
    """The shared chi-squared fold over (keys, cat, _a, _b) cells:
    exact expected counts per row, nano-unit term rounding, INTEGER
    cross-category sum."""
    w_all = Window.partitionBy(*keys)
    t = cells.select(
        *keys,
        "_a",
        "_b",
        F.sum("_a").over(w_all).alias("_na"),
        F.sum("_b").over(w_all).alias("_nb"),
    )
    n = (F.col("_na") + F.col("_nb")).cast("double")
    rowt = (F.col("_a") + F.col("_b")).cast("double")
    ea = rowt * F.col("_na").cast("double") / n
    eb = rowt * F.col("_nb").cast("double") / n
    da = F.col("_a").cast("double") - ea
    db = F.col("_b").cast("double") - eb
    term = da * da / ea + db * db / eb
    nano = F.round(term * 1000000000.0, 0).cast("long")
    return (
        t.select(*keys, "_na", "_nb", nano.alias("_t"))
        .groupBy(*keys)
        .agg(
            F.first("_na").alias("n_a"),
            F.first("_nb").alias("n_b"),
            F.count(F.lit(1)).alias("n_cats"),
            F.sum("_t").alias("chi2_nano"),
        )
        .select(
            *keys,
            "n_a",
            "n_b",
            "n_cats",
            (F.col("n_cats") - 1).alias("dof"),
            "chi2_nano",
            F.round(F.col("chi2_nano") / 1000000000.0, 6).alias("chi2"),
        )
    )


def benford_first_digit(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Benford first-significant-digit conformance check (Benford
    1938; Nigrini's fraud-audit standard): compare the observed
    first-digit distribution of a POSITIVE integral value column
    against log₁₀(1 + 1/d), with a chi-squared conformance statistic
    per key — the classic anomaly screen for fabricated or truncated
    numeric feeds.

    Engine-portable digit extraction: the first character of the
    BIGINT's decimal string — no float log₁₀ of the value anywhere
    (log10 of a double near a power of ten is the classic
    off-by-an-octave hazard).

    One map-side hash aggregate collapses the corpus to (key, digit)
    cells, then the statistic rides :func:`benford_from_counts` — the
    counts-based entry point that also composes bit-for-bit on
    stream-maintained cell state (the ks_from_counts /
    chi2_from_counts pattern).
    """
    keys = list(key_cols or [])
    v = F.col(value_col).cast("long")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    cells = (
        df.filter(v.isNotNull() & (v > 0))
        .groupBy(*keys, digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    return benford_from_counts(cells, key_cols=keys)


def benford_from_counts(
    cells: DataFrame,
    key_cols: list[str] | None = None,
    digit_col: str = "digit",
    count_col: str = "n_obs",
) -> DataFrame:
    """Benford conformance from pre-aggregated (keys, digit, count)
    cells — duplicate cells (per-batch grids from the streaming
    cell-count maintenance) are re-summed first, so the statistic on
    merged stream state equals the direct batch computation exactly.

    Absent digits still contribute their (0 − n·p)²/(n·p) term via a
    (keys × 1..9) spine, so the statistic is the real chi-squared,
    not a present-cells-only lower bound.

    Float parity: digit counts are exact BIGINTs; expected shares are
    per-row log10 doubles; each chi-squared term rounds to integer
    MICRO-UNITS before the (≤9-row) sum — the lm.py micro-nat
    discipline — so the reduction is order-free and the SQL oracle
    replays it bit for bit.

    Scale shape: everything after the (cell-sized) re-sum is
    digit-cell-sized — the 1..9 spine attaches via the sanctioned
    broadcast, windows run over ≤9-row partitions.

    Returns (*key, digit, n_obs, obs_p, exp_p, term_micro,
    chi2_micro) — ``chi2_micro`` is the per-key integer sum repeated
    on each digit row; divide by 10⁶ for the statistic (8 df).
    """
    keys = list(key_cols or [])
    cells = cells.groupBy(
        *keys, F.col(digit_col).cast("int").alias("digit")
    ).agg(F.sum(F.col(count_col).cast("long")).alias("n_obs"))
    spine = (
        cells.select(*keys).distinct()
        .crossJoin(
            F.broadcast(
                cells.sparkSession.range(1, 10).select(
                    F.col("id").cast("int").alias("digit")
                )
            )
        )
    )
    full = spine.join(cells, [*keys, "digit"], "left").select(
        *keys, "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
    )
    wk = Window.partitionBy(*[F.col(k) for k in keys])
    n = F.sum("n_obs").over(wk)
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    expected = n.cast("double") * exp_p
    term = (F.col("n_obs").cast("double") - expected) * (
        F.col("n_obs").cast("double") - expected
    ) / expected
    with_terms = full.select(
        *keys,
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / n.cast("double"), 6).alias(
            "obs_p"
        ),
        F.round(exp_p, 6).alias("exp_p"),
        F.round(term * 1000000.0, 0).cast("long").alias("term_micro"),
    )
    return with_terms.select(
        *keys,
        "digit",
        "n_obs",
        "obs_p",
        "exp_p",
        "term_micro",
        F.sum("term_micro").over(wk).alias("chi2_micro"),
    )
