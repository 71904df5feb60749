"""Per-key sequential time-series operators.

Prefix-dependent recurrences (row i depends on the whole prefix, not a
fixed frame) can't be expressed as window functions without O(n²)
frames — but they CAN stay JVM-side: collect the per-key values in
event order and fold them with the ``aggregate`` HOF.  That keeps the
whole operator inside whole-stage codegen — one shuffle on the group
key, O(group) memory for the ordered array, zero Python/Arrow boundary.
(Round 2 measured the grouped-map ``applyInPandas`` version of the same
fold at 60× the single-node oracle; the Arrow transfer plus a per-group
Python loop was the entire gap.)

Skewed keys (one user = half the events) remain the hazard for the
single-level fold — the per-key array lives in one task.  The EWMA
recurrence COMPOSES, though: a segment of the history folds to a
linear map e ↦ A·e + B (A = ∏(1−α) over the segment, B = the fold
seeded from 0), and maps chain as (A₂A₁, A₂B₁+B₂) — so
:func:`user_value_ewma_segmented` pre-aggregates bounded time
segments first and folds only the per-segment summaries per user,
capping task memory at the largest SEGMENT instead of the largest
USER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def user_value_ewma(
    events: DataFrame, alpha: float = 0.2, value_col: str = "value"
) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per user, in
    (ts, event_id) order: e_0 = v_0; e_i = α·v_i + (1−α)·e_{i−1}.

    Implemented as collect_list(struct) → array_sort → ``aggregate``
    fold — all Catalyst expressions.  Deterministic across engines:
    same operand order, same IEEE754 ops (the DuckDB oracle mirrors it
    with list_reduce over the identically-ordered list; note
    1.0 − 0.2 == 0.8 exactly in binary64, so the literal weights
    agree bit-for-bit too).

    The accumulator is a (n, e) struct, not a bare double with NULL as
    the "not started" sentinel: with the bare-double form a NULL value
    mid-stream nulls the accumulator and then silently RESTARTS the
    fold at the next non-null value, where list_reduce (seeded by the
    first element) propagates the NULL to the end.  The struct keeps
    the step count, so a NULL value poisons ``e`` permanently — the
    same contagion semantics as the oracle.
    """
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.col(value_col).alias("v")))
    )
    vals = F.transform(ordered, lambda s: s["v"])
    fold = F.aggregate(
        vals,
        F.struct(
            F.lit(0).alias("n"), F.lit(None).cast("double").alias("e")
        ),
        lambda acc, v: F.struct(
            (acc["n"] + 1).alias("n"),
            F.when(acc["n"] == 0, v)
            .otherwise(F.lit(alpha) * v + F.lit(1.0 - alpha) * acc["e"])
            .alias("e"),
        ),
        lambda acc: acc["e"],
    )
    return (
        events.select("user_id", "ts", "event_id", value_col)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(fold, 6).alias("ewma"),
        )
    )


def user_value_ewma_segmented(
    events: DataFrame,
    alpha: float = 0.2,
    value_col: str = "value",
) -> DataFrame:
    """Per-user EWMA via two-level segment composition — the whale-safe
    shape of :func:`user_value_ewma`.

    Level 1 groups (user, day) and folds each day's ordered values to a
    summary struct (m, A, B, es): m items, the linear-map coefficients
    A = ∏(1−α) and B = fold of α·v + (1−α)·b from b=0, and es = the
    seeded fold (first value seeds, the flat operator's semantics) in
    case this is the user's first nonempty segment.  Level 2 groups by
    user, sorts the (day-keyed) summaries, and chains them:
    e ← es for the first segment, e ← A·e + B after.  A user with 10⁶
    events across 1000 days now costs 1000 summaries in the final
    task, not a 10⁶-element array — task memory is bounded by the
    largest single DAY.

    Same recurrence as the flat fold, re-associated: results agree up
    to IEEE-754 re-association error (≪1e-9 for |v| ~ 1e3; both are
    rounded to 6 dp) and agree EXACTLY with this function's own DuckDB
    oracle, which replays the identical two-level operation order.
    NULL contagion matches the flat operator: a NULL value nulls B and
    es for its segment, and A·e+B propagates the null to every later
    segment.  Inside the level-1 lambda the fold arithmetic runs on
    null-coalesced values with an explicit null COUNTER, and the NULL
    is applied at extraction: Spark's struct-accumulator HOF fold was
    observed dropping the null bit of an interior accumulator field
    when the aggregation holds multiple groups (b came back as its
    init 0.0 instead of NULL; single-group folds are correct), so the
    operator never relies on null propagation inside the lambda.

    Segment key: date_trunc('day', ts) as epoch seconds — cross-engine
    stable (the events_hourly pattern).
    """
    a = float(alpha)
    one_m = 1.0 - a
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.col(value_col).alias("v")))
    )
    vals = F.transform(ordered, lambda s: s["v"])
    seg_fold = F.aggregate(
        vals,
        F.struct(
            F.lit(0).alias("k"),
            F.lit(1.0).alias("a"),
            F.lit(0.0).alias("b"),
            F.lit(0.0).alias("e"),
            F.lit(0).alias("nn"),
        ),
        lambda acc, v: F.struct(
            (acc["k"] + 1).alias("k"),
            (acc["a"] * F.lit(one_m)).alias("a"),
            (F.lit(a) * F.coalesce(v, F.lit(0.0)) + F.lit(one_m) * acc["b"]).alias(
                "b"
            ),
            F.when(acc["k"] == 0, F.coalesce(v, F.lit(0.0)))
            .otherwise(
                F.lit(a) * F.coalesce(v, F.lit(0.0)) + F.lit(one_m) * acc["e"]
            )
            .alias("e"),
            (acc["nn"] + F.when(v.isNull(), 1).otherwise(0)).alias("nn"),
        ),
    )
    per_seg = (
        events.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("long").alias("seg"),
            "ts",
            "event_id",
            value_col,
        )
        .groupBy("user_id", "seg")
        .agg(F.count(F.lit(1)).alias("m"), seg_fold.alias("f"))
    )
    poisoned = F.col("f.nn") > 0
    segs = F.array_sort(
        F.collect_list(
            F.struct(
                "seg",
                "m",
                F.col("f.a").alias("a"),
                F.when(poisoned, F.lit(None).cast("double"))
                .otherwise(F.col("f.b"))
                .alias("b"),
                F.when(poisoned, F.lit(None).cast("double"))
                .otherwise(F.col("f.e"))
                .alias("es"),
            )
        )
    )
    combine = F.aggregate(
        segs,
        F.struct(
            F.lit(0).cast("long").alias("n"),
            F.lit(None).cast("double").alias("e"),
        ),
        lambda acc, s: F.struct(
            (acc["n"] + s["m"]).alias("n"),
            F.when(acc["n"] == 0, s["es"])
            .otherwise(s["a"] * acc["e"] + s["b"])
            .alias("e"),
        ),
    )
    return per_seg.groupBy("user_id").agg(
        combine.alias("_c")
    ).select(
        "user_id",
        F.col("_c.n").alias("n_events"),
        F.round(F.col("_c.e"), 6).alias("ewma"),
    )

def _parallel_grid(b: DataFrame) -> DataFrame:
    """Dense per-key bucket grid for the gap-fill resamplers, exploded
    in PARALLEL.  The (key, lo, hi) span aggregate is a few KB, so AQE
    coalesces its shuffle to one partition — blind to the ~10³× row
    amplification the sequence-explode behind it performs, which left
    the explode, the grid join AND both window passes on a single task
    (measured 1.5 s of the query's 1.9 s at sf0.1).  An explicit
    hash repartition on the key BEFORE the explode spreads the grid
    across the session cores; the explode output inherits the
    partitioning, so the per-key windows downstream still add no
    exchange.  The exchange itself moves only the tiny span frame, and
    the explicit partition count is cores-proportional (not a local
    constant) — at any scale the span frame stays key-sized and the
    explode amplification stays invisible to AQE, so the fan-out is
    exactly as necessary there as locally."""
    # The count must DIFFER from the aggregate's own exchange count
    # (spark.sql.shuffle.partitions): a repartition whose partitioning
    # exactly matches its child's (same key, same count) is stripped by
    # the planner, leaving only the ENSURE_REQUIREMENTS exchange — which
    # AQE then coalesces to one partition again.  2·cores+1 both
    # guarantees the mismatch and spreads uneven spans a little finer.
    par = 2 * b.sparkSession.sparkContext.defaultParallelism + 1
    return (
        b.groupBy("_u")
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .repartition(par, "_u")
        .select("_u", F.explode(F.sequence("_lo", "_hi")).alias("_b"))
    )


def gap_fill_ffill(
    events: DataFrame,
    bucket_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed per-key time
    grid with forward fill (the classic resample-and-ffill).

    Per key: a dense grid of ``bucket_seconds``-wide buckets from the
    key's first to last observation, LEFT-joined against the last
    observation inside each bucket (deterministic last = max
    (ts, id)), then ``last(value, ignorenulls=True)`` over an
    UNBOUNDED PRECEDING row frame carries the most recent observation
    across empty buckets.  ``is_filled`` marks carried rows.

    Scale shape: one shuffle on the key for the per-bucket reduction,
    one for the grid join, one window per key (the join and window
    reuse the same hash partitioning under AQE).  Grid size is bounded
    by span/bucket_seconds per key — the grid explode is lazy
    (``sequence`` + ``explode``), so no driver-side materialization.
    The leading bucket always holds an observation (the grid starts AT
    the first observation), so the fill never emits NULL.
    """
    from pyspark.sql.window import Window

    epoch = F.floor(F.col(ts_col).cast("double")).cast("long")
    b = events.select(
        F.col(user_col).alias("_u"),
        F.floor(epoch / F.lit(bucket_seconds)).cast("long").alias("_b"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    wn = Window.partitionBy("_u", "_b").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    obs = (
        b.withColumn("_rn", F.row_number().over(wn))
        .filter(F.col("_rn") == 1)
        .select("_u", "_b", "_v")
    )
    grid = _parallel_grid(b)
    wf = Window.partitionBy("_u").orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(obs, ["_u", "_b"], "left")
        .select(
            F.col("_u").alias(user_col),
            F.col("_b").alias("bucket_id"),
            F.last("_v", ignorenulls=True).over(wf).alias("value_ff"),
            F.when(F.col("_v").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_filled"),
        )
    )


def gap_fill_interpolate(
    events: DataFrame,
    bucket_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed per-key time
    grid with LINEAR INTERPOLATION — the numeric twin of
    :func:`gap_fill_ffill` (step-function carry) for quantities where
    a straight line between observations is the honest estimate
    (sensor readings, balances, rates).

    Per key: the same dense bucket grid as ``gap_fill_ffill``
    (``sequence`` + ``explode``, lazily generated in-task, one
    observation per bucket = deterministic last by (ts, id)), then two
    window passes stitch each empty bucket to its bracketing
    observations: ``last(value ignore nulls)`` looking back and
    ``first(value ignore nulls)`` looking forward, plus the matching
    bucket ids.  The interpolated value is

        prev + (next − prev) · (b − b_prev) / (b_next − b_prev)

    emitted UNROUNDED: there is no multi-row reduction here, so the
    value is bit-identical on any IEEE754 engine that replays the same
    operand bits in the same op order (the float-parity policy's safe
    case — the suite oracle floors to micro-units on both sides).  The
    grid spans first..last observation per key, so both brackets always
    exist; observed buckets interpolate to themselves (b == b_prev,
    taken as a copy of the observed value, no arithmetic).

    Scale shape: identical to ``gap_fill_ffill`` — one shuffle for the
    per-bucket reduction, one grid join, two window passes over the
    SAME (key, bucket) partitioning (Catalyst runs them in one Window
    exec pair without re-exchanging).  Grid size is bounded by
    span/bucket_seconds per key; nothing materializes on the driver.
    """
    from pyspark.sql.window import Window

    epoch = F.floor(F.col(ts_col).cast("double")).cast("long")
    b = events.select(
        F.col(user_col).alias("_u"),
        F.floor(epoch / F.lit(bucket_seconds)).cast("long").alias("_b"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    wn = Window.partitionBy("_u", "_b").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    obs = (
        b.withColumn("_rn", F.row_number().over(wn))
        .filter(F.col("_rn") == 1)
        .select("_u", "_b", "_v")
    )
    grid = _parallel_grid(b)
    # both brackets as RUNNING frames (unbounded-preceding..current):
    # Spark evaluates those incrementally in O(rows); the naive
    # [current, unboundedFollowing] frame re-scans to the partition
    # end for EVERY row — O(grid²) per key, measured 10.3 s vs 0.9 s
    # at sf0.1.  The forward bracket is the same running carry over
    # the REVERSED bucket order (one extra in-partition sort, no
    # extra exchange).
    wb = Window.partitionBy("_u").orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfd = Window.partitionBy("_u").orderBy(F.col("_b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    j = grid.join(obs, ["_u", "_b"], "left")
    prev_v = F.last("_v", ignorenulls=True).over(wb)
    prev_b = F.last(F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True).over(wb)
    next_v = F.last("_v", ignorenulls=True).over(wfd)
    next_b = F.last(F.when(F.col("_v").isNotNull(), F.col("_b")), ignorenulls=True).over(wfd)
    interp = F.when(F.col("_b") == prev_b, prev_v).otherwise(
        prev_v
        + (next_v - prev_v)
        * (F.col("_b") - prev_b).cast("double")
        / (next_b - prev_b).cast("double")
    )
    return j.select(
        F.col("_u").alias(user_col),
        F.col("_b").alias("bucket_id"),
        interp.alias("value_interp"),
        F.when(F.col("_v").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("is_observed"),
    )


def ohlc_bars(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    width_seconds: int = 3600,
    cents: int = 100,
) -> DataFrame:
    """Per-(keys, bucket) OHLC bars — the resample-and-summarize shape
    market-data and metrics pipelines run continuously: open = first
    value in the bucket, close = last, high/low = extrema, plus count
    and an exact volume sum.

    ONE map-side-combined aggregation: open/close are ``min_by`` /
    ``max_by`` on the (ts, id) struct — a total order (``id_col``
    unique), so the result is deterministic and engine-replayable with
    no window, no sort, no self-join.  Values are cent-scaled BIGINT
    inside the aggregate (the repo float-parity policy: multi-row
    double sums are order-dependent; integer sums are not) and
    rescaled on output.

    Returns (*keys, bucket_start, open, high, low, close, n,
    sum_value), bucket_start = epoch seconds floored to the bar width.

    NULL ticks are skipped entirely (the standard resampler contract):
    without the explicit filter, ``min_by``/``max_by`` order on
    (ts, id) regardless of the value, so a NULL-valued first tick
    would make ``open`` NULL while ``high``/``low`` (NULL-skipping
    aggregates) came from real ticks — an inconsistent bar.
    """
    if width_seconds <= 0:
        raise ValueError("width_seconds must be positive")
    vc = F.round(F.col(value_col) * cents, 0).cast("long")
    ts_s = F.col(ts_col).cast("long")
    order = F.struct(
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(id_col).alias("_id"),
    )
    bucket = (ts_s - (ts_s % width_seconds)).alias("bucket_start")
    money = lambda c: F.round(c / float(cents), 2)  # noqa: E731
    return (
        events.where(F.col(value_col).isNotNull())
        .select(*keys, bucket, vc.alias("_vc"), order.alias("_o"))
        .groupBy(*keys, "bucket_start")
        .agg(
            F.min_by("_vc", "_o").alias("_open"),
            F.max("_vc").alias("_high"),
            F.min("_vc").alias("_low"),
            F.max_by("_vc", "_o").alias("_close"),
            F.count(F.lit(1)).alias("n"),
            F.sum("_vc").alias("_sum"),
        )
        .select(
            *keys,
            "bucket_start",
            money(F.col("_open")).alias("open"),
            money(F.col("_high")).alias("high"),
            money(F.col("_low")).alias("low"),
            money(F.col("_close")).alias("close"),
            "n",
            money(F.col("_sum")).alias("sum_value"),
        )
    )


def seasonal_profile(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    period: str = "hour",
    cents: int = 1000000,
) -> DataFrame:
    """Per-key seasonal profile: decompose event values by calendar
    phase (hour-of-day or day-of-month) into the per-phase mean, its
    offset from the key's grand mean, and the phase's volume share —
    the additive-seasonality view (classical decomposition, e.g.
    Cleveland et al. STL, JOS 1990, whose seasonal component for a
    fixed period is exactly the per-phase mean of the detrended
    series; with no trend term this IS the seasonal estimate).  The
    profile is how a metrics pipeline answers "is this hourly dip
    seasonal or an incident" and feeds seasonally-adjusted anomaly
    cuts (robust.py twins).

    ONE map-side-combined aggregation keyed by (keys, phase) — the
    phase grid is tiny (≤ 31 rows per key), so the grand totals ride a
    per-key WINDOW over the aggregated grid, not a second scan.  Value
    sums are micro-scaled BIGINT inside the aggregate (float-parity
    policy: integer sums are order-free); each output is one exact
    division (or one subtraction of two such quotients) rounded at 6 —
    deterministic IEEE ops on identical operands in any engine.

    Returns (*keys, phase, n, mean_value, seasonal_offset,
    volume_share): ``seasonal_offset`` = phase mean − grand mean;
    ``volume_share`` = phase row share of the key's rows.  NULL values
    are skipped (the ohlc_bars resampler contract).

    ``period``: "hour" (0-23 hour of day) or "dom" (1-31 day of
    month) — both replay as ANSI ``extract``.
    """
    from pyspark.sql.window import Window

    if period == "hour":
        phase = F.hour(F.col(ts_col))
    elif period == "dom":
        phase = F.dayofmonth(F.col(ts_col))
    else:
        raise ValueError(f"period must be 'hour' or 'dom', got {period!r}")
    vc = F.round(F.col(value_col) * cents, 0).cast("long")
    grid = (
        events.where(F.col(value_col).isNotNull())
        .select(*keys, phase.alias("phase"), vc.alias("_vc"))
        .groupBy(*keys, "phase")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_vc").alias("_sum"))
    )
    w = Window.partitionBy(*[F.col(k) for k in keys])
    tot_n = F.sum("n").over(w)
    tot_sum = F.sum("_sum").over(w)
    mean = F.col("_sum") / F.col("n") / cents
    grand = tot_sum / tot_n / cents
    return grid.select(
        *keys,
        "phase",
        "n",
        F.round(mean, 6).alias("mean_value"),
        F.round(mean - grand, 6).alias("seasonal_offset"),
        F.round(F.col("n") / tot_n.cast("double"), 6).alias("volume_share"),
    )


def ts_shape_signature(
    series: DataFrame,
    id_col: str,
    pos_col: str,
    value_col: str,
    length: int,
    n_segments: int,
) -> DataFrame:
    """Deterministic integer SHAPE signature of fixed-length integer
    series — the PAA/SAX idea (Keogh et al., "Dimensionality Reduction
    for Fast Similarity Search in Large Time Series Databases",
    KAIS'01) made engine-portable: instead of z-normalized Gaussian
    breakpoints (float, engine-fragile), each of ``n_segments`` equal
    segments contributes one bit — is the segment's mean above the
    series mean?  In exact integers: ``seg_sum · n_segments >
    total_sum`` (both sides integral, no division).  The signature is
    the bit pattern plus the series' activity octave
    (``floor(log2(total+1))``, via the bin-string length of the
    BIGINT), so series only bucket together when BOTH shape and
    volume scale agree.

    ``series`` holds one row per (id, pos) with integral positions
    ``0..length-1`` (missing positions count 0 — sums, not means, so
    absence IS signal) and NON-NEGATIVE integral values (the octave is
    a bin-string length; fixed-point-shift signed series first).
    ``length`` must be divisible by ``n_segments``.  Returns
    (id, sig, total) — one row per id.

    This is the FIXED-resolution form (a documented instrument); the
    production similarity join :func:`ts_similar_pairs` uses the
    scale-ADAPTIVE refinement (``_adaptive_sig_from_vec``) whose
    resolution grows with the series count, so its bucket vocabulary
    — unlike this one's — does not saturate as the corpus grows (the
    round-9 occupancy finding: 16× series → 286× candidate pairs at
    fixed resolution).
    """
    if length % n_segments != 0:
        raise ValueError(
            f"length {length} not divisible by n_segments {n_segments}"
        )
    if n_segments > 30:
        raise ValueError("n_segments must be <= 30 (bit-packed int)")
    seg_len = length // n_segments
    pos = F.col(pos_col).cast("long")
    v = F.col(value_col).cast("long")
    segs = (
        series.filter((pos >= 0) & (pos < length))
        .groupBy(F.col(id_col).alias("id"), (pos / seg_len).cast("int").alias("_s"))
        .agg(F.sum(v).alias("_ss"))
    )
    w_all = Window.partitionBy("id")
    bits = segs.select(
        "id",
        F.sum("_ss").over(w_all).alias("_tot"),
        F.when(
            F.col("_ss") * n_segments > F.sum("_ss").over(w_all),
            F.expr("shiftleft(1, _s)"),
        )
        .otherwise(F.lit(0))
        .alias("_bit"),
    )
    return bits.groupBy("id").agg(
        (
            F.sum("_bit")
            + F.shiftleft(
                F.length(F.conv(F.first("_tot") + 1, 10, 2)).cast("int"),
                n_segments,
            )
        ).alias("sig"),
        F.first("_tot").alias("total"),
    )


def _pow2_long(c, max_exp: int):
    """``2^c`` as an exact BIGINT column for a small bounded integer
    column ``c`` in ``[0, max_exp]`` — a chained CASE, no float
    ``pow`` (float-parity policy).  Values beyond ``max_exp`` clamp
    (unreachable when the caller derives ``c`` from a capped
    schedule)."""
    out = F.when(c <= 0, F.lit(1).cast("long"))
    for k in range(1, max_exp):
        out = out.when(c == k, F.lit(1 << k).cast("long"))
    return out.otherwise(F.lit(1 << max_exp).cast("long"))


def _dense_series_vec(
    series: DataFrame,
    id_col: str,
    pos_col: str,
    value_col: str,
    length: int,
) -> DataFrame:
    """ONE hash aggregate collapsing each id to a DENSE length-L
    ``array<long>`` (missing positions are genuine zeros, so absence
    IS signal) plus its per-id sufficient statistics Σv and Σv² —
    materialized ONCE; the signature, candidate generation and BOTH
    verify sides of :func:`ts_similar_pairs` all read this cache.
    One row per (id, pos) per the caller contract; violations fail
    LOUDLY (``map_from_entries`` raises on duplicate keys).  Returns
    (_id, _arr, _s, _ss)."""
    from platform_etl_literature_spark.operators.dedup import (
        _materialize_once,
    )

    pos = F.col(pos_col).cast("long")
    zero = F.lit(0).cast("long")
    return _materialize_once(
        series.filter((pos >= 0) & (pos < length))
        .select(
            F.col(id_col).alias("_id"),
            pos.alias("_p"),
            F.col(value_col).cast("long").alias("_v"),
        )
        .groupBy("_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_p", "_v"))
            ).alias("_m")
        )
        .select(
            "_id",
            F.transform(
                F.sequence(zero, F.lit(length - 1).cast("long")),
                lambda i: F.coalesce(F.col("_m")[i], zero),
            ).alias("_arr"),
        )
        .select(
            "_id",
            "_arr",
            F.aggregate("_arr", zero, lambda a, x: a + x).alias("_s"),
            F.aggregate("_arr", zero, lambda a, x: a + x * x).alias(
                "_ss"
            ),
        )
    )


def _adaptive_sig_from_vec(
    vec: DataFrame,
    length: int,
    n_segments: int,
    sig_base_n: int,
    sig_max_extra_bits: int,
) -> DataFrame:
    """Scale-ADAPTIVE shape signature (the round-9 verdict fix): the
    fixed 1-bit-per-segment PAA signature saturates — its bucket
    vocabulary does not grow with the corpus, so occupancy (and the
    quadratic candidate volume) grows linearly (measured: 16× series
    → 286× pre-valve pairs).  The emb-LSH precedent (log2(n/25) bit
    schedule, ``dedup.embedding_cosine_pairs_lsh``) applied here:

    * ``b = min(sig_max_extra_bits, floor(log2(max(n //
      sig_base_n, 1))))`` EXTRA refinement bits, one per doubling of
      the series count ``n`` beyond ``sig_base_n`` — vocabulary grows
      ~2^b, keeping expected occupancy ~flat.  ``n`` rides a
      broadcast ONE-ROW aggregate crossJoin (the house pattern — no
      eager count, the plan stays lazy), and the identical integer
      schedule replays in the SQL oracle (``floor(log2(x))`` =
      bin-string length − 1).
    * The b bits spread ROUND-ROBIN over segments: segment s gets
      ``r_s = b DIV n_segments + (s < b % n_segments)`` refinement
      bits, so vocabulary grows 2× per bit, not 2^n_segments per
      step.
    * Segment s's LEVEL at resolution r is the dyadic refinement of
      its ratio-to-uniform-mean, in exact integers: ``level =
      least(2^(r+1) − 1, greatest(ss·n_segments·2^r − 1, 0) DIV
      greatest(tot, 1))`` — the count of strictly-exceeded thresholds
      k·tot/(n_segments·2^r), so at r = 0 it reproduces the original
      strict above-mean bit EXACTLY (b = 0 ⇒ bit-identical bucketing
      to the fixed signature; small corpora and the sf0.01 parity
      rows are unchanged).
    * Near-identical series keep recall 1.0 BY CONSTRUCTION at any
      resolution: equal segment sums ⇒ equal levels.

    The signature is a STRING ``octave|level_0|…|level_{k-1}`` (no
    variable-width bit packing, no overflow ceiling); buckets are an
    equijoin key either way.  Computed MAP-SIDE from the dense vector
    (slice folds — no shuffle beyond the vec build and the one-row
    count).  Returns (id, sig)."""
    zero = F.lit(0).cast("long")
    seg_len = length // n_segments
    nrow = vec.agg(F.count(F.lit(1)).alias("_n"))
    # floor(log2(max(n DIV base, 1))) = bin-string length − 1 — the
    # engine-portable integer log the octave already uses (bin(0) is
    # "0", length 1, so n < 2·base ⇒ b = 0)
    b = F.least(
        F.lit(sig_max_extra_bits),
        F.length(F.conv(F.expr(f"_n DIV {sig_base_n}"), 10, 2))
        - F.lit(1),
    ).cast("int")
    staged = (
        vec.crossJoin(F.broadcast(nrow))
        .withColumn("_b", b)
        .select(
            "_id",
            "_s",
            "_b",
            *[
                F.aggregate(
                    F.slice("_arr", s * seg_len + 1, seg_len),
                    zero,
                    lambda a, x: a + x,
                ).alias(f"_ss{s}")
                for s in range(n_segments)
            ],
        )
    )
    # exact integer level: operands stay BIGINT through SQL DIV (all
    # non-negative, so truncating DIV == floor on both engines)
    parts = [F.length(F.conv(F.col("_s") + 1, 10, 2)).cast("string")]
    for s in range(n_segments):
        r = (
            f"(_b DIV {n_segments}"
            f" + (CASE WHEN {s} < _b % {n_segments} THEN 1 ELSE 0 END))"
        )
        parts.append(
            F.expr(
                f"least(shiftleft(CAST(1 AS BIGINT), {r} + 1) - 1,"
                f" greatest(_ss{s} * {n_segments}"
                f" * shiftleft(CAST(1 AS BIGINT), {r}) - 1,"
                f" CAST(0 AS BIGINT))"
                f" DIV greatest(_s, CAST(1 AS BIGINT)))"
            ).cast("string")
        )
    return staged.select(
        F.col("_id").alias("id"),
        F.concat_ws("|", *parts).alias("sig"),
    )


def ts_similar_pairs(
    series: DataFrame,
    id_col: str,
    pos_col: str,
    value_col: str,
    length: int,
    n_segments: int = 7,
    min_r: float = 0.9,
    max_bucket_size: int | None = 256,
    signature_buckets: bool = True,
    sig_base_n: int = 1500,
    sig_max_extra_bits: int = 24,
) -> DataFrame:
    """Time-series similarity join: pairs of ids whose fixed-length
    integer series have Pearson correlation ≥ ``min_r`` — found by the
    house candidate-generation shape (REPOSE ICDE'21 / distributed
    series search EDBT'19 family, re-expressed): NEVER all-pairs.

    1. Each series reduces to its scale-ADAPTIVE shape signature
       (:func:`_adaptive_sig_from_vec` — the round-10 fix for the
       fixed signature's vocabulary saturation: ``floor(log2(n /
       sig_base_n))`` extra dyadic refinement bits spread round-robin
       over segments, one per doubling of the series count, the
       emb-LSH log2(n/25) precedent; at ``b = 0`` bit-identical
       bucketing to :func:`ts_shape_signature`).  One hash aggregate
       + a broadcast one-row count — data crosses the wire once.
    2. Candidates are a bucket EQUIJOIN on the signature (same
       refined shape levels + same activity octave), with the
       dedup-family hot-bucket valve (a flat/viral shape is a stop
       gram; ``None`` = exact).
    3. Candidate pairs verify by EXACT Pearson r from integral
       sufficient statistics: each id pre-collapses to a DENSE
       length-L ``array<long>`` vector (+ its Σv, Σv²) in ONE hash
       aggregate, the candidate join pulls both vectors in by id, and
       the cross moment Σ(va·vb) is a map-side ``zip_with`` dot
       product — no per-(pair, position) shuffle, the grouped_ols
       operand discipline (covariance cast to double before
       squaring).

    Missing positions are genuine zeros on both sides (the dense
    vector makes them explicit): the pair stats derive from n =
    ``length`` — exact, because absent cells contribute 0 to every
    sum.  ``series`` must hold at most one row per (id, pos);
    duplicates fail loudly (duplicate map key).

    Returns (id_a, id_b, r) with id_a < id_b, r rounded at 6.

    REGIME (measured, see the ts_recall suite row): the exact-match
    signature finds NEAR-IDENTICAL series — pairs whose segment
    profile agrees bit-for-bit (duplicated telemetry, bot cohorts,
    mirrored streams; recall 1.0 on planted near-duplicates, pinned
    by test).  It is NOT a low-threshold correlation join: when the
    target is the dense r ≥ 0.3 tail of unstructured series, truth
    is a constant fraction of ALL pairs and no sparse bucketing can
    recall it (sf0.01 events: 668/11,175 pairs are "truth", exact
    shape+octave candidates recall ~1% — the ts_recall row publishes
    exactly this number).  For that regime use
    ``signature_buckets=False``: the deliberate all-pairs mode
    (quadratic by construction) that doubles as the accountability
    row's ground truth — or mean-center the series and go through the
    ANN family (r == cosine of centered vectors).
    """
    from platform_etl_literature_spark.operators.dedup import (
        _drop_hot_buckets,
        _materialize_once,
    )

    if length % n_segments != 0:
        raise ValueError(
            f"length {length} not divisible by n_segments {n_segments}"
        )
    if n_segments > 30:
        raise ValueError("n_segments must be <= 30 (bit-packed int)")

    # The dense-vec cache (see _dense_series_vec) is the round-8
    # rewrite of the verify stage: the previous per-pair full-outer
    # cell align shuffled candidates×length (pair, pos) rows and
    # collapsed them with a second data-sized aggregate — candidate
    # growth × per-pair join fan-out broke 16× linearity (SCALE r7:
    # 205k → 95k rows/s).  Verification is a map-side zip_with dot
    # product on the pair join itself: the only shuffles are the
    # candidate equijoin and the two id-keyed array lookups, each
    # carrying fixed-length rows.
    zero = F.lit(0).cast("long")
    vec = _dense_series_vec(series, id_col, pos_col, value_col, length)
    if signature_buckets:
        # scale-adaptive signature, computed MAP-SIDE from the dense
        # vector (n_segments and seg_len are plan-time constants, so
        # each segment sum is a slice-fold expression — no extra
        # shuffle beyond the vec build and the broadcast one-row
        # count that drives the resolution schedule)
        sig = _drop_hot_buckets(
            _materialize_once(
                _adaptive_sig_from_vec(
                    vec, length, n_segments, sig_base_n,
                    sig_max_extra_bits,
                )
            ),
            ["sig"],
            max_bucket_size,
        )
        cand = (
            sig.select(F.col("id").alias("id_a"), "sig")
            .join(sig.select(F.col("id").alias("id_b"), "sig"), "sig")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
    else:
        ids = vec.select(F.col("_id").alias("id"))
        cand = (
            ids.select(F.col("id").alias("id_a"))
            .join(ids.select(F.col("id").alias("id_b")),
                  F.col("id_a") < F.col("id_b"))
        )
    # per-pair verify: two id-keyed equijoins bring in each side's
    # dense vector + precomputed Σv/Σv²; the cross moment Σ(va·vb) is
    # a zip_with dot product — pure map-side, exact BIGINT.
    # Verify-join strategy (the prefix_jaccard decision, round 9): a
    # forced broadcast of the vec table was built and A/B'd — NEUTRAL
    # locally (3.03 vs 2.96 s at 16×; a single-JVM "shuffle" is a
    # memory copy) and a row-count gate cannot see row WIDTH (length
    # is caller-chosen, so 2M ids × a length-365 array would force a
    # multi-GB hash relation — the exact heap failure the PPJoin
    # broadcast exhibited at 1/100th that size).  The SHUFFLE join
    # stays, the plan remains fully lazy (no eager count at build
    # time), and AQE elects a broadcast from its own byte-based
    # estimates where it actually fits.
    va = vec.select(
        F.col("_id").alias("id_a"),
        F.col("_arr").alias("_aa"),
        F.col("_s").alias("_sa"),
        F.col("_ss").alias("_saa"),
    )
    vb = vec.select(
        F.col("_id").alias("id_b"),
        F.col("_arr").alias("_ab"),
        F.col("_s").alias("_sb"),
        F.col("_ss").alias("_sbb"),
    )
    st = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            "_sa",
            "_sb",
            "_saa",
            "_sbb",
            F.aggregate(
                F.zip_with("_aa", "_ab", lambda x, y: x * y),
                zero,
                lambda a, x: a + x,
            ).alias("_sab"),
        )
    )
    n = F.lit(length).cast("long")
    cov_n = n * F.col("_sab") - F.col("_sa") * F.col("_sb")
    vara_n = n * F.col("_saa") - F.col("_sa") * F.col("_sa")
    varb_n = n * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    r = F.when(
        (vara_n > 0) & (varb_n > 0),
        cov_n.cast("double")
        / F.sqrt(vara_n.cast("double") * varb_n.cast("double")),
    )
    return (
        st.select("id_a", "id_b", F.round(r, 6).alias("r"))
        .filter(F.col("r") >= min_r)
    )


def ts_sig_occupancy(
    series: DataFrame,
    id_col: str,
    pos_col: str,
    value_col: str,
    length: int,
    n_segments: int = 7,
    max_bucket_size: int = 256,
    sig_base_n: int = 1500,
    sig_max_extra_bits: int = 24,
) -> DataFrame:
    """Signature-bucket occupancy accountability for
    :func:`ts_similar_pairs` (the emb_lsh_occupancy pattern — the
    instrument the r8 verdict's emb-LSH fix was built on): ONE row
    with the resolution schedule's extra-bit count, the bucket count,
    max/mean occupancy, the candidate-pair volume Σ s·(s−1)/2 the
    verify stage would pay WITHOUT the valve, the series count the
    hot-bucket valve drops, and the candidate volume after the valve
    — so a drifting 16× cell can be attributed to candidate growth vs
    hot-bucket skew vs verify cost from the numbers, not guessed.

    Measures the join's ACTUAL buckets: the same
    :func:`_adaptive_sig_from_vec` signature (same schedule params)
    ts_similar_pairs buckets on — the round-10 instrument check that
    the floor(log2(n/sig_base_n)) refinement schedule holds mean
    occupancy ~flat as the corpus grows (the fixed signature measured
    16× series → 286× candidates; ``extra_bits`` makes the schedule's
    engagement visible per factor).  ``mean_bucket_micros`` is the
    exact fixed-point mean ``n_series·10⁶ DIV n_buckets`` (integer
    parity policy — no rounded-double boundary cases).

    Scale shape: the signature aggregate + two hash aggregates;
    output is one row, no pair join anywhere.  Deterministic integer
    signature → full SQL oracle.
    """
    vec = _dense_series_vec(series, id_col, pos_col, value_col, length)
    sig = _adaptive_sig_from_vec(
        vec, length, n_segments, sig_base_n, sig_max_extra_bits
    )
    occ = sig.groupBy("sig").agg(F.count(F.lit(1)).alias("_s"))
    hot = F.col("_s") > F.lit(max_bucket_size)
    pairs = F.expr("_s * (_s - 1) DIV 2")
    return occ.agg(
        F.sum("_s").alias("n_series"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("_s").alias("max_bucket"),
        F.sum(pairs).alias("n_cand_pairs"),
        F.sum(F.when(hot, F.col("_s")).otherwise(F.lit(0).cast("long"))).alias(
            "n_hot_dropped"
        ),
        F.sum(
            F.when(~hot, pairs).otherwise(F.lit(0).cast("long"))
        ).alias("n_cand_after_valve"),
    ).select(
        F.least(
            F.lit(sig_max_extra_bits),
            F.length(
                F.conv(F.expr(f"n_series DIV {sig_base_n}"), 10, 2)
            )
            - F.lit(1),
        )
        .cast("int")
        .alias("extra_bits"),
        "n_series",
        "n_buckets",
        "max_bucket",
        "n_cand_pairs",
        "n_hot_dropped",
        "n_cand_after_valve",
        F.expr("n_series * CAST(1000000 AS BIGINT) DIV n_buckets").alias(
            "mean_bucket_micros"
        ),
    )


def cusum_changepoint(
    series: DataFrame,
    id_col: str,
    pos_col: str,
    value_col: str,
) -> DataFrame:
    """Exact CUSUM change-point detection per key (Page, Biometrika
    1954: the cumulative-sum control scheme): for an integral series
    y_1..y_n, the cumulative deviation from the key's own mean is

        S_d = Σ_{i<=d} (y_i − ȳ)

    and the change-point estimate is the position maximizing |S_d| —
    the classic single-shift CUSUM estimator.  Computed EXACTLY in
    scaled integers: ``S_d·n = n·cum_d − d·total`` (both terms
    BIGINT), so argmax and ties (smallest position wins) are
    engine-portable with no float anywhere; the reported ``cusum``
    statistic is the one boundary division ``s_max/(n·n)``-free form
    ``s_max_scaled / n`` rounded at 6.

    One map-side cell collapse (duplicate positions sum), one
    partitioned window over the ≤n positions per key, one argmax
    aggregate via min(struct) — no join, group-parallel.  Returns
    (*id, n_pos, total, cp_pos, s_max_scaled, cusum).  Overflow
    bound: ``n·|total| < 2^63``.
    """
    pos = F.col(pos_col).cast("long")
    v = F.col(value_col).cast("long")
    cells = (
        series.filter(pos.isNotNull() & v.isNotNull())
        .groupBy(F.col(id_col).alias("id"), pos.alias("_p"))
        .agg(F.sum(v).alias("_v"))
    )
    w_cum = (
        Window.partitionBy("id")
        .orderBy("_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("id")
    # rank of the position within the key (1-based d) and total
    stepped = cells.select(
        "id",
        "_p",
        F.row_number().over(Window.partitionBy("id").orderBy("_p")).alias(
            "_d"
        ),
        F.sum("_v").over(w_cum).alias("_cum"),
        F.sum("_v").over(w_all).alias("_tot"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
    )
    s_scaled = F.col("_n") * F.col("_cum") - F.col("_d") * F.col("_tot")
    scored = stepped.select(
        "id",
        "_p",
        "_n",
        "_tot",
        F.abs(s_scaled).alias("_abs"),
    )
    # argmax with smallest-position tiebreak: min over (-abs, pos)
    pick = scored.groupBy("id").agg(
        F.first("_n").alias("n_pos"),
        F.first("_tot").alias("total"),
        F.min(F.struct((-F.col("_abs")).alias("_neg"), F.col("_p"))).alias(
            "_m"
        ),
    )
    return pick.select(
        F.col("id"),
        "n_pos",
        "total",
        F.col("_m._p").alias("cp_pos"),
        (-F.col("_m._neg")).alias("s_max_scaled"),
        F.round(
            (-F.col("_m._neg")) / F.col("n_pos").cast("double"), 6
        ).alias("cusum"),
    )


def acf_lags(
    series: DataFrame,
    id_col: str,
    pos_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Per-key autocorrelation function: for each lag k = 1..max_lag,
    the EXACT Pearson correlation of the aligned pairs
    (y_t, y_{t−k}) over the key's observed positions (Box & Jenkins'
    sample ACF in its paired-Pearson form, which is well-defined on
    irregular/short series too).

    Float parity: duplicate positions collapse to one integral cell
    first (order-free BIGINT sums); every sufficient statistic
    (n, Σx, Σy, Σxy, Σx², Σy² per lag) is an exact conditional BIGINT
    sum over the lag-aligned rows; the correlation is the shared
    grouped-OLS closed form — covariance cast to double BEFORE
    squaring — rounded at 6, so an SQL oracle replays it bit for bit.

    Scale shape: ONE partitioned window pass (ordered by position,
    ``max_lag`` lag columns ride the same frame — no self-join, no
    per-lag pass), ONE hash aggregate per key producing all
    6·max_lag statistics map-side-combinable, then a ``stack`` to
    (key, lag) rows — group-parallel, nothing corpus-shaped after the
    cell collapse, no single-partition funnel.  Overflow bound:
    ``n·Σy² < 2^63`` per key (fixed-point-scale values accordingly).

    Returns (*id, lag, n_pairs, r) — lags with fewer than 2 aligned
    pairs or zero variance on either side report NULL r.
    """
    pos = F.col(pos_col).cast("long")
    v = F.col(value_col).cast("long")
    cells = (
        series.filter(pos.isNotNull() & v.isNotNull())
        .groupBy(F.col(id_col).alias("id"), pos.alias("_p"))
        .agg(F.sum(v).alias("_x"))
    )
    w = Window.partitionBy("id").orderBy("_p")
    lagged = cells.select(
        "id",
        "_x",
        *[F.lag("_x", k).over(w).alias(f"_l{k}") for k in range(1, max_lag + 1)],
    )
    aggs = []
    for k in range(1, max_lag + 1):
        lk = F.col(f"_l{k}")
        present = lk.isNotNull()
        aggs += [
            F.count(lk).alias(f"n_{k}"),
            F.sum(F.when(present, F.col("_x"))).alias(f"sx_{k}"),
            F.sum(lk).alias(f"sy_{k}"),
            F.sum(F.col("_x") * lk).alias(f"sxy_{k}"),
            F.sum(F.when(present, F.col("_x") * F.col("_x"))).alias(f"sxx_{k}"),
            F.sum(lk * lk).alias(f"syy_{k}"),
        ]
    st = lagged.groupBy("id").agg(*aggs)
    stack_args = ", ".join(
        f"{k}, n_{k}, sx_{k}, sy_{k}, sxy_{k}, sxx_{k}, syy_{k}"
        for k in range(1, max_lag + 1)
    )
    long = st.selectExpr(
        "id",
        f"stack({max_lag}, {stack_args})"
        " AS (lag, n_pairs, sx, sy, sxy, sxx, syy)",
    )
    n = F.col("n_pairs").cast("long")
    covn = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varxn = n * F.col("sxx") - F.col("sx") * F.col("sx")
    varyn = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (n >= 2) & (varxn > 0) & (varyn > 0),
        covn.cast("double")
        / F.sqrt(varxn.cast("double") * varyn.cast("double")),
    )
    return long.select(
        F.col("id"),
        F.col("lag").cast("int").alias("lag"),
        F.coalesce(n, F.lit(0)).alias("n_pairs"),
        F.round(r, 6).alias("r"),
    )


def burstiness(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    min_gaps: int = 2,
) -> DataFrame:
    """Per-key inter-arrival burstiness (Goh & Barabási, EPL 2008):
    for the gaps g_1..g_n between consecutive events of a key,

        B = (σ − μ) / (σ + μ)          (−1 regular … 0 Poisson … →1 bursty)

    plus the coefficient of variation σ/μ — the behavioral signal that
    separates schedulers and bots (B≈−1) from humans (B>0).

    Float parity: gaps are exact integral SECONDS from the
    timestamp's microsecond epoch (integer floor division —
    engine-portable; sub-second gap structure truncates, documented);
    (n, Σg, Σg²) are order-free BIGINT sums; μ, sample σ, B, and cv
    are one fixed double sequence on those integers (variance keeps
    the integer numerator n·Σg²−(Σg)² intact until a single cast),
    rounded at 6.  Tied timestamps need no tiebreak: the gap MULTISET
    of a sorted multiset is permutation-invariant, so every statistic
    is deterministic even though the tie order isn't.  Seconds, not
    milliseconds, is the deliberate unit: the exact numerator needs
    per-key n·Σg² < 2⁶³, which millisecond gaps breach at month-scale
    spans (a 30-day span squared is 6.7e18 ms²) while second gaps
    keep ~year-scale headroom (n·(3.2e7)²·n — safe to n ~ 10⁴ gaps
    spanning a year).

    Scale shape: one partitioned window (lag over the key's own
    events) + one map-side-combinable hash aggregate — group-parallel,
    nothing corpus-shaped after the aggregate.

    Returns (*key, n_gaps, mean_s, std_s, burstiness, cv) for keys
    with at least ``min_gaps`` gaps (σ needs n ≥ 2).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy("_k").orderBy("_sec")
    gaps = (
        events.select(F.col(key_col).alias("_k"), us.alias("_us"))
        # integer floor-division — a double divide of a ~1.7e15 µs
        # epoch can round UP across the unit boundary before the
        # cast, flipping the gap by ±1 between engines
        .select("_k", F.expr("_us div 1000000").alias("_sec"))
        .select("_k", (F.col("_sec") - F.lag("_sec", 1).over(w)).alias("_g"))
        .filter(F.col("_g").isNotNull())
    )
    st = gaps.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("_g").alias("_s1"),
        F.sum(F.col("_g") * F.col("_g")).alias("_s2"),
    )
    n = F.col("n_gaps").cast("long")
    mean = F.col("_s1").cast("double") / n.cast("double")
    var = (n * F.col("_s2") - F.col("_s1") * F.col("_s1")).cast(
        "double"
    ) / (n * (n - 1)).cast("double")
    std = F.sqrt(var)
    b = F.when(std + mean > 0, (std - mean) / (std + mean))
    cv = F.when(mean > 0, std / mean)
    return st.filter(n >= max(int(min_gaps), 2)).select(
        F.col("_k").alias(key_col),
        "n_gaps",
        F.round(mean, 6).alias("mean_s"),
        F.round(std, 6).alias("std_s"),
        F.round(b, 6).alias("burstiness"),
        F.round(cv, 6).alias("cv"),
    )


def ccf_lags(
    series: DataFrame,
    id_col: str,
    pos_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Per-key cross-correlation function: for each lag
    k = −max_lag..+max_lag, the EXACT Pearson correlation of the
    aligned pairs (x_i, y_{i+k}) over the key's position-ranked
    observations — the lead/lag diagnostic (does metric x LEAD metric
    y by k steps?) that the ACF can't answer.  k > 0 means x leads y;
    k = 0 is the plain contemporaneous correlation.

    Float parity: duplicate positions collapse to one integral
    (x, y) cell first (order-free BIGINT sums); every sufficient
    statistic per lag is an exact conditional BIGINT sum over the
    alignment (lead(y, k) / lag(y, −k) columns); the correlation is
    the shared grouped-OLS closed form rounded at 6 — replayed
    bit-for-bit by an SQL oracle using the identical window
    alignment.

    Scale shape: ONE partitioned window pass carries all 2·max_lag+1
    shifted columns; ONE hash aggregate produces every statistic
    map-side-combinable; ``stack`` unpivots to (key, lag) rows —
    group-parallel, no self-join, no per-lag pass.  Overflow bound:
    per key n·Σv² < 2⁶³ for both metrics.

    Returns (*id, lag, n_pairs, r); lags with fewer than 2 aligned
    pairs or zero variance on either side report NULL r.
    """
    pos = F.col(pos_col).cast("long")
    xv = F.col(x_col).cast("long")
    yv = F.col(y_col).cast("long")
    # a position with no contribution to one metric counts 0 (sums,
    # not means — absence IS signal; pre-filter for drop semantics)
    cells = (
        series.filter(pos.isNotNull())
        .groupBy(F.col(id_col).alias("id"), pos.alias("_p"))
        .agg(
            F.coalesce(F.sum(xv), F.lit(0)).alias("_x"),
            F.coalesce(F.sum(yv), F.lit(0)).alias("_y"),
        )
    )
    w = Window.partitionBy("id").orderBy("_p")
    ks = list(range(-max_lag, max_lag + 1))

    def shifted(k):
        if k == 0:
            return F.col("_y")
        if k > 0:
            return F.lead("_y", k).over(w)
        return F.lag("_y", -k).over(w)

    lagged = cells.select(
        "id", "_x", "_y",
        *[shifted(k).alias(f"_y{'m' if k < 0 else ''}{abs(k)}") for k in ks],
    )
    aggs = []
    for k in ks:
        c = f"_y{'m' if k < 0 else ''}{abs(k)}"
        yk = F.col(c)
        present = yk.isNotNull()
        tag = f"m{abs(k)}" if k < 0 else str(k)
        aggs += [
            F.count(yk).alias(f"n_{tag}"),
            F.sum(F.when(present, F.col("_x"))).alias(f"sx_{tag}"),
            F.sum(yk).alias(f"sy_{tag}"),
            F.sum(F.col("_x") * yk).alias(f"sxy_{tag}"),
            F.sum(F.when(present, F.col("_x") * F.col("_x"))).alias(
                f"sxx_{tag}"
            ),
            F.sum(yk * yk).alias(f"syy_{tag}"),
        ]
    st = lagged.groupBy("id").agg(*aggs)
    stack_args = ", ".join(
        f"{k}, n_{t}, sx_{t}, sy_{t}, sxy_{t}, sxx_{t}, syy_{t}"
        for k, t in ((k, f"m{abs(k)}" if k < 0 else str(k)) for k in ks)
    )
    long = st.selectExpr(
        "id",
        f"stack({len(ks)}, {stack_args})"
        " AS (lag, n_pairs, sx, sy, sxy, sxx, syy)",
    )
    n = F.col("n_pairs").cast("long")
    covn = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varxn = n * F.col("sxx") - F.col("sx") * F.col("sx")
    varyn = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (n >= 2) & (varxn > 0) & (varyn > 0),
        covn.cast("double")
        / F.sqrt(varxn.cast("double") * varyn.cast("double")),
    )
    return long.select(
        F.col("id"),
        F.col("lag").cast("int").alias("lag"),
        F.coalesce(n, F.lit(0)).alias("n_pairs"),
        F.round(r, 6).alias("r"),
    )
