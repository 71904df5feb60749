"""Ordered-funnel conversion over event streams.

The classic product-analytics question — how many users performed
step 1, then step 2 strictly after it, then step 3 after that — as a
deterministic chained-min plan: the step-1 frontier is a per-user
``min(ts)`` aggregate, and each later frontier is the per-user
``min(ts)`` of that step's events STRICTLY after the previous
frontier.  Strict inequality makes the semantics order-free (ties at
the same timestamp never count as progress, so no tiebreak on event
ids is needed and any engine replays the same answer).

Scale shape: one filtered scan of the events table (only funnel step
types survive the pushed filter), then per step one equijoin on the
shrinking user frontier + one (user)-keyed min aggregate — all
map-side-combined, nothing corpus-sized after the first frontier.
The per-step report rows are single-row count aggregates.

A per-user fold over a collected event array would do this in one
pass but puts per-user history in task memory; the chained-min shape
keeps every stage an aggregate and is the one a 100 TB funnel wants
(steps is small and fixed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-step reach counts for the ordered funnel ``steps``:
    (step, step_idx, n_users) where n_users counts users whose
    chained strictly-increasing timestamps reach that step.  Repeated
    step types are fine (a second 'click' needs a click strictly
    after the first)."""
    if not steps:
        raise ValueError("funnel_conversion needs at least one step")
    e = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_s"),
        F.col(ts_col).alias("_ts"),
    )
    reach = (
        e.where(F.col("_s") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_t"))
    )
    outs = [
        reach.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(steps[0]).alias("step"),
            F.lit(1).alias("step_idx"),
            "n_users",
        )
    ]
    for i, st in enumerate(steps[1:], start=2):
        reach = (
            e.where(F.col("_s") == st)
            .join(reach, "_u")
            .where(F.col("_ts") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
        )
        outs.append(
            reach.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(st).alias("step"),
                F.lit(i).alias("step_idx"),
                "n_users",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_periods: int = 8,
) -> DataFrame:
    """Weekly retention cohorts — funnel's sibling report: users
    cohorted by the ISO week of their FIRST event, then counted as
    active in each 7-day period offset after it.  Period arithmetic is
    day-difference integer division (calendar-date based, so timezone
    and sub-day encoding differences can never shift a bucket), and
    every count is exact.

    Returns (cohort_week, period, cohort_size, n_active,
    retention_pct) for offsets [0, max_periods).  Scale shape: one
    per-user min aggregate, one equijoin of events against the
    user→cohort frame, a distinct on (cohort, user, period) — all
    map-side combined — and a final cohort-sized aggregation; the
    cohort-size frame broadcasts back."""
    e = events.select(
        F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
    ).where(F.col(user_col).isNotNull())
    first = e.groupBy("_u").agg(F.min("_ts").alias("_first"))
    cohorts = first.select(
        "_u",
        F.date_format(
            F.date_trunc("week", F.col("_first")), "yyyy-MM-dd"
        ).alias("cohort_week"),
        F.to_date("_first").alias("_d0"),
    )
    size = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    act = (
        e.join(cohorts, "_u")
        .select(
            "cohort_week",
            "_u",
            (
                F.datediff(F.to_date("_ts"), F.col("_d0")) / 7
            ).cast("long").alias("period"),
        )
        .where((F.col("period") >= 0) & (F.col("period") < max_periods))
        .distinct()
        .groupBy("cohort_week", "period")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        act.join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week",
            "period",
            "cohort_size",
            "n_active",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 4
            ).alias("retention_pct"),
        )
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_seconds: int = 172_800,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First/last-touch marketing attribution: every conversion event
    is credited to the earliest and the latest touch event (any of
    ``touch_types``) by the same user inside the lookback window
    ending at the conversion — the standard multi-touch attribution
    primitives, computed in ONE window pass.

    Semantics (deterministic, engine-replayable):
    * the window is ``[conv_ts − lookback, conv_ts]`` INCLUSIVE on
      both ends (a touch stamped exactly at the conversion counts);
    * last touch = max (ts, id) among in-window touches, first touch
      = min (ts, id) — ids break equal-timestamp ties, so the answer
      is a pure function of the table;
    * conversions with no in-window touch survive with NULL touch
      columns and ``n_touches = 0`` (they are the unattributable
      share — dropping them would silently inflate measured reach).

    Plan: one shuffle on the user key, then a single RANGE-framed
    window over microsecond event time computes all three statistics
    (``max(struct)``, ``min(struct)`` — struct extrema skip the NULL
    non-touch rows, exactly the ignore-nulls carry the as-of join
    uses — and a ``sum`` for the touch count); the conversion filter
    prunes afterwards.  No join, no per-user array: state per row is
    O(1), and the range frame is watermark-shaped (bounded past), so
    the same expression graph lifts onto a stream.

    At 100 TB: the window partitions by user — the usual whale
    hazard — but the frame carries three scalar accumulators, not the
    event history, so a celebrity user costs one task's SORT of its
    own events only (the asof.py segmented remedy applies unchanged
    if that sort itself is the bottleneck).
    """
    us = F.unix_micros(F.col(ts_col))
    is_touch = F.col(type_col).isin(*touch_types)
    touch = F.when(
        is_touch,
        F.struct(
            us.alias("t_us"),
            F.col(id_col).alias("t_id"),
            F.col(type_col).alias("t_type"),
        ),
    )
    from pyspark.sql.window import Window

    fr = (
        Window.partitionBy(user_col)
        .orderBy(us)
        .rangeBetween(-lookback_seconds * 1_000_000, 0)
    )
    enriched = events.select(
        F.col(user_col),
        F.col(id_col),
        F.col(type_col),
        us.alias("_us"),
        F.max(touch).over(fr).alias("_last"),
        F.min(touch).over(fr).alias("_first"),
        F.sum(is_touch.cast("long")).over(fr).alias("n_touches"),
    )
    return enriched.filter(F.col(type_col) == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        F.col(user_col),
        F.col("_us").alias("conversion_us"),
        F.col("_last.t_id").alias("last_touch_id"),
        F.col("_last.t_type").alias("last_touch_type"),
        F.col("_first.t_id").alias("first_touch_id"),
        F.col("_first.t_type").alias("first_touch_type"),
        F.col("n_touches"),
    )


def funnel_conversion_windowed(
    events: DataFrame,
    steps: list[str],
    max_step_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel with a PER-STEP conversion window: step i+1 must
    happen strictly after step i and within ``max_step_seconds`` of it
    — the product-analytics "convert within an hour" question.

    Correctness note (why this is NOT the chained-min of
    :func:`funnel_conversion` plus a bound): greedy earliest
    frontiers UNDERCOUNT under windows — a user whose earliest step-1
    is too early for any step-2 can still convert through a LATER
    step-1, so the exact semantics carries the full FEASIBLE-TIME SET
    per step: f₁ = all step-1 times; fᵢ = step-i times t with some
    prev ∈ fᵢ₋₁ satisfying prev < t ≤ prev + window.  Reach at step i
    = users with fᵢ nonempty.  Sets, not picks ⇒ deterministic, no
    tie rules, exact (pinned against brute-force chain search).

    Plan shape: per step one user-keyed EQUIJOIN with the range
    predicate as a residual condition + a distinct — candidate volume
    per user is (step-i events × feasible prev times), bounded by the
    per-user event counts exactly like the pair-edges valve; at
    100 TB the steps list is small and each join shrinks with the
    surviving user set.  Timestamps compare as integer microseconds
    (engine-exact)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if max_step_seconds <= 0:
        raise ValueError("max_step_seconds must be positive")
    win_us = max_step_seconds * 1_000_000
    e = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_s"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    )
    feas = (
        e.where(F.col("_s") == steps[0]).select("_u", "_us").distinct()
    )
    outs = [
        feas.select("_u")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.lit(steps[0]).alias("step"),
            F.lit(1).alias("step_idx"),
            "n_users",
        )
    ]
    for i, st in enumerate(steps[1:], start=2):
        nxt = e.where(F.col("_s") == st).select(
            "_u", F.col("_us").alias("_t")
        )
        feas = (
            nxt.join(feas, "_u")
            .where(
                (F.col("_t") > F.col("_us"))
                & (F.col("_t") <= F.col("_us") + F.lit(win_us))
            )
            .select("_u", F.col("_t").alias("_us"))
            .distinct()
        )
        outs.append(
            feas.select("_u")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_users"))
            .select(
                F.lit(st).alias("step"),
                F.lit(i).alias("step_idx"),
                "n_users",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
