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
