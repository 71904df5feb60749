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

Skewed keys (one user = half the events) remain the hazard — the
per-key array lives in one task either way; mitigate upstream with AQE
skew handling or a two-level pre-aggregation when the recurrence allows
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
