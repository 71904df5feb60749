"""Event sessionization — gap-based session assignment over an event
stream table, the batch analog of stateful streaming sessionization.

Classic two-window formulation (lag → boundary flag → running sum), all
JVM-side.  The only shuffle is the partitionBy(user) — at 100 TB that is
one hash shuffle on the user key; skewed power-users are handled by AQE
skew-join/partition splitting since no join is involved, and the
windows reuse the same partitioning (single exchange, two sorts fused).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_seconds``.

    Returns the input plus ``session_id`` (1-based per user).
    The (ts, id) ordering makes the result deterministic under ties.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    epoch = F.floor(F.col(ts_col).cast("double")).cast("long")
    prev = F.lag(epoch).over(w)
    new_session = F.when(
        prev.isNull() | ((epoch - prev) > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session rollup: session count, max/avg session sizes."""
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    per_session = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.avg("n_events"), 6).alias("avg_session_events"),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: counts of (prev_type → next_type) steps in exact
    (ts, event_id) order, with the row-normalized transition
    probability — the behavioral fingerprint a funnel can't express
    (funnels fix the step order; the matrix measures EVERY observed
    step).

    One lag window per key (high-cardinality partition key — no hot
    reducer), one map-side-combined count aggregation; the
    probability is one exact two-BIGINT division rounded at 6.
    Returns (prev_type, next_type, n_steps, p) — type-vocabulary² at
    most, never data-sized output.
    """
    w = Window.partitionBy(key_col).orderBy("ts", "event_id")
    steps = (
        events.select(key_col, "ts", "event_id", type_col)
        .withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
    )
    counts = steps.groupBy(
        F.col("_prev").alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).agg(F.count(F.lit(1)).alias("n_steps"))
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_steps",
        F.round(
            F.col("n_steps") / F.sum("n_steps").over(w_row).cast("double"),
            6,
        ).alias("p"),
    )
