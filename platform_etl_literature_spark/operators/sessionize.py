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


def rfm_segments(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_bins: int = 5,
) -> DataFrame:
    """RFM segmentation (Hughes' recency/frequency/monetary scoring,
    the direct-marketing standard): per user, days-style recency
    against the corpus' latest event, activity count, and exact
    monetary total — each equi-depth-binned into ``n_bins`` scores
    (``n_bins`` = best) and combined into the classic 3-digit segment
    code.

    Binning is NOT ntile: a global ntile is a single-partition sort.
    Each dimension ranks with the scale-safe
    :func:`ranking.ordered_global_index` (range exchange + broadcast
    offsets) under a TOTAL order (dimension, then user id — no
    engine-ambiguous ties), and the score is the exact integer form

        score = n_bins − (rank − 1)·n_bins div n_users

    which an SQL oracle replays with row_number.  Recency ranks
    ascending (most recent first), frequency and monetary descending
    (largest first), so ``n_bins`` always means "best".

    Float parity: recency is exact integral seconds (µs epoch,
    integer floor division); counts and cent totals are exact
    BIGINTs; scores are pure integer arithmetic — no doubles anywhere.

    Scale shape: one corpus-collapse hash aggregate to user-sized
    rows, then ONE fused range-partitioned rank pass: the three
    dimensions are stacked into a single 3n-row frame tagged
    (0=recency, 1=frequency, 2=monetary) with DIRECTION-NORMALIZED
    sort keys (descending dims negate), ranked under the total order
    (tag, key, user) in one range exchange, and the per-dimension rank
    recovered by subtracting tag · n_users (the tags occupy contiguous
    global-rank segments by construction).  A single hash aggregate
    pivots the three scores back to user rows and one user-keyed join
    stitches them onto the base.  (The first formulation ran THREE
    rank passes — three range exchanges, three eager offset collects,
    three joins; at sf0.1 the fixed per-pass job barriers dominated
    wall at 1.89 s.  One pass over 3n rows is the same asymptotic
    shuffle volume with a third of the barriers.)  The corpus total-ts
    attaches via the one sanctioned single-row broadcast.  Nothing
    corpus-shaped after the first aggregate.

    Returns (*user, r_seconds, f, m_cents, r_score, f_score, m_score,
    segment).
    """
    from platform_etl_literature_spark.operators.dedup import (
        _materialize_once,
    )
    from platform_etl_literature_spark.operators.ranking import (
        ordered_global_index,
    )

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    v = F.col(value_col).cast("long")
    per_user = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.max(us).alias("_last_us"),
        F.count(F.lit(1)).alias("f"),
        F.sum(v).alias("m_cents"),
    )
    corpus_max = F.broadcast(events.agg(F.max(us).alias("_max_us")))
    # persisted: the user frame feeds the stacked rank input, the
    # n_users broadcast, AND the final stitch — without it the corpus
    # collapse re-runs three times (the dedup registry, released via
    # release_cached)
    base = _materialize_once(
        per_user.crossJoin(corpus_max).select(
            "_u",
            F.expr("(_max_us - _last_us) div 1000000").alias("r_seconds"),
            "f",
            F.coalesce("m_cents", F.lit(0)).alias("m_cents"),
        )
    )
    n_users = F.broadcast(base.agg(F.count(F.lit(1)).alias("_n")))

    # stacked (tag, key, user) rows: ascending rank within each tag
    # segment reproduces each dimension's own order (desc dims negate;
    # ties broken by user id — the same total order the 3-pass form
    # used, so scores are bit-identical)
    stacked = base.select(
        "_u",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("tag"), F.col("r_seconds").alias("key")
                ),
                F.struct(F.lit(1).alias("tag"), (-F.col("f")).alias("key")),
                F.struct(
                    F.lit(2).alias("tag"), (-F.col("m_cents")).alias("key")
                ),
            )
        ).alias("_d"),
    ).select("_u", "_d.tag", "_d.key")
    ranked = ordered_global_index(
        stacked,
        [F.col("tag").asc(), F.col("key").asc(), F.col("_u").asc()],
        rank_col="_g",
    )
    score = ranked.crossJoin(n_users).select(
        "_u",
        "tag",
        (
            F.lit(n_bins)
            - F.expr(f"((_g - tag * _n - 1) * {n_bins}) div _n")
        ).cast("int").alias("_score"),
    )
    scores = score.groupBy("_u").agg(
        F.max(F.when(F.col("tag") == 0, F.col("_score"))).alias("r_score"),
        F.max(F.when(F.col("tag") == 1, F.col("_score"))).alias("f_score"),
        F.max(F.when(F.col("tag") == 2, F.col("_score"))).alias("m_score"),
    )
    return base.join(scores, "_u").select(
        F.col("_u").alias(user_col),
        "r_seconds",
        "f",
        "m_cents",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100
            + F.col("f_score") * 10
            + F.col("m_score")
        ).alias("segment"),
    )
