"""Distributed as-of (point-in-time) join.

For every left row attach the most recent right row with the same key
and right timestamp <= left timestamp (``direction="backward"``; the
standard market-data "latest quote for each trade" join), or the
earliest right row at-or-after it (``"forward"``).

Spark has no AsofJoin operator (DuckDB/kdb/pandas ``merge_asof`` do),
and expressing it as a theta join explodes: an equi-join on key with a
``r.ts <= l.ts`` predicate produces every EARLIER right row per left
row before a top-1 window prunes them — O(n·m) per key.  The shape a
100 TB as-of join wants is the union-and-carry plan used here:

1. tag both sides and union them (a zero-cost plan node),
2. ONE hash exchange on the key — the only shuffle in the whole plan,
3. per key, sort by (ts, side) and carry the last right payload with
   ``last(_rrow, ignorenulls=True)`` over an unbounded-preceding row
   frame — O(1) running state per key, never a per-key array,
4. keep the left rows and unpack the carried payload.

No join operator appears in the physical plan at all.  Ordering
``_side`` right-before-left at equal timestamps makes the match
INCLUSIVE (r.ts == l.ts matches), same as DuckDB ``ASOF JOIN ... ON
l.ts >= r.ts``.  Equal right timestamps within a key are resolved
deterministically: the payload struct (right columns, in order) is the
final sort key, so the lexicographically greatest payload wins — put a
unique id first in ``right``'s column order to pin the rule (the suite
query uses max ``event_id``; its DuckDB oracle replays the rule with
``arg_max(..., event_id)``).

Skew note: one hot key serializes into one task's sort, exactly like
any keyed window.  :func:`asof_join_segmented` is the whale-safe
variant: it sub-partitions each key along the TIME axis (the
``timeseries.user_value_ewma_segmented`` pattern), carries within
each (key, segment) slice, and stitches slices through a
per-segment summary frame that is smaller than the data by the
segment size.  Because the carry ("last non-null right payload
under a fixed total order") is associative — a slice's result given
its incoming carry is ``coalesce(local_carry, incoming)`` — the
composition is EXACT: the segmented plan returns bit-identical rows
to the flat one, it just bounds the largest sort by the largest
single segment instead of the largest key.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the columns of its
    as-of match in ``right`` (NULLs when no match).  Right's non-key
    columns are appended; a name colliding with a left column — and
    the right timestamp column always — gets ``suffix``.

    ``direction``: "backward" (latest right at-or-before), "forward"
    (earliest right at-or-after), or "nearest" (the closer of the two,
    ties preferring backward — pandas ``merge_asof`` semantics; for
    timestamps the gap comparison uses interval arithmetic, which
    Spark orders correctly).

    ``tolerance`` (optional) voids matches farther than that from the
    left timestamp ALONG THE ORDERING AXIS: it is compared with plain
    column subtraction, so pass numeric axes (e.g. ``unix_micros``)
    when you need it; leave None for raw timestamp columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"key column {k!r} missing from a side")
    payload = [c for c in right.columns if c not in keys]
    if right_ts not in payload:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key column")

    lrow = F.struct(*[F.col(c) for c in left.columns])
    rrow = F.struct(*[F.col(c) for c in payload])
    l_dtype = left.select(lrow.alias("x")).schema["x"].dataType
    r_dtype = right.select(rrow.alias("x")).schema["x"].dataType

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        lrow.alias("_lrow"),
        F.lit(None).cast(r_dtype).alias("_rrow"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_dtype).alias("_lrow"),
        rrow.alias("_rrow"),
    )

    # _rrow stays ASC under either time order so the carried row among
    # equal-ts rights is always the greatest payload struct — the same
    # tie rule in every direction
    back_order = [F.col("_ats").asc(), F.col("_side").asc(), F.col("_rrow").asc()]
    fwd_order = [F.col("_ats").desc(), F.col("_side").asc(), F.col("_rrow").asc()]

    def _window(order):
        return (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def _gapped(carried_col, backward: bool):
        # NULL gap (no candidate) propagates; tolerance nulls out the
        # whole candidate below
        rts = carried_col[right_ts]
        return F.col("_ats") - rts if backward else rts - F.col("_ats")

    unioned = l_tagged.unionByName(r_tagged)
    if direction == "nearest":
        # both carries ride the SAME hash exchange (same partition
        # keys — the second window only re-sorts in place); the nearer
        # side wins, ties preferring backward (pandas merge_asof rule)
        out = (
            unioned.withColumn(
                "_cb", F.last("_rrow", ignorenulls=True).over(_window(back_order))
            )
            .withColumn(
                "_cf", F.last("_rrow", ignorenulls=True).over(_window(fwd_order))
            )
            .where(F.col("_side") == 1)
        )
        gb = _gapped(F.col("_cb"), True)
        gf = _gapped(F.col("_cf"), False)
        if tolerance is not None:
            out = out.withColumn(
                "_cb", F.when(gb <= F.lit(tolerance), F.col("_cb"))
            ).withColumn("_cf", F.when(gf <= F.lit(tolerance), F.col("_cf")))
            gb, gf = _gapped(F.col("_cb"), True), _gapped(F.col("_cf"), False)
        out = out.withColumn(
            "_carried",
            F.when(F.col("_cb").isNull(), F.col("_cf")).when(
                F.col("_cf").isNull() | (gb <= gf), F.col("_cb")
            ).otherwise(F.col("_cf")),
        )
    else:
        order = back_order if direction == "backward" else fwd_order
        out = (
            unioned.withColumn(
                "_carried", F.last("_rrow", ignorenulls=True).over(_window(order))
            )
            .where(F.col("_side") == 1)
        )
        if tolerance is not None:
            gap = _gapped(F.col("_carried"), direction == "backward")
            out = out.withColumn(
                "_carried", F.when(gap <= F.lit(tolerance), F.col("_carried"))
            )

    left_names = set(left.columns)
    cols = [F.col(f"_lrow.`{c}`").alias(c) for c in left.columns]
    for c in payload:
        name = c + suffix if (c == right_ts or c in left_names) else c
        cols.append(F.col(f"_carried.`{c}`").alias(name))
    return out.select(*cols)


def asof_join_segmented(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_r",
    segment: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Whale-safe as-of join: bit-identical results to
    :func:`asof_join`, with the keyed sort bounded by the largest
    time SEGMENT instead of the largest key.

    ``segment`` maps the ordering-axis column to a segment id that is
    non-decreasing in the axis (default: UTC day for timestamp/date
    axes; numeric axes must pass one explicitly, e.g.
    ``lambda c: F.floor(c / 3600)``).  A key whose rows all share one
    segment value still serializes — pick a granularity under which
    the hottest (key, segment) slice fits a task, the same contract
    as ``user_value_ewma_segmented``'s day buckets.

    Plan shape: ONE hash exchange on (keys…, segment) computes BOTH
    the within-segment carry and the whole-segment carry (two window
    functions over the same partitioning, the second just re-frames);
    segment summaries — one slim row per (key, segment) — are then
    chained with a keys-partitioned window (the level-2 frame, smaller
    than the data by the segment size), and joined back on
    (keys…, segment), where the big side reuses the existing
    partitioning.  ``coalesce(local, incoming)`` is exact because the
    carry is associative: the last non-null payload in a slice, given
    nothing local, is the last one from earlier slices.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"key column {k!r} missing from a side")
    payload = [c for c in right.columns if c not in keys]
    if right_ts not in payload:
        raise ValueError(f"right_ts {right_ts!r} must be a non-key column")

    lrow = F.struct(*[F.col(c) for c in left.columns])
    rrow = F.struct(*[F.col(c) for c in payload])
    l_dtype = left.select(lrow.alias("x")).schema["x"].dataType
    r_dtype = right.select(rrow.alias("x")).schema["x"].dataType
    axis_type = left.schema[left_ts].dataType.typeName()
    if segment is None:
        if axis_type not in ("timestamp", "timestamp_ntz", "date"):
            raise ValueError(
                "segment is required for non-timestamp ordering axes "
                f"(axis {left_ts!r} is {axis_type})"
            )
        segment = lambda c: F.date_trunc("day", c).cast("long")  # noqa: E731

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        lrow.alias("_lrow"),
        F.lit(None).cast(r_dtype).alias("_rrow"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_dtype).alias("_lrow"),
        rrow.alias("_rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged).withColumn(
        "_seg", segment(F.col("_ats"))
    )

    back_order = [F.col("_ats").asc(), F.col("_side").asc(), F.col("_rrow").asc()]
    fwd_order = [F.col("_ats").desc(), F.col("_side").asc(), F.col("_rrow").asc()]

    def _local(order):
        return (
            Window.partitionBy(*keys, "_seg")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def _total(order):
        return (
            Window.partitionBy(*keys, "_seg")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )

    directions = (
        [("b", back_order, True), ("f", fwd_order, False)]
        if direction == "nearest"
        else [
            ("b", back_order, True)
            if direction == "backward"
            else ("f", fwd_order, False)
        ]
    )

    staged = unioned
    for tag, order, _ in directions:
        staged = staged.withColumn(
            f"_cl_{tag}", F.last("_rrow", ignorenulls=True).over(_local(order))
        ).withColumn(
            f"_ct_{tag}", F.last("_rrow", ignorenulls=True).over(_total(order))
        )

    # Level-2 summary: one slim row per (key, segment).  All rows of a
    # slice agree on _ct_*, so max == that value (NULL iff the slice
    # has no rights).  Chained per key in segment order — ascending
    # for backward (carry flows forward in time), descending for
    # forward — the incoming carry for a slice is the nearest
    # non-empty slice on its lookup side.
    summary = staged.groupBy(*keys, "_seg").agg(
        *[F.max(f"_ct_{tag}").alias(f"_ct_{tag}") for tag, _, _ in directions]
    )
    for tag, _, backward in directions:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_seg").asc() if backward else F.col("_seg").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        summary = summary.withColumn(
            f"_in_{tag}", F.last(f"_ct_{tag}", ignorenulls=True).over(w)
        )
    summary = summary.select(
        *keys, "_seg", *[f"_in_{tag}" for tag, _, _ in directions]
    )

    out = staged.where(F.col("_side") == 1).join(
        summary, [*keys, "_seg"], "left"
    )
    for tag, _, _ in directions:
        out = out.withColumn(
            f"_c{tag}", F.coalesce(F.col(f"_cl_{tag}"), F.col(f"_in_{tag}"))
        )

    def _gapped(carried_col, backward: bool):
        rts = carried_col[right_ts]
        return F.col("_ats") - rts if backward else rts - F.col("_ats")

    if direction == "nearest":
        gb, gf = _gapped(F.col("_cb"), True), _gapped(F.col("_cf"), False)
        if tolerance is not None:
            out = out.withColumn(
                "_cb", F.when(gb <= F.lit(tolerance), F.col("_cb"))
            ).withColumn("_cf", F.when(gf <= F.lit(tolerance), F.col("_cf")))
            gb, gf = _gapped(F.col("_cb"), True), _gapped(F.col("_cf"), False)
        out = out.withColumn(
            "_carried",
            F.when(F.col("_cb").isNull(), F.col("_cf")).when(
                F.col("_cf").isNull() | (gb <= gf), F.col("_cb")
            ).otherwise(F.col("_cf")),
        )
    else:
        tag = directions[0][0]
        out = out.withColumn("_carried", F.col(f"_c{tag}"))
        if tolerance is not None:
            gap = _gapped(F.col("_carried"), direction == "backward")
            out = out.withColumn(
                "_carried", F.when(gap <= F.lit(tolerance), F.col("_carried"))
            )

    left_names = set(left.columns)
    cols = [F.col(f"_lrow.`{c}`").alias(c) for c in left.columns]
    for c in payload:
        name = c + suffix if (c == right_ts or c in left_names) else c
        cols.append(F.col(f"_carried.`{c}`").alias(name))
    return out.select(*cols)
