"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY.md §2.11) — this is the
new-capability extension (§7.6): file-source ingestion → event-time
windowed aggregation with watermark-based late-data handling → sinks.

Design:
* The same transformations run on batch and streaming DataFrames
  (Structured Streaming's contract), so every streaming query here has
  a batch twin used by the tests as the correctness oracle.
* Watermarks bound state: ``hourly_counts`` keeps at most
  (watermark / window) panes per key group in the state store —
  at 100 TB/day ingest the state size is governed by key cardinality ×
  pane count, not by throughput.
* Sessionization uses the built-in ``session_window`` (gap-based
  event-time sessions) rather than custom ``applyInPandasWithState`` —
  JVM-side state, mergeable across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_literature_spark.sources.events import (
    normalize_events_ts,
    read_events_raw,
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet directory.

    Streaming readers need an explicit schema; it is taken from a
    static read (driver-side metadata only).  ``ts`` is normalized to
    TIMESTAMP by the same schema-adaptive transform as the batch
    loader (sources.events), so batch twins stay bit-identical
    whatever physical encoding the writer chose.
    """
    schema = read_events_raw(spark, sf_dir).schema
    # the file source monitors directories; select just the events file
    # via a glob filter so the table dir can hold other tables too
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def hourly_counts(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window counts with a watermark.

    Works identically on batch and streaming inputs; on a stream the
    watermark lets Spark finalize + evict panes older than max(event
    time) - watermark, so late events inside the bound still update
    their pane and older ones are dropped.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding event-time window counts with a watermark: each event
    lands in window/slide overlapping panes (4 for 1h/15m).

    Same batch/streaming contract as hourly_counts; state holds at most
    (watermark + window)/slide panes per key.  The fan-out happens
    inside the window operator (JVM), not as an explode — rows amplify
    only in the aggregation's map side.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def segment_hourly_counts(
    events: DataFrame,
    customers: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment: events joined to the static customer
    dimension (user_id -> market segment), then tumbling-window counts
    per segment.  Unmatched users fall into the 'UNKNOWN' segment
    rather than dropping rows, so rollups stay complete.

    Scale shape: the static side is a dimension table, explicitly
    broadcast — under a stream this re-plans per micro-batch as a
    broadcast hash join (the stream side never shuffles for the join);
    the only stateful operator is the windowed aggregate, bounded by
    watermark x segment cardinality.  Identical code path on batch and
    streaming inputs (the tests pin stream == batch).
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    joined = (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id", "left")
        .withColumn("segment", F.coalesce(F.col("segment"), F.lit("UNKNOWN")))
    )
    return (
        joined.groupBy(F.window("ts", window).alias("win"), F.col("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 2).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").cast("long").alias("window_start"),
            "segment",
            "n",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based event-time sessions per user via ``session_window``
    (the streaming-native equivalent of operators.sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("session_start"),
            F.col("sw.end").cast("long").alias("session_end"),
            "n_events",
        )
    )


def view_click_interval_join(
    views: DataFrame,
    clicks: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner interval join: each view pairs with the same
    user's clicks landing within ``max_delay`` after it.

    Both sides carry watermarks and the join condition bounds click_ts
    relative to view_ts, so the state store can evict a buffered row
    once the other side's watermark passes its join range — state is
    bounded by (watermark + max_delay) × arrival rate, not by stream
    length.  Works identically on batch inputs (the test oracle).
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("click_user"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}")),
            "inner",
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            # integer microseconds: exact in any engine (a seconds double
            # would round-trip through float division)
            (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("delay_us"),
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once by event id under replays/retries:
    ``dropDuplicatesWithinWatermark`` keeps one row per event_id and
    evicts its dedup state once the watermark passes the event's
    timestamp — bounded state, unlike a plain streaming
    ``dropDuplicates`` which must remember every id forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    stream: DataFrame, query_name: str, output_mode: str = "append"
) -> "object":
    """Drain a streaming DataFrame into an in-memory table with the
    available-now trigger (process everything, then stop).  Returns the
    StreamingQuery; caller awaits termination and reads
    ``spark.table(query_name)``."""
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def ohlc_bars_windowed(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "6 hours",
    cents: int = 100,
) -> DataFrame:
    """Streaming OHLC bars: the windowed-aggregation twin of
    ``operators.timeseries.ohlc_bars`` — open/close via min_by/max_by
    on the (ts, event_id) total order inside a tumbling event-time
    window with a watermark, values as exact cent integers (the
    float-parity policy).  Works identically on batch and streaming
    inputs; update-mode state is one (keys, pane) row holding six
    counters — O(1) per pane, same envelope as hourly_counts."""
    vc = F.round(F.col("value") * cents, 0).cast("long")
    order = F.struct(
        F.unix_micros("ts").alias("_us"), F.col("event_id").alias("_id")
    )
    money = lambda c: F.round(c / float(cents), 2)  # noqa: E731
    return (
        events.withWatermark("ts", watermark)
        # NULL ticks are skipped (same contract as the batch twin):
        # min_by/max_by order on (ts, id) regardless of the value, so
        # an unfiltered NULL first tick would null `open` while
        # high/low skipped it — an inconsistent bar.
        .where(F.col("value").isNotNull())
        .select(
            "ts", "event_type", vc.alias("_vc"), order.alias("_o")
        )
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.min_by("_vc", "_o").alias("_open"),
            F.max("_vc").alias("_high"),
            F.min("_vc").alias("_low"),
            F.max_by("_vc", "_o").alias("_close"),
            F.count(F.lit(1)).alias("n"),
            F.sum("_vc").alias("_sum"),
        )
        .select(
            F.col("win.start").cast("long").alias("bucket_start"),
            "event_type",
            money(F.col("_open")).alias("open"),
            money(F.col("_high")).alias("high"),
            money(F.col("_low")).alias("low"),
            money(F.col("_close")).alias("close"),
            "n",
            money(F.col("_sum")).alias("sum_value"),
        )
    )
