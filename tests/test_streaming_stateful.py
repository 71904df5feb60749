"""applyInPandasWithState: running per-user totals must converge to the
batch groupBy aggregation after the stream drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from platform_etl_literature_spark.sources.events import read_events
from platform_etl_literature_spark.streaming import read_events_stream
from platform_etl_literature_spark.streaming.stateful import running_user_totals

SF_DIR = "/root/testdata/sf0.001"


def test_running_totals_converge_to_batch(spark):
    stream = read_events_stream(spark, SF_DIR)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    # last emitted row per user = final running totals
    got_df = spark.table("running_totals")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in got_df.collect()  # update mode: one row per user per batch; later overwrites earlier in dict order
    }

    batch = (
        read_events(spark, SF_DIR)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("total"),
        )
    )
    expected = {
        r["user_id"]: (r["n"], round(r["total"], 2)) for r in batch.collect()
    }
    assert got == expected
    assert len(got) > 0
