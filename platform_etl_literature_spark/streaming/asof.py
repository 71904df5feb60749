"""Streaming as-of enrichment: a fact stream joined point-in-time
against a static (or slowly-rebuilt) dimension table.

Structured Streaming cannot run ``operators.asof.asof_join`` natively
— a window over a union of a stream and a static frame is unsupported
— but the semantics are embarrassingly micro-batch-parallel: each left
row's as-of match depends ONLY on the right table, never on other left
rows, so running the batch operator inside ``foreachBatch`` gives
stream == batch equality unconditionally (no watermark subtleties, no
cross-batch state).

Scale shape per micro-batch: the batch's key set (batch-sized, tiny)
broadcast-semi-joins the dimension FIRST, so the dimension is pruned
map-side — no exchange of the right table — and only then does the
union-and-carry as-of run, on (batch + pruned-slice) rows.  A 100 TB
dimension therefore costs a pruned scan per batch, not a shuffle; keep
it bucketed on the key and the scan prunes further.

Replay safety: each batch writes its whole output under
``batch=<id>/`` with overwrite, so an at-least-once replay of a batch
is byte-idempotent (same layout rule as the streaming sketch and IVM
maintainers).  Readers union the batch dirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from platform_etl_literature_spark.operators.asof import asof_join


def asof_enrich_writer(
    stream: DataFrame,
    right: DataFrame,
    out_path: str,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataStreamWriter:
    """foreachBatch writer enriching each micro-batch with its as-of
    match from ``right`` (caller adds checkpoint/trigger and calls
    ``.start()``)."""
    keys = [on] if isinstance(on, str) else list(on)

    def _step(batch: DataFrame, batch_id: int) -> None:
        batch_keys = F.broadcast(batch.select(*keys).distinct())
        sliced = right.join(batch_keys, keys, "left_semi")
        out = asof_join(
            batch,
            sliced,
            keys,
            left_ts=left_ts,
            right_ts=right_ts,
            direction=direction,
            tolerance=tolerance,
        )
        out.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(_step).outputMode("update")


def read_enriched(spark: SparkSession, out_path: str) -> DataFrame:
    """Union of every committed batch's enriched output."""
    return spark.read.option("basePath", out_path).parquet(
        f"{out_path}/batch=*"
    )
