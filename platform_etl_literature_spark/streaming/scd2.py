"""Streaming SCD2: maintain a versioned corpus history from an update
stream via ``foreachBatch`` + immutable per-version snapshots.

Each micro-batch applies the SAME merge the batch operator uses
(``operators.merge.scd2_apply``) against the latest committed history
snapshot and writes the result as a NEW ``history_v{n}`` directory —
never overwriting the snapshot it just read (read-then-overwrite of
one path is a self-corruption hazard in any engine).  The version
number is ``batch_id + 1``, which makes the sink idempotent under
foreachBatch's at-least-once replays: a replayed batch sees its
version already COMMITTED (the ``_SUCCESS`` marker, not mere directory
existence — a partially-written failed attempt has no marker and is
safely overwritten) and skips.

Scale note: a per-batch full-history rewrite is the format-agnostic
equivalent of what a transactional table format (Delta/Iceberg/Hudi)
does with MERGE + snapshot isolation; on those sinks ``_step`` becomes
a single MERGE and versioning is the table's own log.  History growth
is bounded by (corpus size × change rate); compact by periodically
re-``scd2_init``-ing from the current rows when closed history ages
out of retention.

Pairs with streaming/ingest_dedup.py (same foreachBatch bridge, same
batch-operator reuse) — tests/test_streaming.py pins stream == batch
on a replayed update sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from platform_etl_literature_spark.operators.merge import scd2_apply, scd2_init


def _committed_versions(spark, root: str) -> list[int]:
    """Versions under ``root`` whose parquet write COMMITTED (has the
    _SUCCESS marker), ascending.  Hadoop FS API, so any supported
    filesystem works, not just local paths."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("history_v"):
            marker = jvm.org.apache.hadoop.fs.Path(
                f"{root}/{name}/_SUCCESS"
            )
            if fs.exists(marker):
                out.append(int(name[len("history_v") :]))
    return sorted(out)


def scd2_stream_writer(
    updates: DataFrame,
    history_root: str,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataStreamWriter:
    """Build the foreachBatch writer (caller adds checkpoint/trigger
    and calls ``.start()``).  The first committed batch initializes the
    history (scd2_init); each later batch closes/opens/inserts via
    scd2_apply.  Updates are deduplicated per key within a batch
    (deterministic min-struct winner, so replays and speculative tasks
    agree)."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        spark = batch.sparkSession
        versions = _committed_versions(spark, history_root)
        target = int(batch_id) + 1
        if target in versions:
            return  # replayed, already committed — idempotent skip
        other = [c for c in batch.columns if c not in key_cols]
        b = (
            batch.groupBy(*key_cols)
            .agg(F.min(F.struct(*other)).alias("_w"))
            .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in other])
        )
        if not versions:
            hist = scd2_init(b, compare_cols, version=target)
        else:
            prev = spark.read.parquet(
                f"{history_root}/history_v{versions[-1]}"
            )
            hist = scd2_apply(prev, b, key_cols, compare_cols, version=target)
        hist.write.mode("overwrite").parquet(
            f"{history_root}/history_v{target}"
        )

    return updates.writeStream.foreachBatch(_step).outputMode("update")
