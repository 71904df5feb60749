"""Streaming incremental view maintenance: keep a grouped
count/sum/avg state (operators/ivm.py) up to date from a CDC stream
via ``foreachBatch`` — with per-batch work proportional to the BATCH,
not the state.

Layout: the same hash-bucketed, manifest-committed version chain as
``streaming/scd2.py`` (whose helpers this module reuses) — state rows
live in bucket ``pmod(xxhash64(keys), n_buckets)``, each committed
version writes ONLY the buckets the batch's keys touched, and
``manifest.json`` (written last, the commit marker, carrying the
batch id for replay idempotency) maps every live bucket to the
version holding its current rows.  Aggregate maintenance is key-local
exactly like SCD2 (a delta can only change the groups it carries), so
untouched buckets are bit-identical in the next version and are
neither read nor rewritten.

Each micro-batch applies the SAME fold the batch operator proves
(``operators.ivm.agg_state_apply`` — exact under insert/delete
deltas), against only the dirty buckets' state rows.  CDC rows carry
an op column (``'I'`` insert / ``'D'`` delete, the
``merge.corpus_diff`` vocabulary); a group whose count reaches zero
drops out of the state, and a bucket left empty drops out of the
manifest.  ``compact_history`` / ``vacuum_history`` from the scd2
module work unchanged on this layout for maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from platform_etl_literature_spark.operators.ivm import (
    agg_state_apply,
    agg_state_build,
)
from platform_etl_literature_spark.streaming.scd2 import (
    _bucket_col,
    _bucket_paths,
    _committed_versions,
    _read_manifest,
    _write_manifest,
    read_history,
)


def read_state(spark: SparkSession, state_root: str) -> DataFrame:
    """The maintained aggregate state at the latest committed version —
    a plain multi-path parquet scan of one file set per live bucket
    (shared with scd2's read_history; the layout is identical)."""
    return read_history(spark, state_root).drop("_bucket")


def agg_maintain_writer(
    cdc: DataFrame,
    state_root: str,
    keys: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
    op_col: str = "_op",
) -> DataStreamWriter:
    """Build the foreachBatch writer (caller adds checkpoint/trigger and
    calls ``.start()``).  ``cdc`` rows are fact rows plus ``op_col``
    ('I' or 'D').  Per batch: split the delta, find its dirty buckets
    (an at-most-``n_buckets``-row collect), read ONLY those buckets'
    state rows, fold with the exact batch operator, and commit the
    rewritten buckets under a fresh manifest — O(batch + batch's
    buckets), never O(state).  Replays skip via the manifest batch-id
    check (manifest is written last, so a failed partial attempt has
    none and is safely overwritten)."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        versions = _committed_versions(spark, state_root)
        manifests = {
            v: _read_manifest(spark, state_root, v) for v in versions
        }
        if any(
            m.get("batch_id") == int(batch_id) for m in manifests.values()
        ):
            return  # replayed, already committed — idempotent skip
        target = (versions[-1] + 1) if versions else 1
        inserts = batch.where(F.col(op_col) == "I").drop(op_col)
        deletes = batch.where(F.col(op_col) == "D").drop(op_col)
        dirty = sorted(
            r["_bucket"]
            for r in batch.select(
                _bucket_col(keys, n_buckets).alias("_bucket")
            )
            .distinct()
            .collect()
        )
        if not versions:
            prev = agg_state_build(inserts, keys, sum_cols).limit(0)
            prev_manifest = {"n_buckets": n_buckets, "buckets": {}}
        else:
            prev_manifest = manifests[versions[-1]]
            nb = int(prev_manifest["n_buckets"])
            if nb != n_buckets:
                raise ValueError(
                    f"state bucketed at {nb}, writer configured {n_buckets}"
                )
            paths = _bucket_paths(state_root, prev_manifest, dirty)
            if paths:
                prev = spark.read.parquet(*paths).drop("_bucket")
            else:
                prev = agg_state_build(inserts, keys, sum_cols).limit(0)
        state = agg_state_apply(
            prev, keys, sum_cols, inserts=inserts, deletes=deletes
        ).withColumn("_bucket", _bucket_col(keys, n_buckets))
        state.write.mode("overwrite").partitionBy("_bucket").parquet(
            f"{state_root}/history_v{target}/data"
        )
        # buckets whose every group dropped out write no partition dir —
        # they must leave the manifest, or readers would chase a
        # nonexistent path
        surviving = {
            r["_bucket"]
            for r in state.select("_bucket").distinct().collect()
        }
        live = dict(prev_manifest["buckets"])
        for bk in dirty:
            if bk in surviving:
                live[str(bk)] = target
            else:
                live.pop(str(bk), None)
        _write_manifest(
            spark,
            state_root,
            target,
            {
                "version": target,
                "batch_id": int(batch_id),
                "n_buckets": n_buckets,
                "key_cols": list(keys),
                "buckets": live,
            },
        )

    return cdc.writeStream.foreachBatch(_step).outputMode("update")
