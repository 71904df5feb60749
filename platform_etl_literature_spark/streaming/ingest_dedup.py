"""Dedup-at-ingest: exact dedup of an arriving document stream against
everything already accepted, via ``foreachBatch`` + a persistent digest
index.

Watermark-bounded stream dedup (``events.dedup_within_watermark``)
forgets keys once the watermark passes; corpus dedup must remember
FOREVER.  The Spark-idiomatic bridge is ``foreachBatch``: each
micro-batch runs the same digest anti-join as the batch operator
(``operators.dedup.incremental_dedup`` semantics — first-id-wins
within the batch, drop anything whose digest is already indexed), then
appends the survivors to the corpus sink and their digests to the
index.  The index is digests only (16 bytes + id per accepted doc), so
the per-batch probe scans an index that is orders of magnitude smaller
than the corpus; at 100 TB the index lives as a bucketed table on the
digest so the anti-join is exchange-free on the probe side.

Delivery note: foreachBatch is at-least-once on sink writes — a batch
replayed after a failure can re-append survivors.  Re-appended digests
are harmless (the index is a set); for the corpus sink use a
transactional/idempotent sink keyed by (batch_id) in production.  The
dedup decision itself is replay-stable: a replayed batch sees at worst
MORE indexed digests, never fewer, so it can only drop extra
duplicates, never re-admit one.

Capability extension (SURVEY.md §7.6): the reference has no streaming
surface at all; this pairs its Processing dedup semantics
(Processing.scala:117-122 dropDuplicates) with Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def _digest(c, prefix_chars: int | None):
    """The ingest digest — md5 of the text (or its head fingerprint),
    one definition for the writer and the replay."""
    t = F.substring(c, 1, prefix_chars) if prefix_chars else c
    return F.md5(t)


def _dedup_step(
    keyed: DataFrame, seen: DataFrame | None, id_col: str
) -> DataFrame:
    """The per-micro-batch rule, shared verbatim by the foreachBatch
    writer and the batch replay: drop rows whose digest is already
    indexed (anti-join), then first-id-wins within the batch."""
    fresh = (
        keyed
        if seen is None
        else keyed.join(seen.select("_h"), "_h", "left_anti")
    )
    winners = fresh.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return fresh.join(winners, ["_h", id_col], "left_semi")


def ingest_dedup_replay(
    docs: DataFrame,
    batch_ids: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_col: str = "batch",
    prefix_chars: int | None = None,
) -> DataFrame:
    """Batch REPLAY of the streaming ingest-dedup fold — the
    batch-equivalence witness for :func:`ingest_dedup_writer`: feed
    the same corpus partitioned into ``batch_ids``-ordered
    micro-batches through the SAME per-batch rule (``_dedup_step``,
    shared code, not a re-implementation) with the accepted set
    accumulating in-plan instead of in a parquet index.

    The fold chains K anti-join + winner stages by unionByName; each
    batch's kept frame is eagerly ``localCheckpoint``ed (round 10):
    the purely-lazy fold embedded batch b's whole kept subtree in
    every later batch's anti-join AND the final union — O(K²)
    recompute of the digest/winner stages (interleaved A/B at sf0.1:
    1.75 → 1.11 s min).  The checkpoint mirrors the streaming
    writer's per-trigger digest index, replayed in memory; accepted
    values are unchanged.  Closed form (what the SQL oracle replays):
    per digest, the accepted doc is the one minimizing (batch, id)
    lexicographically — earlier micro-batches always win,
    first-id-wins inside a batch.  ``batch_ids`` must list every
    batch value in arrival order (the streaming contract: micro-batch
    sequence is known and ordered); K is micro-batch-count-sized,
    never data-sized.

    Returns the accepted rows (*docs columns*, plus ``_h`` digest).
    """

    keyed = docs.withColumn("_h", _digest(F.col(text_col), prefix_chars))
    accepted: DataFrame | None = None
    for b in batch_ids:
        kept = _dedup_step(
            keyed.filter(F.col(batch_col) == F.lit(b)), accepted, id_col
        ).localCheckpoint(eager=True)
        accepted = kept if accepted is None else accepted.unionByName(kept)
    if accepted is None:
        raise ValueError("batch_ids must be non-empty")
    return accepted


def ingest_dedup_writer(
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int | None = None,
) -> DataStreamWriter:
    """Build the foreachBatch writer (caller adds checkpoint/trigger and
    calls ``.start()``).  ``prefix_chars`` selects the head-fingerprint
    variant (see ``incremental_dedup``)."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        keyed = batch.withColumn(
            "_h", _digest(F.col(text_col), prefix_chars)
        )
        try:
            seen = spark.read.parquet(index_path).select("_h")
        except AnalysisException as exc:
            # ONLY the first-batch missing-index case may fall through
            # to "everything is fresh" — any other read failure (a
            # corrupt index, permissions) must fail the batch, or
            # indexed duplicates would silently re-admit.
            cond = getattr(exc, "getCondition", exc.getErrorClass)() or ""
            if "PATH_NOT_FOUND" not in cond and "does not exist" not in str(exc):
                raise
            seen = None
        # the FULL shared rule (index anti-join + first-id-wins) —
        # _dedup_step is the single definition of both halves, so the
        # batch-equivalence claim against ingest_dedup_replay is
        # code-shared, not re-implemented
        kept = _dedup_step(keyed, seen, id_col)
        kept.drop("_h").write.mode("append").parquet(out_path)
        kept.select("_h").write.mode("append").parquet(index_path)

    return docs_stream.writeStream.foreachBatch(_step).outputMode("update")
