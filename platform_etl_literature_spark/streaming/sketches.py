"""Streaming sketch maintenance: keep a mergeable count-min frequency
grid (operators/sketch.py) up to date over an arriving stream, with
replay-safe exactly-once counting.

The trap with streaming COUNTER sketches is that ``foreachBatch`` is
at-least-once: a replayed batch that merged its counts into a single
mutable grid would DOUBLE-COUNT (counter addition is not idempotent —
unlike the digest-set appends of ``ingest_dedup``, where re-appending
is harmless).  The fix is the sketch contract itself: grids are
mergeable, so the stream never mutates a global grid at all.  Each
micro-batch writes ITS OWN grid under ``grid_path/batch=<id>`` with
``mode("overwrite")`` on that one directory — a replay of batch N
overwrites batch N's grid with identical cells, so the merged view is
exactly-once no matter how many times a batch replays.  Readers merge
on demand (cell-wise sum over ≤ d·w rows per batch — sketch-sized,
never corpus-sized); a maintenance job may compact old batch grids
into one with :func:`operators.sketch.cms_merge` at any time, since
merge is associative.

This is the streaming face of the compute-once/merge-many pattern the
batch module documents: per-micro-batch grids are just a finer fine
grain.

Capability extension (SURVEY.md §7.6): the reference has no streaming
surface; this pairs its batch aggregation semantics with Structured
Streaming the same way ingest_dedup pairs its dropDuplicates.
"""

from __future__ import annotations

from platform_etl_literature_spark.localdf import local_df
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from platform_etl_literature_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)


def cms_maintain_writer(
    stream: DataFrame,
    col: str,
    grid_path: str,
    w: int = 8192,
    d: int = 3,
) -> DataStreamWriter:
    """Build the foreachBatch writer (caller adds checkpoint/trigger
    and calls ``.start()``).  Each micro-batch lands its own grid at
    ``grid_path/batch=<batch_id>`` — overwrite-per-batch-directory, so
    batch replays are idempotent and the merged view stays exact."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        cms_build(batch, col, w, d).write.mode("overwrite").parquet(
            f"{grid_path}/batch={batch_id}"
        )

    return stream.writeStream.foreachBatch(_step).outputMode("update")


def cms_read_merged(spark: SparkSession, grid_path: str) -> DataFrame:
    """The merged grid across every landed batch: cell-wise counter
    sum.  Equal to a direct batch build over everything the stream has
    delivered (pinned by test) — the reader-side half of the
    exactly-once story."""
    return (
        spark.read.parquet(grid_path)
        .groupBy("r", "p")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_stream_estimate(
    spark: SparkSession,
    grid_path: str,
    items: DataFrame,
    col: str,
    w: int,
    d: int,
) -> DataFrame:
    """Estimated stream-so-far count for each candidate item, against
    the merged grid.  (w, d) must match the writer's."""
    return cms_estimate(items, col, cms_read_merged(spark, grid_path), w, d)


def hdr_maintain_writer(
    stream: DataFrame,
    col: str,
    hist_path: str,
    m: int = 32,
    keys: list[str] | None = None,
) -> DataStreamWriter:
    """Streaming HDR quantile-histogram maintenance — same
    overwrite-per-batch-directory contract as :func:`cms_maintain_writer`
    (bucket counters are not idempotent under replay, per-batch grids
    are): each micro-batch lands its own (keys, b, cnt) histogram at
    ``hist_path/batch=<batch_id>``, so replays overwrite identical
    cells and the merged view stays exactly-once."""
    from platform_etl_literature_spark.operators.sketch import hdr_build

    def _step(batch: DataFrame, batch_id: int) -> None:
        hdr_build(batch, col, m, keys).write.mode("overwrite").parquet(
            f"{hist_path}/batch={batch_id}"
        )

    return stream.writeStream.foreachBatch(_step).outputMode("update")


def hdr_read_merged(
    spark: SparkSession, hist_path: str, keys: list[str] | None = None
) -> DataFrame:
    """The merged histogram across every landed batch: bucket-wise
    counter sum — IDENTICAL cells to a direct batch build over
    everything the stream has delivered (pinned by test, the exact-merge
    theorem of operators.sketch.hdr_merge)."""
    keys = list(keys or [])
    return (
        spark.read.parquet(hist_path)
        .groupBy(*keys, "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hdr_stream_quantiles(
    spark: SparkSession,
    hist_path: str,
    qs: list[float],
    m: int = 32,
    keys: list[str] | None = None,
) -> DataFrame:
    """Stream-so-far quantile estimates from the merged histogram —
    sketch-sized work regardless of how much the stream has seen.
    ``m`` must match the writer's."""
    from platform_etl_literature_spark.operators.sketch import hdr_quantiles

    return hdr_quantiles(hdr_read_merged(spark, hist_path, keys), qs, m, keys)


def bloom_maintain_writer(
    stream: DataFrame,
    col: str,
    words_path: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataStreamWriter:
    """Streaming Bloom-filter maintenance — membership, the third
    member of the streaming sketch family (CMS = counts, HDR =
    quantiles).  Each micro-batch lands its own (w, bits) word rows
    under ``words_path/batch=<batch_id>`` (the per-batch-directory
    replay contract); because ``bit_or`` is idempotent AND associative,
    the merged filter is bit-identical to a direct build over
    everything delivered no matter how batches replay or reorder."""
    from platform_etl_literature_spark.operators.dedup import (
        bloom_positions_sql,
    )

    def _step(batch: DataFrame, batch_id: int) -> None:
        pos = bloom_positions_sql(f"`{col}`", m_bits, k)
        (
            batch.where(F.col(col).isNotNull())
            .selectExpr(f"explode(array({', '.join(pos)})) AS p")
            .distinct()
            .selectExpr(
                "shiftright(p, 6) AS w",
                "shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT)) AS b",
            )
            .groupBy("w")
            .agg(F.bit_or("b").alias("bits"))
            .write.mode("overwrite")
            .parquet(f"{words_path}/batch={batch_id}")
        )

    return stream.writeStream.foreachBatch(_step).outputMode("update")


def bloom_read_merged(spark: SparkSession, words_path: str) -> list[int]:
    """The merged filter across every landed batch as the
    ``m_bits/64``-long word array (absent words are zero) — collect is
    bounded by the FILTER size, never the stream volume."""
    rows = (
        spark.read.parquet(words_path)
        .groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    )
    if not rows:
        return []
    n_words = max(r["w"] for r in rows) + 1
    arr = [0] * n_words
    for r in rows:
        arr[r["w"]] = r["bits"]
    return arr


def bloom_stream_probe(
    spark: SparkSession,
    words_path: str,
    items: DataFrame,
    col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Membership probe of candidate items against the merged stream
    filter: one-sided — a value the stream delivered ALWAYS probes
    true; a fresh value probes false except for documented false
    positives.  Pure map-side bit tests against the one-row broadcast
    array."""
    from platform_etl_literature_spark.operators.dedup import (
        bloom_positions_sql,
    )

    arr = bloom_read_merged(spark, words_path)
    arr = arr + [0] * (m_bits // 64 - len(arr))
    bloom_row = F.broadcast(
        local_df(spark, [(arr,)], "_bloom array<long>")
    )
    pos = bloom_positions_sql(f"`{col}`", m_bits, k)
    tests = [
        f"(element_at(_bloom, CAST(shiftright({p}, 6) AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) & 63 AS INT))) != 0"
        for p in pos
    ]
    return (
        items.crossJoin(bloom_row)
        .select(
            F.col(col),
            F.expr(" AND ".join(f"({t})" for t in tests)).alias("maybe_seen"),
        )
    )


def cell_counts_maintain_writer(
    stream: DataFrame,
    group_cols: list[str],
    cells_path: str,
) -> DataStreamWriter:
    """Streaming maintenance of EXACT per-group count cells — the
    state the exact drift tests compose on (robust.ks_from_counts
    needs (keys, value, cnt), quality_checks.chi2_from_counts needs
    (keys, cat, cnt); both are just group-by counts, which collapse
    map-side and merge bucket-wise like every sketch here).

    Same overwrite-per-batch-directory contract as
    :func:`cms_maintain_writer`: counters are not replay-idempotent,
    per-batch grids are — batch N's cells land at
    ``cells_path/batch=<id>`` and a replay overwrites identical
    cells, so the merged view stays exactly-once."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        batch.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("cnt")
        ).write.mode("overwrite").parquet(f"{cells_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(_step).outputMode("update")


def cell_counts_read_merged(
    spark: SparkSession, cells_path: str, group_cols: list[str]
) -> DataFrame:
    """The merged cell frame across every landed batch: group-wise
    counter sum — IDENTICAL cells to a direct batch count over
    everything the stream has delivered (the same exact-merge theorem
    as hdr_read_merged; pinned by test).  Feed straight into
    ks_from_counts / chi2_from_counts: the drift statistic on merged
    state equals the raw-stream statistic bit-for-bit, because the
    merge is cell-exact and both folds are integer-deterministic."""
    return (
        spark.read.parquet(cells_path)
        .groupBy(*group_cols)
        .agg(F.sum("cnt").alias("cnt"))
    )
