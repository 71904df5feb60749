"""Scale-safe global ordering primitives.

``row_number().over(Window.orderBy(...))`` — a window with an ORDER BY
but no PARTITION BY — is the one construct that funnels an entire
DataFrame through a single reducer (`Exchange SinglePartition` →
`Window`), no matter how many executors the cluster has.  Fine on a
35-row LUT; fatal on a web-corpus vocabulary of 10⁸–10⁹ distinct
tokens.  This module provides the distributed equivalent: the classic
"DataFrame zipWithIndex" construction

  1. ``repartitionByRange(n, keys)`` — a range exchange puts every row
     of partition *p* strictly before every row of partition *p+1* in
     the requested order (the sampled boundaries are a function of the
     key, so equal keys never straddle a boundary);
  2. ``sortWithinPartitions(keys)`` — each partition is locally sorted,
     so (partition id, local position) IS the global order;
  3. ``monotonically_increasing_id()`` — encodes exactly that pair
     ((pid << 33) | local_position, per the function's contract) with
     zero additional shuffle; Catalyst never reorders the
     nondeterministic expression past the sort;
  4. per-partition row counts (and optional column sums) — an
     #partitions-sized aggregate — are collected to the driver, turned
     into exclusive prefix sums, and BROADCAST back as a tiny
     (pid → offset) lookup joined on the partition id.

Global rank = offset[pid] + local_position + 1.  Deterministic and
dense whenever ``order_by`` is a total order (unique keys): the rank of
a key is its position in the total order regardless of where the
sampled range boundaries fall, so reruns — and the DuckDB oracle's
``row_number() OVER (ORDER BY ...)`` — agree bit-for-bit.

Running (prefix) sums ride the same machinery: a bounded window
``PARTITION BY pid ORDER BY keys`` computes the within-partition
running sum (every window group is one range partition — bounded, ~N/n
rows), and the broadcast lookup adds the sum of all earlier partitions.
The grand total falls out of the same collected stats as a literal —
no second scan, no global window anywhere in the plan.

Cost vs the single-reducer window: one range exchange (vs the
SinglePartition exchange), one #partitions-row collect, and — only when
running sums are requested — one bounded hash exchange for the pid
window.  At 10⁹ vocabulary rows the old shape is a single straggler
task sorting the world; this shape is n parallel sorts.

Used by :func:`operators.dedup.prefix_jaccard_pairs` (rare-first token
rank feeding the PPJoin prefix filter) and
:func:`operators.textstats.vocab_coverage` (Zipf rank + cumulative
coverage).  VERDICT r4 item 1.
"""

from __future__ import annotations

from platform_etl_literature_spark.localdf import local_df
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Persisted range-partitioned intermediates (the id-annotated table
# feeds both the stats collect and the downstream consumer exactly
# once).  Mirrors operators.dedup's registry; release via
# release_cached() or spark.catalog.clearCache().
_CACHED: list[DataFrame] = []

_LOCAL_MASK = (1 << 33) - 1  # low 33 bits of monotonically_increasing_id


def release_cached() -> int:
    """Unpersist every intermediate this module has cached; returns the
    count released."""
    n = 0
    while _CACHED:
        df = _CACHED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped
            pass
    return n


def ordered_global_index(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rnk",
    running_sum_col: str | list[str] | None = None,
    running_sum_out: str | list[str] = "cum",
    total_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a dense 1-based global rank in ``order_by`` order — and
    optionally the running (inclusive-prefix) sum of
    ``running_sum_col`` and its grand total — WITHOUT a
    single-partition window.  See the module docstring for the
    construction and its determinism contract.

    ``running_sum_col``/``running_sum_out`` accept parallel LISTS to
    carry several prefix sums through the SAME range exchange (the
    heaps_law caller needs cumulative tokens AND cumulative new
    types); ``total_out`` applies to the FIRST sum column only.

    ``order_by`` MUST be a total order (no ties), or ranks within a tie
    group follow the physical range/sort placement.  Callers here rank
    DISTINCT token tables keyed by the token itself, so the order is
    total by construction.

    Materializes the range-partitioned table (persist, registered for
    :func:`release_cached`) and runs one #partitions-row collect to
    build the broadcast offset lookup — an eager, metadata-sized job.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ann = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", 33).cast("int"))
        .withColumn("_loc", F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK)))
        .drop("_mid")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CACHED.append(ann)

    sum_cols = (
        [running_sum_col]
        if isinstance(running_sum_col, str)
        else list(running_sum_col or [])
    )
    sum_outs = (
        [running_sum_out]
        if isinstance(running_sum_out, str)
        else list(running_sum_out)
    )
    if sum_cols and len(sum_outs) < len(sum_cols):
        raise ValueError("running_sum_out must name every running_sum_col")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, sc in enumerate(sum_cols):
        # The offset table is typed `_sum_off long`: running sums are
        # supported for integral columns only (every caller here sums
        # counts).  The cast keeps a drifting caller loud at analysis
        # time instead of silently truncating doubles driver-side.
        dtype = dict(ann.dtypes).get(sc)
        if dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
            raise TypeError(
                f"running_sum_col must be integral, got {sc}:{dtype}"
            )
        aggs.append(F.sum(sc).alias(f"_s{i}"))
    stats = sorted(
        ann.groupBy("_pid").agg(*aggs).collect(), key=lambda r: r["_pid"]
    )
    # exclusive prefix sums over the #partitions-sized stats
    rows, row_off = [], 0
    sum_offs = [0] * len(sum_cols)
    for r in stats:
        rows.append((r["_pid"], row_off, *sum_offs))
        row_off += r["_n"]
        for i in range(len(sum_cols)):
            # F.sum is NULL over an all-NULL partition — contribute 0
            sum_offs[i] += int(r[f"_s{i}"] or 0)
    off_schema = "_pid int, _row_off long" + "".join(
        f", _sum_off{i} long" for i in range(len(sum_cols))
    )
    offsets = local_df(
        spark, rows or [(0, 0, *([0] * len(sum_cols)))], off_schema
    )

    out = ann.join(F.broadcast(offsets), "_pid", "left").withColumn(
        rank_col, (F.coalesce("_row_off", F.lit(0)) + F.col("_loc") + 1)
    )
    if sum_cols:
        from pyspark.sql.window import Window

        # bounded window: each group is exactly one range partition
        w = (
            Window.partitionBy("_pid")
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for i, (sc, so) in enumerate(zip(sum_cols, sum_outs)):
            out = out.withColumn(
                so,
                F.coalesce(f"_sum_off{i}", F.lit(0)) + F.sum(sc).over(w),
            )
        if total_out is not None:
            out = out.withColumn(total_out, F.lit(sum_offs[0]).cast("long"))
    drop_cols = ["_pid", "_loc", "_row_off"] + [
        f"_sum_off{i}" for i in range(len(sum_cols))
    ]
    return out.drop(*drop_cols)
