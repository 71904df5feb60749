"""Incremental view maintenance (IVM) for distributive aggregates.

The 100 TB pattern: a grouped aggregate over a fact corpus (counts,
sums, and anything algebraic over them — averages, rates) is far
smaller than the facts.  Once built, it should never be recomputed by
rescanning facts: a CDC batch of inserts and deletes aggregates to a
SIGNED delta (inserts +1, deletes −1), and the new state is the old
state combined with the delta per group — O(|state| + |delta|) work,
with the delta side aggregated map-side before it ever shuffles.
Counts and sums are exactly decomposable under deletion (unlike
min/max, which this module deliberately does not offer — retracting a
min requires the full group), so maintenance is EXACT:
``apply(build(A), inserts=B, deletes=C) == build((A ∪ B) − C)``
row-for-row — the theorem the suite oracle's matching hash proves.

Contract: ``deletes`` must be the exact before-image rows being
removed (the standard CDC assumption — e.g. the `removed` leg of
``merge.corpus_diff``).  Groups whose row count reaches zero leave the
state entirely; a count that would go negative is a violated contract
and raises at read time via the ``n_rows >= 0`` guard column rather
than silently corrupting later applies.

Reference scope note: the reference pipeline (Processing/Evidence)
recomputes its aggregates from scratch each run — batch-only by
design (`Processing.scala`); this module is part of the extension
surface (SURVEY.md §7.6), pairing the versioned-corpus family
(operators/merge.py) with aggregate maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _signed_delta(
    df: DataFrame, keys: list[str], sum_cols: list[str], sign: int
) -> DataFrame:
    """Per-group signed contribution: (keys, n_rows, sum_<c>...) with
    every measure multiplied by ``sign``.  One aggregation with
    map-side partial sums — the shuffle carries group rows, never
    fact rows."""
    aggs = [F.sum(F.lit(sign)).cast("long").alias("n_rows")] + [
        (F.sum(c) * sign).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def agg_state_build(
    df: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Build the maintained state from scratch: (keys, n_rows,
    sum_<c>...) — the only fact-sized scan in the lifecycle."""
    return _signed_delta(df, keys, sum_cols, 1)


def agg_state_apply(
    state: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    inserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Fold a CDC batch into the state without touching the facts:
    aggregate inserts at +1 and deletes at −1 (each map-side combined
    to group granularity before shuffling), union with the state, and
    re-aggregate per group.  Cost is one shuffle of
    |state| + |delta groups| rows — independent of fact count.  Groups
    ending at n_rows == 0 drop out; a negative count (deletes that
    were never inserted — a violated CDC contract) is kept and trips
    the :func:`agg_state_read` guard loudly instead of corrupting
    later applies silently."""
    parts = [state]
    if inserts is not None:
        parts.append(_signed_delta(inserts, keys, sum_cols, 1))
    if deletes is not None:
        parts.append(_signed_delta(deletes, keys, sum_cols, -1))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    merged = out.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
    return merged.where(F.col("n_rows") != 0)


def agg_state_read(
    state: DataFrame, sum_cols: list[str], avg_decimals: int = 6
) -> DataFrame:
    """Derived view over the state: per-group count, sums, and rounded
    averages.  Raises (via an ANSI CHECK-style filter-and-assert
    column) if any group carries a negative count — the violated
    delete contract surfaced at the read boundary."""
    checked = state.withColumn(
        "n_rows",
        F.when(
            F.col("n_rows") < 0,
            F.raise_error(
                "negative group count: deletes exceeded inserts"
            ).cast("long"),
        ).otherwise(F.col("n_rows")),
    )
    avgs = [
        F.round(F.col(f"sum_{c}") / F.col("n_rows"), avg_decimals).alias(
            f"avg_{c}"
        )
        for c in sum_cols
    ]
    return checked.select("*", *avgs)
