"""Skew-mitigation helpers: salted two-phase aggregation.

AQE's skew-join splitting handles skewed *joins*; skewed *aggregations*
(one hot group key receiving a large fraction of rows) still funnel the
hot key through a single reducer.  Salting splits each group into
``n_salts`` sub-groups for the first (parallel) aggregation, then a
cheap second aggregation over ``n_salts`` partial rows per key merges
them.  Works for any algebraic aggregate (sum/count/min/max); shown
here for the common count/sum case.

Spark's map-side partial aggregation already covers mild skew; salting
matters when a hot key's partials are large (collect_list-ish state) or
when partial aggregation is disabled by distinct operations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {"count", "sum", "min", "max"}.  Result is identical to
    ``df.groupBy(keys).agg(...)`` for these algebraic aggregates.
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))

    phase1_aggs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
        else:
            phase1_aggs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)

    phase2_aggs = []
    for out, (_, fn) in aggs.items():
        merge = "sum" if fn in ("count", "sum") else fn
        phase2_aggs.append(getattr(F, merge)(f"_p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*phase2_aggs)
