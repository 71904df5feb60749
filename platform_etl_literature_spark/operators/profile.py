"""Data-quality table profiling (the Deequ/Great-Expectations core):
per-column row count, null count, exact distinct count, min and max —
the screening pass a training-data pipeline runs before trusting a new
source drop.

Scale shape: typed null/min/max stats reduce in ONE single-row
aggregate over one scan (map-side combine, no shuffle of data rows);
the exact distinct counts come from a melted (col_name, value) stream —
one explode, ONE shuffle keyed by (col_name, value) via the partial
distinct aggregate — because n parallel ``count(DISTINCT col)`` branches
in a single agg would either multiply scans or expand rows n-fold
anyway, and the melt keys the shuffle so every column's distinct work
spreads across the cluster.  The two tiny results (one row; n rows)
broadcast-join on col_name.

Values are reported as strings for a uniform schema; casts are
injective for the supported types (integral, string, date), so the
distinct count over the cast equals the typed distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile the given columns → one row per column:
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    if not cols:
        raise ValueError("table_profile needs at least one column")

    stats = df.agg(
        F.count(F.lit(1)).alias("_n_rows"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{i}") for i, c in enumerate(cols)],
        *[F.min(c).cast("string").alias(f"_min_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("string").alias(f"_max_{i}") for i, c in enumerate(cols)],
    )
    typed = stats.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("_n_rows").alias("n_rows"),
                        F.col(f"_nulls_{i}").alias("n_nulls"),
                        F.col(f"_min_{i}").alias("min_value"),
                        F.col(f"_max_{i}").alias("max_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("kv")
    ).select("kv.*")

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.*")
    distincts = melted.groupBy("col_name").agg(
        F.count_distinct("v").alias("n_distinct")
    )

    return typed.join(F.broadcast(distincts), "col_name", "left").select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )
