"""Streaming robust-outlier flagging: stream-static enrichment with
batch-computed median/MAD statistics.

The lambda-architecture shape for anomaly detection: the robust
location/scale statistics (operators.robust.robust_stats — exact
median/MAD, which NEED a corpus pass) are computed in batch and
refreshed on a cadence; the stream side is a pure per-row enrichment —
broadcast join on the group key plus fixed arithmetic — so flagging
adds ZERO streaming state: no watermark, no aggregation, latency is
one micro-batch.

Identical code path on batch and streaming inputs; the test pins
stream output == operators.robust.robust_outliers on the same data,
row for row, because the z-score arithmetic is shared (same MAD_SIGMA,
same rounding edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platform_etl_literature_spark.operators.robust import MAD_SIGMA


def flag_outliers(
    stream: DataFrame,
    stats: DataFrame,
    key_cols: list[str],
    value_col: str,
    cutoff: float = 3.5,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Flag rows whose robust z-score exceeds ``cutoff``.

    ``stats`` is the (keys, med, mad) frame from
    ``operators.robust.robust_stats`` (batch-computed; broadcast).
    Rows in groups with no stats or ``mad = 0`` are not scoreable and
    are dropped — the same contract as the batch operator.
    Returns (*carry_cols, *key_cols, value, med, mad, z) with the same
    6 dp output rounding as the batch side.
    """
    carry = list(carry_cols or [])
    z = (
        F.lit(MAD_SIGMA) * (F.col(value_col) - F.col("med")) / F.col("mad")
    )
    return (
        stream.join(
            F.broadcast(stats.select(*key_cols, "med", "mad")), key_cols
        )
        .filter((F.col("mad") > 0) & (F.abs(z) > cutoff))
        .select(
            *carry,
            *key_cols,
            F.col(value_col),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(z, 6).alias("z"),
        )
    )
