"""Per-key sequential time-series operators via grouped-map
``applyInPandas`` — the batch escape hatch for order-dependent folds
that window frames can't express cheaply (recurrences where row i
depends on the full prefix, not a fixed frame).

Scale shape: one shuffle on the group key, then each group is a single
Arrow batch in one Python worker.  State is O(1) per group during the
fold; output is one row per group.  Skewed keys (one user = half the
events) are the hazard — mitigate upstream with AQE skew handling or a
two-level pre-aggregation when the recurrence allows it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def user_value_ewma(
    events: DataFrame, alpha: float = 0.2, value_col: str = "value"
) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per user, in
    (ts, event_id) order: e_0 = v_0; e_i = α·v_i + (1−α)·e_{i−1}.

    The fold is sequential and order-sensitive — a window function would
    need an unbounded frame with a per-row decaying weight, which Spark
    cannot express without O(n²) work.  Deterministic across engines:
    same operand order, same IEEE754 ops (the DuckDB oracle mirrors it
    with list_reduce over the identically-ordered list).
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        e = None
        for v in pdf[value_col]:
            e = v if e is None else alpha * v + (1.0 - alpha) * e
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [round(e, 6)],
            }
        )

    # project to the fold's columns BEFORE the grouped map: every column
    # of the grouped DataFrame crosses the Arrow boundary per row, so
    # carrying payload columns (event props JSON…) through the shuffle
    # and into Python pays for bytes the fold never reads
    needed = events.select("user_id", "ts", "event_id", value_col)
    return needed.groupBy("user_id").applyInPandas(
        fold, "user_id long, n_events long, ewma double"
    )
