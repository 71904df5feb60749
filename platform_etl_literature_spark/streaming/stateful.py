"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` (Arrow-batched user state).

This is the escape hatch for stateful semantics the built-in windowed
aggregations can't express (running aggregates emitted every batch,
custom eviction, cross-event derived state).  State is per group key —
at scale the state store shards by the groupBy key, so per-user state
is bounded and the operator scales with key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"
STATE_SCHEMA = "n LONG, total DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (cumulative) per-user event count + value total, emitted
    on every micro-batch the user appears in.  Works on a streaming
    DataFrame; the batch twin is a plain groupBy aggregation.

    The update function is a closure (pickled by value) so executors do
    not need this package importable — same constraint as the stemmer
    UDF in functions/text.py.
    """

    def update_user_totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            # exact cents accumulation (values have 2 decimals)
            total += float((pdf["value"] * 100).round().astype("int64").sum()) / 100.0
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
