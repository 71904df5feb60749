"""Streaming multi-touch attribution — the stream twin of
``operators.funnel.touch_attribution``.

The batch operator is one RANGE-framed window; a stream cannot frame
over event time directly (the frame's content is only final once the
watermark has passed the conversion), so the operator defers exactly
like the stream-stream as-of join (``asof_stream.py``, whose boundary
rules this module copies verbatim):

* per user, state = pending conversions + buffered touches, both
  JSON-encoded with integer-microsecond timestamps;
* a conversion resolves only when the watermark has STRICTLY passed
  its timestamp — the attribution window is inclusive at the
  conversion edge, so a touch stamped exactly at the conversion
  (t_us == c_us == wm) could still arrive while wm == c_us;
* resolution replays the batch semantics on the buffered window
  content: last touch = max (us, id), first touch = min (us, id),
  n_touches = count over ``[c_us − lookback, c_us]`` inclusive;
  unattributable conversions emit NULL touch columns and
  ``n_touches = 0`` (the batch contract);
* touch eviction is exact: every pending or future conversion has
  ``c_us ≥ wm``, so its window reaches back at most to
  ``wm − lookback`` — touches older than that can never be counted
  again and leave state;
* an EventTimeTimeout is armed at the earliest pending conversion so
  resolution fires when the watermark crosses it even if the user
  never appears in another batch.

State per user is bounded by (touch arrival rate × lookback) +
(conversion rate × watermark delay) — the interval-join envelope.
Output mode is append: each conversion is emitted exactly once, when
its attribution becomes final.  Equality with the batch operator on
the watermark-resolved prefix is pytest-pinned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("convs", ArrayType(StringType())),
        StructField("touches", ArrayType(StringType())),
    ]
)


def touch_attribution_stream(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_seconds: int = 172_800,
    delay: str = "10 seconds",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Attribute conversions on a STREAMING events DataFrame.  Returns
    an append-mode stream with the batch operator's columns:
    (conversion_id, user_id, conversion_us, last_touch_id,
    last_touch_type, first_touch_id, first_touch_type, n_touches)."""
    lookback_us = lookback_seconds * 1_000_000
    touch_list = list(touch_types)

    key_field = [f for f in events.schema if f.name == user_col][0]
    tagged = (
        events.where(
            F.col(type_col).isin(*(touch_list + [conversion_type]))
        )
        .select(
            F.col(user_col),
            F.col(ts_col).alias("_ts"),
            F.to_json(
                F.struct(
                    F.unix_micros(ts_col).alias("_us"),
                    F.col(id_col).alias("_id"),
                    F.col(type_col).alias("_ty"),
                )
            ).alias("_row"),
        )
        .withWatermark("_ts", delay)
    )

    out_schema = StructType(
        [
            StructField("conversion_id", LongType()),
            StructField(user_col, key_field.dataType),
            StructField("conversion_us", LongType()),
            StructField("last_touch_id", LongType()),
            StructField("last_touch_type", StringType()),
            StructField("first_touch_id", LongType()),
            StructField("first_touch_type", StringType()),
            StructField("n_touches", LongType()),
        ]
    )
    # after the type filter above, every non-conversion row IS a touch
    conv_ty = conversion_type

    def _resolve(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import json as _json

        import pandas as _pd

        convs: list[str] = []
        touches: list[str] = []
        if state.exists:
            st_c, st_t = state.get
            convs = list(st_c or [])
            touches = list(st_t or [])
        if not state.hasTimedOut:
            for pdf in pdfs:
                for raw in pdf["_row"]:
                    d = _json.loads(raw)
                    (convs if d["_ty"] == conv_ty else touches).append(raw)

        wm_us = state.getCurrentWatermarkMs() * 1000
        ts = sorted(
            (_json.loads(t) for t in touches),
            key=lambda d: (d["_us"], d["_id"]),
        )
        out_rows = []
        still_pending: list[str] = []
        for craw in convs:
            cd = _json.loads(craw)
            # strict boundary (the asof_stream rule): while
            # c_us == wm an inclusive equal-ts touch can still arrive
            if cd["_us"] >= wm_us:
                still_pending.append(craw)
                continue
            lo = cd["_us"] - lookback_us
            win = [t for t in ts if lo <= t["_us"] <= cd["_us"]]
            rec = [cd["_id"], key[0], cd["_us"]]
            if win:
                last, first = win[-1], win[0]  # ts sorted by (us, id)
                rec += [
                    last["_id"], last["_ty"], first["_id"], first["_ty"],
                    len(win),
                ]
            else:
                rec += [None, None, None, None, 0]
            out_rows.append(rec)

        # exact eviction: every unresolved/future conversion has
        # c_us >= wm, so no window reaches below wm - lookback
        kept = [
            _json.dumps(t, sort_keys=True)
            for t in ts
            if t["_us"] >= wm_us - lookback_us
        ]

        if still_pending or kept:
            state.update((still_pending, kept))
            if still_pending:
                min_ms = min(
                    _json.loads(x)["_us"] for x in still_pending
                ) // 1000
                state.setTimeoutTimestamp(
                    max(min_ms, state.getCurrentWatermarkMs() + 1)
                )
        else:
            state.remove()

        if out_rows:
            cols = [f.name for f in out_schema.fields]
            yield _pd.DataFrame(out_rows, columns=cols)

    return tagged.groupBy(user_col).applyInPandasWithState(
        _resolve,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
