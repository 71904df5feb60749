"""Stream-stream AS-OF join — the operator Structured Streaming does
not ship (its stream-stream joins are equi/interval only; an as-of
needs "the LATEST right row at-or-before", which is an ordering
property, not a range predicate).

Semantics: for every left (fact) row, the right (quote) row with the
same key and the greatest ``right_ts <= left_ts``.  Correct under
out-of-order arrival BY CONSTRUCTION: a left row is resolved only once
the event-time watermark has STRICTLY passed its timestamp — after
that, no right row that could change its answer can still arrive (any
such row would be late beyond the watermark and dropped before the
state operator).  Strictness matters at the boundary: whether a row
stamped EXACTLY at the watermark is filtered is empirically
shape-dependent in Spark 4.1 (a bare single-source
applyInPandasWithState pipeline delivered rows at and below the
watermark; this operator's union shape drops ``ts <= wm``), so the
operator never banks on the inclusive edge — deferring one watermark
advance is safe under either convention.

Built on ``applyInPandasWithState`` over the UNION of the two tagged
streams (so one state shard per key holds both sides):

* per key, state = pending left rows (unresolved) + buffered right
  rows, both JSON-encoded with integer-microsecond timestamps
  (doubles survive bit-exact via shortest-round-trip repr);
* on every invocation (new data OR event-time timeout) the operator
  resolves all pending lefts with ``ts < watermark`` (STRICT — a
  right stamped exactly at the watermark is not yet late and could
  still arrive as an inclusive match) against the sorted right
  buffer and APPENDS them to the output;
* state is watermark-bounded: rights older than the newest
  right <= watermark are evicted (exactly one candidate must survive
  for future lefts — any future left has ts > watermark >= that
  right's successors' ts... i.e. older rights can never win again);
  resolved lefts leave state immediately;
* an EventTimeTimeout is armed at the earliest pending left's
  timestamp, so resolution fires when the watermark crosses it even
  if the key never appears in another batch.

Scale shape: the state store shards by key; per-key state is bounded
by the watermark delay × arrival rate (pending lefts) + one
surviving right per closed epoch, the same envelope as the built-in
stream-stream interval join keeps.  Output mode is append — each left
row is emitted exactly once, when its answer becomes final.

Batch twin: ``operators.asof.asof_join`` (the equality the test
pins).  Tie rule matches it when right rows are unique per (key, ts);
duplicate equal-ts rights resolve by greatest JSON payload — pass
pre-deduped rights (or a unique id first) for a pinned rule.

Lateness contract (inherited from the watermark, as for every
stateful streaming op): input rows older than the current watermark
are dropped before the state operator sees them, so ``delay`` must
cover the worst expected cross-stream disorder — the randomized test
scatters rows ~900 s out of order and declares a 1000 s delay.

State-retention caveat: a key whose stream goes silent keeps its
buffered rights (correct — a future left may still need them) with no
timeout armed once no lefts are pending; eviction for such keys only
runs at their next invocation.  For keyspaces that churn, arm a
coarse TTL upstream (filter rights older than the business horizon)
— the operator cannot know a key is retired.
"""

from __future__ import annotations

import json
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
        StructField("lefts", ArrayType(StringType())),
        StructField("rights", ArrayType(StringType())),
    ]
)


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    delay: str = "10 seconds",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join two STREAMING DataFrames.  ``left_ts``/``right_ts``
    must be TIMESTAMP columns (they drive the watermark); they are
    emitted as LONG microseconds (``{name}_us``).  Returns an
    append-mode streaming DataFrame: key columns, left payload,
    ``{right_ts}{suffix}_us`` and the right payload (NULL when no
    match), suffixed on collision.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l_payload = [c for c in left.columns if c not in keys and c != left_ts]
    r_payload = [c for c in right.columns if c not in keys and c != right_ts]

    tagged = (
        left.select(
            *keys,
            F.col(left_ts).alias("_ts"),
            F.lit(1).alias("_side"),
            F.to_json(
                F.struct(F.unix_micros(left_ts).alias("_us"), *l_payload)
            ).alias("_row"),
        )
        .unionByName(
            right.select(
                *keys,
                F.col(right_ts).alias("_ts"),
                F.lit(0).alias("_side"),
                F.to_json(
                    F.struct(
                        F.unix_micros(right_ts).alias("_us"), *r_payload
                    )
                ).alias("_row"),
            )
        )
        .withWatermark("_ts", delay)
    )

    key_fields = [
        StructField(f.name, f.dataType) for f in tagged.schema if f.name in keys
    ]
    out_schema = StructType(
        key_fields
        + [StructField(f"{left_ts}_us", LongType())]
        + [
            StructField(f.name, f.dataType)
            for f in left.schema
            if f.name in l_payload
        ]
        + [StructField(f"{right_ts}{suffix}_us", LongType())]
        + [
            StructField(
                f.name + suffix
                if (f.name in l_payload or f.name in keys)
                else f.name,
                f.dataType,
            )
            for f in right.schema
            if f.name in r_payload
        ]
    )
    l_names = list(l_payload)
    r_names = list(r_payload)

    def _resolve(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import json as _json

        import pandas as _pd

        lefts: list[str] = []
        rights: list[str] = []
        if state.exists:
            st_l, st_r = state.get
            lefts = list(st_l or [])
            rights = list(st_r or [])
        if not state.hasTimedOut:
            for pdf in pdfs:
                for side, row in zip(pdf["_side"], pdf["_row"]):
                    (lefts if side == 1 else rights).append(row)

        wm_us = state.getCurrentWatermarkMs() * 1000
        rs = sorted(
            (_json.loads(r) for r in rights), key=lambda d: (d["_us"], _json.dumps(d, sort_keys=True))
        )
        out_rows = []
        still_pending: list[str] = []
        for lraw in lefts:
            ld = _json.loads(lraw)
            # resolve only lefts STRICTLY inside the closed region:
            # Spark's late-record filter drops rows strictly older
            # than the watermark, so a right with event time exactly
            # equal to the watermark (r_us == wm_us == ld_us) can
            # still arrive in a later batch and would be an inclusive
            # match for this left — emission waits until the
            # watermark has strictly passed the left's timestamp
            if ld["_us"] >= wm_us:
                still_pending.append(lraw)
                continue
            match = None
            for rd in rs:  # rs sorted asc: last <= wins
                if rd["_us"] <= ld["_us"]:
                    match = rd
                else:
                    break
            rec = list(key) + [ld["_us"]] + [ld.get(c) for c in l_names]
            if match is None:
                rec += [None] + [None for _ in r_names]
            else:
                rec += [match["_us"]] + [match.get(c) for c in r_names]
            out_rows.append(rec)

        # evict rights that can never win again: every unresolved or
        # future left has ts >= watermark, so among rights <= watermark
        # only the newest (greatest (ts, payload) — the tie-rule
        # winner) can still match; it plus all rights > watermark
        # remain candidates.  An equal-ts right arriving later can
        # only BEAT the kept one on payload, never resurrect an
        # evicted smaller one, so the boundary stays safe under the
        # strict left-resolution rule above
        keep_idx = len(rs)
        for i, rd in enumerate(rs):
            if rd["_us"] > wm_us:
                keep_idx = i
                break
        keep_from = max(0, keep_idx - 1)
        kept_rights = [
            _json.dumps(d, sort_keys=True) for d in rs[keep_from:]
        ]

        if still_pending or kept_rights:
            state.update((still_pending, kept_rights))
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

    return tagged.groupBy(*keys).applyInPandasWithState(
        _resolve,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
