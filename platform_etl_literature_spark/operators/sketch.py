"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
by Spark as ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB pattern this encodes: compute per-fine-grain sketches ONCE
(e.g. per source × day at ingest), persist the few-KB sketch binaries
with the data, and answer every coarser distinct-count rollup (per
source, per day, global, ad-hoc unions) by MERGING sketches — no
re-scan of the raw data, ever.  Exact `count_distinct` cannot do this:
its partial state is the value set itself, so every new rollup grain
is a full shuffle of the corpus keys.  HLL union is associative and
deterministic for a fixed lgK, so merged ESTIMATES are reproducible
and re-aggregation loses nothing: estimate(union(sketch per fine
key)) == estimate(sketch(all rows)) — pinned in
tests/test_operators.py::test_hll_rollup_merge_equals_direct.  (The
serialized sketch BINARIES are not bitwise identical across the two
routes — compact encodings differ by build path — so persisted
sketches must be compared by estimate, never by checksum.)

The estimate is approximate (~1.04/sqrt(2^lgK) relative standard
error — ~1.6% at the default lgK=12), so the suite query is rows-only
(the same inherent-engine-specificity as `approx_distinct_window`, its
windowed HLL sibling); the exact analogs stay value-checked elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of distinct ``value_col`` values: one
    aggregation with map-side partial sketches (the shuffle carries
    ~2^lgk-byte sketch states, independent of row count).  Returns
    (*keys, n_rows, sketch binary)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
    )


def rollup_sketches(
    sketches: DataFrame, keys: list[str]
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain by HLL union
    — touches only sketch rows, never the raw data.  Returns
    (*keys, n_rows, n_distinct_est)."""
    return sketches.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct_est"),
    )
