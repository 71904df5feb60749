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

from platform_etl_literature_spark.localdf import local_df
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


def key_skew_stats(df: DataFrame, keys: list[str], n_salts_target: int = 16) -> DataFrame:
    """Skew diagnostics for a prospective groupBy/join key: one row of
    corpus-level distribution stats — key count, total rows, the hot
    key's share, mean rows/key, the max/mean ratio, and the salt factor
    that would level the hot key to ~mean (capped at
    ``n_salts_target``).

    Use it to DECIDE between a plain groupBy, :func:`salted_agg`, or a
    broadcast: hot_share near 1/partitions means one straggler task.

    Scale shape: one exact per-key count (map-side partial combine) and
    a single-row rollup over the key table — no row-level shuffle
    beyond the count itself.
    """
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_n").alias("n_rows"),
        F.max("_n").alias("max_key_rows"),
        F.round(F.max("_n") / F.sum("_n"), 6).alias("hot_share"),
        F.round(F.sum("_n") / F.count(F.lit(1)), 6).alias("mean_key_rows"),
        F.round(F.max("_n") / (F.sum("_n") / F.count(F.lit(1))), 6).alias(
            "max_mean_ratio"
        ),
        F.least(
            F.lit(n_salts_target),
            F.ceil(F.max("_n") / (F.sum("_n") / F.count(F.lit(1)))).cast("int"),
        ).alias("suggested_salts"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe equijoin: every big-side row gets a deterministic
    salt (content hash mod ``n_salts``), the small side replicates once
    per salt value, and the join runs on (keys..., salt) — a hot join
    key's rows now spread over ``n_salts`` reducers instead of one.

    This is the manual fallback for engines/paths where AQE's runtime
    skew-join splitting doesn't apply (it only fires on sort-merge
    joins with ``spark.sql.adaptive.skewJoin`` and post-shuffle stats;
    a bucketed or pre-partitioned join bypasses it).  Result set is
    EXACTLY the plain join's: each big row matches precisely the one
    replica carrying its salt.  The salt hashes the big row's join-key
    and payload columns (xxhash64 — deterministic across retries, so a
    recomputed task re-derives the same salt; duplicate rows share a
    salt, which costs skew relief but never correctness).

    ``how`` supports inner / left joins (the replicated side is the
    RIGHT side; a right/full join against a replicated table would
    produce phantom unmatched replicas).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def bloom_join(
    big: "DataFrame",
    small: "DataFrame",
    big_key: str,
    small_key: str,
    how: str = "inner",
    m_bits: int = 1 << 16,
    k: int = 3,
) -> "DataFrame":
    """Bloom-pruned equijoin — the runtime-filter pattern for 100 TB
    shuffle reduction: build a Bloom filter over the small side's keys
    (sketch-sized: ``m_bits/64`` longs, built with one distinct +
    bit_or aggregation), broadcast it as a single row, and drop big
    rows map-side BEFORE the join ever shuffles or probes.  Bloom
    filters have no false negatives, so the result is EXACTLY the
    plain join's (the oracle theorem); false positives only pass extra
    rows into the join, which discards them — the knob trades filter
    memory for shuffle volume, never correctness.

    Spark's AQE injects a similar runtime filter for some shapes; this
    operator makes the reduction explicit, deterministic
    (engine-portable md5 double-hash positions, replayable by a SQL
    oracle false-positive-for-false-positive), and available to any
    join the planner would not cover.  ``how`` supports inner / left
    semi (shapes where dropping non-matching big rows early is
    sound)."""
    from platform_etl_literature_spark.operators.dedup import (
        bloom_filter_words,
        bloom_hash_sql,
        bloom_positions_from,
    )

    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(f"bloom_join supports inner/semi joins, got {how!r}")
    spark = big.sparkSession
    arr = bloom_filter_words(
        small.selectExpr(f"CAST(`{small_key}` AS STRING) AS _g").where(
            F.col("_g").isNotNull()
        ),
        "_g",
        m_bits,
        k,
    )
    bloom_row = F.broadcast(
        local_df(spark, [(arr,)], "_bloom array<long>")
    )
    # hash once per row (round 10): projecting (h1, h2) before the k
    # bit tests halves the per-row md5 count and keeps the generated
    # code small (the fully-inlined form's Janino compile alone cost
    # ~1.4 s per query -- see dedup.bloom_hash_sql)
    h1, h2 = bloom_hash_sql(f"CAST(`{big_key}` AS STRING)")
    pos = bloom_positions_from("_bh1", "_bh2", m_bits, k)
    bit_tests = [
        f"(element_at(_bloom, CAST(shiftright({p}, 6) AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) & 63 AS INT))) != 0"
        for p in pos
    ]
    pre = (
        big.selectExpr("*", f"{h1} AS _bh1", f"{h2} AS _bh2")
        .crossJoin(bloom_row)
        .where(F.expr(" AND ".join(f"({t})" for t in bit_tests)))
        .drop("_bloom", "_bh1", "_bh2")
    )
    # the small side is deliberately NOT forced to broadcast: bloom
    # pruning matters most exactly when the small side is too large to
    # broadcast but its m_bits-sized filter is not — the join strategy
    # stays Catalyst/AQE's call
    jhow = "left_semi" if how in ("left_semi", "semi") else how
    return pre.join(small, pre[big_key] == small[small_key], jhow)
