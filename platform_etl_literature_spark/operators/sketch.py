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


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
# mergeable frequency sketch.  Same persist-fine/merge-coarse contract
# as the HLL sketches above, but for COUNTS: build one d×w counter
# grid per fine grain at ingest, answer any coarser heavy-hitter /
# frequency question by summing grids cell-wise — counter addition is
# exact, so merged sketches are IDENTICAL to a direct build over the
# union (pinned by test), unlike HLL where only the estimate survives.
# Estimates are one-sided: est(x) = min over d rows of the cell
# counters >= true count(x), with overestimate bounded by collisions
# (~2n/w at the standard depth).  Hash positions reuse the
# engine-portable md5 double hash (the Bloom pattern in
# operators/dedup.py), so a SQL oracle can replay the EXACT grid —
# collisions and all.
# ---------------------------------------------------------------------------


def cms_positions_sql(item_sql: str, w: int, d: int) -> list[str]:
    """SQL expressions for the ``d`` count-min row positions of an
    item — Kirsch–Mitzenmacher double hashing (h1 + i·h2 mod w) over
    md5, one expression per sketch row.  Both base hashes are
    non-negative 32-bit, so ``%`` agrees across engines and the
    combination never overflows a long."""
    h1 = f"CAST(conv(substring(md5({item_sql}), 1, 8), 16, 10) AS BIGINT)"
    h2 = (
        f"CAST(conv(substring(md5(concat('c2:', {item_sql})), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    return [f"(({h1}) + {i} * ({h2})) % {w}" for i in range(d)]


def cms_build(df: DataFrame, col: str, w: int = 8192, d: int = 3) -> DataFrame:
    """Build the sketch grid over ``df[col]``: (r, p, cnt) rows, one
    per NON-EMPTY cell (absent cells are zero).  One map-side explode
    of d positions per row and one (r, p)-keyed aggregation with
    map-side partial counts — the shuffle carries at most d·w cells
    per task, a function of the SKETCH SIZE, never of the corpus."""
    if w < 1 or d < 1:
        raise ValueError(f"w and d must be >= 1, got w={w} d={d}")
    pos = cms_positions_sql(f"`{col}`", w, d)
    structs = ", ".join(
        f"struct({i} AS r, {p} AS p)" for i, p in enumerate(pos)
    )
    return (
        df.where(F.col(col).isNotNull())
        .selectExpr(f"`{col}`")
        .selectExpr(f"explode(array({structs})) AS c")
        .groupBy(F.col("c.r").alias("r"), F.col("c.p").alias("p"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketch grids built with the same (w, d): cell-wise counter
    sum.  Exact — merge(build(A), build(B)) has identical cells to
    build(A ∪ B)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "p").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    items: DataFrame, col: str, sketch: DataFrame, w: int, d: int
) -> DataFrame:
    """Estimated count per item: min over the item's d cells.  The
    grid broadcasts (≤ d·w rows by construction); items explode their
    d positions map-side, take a broadcast join, and reduce with a
    map-side-combined min.  Cells the grid never saw coalesce to 0
    (an item absent from the build data estimates 0 only if at least
    one of its cells is empty — otherwise it inherits the collision
    floor, the documented one-sided error)."""
    pos = cms_positions_sql(f"`{col}`", w, d)
    structs = ", ".join(
        f"struct({i} AS r, {p} AS p)" for i, p in enumerate(pos)
    )
    probed = (
        items.where(F.col(col).isNotNull())
        .selectExpr(f"`{col}`", f"explode(array({structs})) AS c")
        .select(col, F.col("c.r").alias("r"), F.col("c.p").alias("p"))
        .join(F.broadcast(sketch), ["r", "p"], "left")
    )
    return probed.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_count")
    )


def cms_topk(
    df: DataFrame, col: str, w: int = 8192, d: int = 3, k: int = 20
) -> DataFrame:
    """Heavy hitters by count-min estimate: build the grid, estimate
    every DISTINCT item (candidate generation is the vocabulary-sized
    distinct, the same compaction as bpe_encode), return the top-``k``
    by (est_count desc, item) with a 1-based rank — deterministic, so
    the SQL oracle replays it exactly."""
    from platform_etl_literature_spark.operators.retrieval import (
        ranked_topk,
    )

    sketch = cms_build(df, col, w, d)
    est = cms_estimate(df.select(col).distinct(), col, sketch, w, d)
    return ranked_topk(
        est, [F.col("est_count").desc(), F.col(col)], k
    ).select(col, "est_count", "rank")


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, d: int = 3
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min grids built
    with the same (w, d) over the join key: per sketch row the
    cell-wise inner product Σ_p a[r,p]·b[r,p] over-counts |A ⋈ B| by
    exactly the hash collisions, so the MIN across the d rows is the
    classic one-sided estimate (Cormode & Muthukrishnan '05, the CM
    analog of the AMS inner product): always ≥ the true join size,
    tight when w ≫ distinct keys.

    This is the planner's use of the sketch family: join sizes of
    100 TB fact tables judged from two broadcast-sized grids that were
    built in one pass each (and are MERGEABLE across partitions/days —
    estimate first, shuffle only if the answer says it's affordable).
    Inner-join the grids on (r, p): absent cells are zero and
    contribute nothing.  Returns one row (est_join_size).
    """
    prod = (
        sketch_a.alias("a")
        .join(sketch_b.alias("b"), ["r", "p"])
        .select(
            F.col("r"),
            (F.col("a.cnt") * F.col("b.cnt")).alias("_prod"),
        )
    )
    per_row = prod.groupBy("r").agg(F.sum("_prod").alias("_ip"))
    # a row with NO colliding cells has inner product 0; surface it via
    # the d-row spine so the min is taken over all d rows
    return per_row.agg(
        F.when(F.count(F.lit(1)) < d, F.lit(0))
        .otherwise(F.min("_ip"))
        .cast("long")
        .alias("est_join_size")
    )


# ---------------------------------------------------------------------------
# HDR log-linear quantile sketch (Tene's HdrHistogram bucket scheme;
# the same persist-fine/merge-coarse contract as HLL/CMS/KMV above but
# for QUANTILES — the missing member of the sketch family).  Buckets
# are log-linear over positive integers: octave e = floor(log2(v))
# computed EXACTLY as length(bin(v)) - 1, then m linear sub-buckets
# per octave via pure integer arithmetic, so bucketing is
# engine-portable bit-for-bit (no float log at any point — DDSketch's
# ceil(log_gamma(x)) would be one libm ulp away from a cross-engine
# bucket flip at boundaries).  Bucket counts are exact counters, so
# merge == direct build IDENTICALLY (the CMS invariant), and any
# quantile is answered from the sketch with relative error <= 1/(2m)
# (bucket width 2^e/m at values >= 2^e, midpoint estimate).  Values
# are positive integers by contract — fixed-point scale floats first
# (cents, micro-units), the repo-wide float-parity policy anyway.
# ---------------------------------------------------------------------------


def hdr_bucket_sql(v_sql: str, m: int) -> str:
    """Engine-portable-by-construction bucket id for a positive
    integer expression: ``e*m + ((v - 2^e) * m) DIV 2^e`` with
    ``e = length(bin(v)) - 1``.  ``pow(2, e)`` is a power of two —
    exactly representable, so the BIGINT cast is exact in any IEEE
    engine; everything after is integer arithmetic.  (Spark dialect;
    a DuckDB oracle replays it with ``//`` for DIV.)

    Domain bound: ``(v - 2^e) * m`` runs in BIGINT, so values must
    satisfy ``v <= (2^63 - 1) DIV m`` (~2^58 at the default m=32) or
    the multiply overflows and silently flips bucket ids (or raises
    under ANSI mode).  :func:`hdr_build` enforces this in-plan with
    ``raise_error`` — reachable in practice for nano-unit fixed-point
    scaling, which is exactly when a silent flip would be worst."""
    e = f"(length(bin({v_sql})) - 1)"
    p2e = f"CAST(pow(2, {e}) AS BIGINT)"
    return f"({e} * {m} + (({v_sql}) - {p2e}) * {m} DIV {p2e})"


def hdr_domain_max(m: int) -> int:
    """Largest value hdr_bucket_sql buckets without BIGINT overflow."""
    return (2**63 - 1) // m


def hdr_build(
    df: DataFrame, col: str, m: int = 32, keys: list[str] | None = None
) -> DataFrame:
    """Build per-``keys`` histograms over positive-integer ``df[col]``:
    (*keys, b, cnt) rows, one per non-empty bucket.  One map-side
    projection + one (keys, b)-keyed aggregation with partial counts —
    the shuffle carries at most ~63·m cells per key, a function of the
    SKETCH SIZE, never the corpus.  Rows with ``col`` NULL or < 1 are
    out of domain and excluded (fixed-point scale first); values
    above ``hdr_domain_max(m)`` would overflow the bucket arithmetic
    and raise from the executor instead of silently mis-bucketing —
    scale the fixed point down (or reduce m) if the domain needs
    them."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    keys = list(keys or [])
    maxv = hdr_domain_max(m)
    guarded = (
        f"CASE WHEN `{col}` > {maxv} THEN CAST(raise_error(concat("
        f"'hdr_build: value ', CAST(`{col}` AS STRING), "
        f"' exceeds domain max {maxv} for m={m}; fixed-point scale "
        f"down or reduce m')) AS BIGINT) ELSE `{col}` END"
    )
    b = F.expr(hdr_bucket_sql(f"({guarded})", m))
    return (
        df.where(F.col(col).isNotNull() & (F.col(col) >= 1))
        .groupBy(*keys, b.alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge histograms built with the same ``m``: bucket-wise counter
    sum.  Exact — merge(build(A), build(B)) has cells IDENTICAL to
    build(A ∪ B) (pinned by test), so sketches persisted per
    source × day answer any coarser rollup without re-scanning."""
    if not sketches:
        raise ValueError("hdr_merge needs at least one sketch")
    keys = list(keys or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "b").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame,
    qs: list[float],
    m: int = 32,
    keys: list[str] | None = None,
) -> DataFrame:
    """Nearest-rank quantile estimates from a histogram: for each q,
    the midpoint of the first bucket whose cumulative count reaches
    ``max(1, ceil(q·n))`` — relative error <= 1/(2m) by the bucket
    width bound.  Everything here is sketch-sized: the cumulative
    window partitions by ``keys`` over <= ~63·m bucket rows per key,
    and the q probes join as a broadcast literal array.  Returns
    (*keys, q, n, est_q) with est_q rounded to 6 places (the bucket
    midpoint is derived from integers by identical IEEE arithmetic in
    any engine, so the value is oracle-checkable)."""
    from pyspark.sql.window import Window

    keys = list(keys or [])
    n = sketch.groupBy(*keys).agg(F.sum("cnt").alias("n"))
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if keys
        else Window.partitionBy(F.lit(0))
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("_cum", F.sum("cnt").over(w))
    probes = n.select(
        *keys,
        "n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn(
        "_target",
        F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n"))),
    )
    hit = cum.join(probes, keys) if keys else cum.crossJoin(F.broadcast(probes))
    hit = hit.where(
        (F.col("_cum") >= F.col("_target"))
        & (F.col("_cum") - F.col("cnt") < F.col("_target"))
    )
    e = (F.col("b") / m).cast("long")
    sub = F.col("b") - e * m
    lo = F.pow(F.lit(2.0), e.cast("double")) * (
        F.lit(1.0) + sub.cast("double") / F.lit(float(m))
    )
    hi = F.pow(F.lit(2.0), e.cast("double")) * (
        F.lit(1.0) + (sub + 1).cast("double") / F.lit(float(m))
    )
    return hit.select(
        *keys,
        "q",
        "n",
        F.round((lo + hi) / F.lit(2.0), 6).alias("est_q"),
    )


def psi_drift(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Population Stability Index between two HDR histograms built
    with the same ``m`` — the standard drift monitor for a training-
    data pipeline (did this week's value distribution shift against
    the reference window?): PSI = Σᵢ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over the
    aligned buckets, with the usual rule of thumb <0.1 stable /
    0.1–0.25 drifting / >0.25 shifted.

    Works ON THE SKETCHES, not the data: drift between any two
    persisted windows costs a bucket-aligned FULL OUTER join of two
    ≤ ~63·m-row frames per key — never a rescan of either corpus (the
    persist-fine/compare-later contract the whole sketch family
    exists for).  Buckets are Laplace-smoothed (+1 per aligned
    bucket, totals + K) so one-sided buckets contribute finite terms.

    Exactness: each bucket's term is rounded to integer NANO-units
    and SUMMED AS INTEGERS (the LM micro-nat pattern — a float sum
    across buckets would be accumulation-order-dependent across
    engines); ``psi`` is derived from that integer once.  Returns
    (*keys, n_a, n_b, n_buckets, psi_nano, psi)."""
    keys = list(keys or [])
    a = sketch_a.select(
        *keys, "b", F.col("cnt").alias("_ca")
    )
    bb = sketch_b.select(
        *keys, "b", F.col("cnt").alias("_cb")
    )
    j = a.join(bb, [*keys, "b"], "full").select(
        *keys,
        "b",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    tot = j.groupBy(*keys).agg(
        F.sum("_ca").alias("_A"),
        F.sum("_cb").alias("_B"),
        F.count(F.lit(1)).alias("_K"),
    )
    t = j.join(F.broadcast(tot), keys) if keys else j.crossJoin(
        F.broadcast(tot)
    )
    p = (F.col("_ca") + 1) / (F.col("_A") + F.col("_K"))
    q = (F.col("_cb") + 1) / (F.col("_B") + F.col("_K"))
    nano = F.round((p - q) * F.log(p / q) * 1000000000.0, 0).cast("long")
    return (
        t.select(*keys, "_A", "_B", "_K", nano.alias("_t"))
        .groupBy(*keys)
        .agg(
            F.first("_A").alias("n_a"),
            F.first("_B").alias("n_b"),
            F.first("_K").alias("n_buckets"),
            F.sum("_t").alias("psi_nano"),
        )
        .withColumn("psi", F.round(F.col("psi_nano") / 1000000000.0, 6))
    )
