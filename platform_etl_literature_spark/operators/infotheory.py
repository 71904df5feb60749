"""Information-theoretic association between categorical columns —
entropy, mutual information, and normalized MI from exact joint
counts.

The training-data use: MI(lang, source) tells you whether a corpus's
language mix is confounded with its source mix (a high-MI pair means
per-source language balancing is NOT optional); MI(event_type,
device) is the feature-redundancy screen before one of them is
dropped from a training mix key.

Float-determinism (suite module docstring policy): every count is an
exact order-free BIGINT.  Each LEVEL's log term is ONE canonical
double expression — ``round(ln(count / N) * 1e6)`` → BIGINT
micro-nats (the lm.py precedent) — and every reduction over levels is
an integer sum of ``count · micro`` products, so the result is
accumulation-order-free and a SQL oracle replays it bit-for-bit:

    H_num(X)  = −Σ_x n_x · round(ln(n_x / N)·1e6)      (BIGINT)
    H(X)      = H_num(X) / (N · 1e6)                    (one division)
    MI_num    = H_num(X) + H_num(Y) − H_num(X,Y)
    NMI       = MI_num / min(H_num(X), H_num(Y))        (one division)

Quantization note: each micro-nat term carries ≤ 5·10⁻⁷ nat of
rounding; the level sums carry ≤ 5·10⁻⁷·N weighted nats, i.e. the
H/MI values are exact to ~6 decimal places BY CONSTRUCTION — which is
also the output rounding, and (unlike an unrounded float fold) the
quantized sum is bit-identical in any engine.

Overflow: |micro| ≤ ln(N)·1e6 < 5·10⁷ for N < 2⁶³; Σ n·micro ≤
N·5·10⁷ — safe for N up to ~10¹¹ rows per MI cell; corpus-scale N
beyond that wants the counts pre-aggregated per level anyway (this
operator's input IS level counts after the first groupBy).

Scale shape: three map-side-combinable hash aggregates keyed by
level / level-pair (vocabulary-sized), one broadcast of the one-row
total — never a corpus-shaped shuffle, no window, no UDF.

Reference parity note: the reference engine has no information-theory
analytics; this extends the drift/eval family (operators.robust,
operators.evalmetrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _h_num(level_counts: DataFrame, n_col: str = "_c") -> DataFrame:
    """−Σ n·round(ln(n/N)·1e6) over one level-count frame (one row:
    _h_num BIGINT, _n BIGINT)."""
    tot = level_counts.agg(F.sum(n_col).alias("_n"))
    term = F.col(n_col) * F.round(
        F.log(F.col(n_col).cast("double") / F.col("_nn").cast("double"))
        * MICRO,
        0,
    ).cast("long")
    return (
        level_counts.crossJoin(
            F.broadcast(tot.select(F.col("_n").alias("_nn")))
        )
        .agg((-F.sum(term)).alias("_h_num"), F.max("_nn").alias("_n"))
    )


def categorical_mi(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Exact-count entropy / MI profile of two categorical columns.

    Returns ONE row: (n, nx_levels, ny_levels, h_x, h_y, h_xy, mi,
    nmi) — entropies in nats rounded to 6 dp; ``nmi`` = MI /
    min(H(X), H(Y)) (the "uncertainty coefficient"-style bound that
    makes 1.0 mean "one column determines the other"), NULL when
    either marginal entropy is 0 (a constant column carries no
    information to share).

    NULL levels are kept as their own level (a missing language IS a
    category for mixing purposes) via a sentinel coalesce.
    """
    x = F.coalesce(F.col(x_col).cast("string"), F.lit("<null>"))
    y = F.coalesce(F.col(y_col).cast("string"), F.lit("<null>"))
    base = df.select(x.alias("_x"), y.alias("_y"))
    cx = base.groupBy("_x").agg(F.count(F.lit(1)).alias("_c"))
    cy = base.groupBy("_y").agg(F.count(F.lit(1)).alias("_c"))
    cxy = base.groupBy("_x", "_y").agg(F.count(F.lit(1)).alias("_c"))
    hx = _h_num(cx).select(
        F.col("_h_num").alias("_hx"), F.col("_n").alias("_n")
    )
    hy = _h_num(cy).select(F.col("_h_num").alias("_hy"))
    hxy = _h_num(cxy).select(F.col("_h_num").alias("_hxy"))
    lvl = cx.agg(F.count(F.lit(1)).alias("_lx")).crossJoin(
        F.broadcast(cy.agg(F.count(F.lit(1)).alias("_ly")))
    )
    j = (
        hx.crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(hxy))
        .crossJoin(F.broadcast(lvl))
    )
    denom = F.col("_n").cast("double") * float(MICRO)
    mi_num = F.col("_hx") + F.col("_hy") - F.col("_hxy")
    hmin = F.least("_hx", "_hy")
    return j.select(
        F.col("_n").alias("n"),
        F.col("_lx").alias("nx_levels"),
        F.col("_ly").alias("ny_levels"),
        F.round(F.col("_hx") / denom, 6).alias("h_x"),
        F.round(F.col("_hy") / denom, 6).alias("h_y"),
        F.round(F.col("_hxy") / denom, 6).alias("h_xy"),
        F.round(mi_num / denom, 6).alias("mi"),
        F.when(
            hmin > 0,
            F.round(
                mi_num.cast("double") / hmin.cast("double"), 6
            ),
        ).alias("nmi"),
    )
