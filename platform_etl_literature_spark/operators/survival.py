"""Survival analysis — time-to-event curves over behavioral data
(churn, time-to-second-purchase, document staleness).

Reference parity note: the reference pipeline has no survival stage;
this extends the behavioral family (SURVEY.md §7.8's analytics
extension surface) with the product-limit estimator every analytics
engine owes its users (Kaplan & Meier, JASA 1958).

Float parity (suite module docstring policy): the survival curve is a
RUNNING PRODUCT Π(1 − dᵢ/nᵢ) — a multi-row float reduction, which the
repo's contract forbids raw.  It is made order-free the lm.py way:
each factor's log, ln((nᵢ−dᵢ)/nᵢ), rounds to integer MICRO-NATS;
the running product becomes a running INTEGER sum over a cumulative
window; one exp at the boundary recovers S(t), rounded at 6.  Every
count (events dᵢ, censored cᵢ, at-risk nᵢ) is an exact BIGINT derived
from one cell collapse + one cumulative window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan-Meier product-limit survival curve per group.

    Input: one row per subject with an integral ``duration`` (time
    observed) and ``event`` ∈ {0, 1} (1 = the event happened at that
    duration, 0 = censored there — left the study still alive).

        S(t) = Π_{tᵢ ≤ t, dᵢ > 0} (1 − dᵢ / nᵢ)

    with nᵢ the number still at risk entering tᵢ (standard KM: both
    events and censorings at tᵢ count as at-risk AT tᵢ and leave
    after).  When dᵢ = nᵢ (everyone remaining dies) the curve hits
    exactly 0 and stays there — handled by an explicit cumulative
    flag, not a −∞ log.

    Float parity: per-time log factors round to integer micro-nats
    before the cumulative integer sum (module docstring); S is one
    exp + round(6) at the boundary — engine-portable, SQL-replayable.

    Scale shape: one map-side cell collapse to (group, duration)
    cells, one group-parallel cumulative window over the DISTINCT
    durations (never subject rows), no join.  Censored-only times
    still emit a row (n_at_risk bookkeeping; survival unchanged).

    Returns (*group, t, n_at_risk, d, censored, survival) ordered
    within group by t.
    """
    g = list(group_cols or [])
    part = [F.col(c) for c in g]
    t = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("long")
    cells = df.groupBy(*g, t.alias("t")).agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum(e).alias("d"),
    )
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    # at risk entering t = all subjects − those removed strictly before
    n_at_risk = (
        F.sum("_total").over(w_all)
        - F.sum("_total").over(w_cum)
        + F.col("_total")
    )
    lp_micro = F.when(
        (F.col("d") > 0) & (F.col("d") < n_at_risk),
        F.round(
            F.log(
                (n_at_risk - F.col("d")).cast("double")
                / n_at_risk.cast("double")
            )
            * 1000000.0,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    dead = F.when(F.col("d") >= n_at_risk, F.lit(1)).otherwise(F.lit(0))
    staged = cells.select(
        *g,
        "t",
        n_at_risk.alias("n_at_risk"),
        "d",
        (F.col("_total") - F.col("d")).alias("censored"),
        lp_micro.alias("_lp"),
        dead.alias("_dead"),
    )
    cum_lp = F.sum("_lp").over(w_cum)
    cum_dead = F.sum("_dead").over(w_cum)
    surv = F.when(cum_dead > 0, F.lit(0.0)).otherwise(
        F.round(F.exp(cum_lp.cast("double") / 1000000.0), 6)
    )
    return staged.select(
        *g,
        "t",
        "n_at_risk",
        "d",
        "censored",
        surv.alias("survival"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ — the
    additive companion to :func:`kaplan_meier` (Nelson '72 / Aalen
    '78), preferred when hazards are the modeling target (−ln S(t)
    ≈ H(t)).

    Float parity: the per-time hazard increments dᵢ/nᵢ round to
    integer MICRO-UNITS before the cumulative sum (same discipline as
    the KM log products), so H is an order-free integer fold; the
    boundary emits both the integer ``h_micro`` and the rounded
    double.  Same cell collapse + cumulative window shape as KM —
    no join, group-parallel, cells are distinct durations.

    Returns (*group, t, n_at_risk, d, censored, h_micro, cum_hazard).
    """
    g = list(group_cols or [])
    part = [F.col(c) for c in g]
    t = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("long")
    cells = df.groupBy(*g, t.alias("t")).agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum(e).alias("d"),
    )
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    n_at_risk = (
        F.sum("_total").over(w_all)
        - F.sum("_total").over(w_cum)
        + F.col("_total")
    )
    inc_micro = F.round(
        F.col("d").cast("double") / n_at_risk.cast("double") * 1000000.0,
        0,
    ).cast("long")
    staged = cells.select(
        *g,
        "t",
        n_at_risk.alias("n_at_risk"),
        "d",
        (F.col("_total") - F.col("d")).alias("censored"),
        inc_micro.alias("_inc"),
    )
    h_micro = F.sum("_inc").over(w_cum)
    return staged.select(
        *g,
        "t",
        "n_at_risk",
        "d",
        "censored",
        h_micro.alias("h_micro"),
        F.round(h_micro.cast("double") / 1000000.0, 6).alias("cum_hazard"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    arm_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample log-rank test per key (Mantel '66 / Peto '72): does
    the treatment arm's survival curve differ from control's?  At
    each pooled event time t with dₜ events among nₜ at risk
    (n₁ₜ in arm 1):

        O−E = Σₜ (d₁ₜ − dₜ·n₁ₜ/nₜ)
        V   = Σₜ dₜ·(n₁ₜ/nₜ)·(1−n₁ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1)
        χ²  = (O−E)² / V        (1 df)

    ``arm_col`` must take exactly two values per key; the arm that
    sorts FIRST is "arm 1" (deterministic, engine-portable).  Three
    or more arms fail LOUDLY in-plan (raise_error, the hdr_build
    domain-guard pattern) — silent pooling into "arm 2" would yield a
    plausible but wrong statistic.  One arm is degenerate but valid
    (every O−E and V term is 0; χ² is NULL).

    Float parity: at-risk and event counts are exact BIGINTs from one
    cell collapse + cumulative windows (the KM shape, pivoted by
    arm); each time's O−E and V terms round to integer MICRO-UNITS
    before their sums (the module discipline), so both reductions are
    order-free and an SQL oracle replays them term-for-term; χ² is
    two double ops at the boundary.

    Scale shape: one map-side cell collapse to (key, t, arm) cells,
    a conditional-sum pivot to (key, t) rows, group-parallel
    cumulative windows over distinct times, one final aggregate — no
    join anywhere.  Times with nₜ−1 = 0 or dₜ = 0 contribute zero.

    Returns (*key, arm1, n1, n2, o1, ome_micro, v_micro, chi2).
    """
    g = list(key_cols or [])
    part = [F.col(c) for c in g]
    t = F.col(duration_col).cast("long")
    e = F.col(event_col).cast("long")
    cells = df.groupBy(*g, t.alias("t"), F.col(arm_col).alias("_arm")).agg(
        F.count(F.lit(1)).alias("_total"),
        F.sum(e).alias("_d"),
    )
    w_all = Window.partitionBy(*part)
    arm1 = F.min("_arm").over(w_all)
    # in-plan domain guard (the hdr_build raise_error pattern,
    # sketch.py): 3+ arms would silently pool every non-first arm
    # into "arm 2" and yield a plausible-looking but wrong two-sample
    # statistic — fail loudly instead.  collect_set runs over the
    # already-collapsed (key, t, arm) cells, never the subject rows.
    n_arms = F.size(F.collect_set("_arm").over(w_all))
    is1 = F.when(
        n_arms > 2,
        F.expr(
            "CAST(raise_error(concat('logrank_test: arm column takes "
            "3+ distinct values within a key; the two-sample test "
            "requires exactly two arms per key')) AS BIGINT)"
        ),
    ).otherwise((F.col("_arm") == arm1).cast("long"))
    pooled = cells.select(
        *g,
        "t",
        arm1.alias("arm1"),
        (is1 * F.col("_total")).alias("_tot1"),
        ((1 - is1) * F.col("_total")).alias("_tot2"),
        (is1 * F.col("_d")).alias("_d1"),
        ((1 - is1) * F.col("_d")).alias("_d2"),
    ).groupBy(*g, "t", "arm1").agg(
        F.sum("_tot1").alias("tot1"),
        F.sum("_tot2").alias("tot2"),
        F.sum("_d1").alias("d1"),
        F.sum("_d2").alias("d2"),
    )
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_key = Window.partitionBy(*part)
    n1 = (
        F.sum("tot1").over(w_key) - F.sum("tot1").over(w_cum) + F.col("tot1")
    )
    n2 = (
        F.sum("tot2").over(w_key) - F.sum("tot2").over(w_cum) + F.col("tot2")
    )
    n = n1 + n2
    d = F.col("d1") + F.col("d2")
    usable = (d > 0) & (n > 1)
    frac1 = n1.cast("double") / n.cast("double")
    ome = F.when(
        usable,
        F.round(
            (F.col("d1").cast("double") - d.cast("double") * frac1)
            * 1000000.0,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    v = F.when(
        usable,
        F.round(
            d.cast("double")
            * frac1
            * (F.lit(1.0) - frac1)
            * ((n - d).cast("double") / (n - 1).cast("double"))
            * 1000000.0,
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    staged = pooled.select(
        *g,
        "arm1",
        F.col("d1"),
        ome.alias("_ome"),
        v.alias("_v"),
        n1.alias("_n1row"),
        n2.alias("_n2row"),
        F.row_number().over(Window.partitionBy(*part).orderBy("t")).alias(
            "_rn"
        ),
    )
    st = staged.groupBy(*g).agg(
        F.min("arm1").alias("arm1"),
        F.max(F.when(F.col("_rn") == 1, F.col("_n1row"))).alias("n1"),
        F.max(F.when(F.col("_rn") == 1, F.col("_n2row"))).alias("n2"),
        F.sum("d1").alias("o1"),
        F.sum("_ome").alias("ome_micro"),
        F.sum("_v").alias("v_micro"),
    )
    chi2 = F.when(
        F.col("v_micro") > 0,
        (F.col("ome_micro").cast("double") / 1000000.0)
        * (F.col("ome_micro").cast("double") / 1000000.0)
        / (F.col("v_micro").cast("double") / 1000000.0),
    )
    return st.select(
        *g,
        "arm1",
        "n1",
        "n2",
        "o1",
        "ome_micro",
        "v_micro",
        F.round(chi2, 6).alias("chi2"),
    )
