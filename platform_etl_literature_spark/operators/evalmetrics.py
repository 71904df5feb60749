"""Offline evaluation metrics — the measurement half of a
training-data pipeline: ranking quality (recall@k / MRR / nDCG@k),
per-class classification reports, and chance-corrected agreement
(Cohen's kappa).  A curation pass that cannot SCORE its retrieval,
language-ID, or labeling stages cannot be tuned; these operators close
that loop with the same engine-portable float contract the rest of the
repo uses.

Float parity (suite module docstring policy):

* Every metric derives from EXACT integer counts (hits, ranks,
  contingency cells) reduced with order-free integer sums.
* nDCG's per-rank gains are irrational (1/log2(rank+1)); each term is
  rounded to integer micro-units BEFORE the sum (the lm.py micro-nat
  precedent), so the reduction stays order-free and an SQL oracle
  replays it bit for bit.
* Final ratios are one or two IEEE double ops on identical operands,
  rounded at 6 — deterministic in any engine.

Scale shape: ranking metrics aggregate per query (one
map-side-combined shuffle keyed by query id); classification reports
aggregate the label pair grid (vocabulary-sized, not corpus-sized);
kappa folds the same grid to one row via single-row broadcast
aggregates — no driver collect, nothing corpus-shaped after the first
aggregation.

Reference parity note: the reference pipeline has no evaluation stage
(its quality signal is the harmonic section-rank sum,
Evidence.scala:113-142); this extends the quality family
(SURVEY.md §7.8) with the standard IR/classification measurement kit
(Järvelin & Kekäläinen, TOIS 2002 for nDCG; Cohen, 1960 for kappa).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ranking_metrics(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "relevant",
    k: int = 10,
) -> DataFrame:
    """Per-query recall@k, MRR@k, and binary nDCG@k from a ranked
    result table (one row per (query, rank) with a 0/1 relevance
    label; ``rank`` is 1-based and unique per query).

    Returns (query_id, n_rel, n_rel_at_k, recall_at_k, mrr_at_k,
    dcg_micro, idcg_micro, ndcg_at_k):

    * ``recall_at_k`` = |relevant in top-k| / |relevant| (queries with
      zero relevant docs report 0.0 — the trec_eval convention);
    * ``mrr_at_k`` = 1/first-relevant-rank within k, else 0.0 — exact,
      one division;
    * ``ndcg_at_k`` = dcg/idcg over integer micro-unit gains
      round(10^6 / log2(rank+1)) — the ideal ranking puts the query's
      min(n_rel, k) relevant docs at ranks 1..;

    All three reduce per query in ONE map-side-combined aggregation;
    the iDCG term for rank r is the same micro table evaluated at r,
    so no second pass and no per-query sort beyond the input ranks.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = F.col(query_col)
    rnk = F.col(rank_col).cast("long")
    rel = F.col(rel_col).cast("int")
    gain = F.round(F.lit(1000000.0) / F.log2(rnk + F.lit(1.0)), 0).cast(
        "long"
    )
    in_k = rnk <= k
    agg = ranked.groupBy(q.alias("query_id")).agg(
        F.sum(rel.cast("long")).alias("n_rel"),
        F.sum(F.when(in_k & (rel == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_rel_at_k"),
        F.min(F.when(in_k & (rel == 1), rnk)).alias("_first_rel"),
        F.sum(F.when(in_k & (rel == 1), gain).otherwise(0))
        .cast("long")
        .alias("dcg_micro"),
        # ideal gains: the per-query RANK of each relevant doc among
        # relevant docs is what the ideal ranking assigns it; summing
        # the micro table over ranks 1..min(n_rel, k) is equivalent —
        # done below from n_rel to keep this a single aggregation.
    )
    # idcg = Σ_{r=1..min(n_rel,k)} round(1e6/log2(r+1)) — a pure
    # function of min(n_rel, k); k is a small constant, so the sum
    # unrolls into a CASE over k precomputed partial sums (exact
    # integers, no per-row sequence explode).
    import math

    partial = [0]
    for r in range(1, k + 1):
        partial.append(partial[-1] + round(1000000.0 / math.log2(r + 1)))
    m = F.least(F.col("n_rel"), F.lit(k)).cast("int")
    idcg = F.element_at(
        F.array(*[F.lit(v) for v in partial]), m + 1
    ).cast("long")
    return agg.select(
        "query_id",
        "n_rel",
        "n_rel_at_k",
        F.when(F.col("n_rel") > 0, F.round(F.col("n_rel_at_k") / F.col("n_rel"), 6))
        .otherwise(F.lit(0.0))
        .alias("recall_at_k"),
        F.when(
            F.col("_first_rel").isNotNull(),
            F.round(F.lit(1.0) / F.col("_first_rel"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("mrr_at_k"),
        "dcg_micro",
        idcg.alias("idcg_micro"),
        F.when(idcg > 0, F.round(F.col("dcg_micro") / idcg, 6))
        .otherwise(F.lit(0.0))
        .alias("ndcg_at_k"),
    )


def classification_report(
    labeled: DataFrame,
    true_col: str = "label",
    pred_col: str = "pred",
) -> DataFrame:
    """Per-class precision / recall / F1 from exact contingency counts.

    Returns (label, n_true, n_pred, tp, precision, recall, f1) — one
    row per class appearing as a TRUE or PREDICTED label.  F1 is
    computed as 2·tp / (n_true + n_pred) (one division — equal to the
    harmonic mean whenever either is nonzero); classes never predicted
    (or never true) report 0.0 for the undefined ratio, the standard
    zero-division convention.

    ONE aggregation over the (true, pred) pair grid (vocabulary-sized)
    then two label-keyed rollups of that grid — nothing corpus-shaped
    after the first map-side combine.
    """
    t = F.col(true_col).alias("label")
    p = F.col(pred_col)
    grid = (
        labeled.select(t, p.alias("pred"))
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    by_true = grid.groupBy("label").agg(
        F.sum("n").alias("n_true"),
        F.sum(F.when(F.col("pred") == F.col("label"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("tp"),
    )
    by_pred = grid.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    j = by_true.join(by_pred, "label", "full_outer").select(
        "label",
        F.coalesce(F.col("n_true"), F.lit(0)).alias("n_true"),
        F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
    )
    return j.select(
        "label",
        "n_true",
        "n_pred",
        "tp",
        F.when(F.col("n_pred") > 0, F.round(F.col("tp") / F.col("n_pred"), 6))
        .otherwise(F.lit(0.0))
        .alias("precision"),
        F.when(F.col("n_true") > 0, F.round(F.col("tp") / F.col("n_true"), 6))
        .otherwise(F.lit(0.0))
        .alias("recall"),
        F.when(
            (F.col("n_true") + F.col("n_pred")) > 0,
            F.round(
                F.lit(2.0) * F.col("tp") / (F.col("n_true") + F.col("n_pred")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def cohens_kappa(
    labeled: DataFrame,
    true_col: str = "label",
    pred_col: str = "pred",
) -> DataFrame:
    """Chance-corrected agreement (Cohen, "A coefficient of agreement
    for nominal scales", 1960): kappa = (p_o − p_e) / (1 − p_e) with
    p_o the observed agreement rate and p_e the expected rate under
    independent marginals — the standard check that a labeler (or the
    language-ID heuristic) beats marginal-frequency chance.

    Returns ONE row (n, n_agree, po, pe, kappa).  The marginal product
    Σ row_i · col_i is an exact integer (the two marginals join on the
    label key — label-vocabulary-sized, never corpus-sized); p_o, p_e
    and kappa are then three divisions and one subtraction on exact
    operands, rounded at 6.  Degenerate total agreement with p_e = 1
    (a single-class table) reports kappa = 0.0 by convention.
    """
    t = F.col(true_col)
    p = F.col(pred_col)
    base = labeled.select(t.alias("label"), p.alias("pred")).persist()
    tot = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("label") == F.col("pred")).cast("long")).alias(
            "n_agree"
        ),
    )
    rows = base.groupBy("label").agg(F.count(F.lit(1)).alias("n_row"))
    cols = base.groupBy(F.col("pred").alias("label")).agg(
        F.count(F.lit(1)).alias("n_col")
    )
    prod = (
        rows.join(cols, "label")
        .agg(
            F.coalesce(
                F.sum(F.col("n_row") * F.col("n_col")), F.lit(0)
            ).alias("marg")
        )
    )
    po = F.col("n_agree") / F.col("n")
    pe = F.col("marg") / (F.col("n") * F.col("n"))
    return (
        tot.crossJoin(F.broadcast(prod))
        .select(
            "n",
            "n_agree",
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe"),
            F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6))
            .otherwise(F.lit(0.0))
            .alias("kappa"),
        )
    )


def ab_welch(
    df: DataFrame,
    arm_col: str,
    value_col: str,
    control: str,
) -> DataFrame:
    """Per-arm A/B experiment readout with Welch's unequal-variance
    t-test against the named control arm (Welch, Biometrika 1947) —
    the standard experiment-analysis primitive a curation/analytics
    engine owes its users.

    Float parity: per-arm sufficient statistics (n, Σv, Σv²) are
    exact order-free BIGINT sums over an integral (fixed-point)
    value column; mean, variance, t, and the Welch–Satterthwaite
    degrees of freedom are a fixed sequence of per-row double ops on
    those integers — replayed operand-for-operand by the SQL oracle —
    rounded at 6.  Sample variance uses the exact integer numerator
    ``n·Σv² − (Σv)²`` over ``n·(n−1)`` (cast AFTER the integer
    arithmetic; overflow bound ``n·Σv² < 2^63``).

    Scale shape: ONE map-side-combinable hash aggregate collapses the
    corpus to arm-count rows; the control row attaches via the one
    sanctioned single-row broadcast — no window, nothing corpus-shaped
    downstream.  Arms with n < 2 (either side) report NULL t/df.  A
    control arm with NO rows fails loudly in-plan (raise_error) —
    a typo'd control name must not silently empty the result.

    Returns (arm, n, mean, var, t, df_welch) for every non-control
    arm, plus the control arm's own row with NULL t/df.
    """
    v = F.col(value_col).cast("long")
    stats = df.filter(v.isNotNull()).groupBy(
        F.col(arm_col).alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sv"),
        F.sum(v * v).alias("svv"),
    )
    n = F.col("n").cast("long")
    mean = F.col("sv").cast("double") / n.cast("double")
    var = F.when(
        n >= 2,
        (n * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
        / (n * (n - 1)).cast("double"),
    )
    per_arm = stats.select("arm", "n", mean.alias("m"), var.alias("s2"))
    # the control aggregate is ALWAYS exactly one row (a global
    # conditional aggregate, not a filter): a typo'd / absent control
    # arm fails LOUDLY in-plan (raise_error, the hdr_build pattern)
    # instead of silently cross-joining an empty frame into zero rows
    ctrl_match = F.col("arm") == control
    ctrl = F.broadcast(
        per_arm.agg(
            F.sum(ctrl_match.cast("long")).alias("_c"),
            F.max(F.when(ctrl_match, F.col("n"))).alias("_n0"),
            F.max(F.when(ctrl_match, F.col("m"))).alias("m0"),
            F.max(F.when(ctrl_match, F.col("s2"))).alias("s20"),
        ).select(
            F.when(
                F.col("_c") < 1,
                F.raise_error(
                    F.lit(
                        "ab_welch: control arm "
                        + repr(control)
                        + " has no rows"
                    )
                ).cast("long"),
            )
            .otherwise(F.col("_n0"))
            .alias("n0"),
            "m0",
            "s20",
        )
    )
    j = per_arm.crossJoin(ctrl)
    se2_a = F.col("s2") / F.col("n").cast("double")
    se2_0 = F.col("s20") / F.col("n0").cast("double")
    se2 = se2_a + se2_0
    usable = (
        (F.col("arm") != control)
        & (F.col("n") >= 2)
        & (F.col("n0") >= 2)
        & (se2 > 0)
    )
    t = F.when(usable, (F.col("m") - F.col("m0")) / F.sqrt(se2))
    df_w = F.when(
        usable,
        (se2 * se2)
        / (
            se2_a * se2_a / (F.col("n") - 1).cast("double")
            + se2_0 * se2_0 / (F.col("n0") - 1).cast("double")
        ),
    )
    return j.select(
        "arm",
        "n",
        F.round(F.col("m"), 6).alias("mean"),
        F.round(F.col("s2"), 6).alias("var"),
        F.round(t, 6).alias("t"),
        F.round(df_w, 6).alias("df_welch"),
    )


def lift_table(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Decile lift/gains table — the model-quality readout for a
    scoring stage (quality classifiers, Moore-Lewis selectors):
    bucket rows by descending score into ``n_buckets`` equal-count
    bins, report per-bucket and cumulative response rates and the
    cumulative lift over the group's base rate.

    Determinism: ntile over a NON-UNIQUE order is engine-ambiguous,
    so the bucket order is (score DESC, id ASC) — total, replayable.
    NULL scores are excluded (Spark orders them NULLS LAST on DESC
    where DuckDB puts them FIRST — an unrankable row must not decide
    bucket boundaries engine-dependently).  All counts are exact
    integers; rates and lift are per-row double divisions on
    identical operands, rounded at 6.

    Scale shape: when ``group_cols`` partition the table (per-language
    / per-source reporting — the intended use), the ntile window and
    the cumulative window are both group-parallel; a global table
    (``group_cols=None``) degrades to a single-partition sort and is
    only for bucket-count-sized outputs.  One window pass + one hash
    aggregate + one bucket-count-sized cumulative window.

    Returns (*group, bucket, n, n_pos, rate, cum_rate, lift).
    """
    g = list(group_cols or [])
    part = [F.col(c) for c in g]
    w = Window.partitionBy(*part).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    lbl = F.col(label_col).cast("long")
    b = scored.filter(F.col(score_col).isNotNull()).select(
        *g,
        lbl.alias("_y"),
        F.ntile(n_buckets).over(w).alias("bucket"),
    )
    per = b.groupBy(*g, "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("n_pos"),
    )
    wc = (
        Window.partitionBy(*part)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*part)
    cum_n = F.sum("n").over(wc)
    cum_pos = F.sum("n_pos").over(wc)
    tot_n = F.sum("n").over(wt)
    tot_pos = F.sum("n_pos").over(wt)
    rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    cum_rate = cum_pos.cast("double") / cum_n.cast("double")
    base = tot_pos.cast("double") / tot_n.cast("double")
    lift = F.when(tot_pos > 0, cum_rate / base)
    return per.select(
        *g,
        "bucket",
        "n",
        "n_pos",
        F.round(rate, 6).alias("rate"),
        F.round(cum_rate, 6).alias("cum_rate"),
        F.round(lift, 6).alias("lift"),
    )


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    smooth: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence / information-value profile of a categorical
    feature against a binary label (the credit-scorecard standard,
    Siddiqi 2006) — the engine's feature-vs-label diagnostic: which
    source/language/bucket values carry signal about a quality label,
    and how much (IV = Σ per-category terms).

        woe(c) = ln( ((pos_c + s)/tot_pos) / ((neg_c + s)/tot_neg) )
        iv(c)  = ((pos_c + s)/tot_pos − (neg_c + s)/tot_neg) · woe(c)

    with additive smoothing ``s`` so empty cells stay finite; totals
    are the UNSMOOTHED exact integer marginals.

    Float parity: category cells are exact BIGINT counts from one
    map-side-combinable aggregate; woe/iv are a fixed per-row double
    sequence on those integers, rounded at 6.

    Scale shape: corpus collapses to category-count rows in ONE hash
    aggregate; the totals row attaches via the one sanctioned
    single-row broadcast — no window, no join beyond it.

    Returns (category, n, n_pos, n_neg, woe, iv_term).
    """
    y = F.col(label_col).cast("long")
    cells = df.groupBy(F.col(feature_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    totals = F.broadcast(
        cells.select(
            F.sum("n_pos").alias("tot_pos"), F.sum("n_neg").alias("tot_neg")
        )
    )
    j = cells.crossJoin(totals)
    p = (F.col("n_pos").cast("double") + F.lit(float(smooth))) / F.col(
        "tot_pos"
    ).cast("double")
    q = (F.col("n_neg").cast("double") + F.lit(float(smooth))) / F.col(
        "tot_neg"
    ).cast("double")
    woe = F.log(p / q)
    return j.select(
        "category",
        "n",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((p - q) * woe, 6).alias("iv_term"),
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney U identity
    (Hanley & McNeil, Radiology 1982) with midrank tie handling —
    the threshold-free twin of :func:`lift_table`:

        AUC = (Σ_{positives} rank(score) − n₊(n₊+1)/2) / (n₊·n₋)

    with ties taking the average rank.  EXACT in integers until the
    one closing division: score rows collapse to per-score cells
    (n, n_pos); the minimum rank of a score is 1 + the running count
    of lower scores (a cumulative window over DISTINCT scores, never
    rows); twice the midrank is the integer ``2·rank_min + n − 1``;
    and Σ 2·midrank·n_pos, 2·n₊(n₊+1)/2 and the denominator are all
    BIGINTs an SQL oracle replays term-for-term.  Integral scores
    only (fixed-point-shift doubles first) — float scores would make
    the DISTINCT cell collapse engine-fragile.

    Scale shape: one map-side cell collapse (distinct-score-sized),
    one group-parallel cumulative window over the cells, one final
    hash aggregate.  Groups with zero positives or zero negatives
    report NULL.  Overflow bound: 2·n_rows·n_cells < 2⁶³ per group.

    Returns (*group, n, n_pos, n_neg, auc).
    """
    g = list(group_cols or [])
    part = [F.col(c) for c in g]
    s = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    # NULL scores are unrankable and engine-divergent (Spark orders
    # NULLS FIRST on ASC, DuckDB NULLS LAST) — exclude them so the
    # SQL-oracle replay contract holds for arbitrary inputs
    cells = df.filter(s.isNotNull()).groupBy(*g, s.alias("_s")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(y).alias("_np"),
    )
    w = (
        Window.partitionBy(*part)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rank_min = F.sum("_n").over(w) - F.col("_n") + 1
    mid2 = 2 * rank_min + F.col("_n") - 1
    st = cells.select(
        *g,
        (F.col("_np") * mid2).alias("_contrib2"),
        "_n",
        "_np",
    ).groupBy(*g).agg(
        F.sum("_n").alias("n"),
        F.sum("_np").alias("n_pos"),
        F.sum("_contrib2").alias("_sum2"),
    )
    n_pos = F.col("n_pos")
    n_neg = F.col("n") - n_pos
    u2 = F.col("_sum2") - n_pos * (n_pos + 1)
    auc = F.when(
        (n_pos > 0) & (n_neg > 0),
        u2.cast("double") / (2 * n_pos * n_neg).cast("double"),
    )
    return st.select(
        *g,
        "n",
        "n_pos",
        n_neg.alias("n_neg"),
        F.round(auc, 6).alias("auc"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    key_cols: list[str] | None = None,
    max_cells: int = 1024,
) -> DataFrame:
    """Per-group isotonic regression of outcome on score — the
    monotone calibration map (Zadrozny & Elkan, KDD '02; the classic
    PAV algorithm of Ayer et al. '55) computed NON-iteratively via the
    minimax characterization (Robertson, Wright & Dykstra,
    "Order Restricted Statistical Inference" '88, Thm 1.4.4):

        fit(k) = max_{i<=k} min_{j>=k} mean(y over score cells i..j)

    which equals the pooled-adjacent-violators solution exactly — no
    loop, no convergence state, so the whole fit is ONE declarative
    plan an SQL oracle replays verbatim.

    Construction: collapse to distinct score CELLS per group (the
    auc_roc discipline — a billion scored rows with a 10⁴-value score
    domain produce 10⁴ cells), prefix sums over one group-parallel
    window, interval means A(i,j) = exact-BIGINT differences with ONE
    division, a running suffix-min window over j, and a per-cell max
    aggregate.  The interval frame is per-group quadratic in CELLS by
    design, guarded by the ``max_cells`` loud-exclusion valve (the
    theil_sen rule).

    Exactness: every A(i,j) is one double division of exact BIGINTs;
    min/max over doubles are value-exact (no accumulation) — so fit
    values are bit-identical in any engine before the 6 dp rounding.

    ``score_col``/``label_col`` integral by contract (fixed-point
    scale first; labels are typically 0/1 outcomes).  Returns
    (*key, score, n, sy, rate, fit) — ``fit`` is non-decreasing in
    score within each group (the property test), with rate = sy/n the
    raw cell mean.
    """
    keys = list(key_cols or [])
    x = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    cells = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(*keys, x.alias("score"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(y).alias("sy"))
    )
    sizes = cells.groupBy(*keys).agg(F.count(F.lit(1)).alias("_nc"))
    cells = cells.join(
        F.broadcast(sizes.filter(F.col("_nc") <= max_cells).select(*keys)),
        keys,
    )
    w = (
        Window.partitionBy(*(keys or [F.lit(1)]))
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = (
        cells.withColumn("_i", F.row_number().over(
            Window.partitionBy(*(keys or [F.lit(1)])).orderBy("score")
        ))
        .withColumn("_P", F.sum("sy").over(w))
        .withColumn("_N", F.sum("n").over(w))
    )
    a = pref.select(
        *keys,
        F.col("_i").alias("_ia"),
        (F.col("_P") - F.col("sy")).alias("_P0"),
        (F.col("_N") - F.col("n")).alias("_N0"),
    )
    b = pref.select(
        *keys,
        F.col("_i").alias("_ib"),
        F.col("_P").alias("_P1"),
        F.col("_N").alias("_N1"),
    )
    intervals = a.join(b, keys).filter(F.col("_ia") <= F.col("_ib"))
    A = (F.col("_P1") - F.col("_P0")).cast("double") / (
        F.col("_N1") - F.col("_N0")
    ).cast("double")
    wmin = (
        Window.partitionBy(*keys, "_ia")
        .orderBy(F.col("_ib").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = intervals.withColumn("_A", A).withColumn("_M", F.min("_A").over(wmin))
    fit = m.groupBy(*keys, F.col("_ib").alias("_i")).agg(
        F.max("_M").alias("_fit")
    )
    return (
        pref.join(fit, [*keys, "_i"])
        .select(
            *keys,
            "score",
            "n",
            "sy",
            F.round(F.col("sy").cast("double") / F.col("n").cast("double"), 6)
            .alias("rate"),
            F.round(F.col("_fit"), 6).alias("fit"),
        )
    )


def ece_from_calibration(
    cal: DataFrame,
    key_cols: list[str] | None = None,
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error over a fitted calibration table
    (Naeini et al., AAAI '15): bin cells by PREDICTED probability
    (equal-width over [0,1]), compare each bin's weighted accuracy to
    its weighted confidence,

        ECE = Σ_b (n_b / N) · |acc_b − conf_b|

    ``cal`` is :func:`isotonic_calibration` output ((*key, score, n,
    sy, fit) with fit ∈ [0,1] — indicator labels by contract).

    Exactness: confidences quantize per CELL to micro-units
    (round(fit·1e6) BIGINT — the lm.py discipline) so bin sums are
    order-free integer folds; each bin's |acc − conf| is doubles on
    identical integers, quantized back to micro BEFORE the cross-bin
    weighted sum — the entire statistic is an integer fold with two
    scale divisions, bit-identical in any engine.

    Returns per-bin rows (*key, bin, n_b, acc, conf) with the
    group-constant ``ece`` attached — non-empty bins only.
    """
    keys = list(key_cols or [])
    fit_micro = F.round(F.col("fit") * 1_000_000, 0).cast("long")
    binned = cal.withColumn(
        "bin",
        F.least(
            F.floor(F.col("fit") * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
    ).withColumn("_fm", fit_micro)
    per_bin = binned.groupBy(*keys, "bin").agg(
        F.sum("n").alias("n_b"),
        F.sum("sy").alias("_sy_b"),
        F.sum(F.col("n") * F.col("_fm")).alias("_conf_num"),
    )
    acc = F.col("_sy_b").cast("double") / F.col("n_b").cast("double")
    conf = F.col("_conf_num").cast("double") / (
        F.col("n_b").cast("double") * 1_000_000.0
    )
    per_bin = per_bin.withColumn(
        "_term_micro",
        F.round(F.abs(acc - conf) * 1_000_000, 0).cast("long"),
    )
    ece = per_bin.groupBy(*keys).agg(
        (
            F.sum(F.col("n_b") * F.col("_term_micro"))
            / (F.sum("n_b") * 1_000_000.0)
        ).alias("_ece")
    )
    return (
        per_bin.join(F.broadcast(ece), keys if keys else None, "inner")
        if keys
        else per_bin.crossJoin(F.broadcast(ece))
    ).select(
        *keys,
        "bin",
        "n_b",
        F.round(acc, 6).alias("acc"),
        F.round(conf, 6).alias("conf"),
        F.round(F.col("_ece"), 6).alias("ece"),
    )
