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
