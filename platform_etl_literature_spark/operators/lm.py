"""Count-based n-gram language-model scoring — the CCNet-style corpus
quality filter (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020): score every
document by its average bigram log-probability under a model trained on
the corpus itself, so boilerplate/gibberish (improbable token
transitions) ranks low and fluent text ranks high.  The literature
reference has no LM scoring (its quality signal is the harmonic
section-rank sum, Evidence.scala:113-142); a training-data pipeline
filters on one.

Scale design (100 TB):

- Two corpus passes total: one builds the PERSISTED bigram instance
  table (which then feeds both the bigram counts and the scoring join
  without re-reading text), one the unigram counts.  All count tables
  reduce with map-side partial aggregation — gram counts shuffle as
  (8-byte-hashable string, long) pairs, never document-shaped rows.
- The model is NOT broadcast: at corpus scale the bigram vocabulary is
  itself corpus-sized, so instances join counts with shuffle joins
  co-partitioned on the gram key (Catalyst/AQE picks broadcast anyway
  when a count table is small — the local-test case — without the plan
  hard-coding it).
- The vocabulary size V (the add-k smoothing denominator) is the only
  scalar: a single-row aggregate attached via broadcast nested-loop
  join, the same single-row-broadcast shape as textstats.vocab_coverage.

Float parity (suite module docstring policy): each instance's log-prob
is rounded to integer micro-nats (bigint), so the per-document reduction
is an exact integer sum — order-independent across engines; the final
average divides the exact sum once, mirrored op-for-op by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platform_etl_literature_spark.operators.dedup import _materialize_once, tokens


def bigram_instances(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pre, big): one row per positional token bigram.  ``pre`` is
    the conditioning prefix token (the bigram's first token — tokens are
    whitespace-split, so ``substring_index(big, ' ', 1)`` is exact).
    Documents with fewer than 2 tokens contribute no rows."""
    w = tokens(F.col(text_col))
    toks = docs.select(F.col(id_col).alias("id"), w.alias("w"))
    bigs = F.when(
        F.size("w") < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat_ws(" ", F.slice("w", i, 2)),
        )
    )
    return toks.select("id", F.explode(bigs).alias("big")).select(
        "id", F.substring_index("big", " ", 1).alias("pre"), "big"
    )


def _doc_lp_micro(
    docs: DataFrame, id_col: str, text_col: str, add_k: float
) -> DataFrame:
    """Per-bigram-instance scores as EXACT integer micro-nats:
    (id, lp_micro) with lp_micro = round(ln(p)·10⁶) — the shared
    scoring frame behind both the averaged filter metric
    (:func:`lm_doc_logprob`) and the integer totals
    (:func:`lm_doc_neg_micro_nats`)."""
    if add_k <= 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    inst = _materialize_once(bigram_instances(docs, id_col, text_col))

    uni = docs.select(
        F.explode(tokens(F.col(text_col))).alias("t")
    )
    # c1 is read twice (the vocabulary scalar below and the scoring
    # join), so materialize it — V is then c1's own row count (one row
    # per distinct token), not a third tokenizing pass over the corpus.
    c1 = _materialize_once(uni.groupBy("t").agg(F.count(F.lit(1)).alias("n1")))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    c2 = inst.groupBy("big").agg(F.count(F.lit(1)).alias("n2"))

    logp = F.log(
        (F.col("n2") + add_k) / (F.col("n1") + add_k * F.col("v"))
    )
    return (
        inst.join(c2, "big")
        .join(c1, F.col("pre") == F.col("t"))
        .crossJoin(F.broadcast(vocab))
        .select("id", F.round(logp * 1000000.0, 0).cast("long").alias("lp_micro"))
    )


def lm_doc_neg_micro_nats(
    docs: DataFrame, id_col: str, text_col: str, add_k: float = 0.1
) -> DataFrame:
    """Per-document total negative log-likelihood in EXACT integer
    micro-nats — (id, n_bigrams, neg_lp_micro) with neg_lp_micro ≥ 1
    for any scoreable document; the form downstream integer-exact
    consumers (HDR quantile thresholds, mixture diagnostics) need,
    where the averaged float metric would reintroduce float-parity
    risk."""
    scored = _doc_lp_micro(docs, id_col, text_col, add_k)
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("lp_micro")).alias("neg_lp_micro"),
    )


def lm_doc_logprob(
    docs: DataFrame, id_col: str, text_col: str, add_k: float = 0.1
) -> DataFrame:
    """Average bigram log-probability (and perplexity) per document
    under an add-k-smoothed bigram LM trained on the same corpus:

        logP(w_i | w_{i-1}) = ln((c2(w_{i-1} w_i) + k) / (c1(w_{i-1}) + k·V))

    where c2/c1 are corpus bigram/unigram counts and V the distinct
    unigram vocabulary size.  Returns (id, n_bigrams, avg_logp, ppl)
    for every document with at least one bigram; ``ppl`` is
    exp(-avg_logp), the standard per-token perplexity filter metric.
    """
    scored = _doc_lp_micro(docs, id_col, text_col, add_k)
    n = F.count(F.lit(1))
    avg_raw = F.sum("lp_micro") / 1000000.0 / n
    return scored.groupBy("id").agg(
        n.alias("n_bigrams"),
        F.round(avg_raw, 6).alias("avg_logp"),
        F.round(F.exp(-avg_raw), 4).alias("ppl"),
    )


def lm_doc_logprob_against(
    ref_docs: DataFrame,
    tgt_docs: DataFrame,
    id_col: str,
    text_col: str,
    add_k: float = 0.1,
) -> DataFrame:
    """CCNet proper: score TARGET documents under a bigram LM trained
    on a separate REFERENCE corpus (Wenzek et al. score crawl text
    against a Wikipedia-trained LM) — the cross-corpus form that makes
    perplexity a quality filter rather than a self-consistency score.
    Same smoothing/float-parity contract as :func:`lm_doc_logprob`;
    the differences are that counts come from ``ref_docs`` and that
    target bigrams/prefixes UNSEEN in the reference survive via LEFT
    joins with zero-coalesced counts (add-k smoothing keeps every
    probability positive, and unseen transitions are exactly what
    drive a gibberish document's perplexity up).

    Scale shape: identical to the self-trained variant — count tables
    shuffle as (gram, long) pairs, the scoring joins co-partition on
    the gram key (AQE broadcasts small reference models on its own),
    and the vocabulary scalar rides a single-row broadcast.
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    inst = _materialize_once(bigram_instances(tgt_docs, id_col, text_col))

    ref_uni = ref_docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
    c1 = _materialize_once(
        ref_uni.groupBy("t").agg(F.count(F.lit(1)).alias("n1"))
    )
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    c2 = bigram_instances(ref_docs, id_col, text_col).groupBy("big").agg(
        F.count(F.lit(1)).alias("n2")
    )

    logp = F.log(
        (F.coalesce(F.col("n2"), F.lit(0)) + add_k)
        / (F.coalesce(F.col("n1"), F.lit(0)) + add_k * F.col("v"))
    )
    scored = (
        inst.join(c2, "big", "left")
        .join(c1, F.col("pre") == F.col("t"), "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id", F.round(logp * 1000000.0, 0).cast("long").alias("lp_micro")
        )
    )
    n = F.count(F.lit(1))
    avg_raw = F.sum("lp_micro") / 1000000.0 / n
    return scored.groupBy("id").agg(
        n.alias("n_bigrams"),
        F.round(avg_raw, 6).alias("avg_logp"),
        F.round(F.exp(-avg_raw), 4).alias("ppl"),
    )


def kn_doc_neg_micro_nats(
    docs: DataFrame, id_col: str, text_col: str, discount: float = 0.5
) -> DataFrame:
    """Per-document total negative log-likelihood under an
    INTERPOLATED KNESER-NEY bigram model (Kneser & Ney, ICASSP'95;
    the Chen & Goodman '98 interpolated form) trained on the corpus
    itself — the standard upgrade over add-k smoothing: instead of
    shaving probability mass uniformly, KN backs off to the
    CONTINUATION probability (how many distinct contexts a word
    completes), which scores boilerplate tokens that appear in one
    fixed collocation far lower than genuinely productive words:

        P(w2|w1) = (c(w1 w2) − D)/c(w1·)
                   + (D · N1+(w1 ·)/c(w1·)) · (N1+(· w2)/T)

    with D = ``discount``, c(w1·) the prefix's bigram-instance count,
    N1+(w1 ·)/N1+(· w2) the distinct-follower/-predecessor type
    counts, and T the total distinct bigram types.  Scoring the
    training corpus itself means every instance has c ≥ 1 > D, so the
    max(·, 0) clamp never binds and P > 0 always.

    Returns (id, n_bigrams, neg_lp_micro) — the exact-integer
    micro-nat contract of :func:`lm_doc_neg_micro_nats` (per-instance
    ln(P) rounded to micro-nats, summed as integers; the default
    D = 0.5 is a dyadic literal so both engines fold identical
    operand bits in identical order).

    Scale shape, same as the add-k scorer: the model is never
    broadcast — the persisted instance table feeds four
    map-side-combined count aggregations (prefix totals, bigram
    counts, distinct-follower and distinct-predecessor type counts)
    whose rows are (token, long) pairs, and scoring joins them back
    co-partitioned on the gram key; T is the one scalar, attached via
    a single-row broadcast."""
    if not 0 < discount < 1:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    inst = _materialize_once(bigram_instances(docs, id_col, text_col))

    cp = inst.groupBy("pre").agg(F.count(F.lit(1)).alias("np"))
    c2 = inst.groupBy("big").agg(F.count(F.lit(1)).alias("n2"))
    types = _materialize_once(inst.select("big").distinct())
    nf = (
        types.select(F.substring_index("big", " ", 1).alias("pre"))
        .groupBy("pre")
        .agg(F.count(F.lit(1)).alias("nf"))
    )
    nc = (
        types.select(F.substring_index("big", " ", -1).alias("suf"))
        .groupBy("suf")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    t_row = types.agg(F.count(F.lit(1)).alias("t"))

    p = (F.col("n2") - F.lit(discount)) / F.col("np") + (
        F.lit(discount) * F.col("nf") / F.col("np")
    ) * (F.col("nc") / F.col("t"))
    scored = (
        inst.join(c2, "big")
        .join(cp, "pre")
        .join(nf, "pre")
        .join(nc, F.substring_index(F.col("big"), " ", -1) == F.col("suf"))
        .crossJoin(F.broadcast(t_row))
        .select(
            "id",
            F.round(F.log(p) * 1000000.0, 0).cast("long").alias("lp_micro"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("lp_micro")).alias("neg_lp_micro"),
    )


def moore_lewis_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str,
    text_col: str,
    add_k: float = 0.1,
) -> DataFrame:
    """Cross-entropy-difference importance weights (Moore & Lewis,
    "Intelligent Selection of Language Model Training Data", ACL 2010;
    the same contrast DSIR resamples from — Xie et al., NeurIPS 2023):
    score every document by

        w(x) = log P_target(x) − log P_self(x)

    under two add-k bigram LMs — one trained on a small in-domain
    TARGET corpus, one on the general corpus being scored.  High w =
    looks like the target domain relative to the corpus background;
    this is THE classic data-selection score for domain-matched
    training corpora.

    Returns (id, n_bigrams, w_micro): ``w_micro`` is the exact integer
    micro-nat total difference (each bigram's two log-probs rounded to
    micro-nats BEFORE the order-free integer sum — the lm.py
    float-parity contract), so an SQL oracle replays it bit for bit.

    Scale shape: the corpus is tokenized ONCE into the persisted
    bigram-instance table; BOTH models score it in a single join
    pipeline (self-model counts join inner — every gram of the corpus
    is in its own model by construction; target-model counts join LEFT
    with zero-coalesce, unseen-in-target transitions being exactly
    what add-k smoothing penalizes).  Count tables shuffle as
    (gram, long) pairs; the two vocabulary scalars ride one broadcast
    single-row frame.
    """
    if add_k <= 0:
        raise ValueError(f"add_k must be > 0, got {add_k}")
    inst = _materialize_once(bigram_instances(docs, id_col, text_col))

    # self (background) model — trained on the scored corpus itself
    c1s = _materialize_once(
        docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n1s"))
    )
    c2s = inst.groupBy("big").agg(F.count(F.lit(1)).alias("n2s"))

    # target (in-domain) model
    c1t = _materialize_once(
        target_docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n1t"))
    )
    c2t = bigram_instances(target_docs, id_col, text_col).groupBy("big").agg(
        F.count(F.lit(1)).alias("n2t")
    )
    scal = c1s.agg(F.count(F.lit(1)).alias("vs")).crossJoin(
        c1t.agg(F.count(F.lit(1)).alias("vt"))
    )

    lp_self = F.log(
        (F.col("n2s") + add_k) / (F.col("n1s") + add_k * F.col("vs"))
    )
    lp_tgt = F.log(
        (F.coalesce(F.col("n2t"), F.lit(0)) + add_k)
        / (F.coalesce(F.col("n1t"), F.lit(0)) + add_k * F.col("vt"))
    )
    micro = lambda c: F.round(c * 1000000.0, 0).cast("long")  # noqa: E731
    scored = (
        inst.join(c2s, "big")
        .join(c1s.withColumnRenamed("t", "pre"), "pre")
        .join(c2t, "big", "left")
        .join(c1t.withColumnRenamed("t", "pre"), "pre", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "id",
            (micro(lp_tgt) - micro(lp_self)).alias("_w"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("_w").alias("w_micro"),
    )


def moore_lewis_select(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    keep_frac: float = 0.25,
    add_k: float = 0.1,
) -> DataFrame:
    """Deterministic top-fraction Moore-Lewis selection: rank every
    document inside its shard (source, language, dump, …) by
    descending :func:`moore_lewis_weights` score — id ascending as the
    total-order tiebreak — and keep the top ``ceil(keep_frac · n)`` of
    each shard.  Per-shard quotas (rather than one global cutoff)
    preserve the corpus mixture while upgrading its quality — the
    standard curation shape; the hard top-k variant (vs DSIR's
    sampled resampling) keeps the operator a pure function of its
    inputs, so the oracle replays it row for row.

    Returns (id, shard, n_bigrams, w_micro, rk, selected); documents
    with no bigrams are unscoreable and are absent (the LM-family
    contract).  The ranking window partitions by shard — shard counts
    ride the same window, no second scan.
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    from pyspark.sql.window import Window

    w = moore_lewis_weights(docs, target_docs, id_col, text_col, add_k)
    labeled = w.join(
        docs.select(F.col(id_col).alias("id"), F.col(shard_col).alias("shard")),
        "id",
    )
    win = Window.partitionBy("shard")
    rk = F.row_number().over(
        win.orderBy(F.col("w_micro").desc(), F.col("id").asc())
    )
    quota = F.ceil(F.count(F.lit(1)).over(win) * keep_frac)
    return labeled.select(
        "id", "shard", "n_bigrams", "w_micro",
        rk.alias("rk"),
        (rk <= quota).alias("selected"),
    )


def nb_confusion(
    docs: DataFrame,
    id_col: str,
    label_col: str,
    text_col: str,
) -> DataFrame:
    """Multinomial Naive Bayes trained and resubstitution-scored
    in-engine (McCallum & Nigam, AAAI-98 workshop): add-one-smoothed
    token likelihoods per class, log-prior from class document
    frequencies, argmax prediction per document, and the
    (true, predicted) confusion matrix — the supervised twin of the
    heuristic ``lang_id``, and the proof that classifier TRAINING is
    a pair of hash aggregates, not an ML-library import:

        lp(w|c) = ln((count(w,c) + 1) / (n_c + V))
        score(d,c) = ln(n_docs_c / n_docs) + Σ_{w∈d} lp(w|c)

    Float parity: every count is an exact BIGINT; each ln rounds to
    integer MICRO-NATS before the per-document sum (the module's
    standing contract), so scores are order-free integer sums and the
    argmax (ties → lexicographically smallest class) is
    engine-portable.

    Scale shape: training is two vocabulary-keyed map-side hash
    aggregates (class-token counts, class totals); the class frame —
    priors, totals, vocabulary size folded in — is class-count-sized
    and attaches to the token stream via ONE sanctioned broadcast
    nested loop (classes × occurrences IS multinomial scoring's data
    size); token likelihoods attach by a (w, c) vocabulary equijoin;
    the argmax window partitions by document.  Documents with zero
    tokens carry no score rows and are excluded (documented; both
    engines agree).

    Returns (true_label, pred_label, n_docs) — the confusion matrix.
    """
    from pyspark.sql.window import Window

    # Round 10: score on per-document WORD COUNTS, not occurrences —
    # Σ_{w∈d} lp(w|c) = Σ_w count(d,w)·lp(w|c), an exact integer
    # multiply, so the result is bit-identical while the scoring join
    # volume drops from occurrences × classes to distinct-(doc, word)
    # × classes.  The class-token counts and the vocabulary both
    # re-aggregate from the (doc, word) frame, so the corpus is
    # tokenized ONCE instead of three times (measured 2.20 → 1.75 s
    # at sf0.1, values identical).
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.col(label_col).alias("_y"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    dwc = toks.groupBy("_d", "_y", "w").agg(F.count(F.lit(1)).alias("_k"))
    cwc = dwc.groupBy(F.col("_y").alias("c"), "w").agg(
        F.sum("_k").alias("cnt")
    )
    nc = cwc.groupBy("c").agg(F.sum("cnt").alias("n_c"))
    vocab = cwc.agg(F.countDistinct("w").alias("v"))
    priors = docs.groupBy(F.col(label_col).alias("c")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    ndt = docs.agg(F.count(F.lit(1)).alias("n_all"))
    prior_lp = F.round(
        F.log(
            F.col("nd").cast("double") / F.col("n_all").cast("double")
        )
        * 1000000.0,
        0,
    ).cast("long")
    classes = (
        priors.join(nc, "c")
        .crossJoin(F.broadcast(ndt))
        .crossJoin(F.broadcast(vocab))
        .select("c", "n_c", "v", prior_lp.alias("prior_micro"))
    )
    lp = F.round(
        F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
            / (F.col("n_c") + F.col("v")).cast("double")
        )
        * 1000000.0,
        0,
    ).cast("long")
    scored = (
        dwc.crossJoin(F.broadcast(classes))
        .join(cwc, ["c", "w"], "left")
        .select(
            "_d", "_y", "c", "prior_micro",
            (F.col("_k") * lp).alias("lp_micro"),
        )
    )
    per_dc = scored.groupBy("_d", "_y", "c").agg(
        (F.sum("lp_micro") + F.min("prior_micro")).alias("score_micro")
    )
    w = Window.partitionBy("_d").orderBy(
        F.col("score_micro").desc(), F.col("c").asc()
    )
    pred = per_dc.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return (
        pred.groupBy(
            F.col("_y").alias("true_label"), F.col("c").alias("pred_label")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
