"""Text retrieval: BM25 scoring and top-k keyword search over a corpus.

The literature reference ranks entity matches with harmonic sums
(Evidence.scala:113-142) but has no free-text relevance search; a
training-data platform needs one (query-driven corpus slicing, targeted
decontamination, eval-set mining).  BM25 (Robertson et al., TREC-3) is
the standard lexical ranking function, and it maps cleanly onto one
corpus scan plus scalar rollups.

Scale design (100 TB):

- The query term list is tiny and is compiled INTO the per-document
  projection — one ``size(filter(tokens, = term))`` counter per term —
  so the corpus pass is map-side, fully inside whole-stage codegen.
  The corpus vocabulary is never exploded and nothing document-shaped
  is shuffled.
- Corpus statistics (N, total token count, per-term document
  frequency) reduce to ONE single-row aggregate (partial map-side
  combine, one exchange of a handful of longs) and are re-attached
  with a broadcast nested-loop join of that single row — the same
  single-row-broadcast shape as textstats.vocab_coverage.
- Top-k is ``ORDER BY score LIMIT k`` → TakeOrderedAndProject: each
  partition holds only its local k candidates; no global sort, no
  single-partition window.

The per-term expressions re-scan each document's token array once per
term; for realistic query sizes (<= ~32 terms) that is still cheaper
than an explode + groupBy over every (doc, term) pair, which would
shuffle the whole tokenized corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_etl_literature_spark.operators.dedup import _materialize_once, tokens


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every matching document against a bag-of-words query.

    Returns (id, n_hits, score) for documents containing at least one
    query term.  ``score`` is the Lucene/Okapi BM25 sum over terms with
    the +1-smoothed idf (always non-negative):

        idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)
        score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Determinism/parity: idf is rounded to 6 places before the per-term
    product and the final sum is rounded to 6 places, with a fixed
    left-to-right term order — the float-parity policy from the suite
    module docstring (reductions exact-or-rounded, identical operation
    order on both engines).
    """
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError("query terms must be distinct")

    # Stage the token array in its own projection: CollapseProject will
    # not inline a non-cheap split() referenced by every counter, so the
    # text tokenizes ONCE per row instead of once per term (Catalyst
    # does not CSE lambda-bearing expressions across projection items).
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
    w = F.col("_w")

    # NB: a `lambda t, term=term:` default-arg capture would change the
    # lambda's arity and flip F.filter into its (element, index) form —
    # the closure factory keeps it unary.
    def eq(term: str):
        return lambda t: t == F.lit(term)

    tf_cols = [
        F.size(F.filter(w, eq(term))).alias(f"_tf{i}")
        for i, term in enumerate(terms)
    ]
    # The slim (id, dl, tf...) table feeds BOTH the corpus-stats rollup
    # and the scoring pass; persist it so the text is scanned and
    # tokenized exactly once (a handful of longs per document — at
    # 100 TB this is the difference between one and two corpus reads).
    base = _materialize_once(
        toks.select(F.col(id_col), F.size(w).alias("_dl"), *tf_cols)
    )

    stats = base.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("_dl").alias("_sum_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )

    scored = base.crossJoin(F.broadcast(stats))
    n_docs = F.col("_n_docs")
    # exact-integer sum / count, NOT avg(): both engines then divide the
    # same two exact values, so avgdl is bit-identical cross-engine
    avgdl = F.col("_sum_dl").cast("double") / n_docs.cast("double")

    def term_score(i: int) -> Column:
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.round(F.log((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6)
        return idf * (
            (tf * (k1 + 1.0))
            / (tf + k1 * ((1.0 - b) + b * (F.col("_dl") / avgdl)))
        )

    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    n_hits = F.col("_tf0")
    for i in range(1, len(terms)):
        n_hits = n_hits + F.col(f"_tf{i}")

    return scored.select(
        F.col(id_col),
        # long, to line up with the BIGINT the DuckDB oracle's len() produces
        n_hits.cast("long").alias("n_hits"),
        F.round(score, 6).alias("score"),
    ).where(F.col("n_hits") > 0)


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 search: highest-scoring documents for the query,
    deterministic tie-break on ascending id.  Compiles to
    TakeOrderedAndProject over the map-side score pass."""
    return (
        bm25_scores(docs, id_col, text_col, terms, k1=k1, b=b)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ranked_topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Attach a 1-based ``rank`` to the top-``k`` rows under ``order``.

    Scale shape: the global sort never happens — ``orderBy(...).limit(k)``
    compiles to TakeOrderedAndProject (each partition keeps its local k,
    the driver merges k·partitions rows), and only the k surviving rows
    are ranked — WITHOUT a window.  An unpartitioned
    ``row_number().over(Window.orderBy(...))`` here would be harmless
    (≤ k rows) but makes Spark emit the ``WindowExec: No Partition
    Defined`` degradation warning on every run — noise
    indistinguishable from a real whole-dataset single-reducer window
    in bench logs (and partitioning the window on a literal doesn't
    help: constant folding erases the partition spec before the
    physical check).  Instead the ≤ k survivors take the k=1-partition
    case of the ranking-module zipWithIndex construction: one range
    exchange of ≤ k rows, a local sort, and
    ``monotonically_increasing_id`` (pid=0, so the id IS the 0-based
    position in sort order).  ``order`` must be a total order (include
    a unique tiebreak column) or ranks are nondeterministic.
    """
    return (
        df.orderBy(*order)
        .limit(k)
        .repartitionByRange(1, *order)
        .sortWithinPartitions(*order)
        .withColumn(
            "rank", (F.monotonically_increasing_id() + 1).cast("int")
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
    combine ranked lists from heterogeneous scorers without score
    calibration — each list contributes 1/(k + rank) per document:

        rrf(d) = sum_lists 1 / (k + rank_list(d))

    The standard hybrid-retrieval combiner (lexical BM25 + dense ANN +
    priors); k=60 is the paper's constant.  Documents absent from a
    list simply contribute nothing (no outer-join NULL handling needed:
    the union-then-aggregate shape encodes "missing = 0").

    Returns (id, n_lists, rrf_score).  Float parity: each contribution
    is rounded to integer nano-units so the cross-list reduction is an
    exact integer sum (order-independent across engines); the score
    divides the exact sum once at output.

    Scale shape: a unionByName of slim (id, contribution) pairs and ONE
    hash aggregation on id — fused lists are usually top-k (tiny), but
    the same plan holds for full-corpus rankings (shuffle keyed on id,
    map-side partial sums).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            F.round(1000000000.0 / (k + F.col(rank_col)), 0)
            .cast("long")
            .alias("_c"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.round(F.sum("_c") / 1000000000.0, 9).alias("rrf_score"),
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 20,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from each query's exact top-``m`` cosine shortlist,
    greedily select ``k`` results maximizing

        lam · rel(c)  −  (1 − lam) · max_{s ∈ selected} sim(c, s)

    — the standard relevance-vs-redundancy dial for retrieval feeding
    a context window (near-duplicate passages waste tokens; MMR keeps
    the list diverse).  Returns (query_id, neighbor_id, pick_order,
    score), pick_order 1..k in selection order.

    Determinism contract: rel and the candidate-pair sims are the
    6dp-rounded cosines (the proven cross-engine-identical values from
    the exact-cosine family); with the default ``lam=0.5`` the scores
    are exact IEEE halvings of those, so the greedy argmax (ties by
    neighbor_id) replays identically on any engine — a non-dyadic lam
    works too but the oracle must inline python's ``repr(lam)`` /
    ``repr(1-lam)`` so both engines fold the same literals.

    Plan shape: the shortlist costs one cosine_topk; candidate-pair
    sims are ONE self-equijoin of the shortlist on query_id (≤ m² rows
    per query, m is small by contract — the bounded-candidates rule);
    each of the k greedy steps is a broadcast-scale join + one
    per-query window over ≤ m rows.  Everything is keyed by query_id,
    so a million queries parallelize; nothing is ever corpus-sized
    after the shortlist stage.
    """
    if not 1 <= k <= m:
        raise ValueError(f"need 1 <= k <= m, got k={k} m={m}")
    from pyspark.sql.window import Window

    from platform_etl_literature_spark.functions.vectors import array_cosine
    from platform_etl_literature_spark.operators.similarity import (
        cosine_topk,
    )

    short = cosine_topk(corpus, queries, id_col=id_col, vec_col=vec_col, k=m)
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    sc = (
        short.join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", F.col("sim").alias("rel"), "cv")
        .localCheckpoint(eager=True)
    )
    a = sc.select(
        "query_id", F.col("neighbor_id").alias("n1"), F.col("cv").alias("v1")
    )
    b = sc.select(
        "query_id", F.col("neighbor_id").alias("n2"), F.col("cv").alias("v2")
    )
    pairs = (
        a.join(b, "query_id")
        .filter(F.col("n1") != F.col("n2"))
        .select(
            "query_id",
            "n1",
            "n2",
            F.round(array_cosine("v1", "v2"), 6).alias("psim"),
        )
        .localCheckpoint(eager=True)
    )
    lam_c = 1.0 - lam  # python-side: the oracle inlines repr() of BOTH
    sel = None
    remaining = sc.select("query_id", "neighbor_id", "rel")
    for step in range(1, k + 1):
        if sel is None:
            scored = remaining.withColumn("_ms", F.lit(0.0))
        else:
            ms = (
                pairs.join(
                    sel.select(
                        "query_id", F.col("neighbor_id").alias("n2")
                    ),
                    ["query_id", "n2"],
                )
                .groupBy("query_id", F.col("n1").alias("neighbor_id"))
                .agg(F.max("psim").alias("_ms"))
            )
            scored = remaining.join(
                ms, ["query_id", "neighbor_id"], "left"
            ).na.fill({"_ms": 0.0})
        scored = scored.withColumn(
            "score",
            F.round(
                F.lit(lam) * F.col("rel") - F.lit(lam_c) * F.col("_ms"), 6
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc()
        )
        # eager-checkpoint each pick (≤ n_queries rows): the step's
        # scoring tree references the previous selection twice (max-sim
        # join + anti-join), so without truncation the logical plan
        # DOUBLES per step — ~2^k nodes, measured 10k plan lines at
        # k=5; checkpointed picks make growth linear in k
        pick = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(step).alias("pick_order"),
                "score",
            )
            .localCheckpoint(eager=True)
        )
        sel = pick if sel is None else sel.unionByName(pick)
        remaining = remaining.join(
            pick.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
    return sel
