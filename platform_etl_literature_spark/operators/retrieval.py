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
