"""Byte-pair-encoding tokenizer training (Sennrich/Haddow/Birch, ACL
2016) — learn a subword merge table from the corpus, the vocabulary
step every LLM data pipeline runs before token counting and packing.
The literature reference trains Word2Vec (Embedding.scala) but has no
tokenizer training; this fills that gap with the same iterative-fit
pattern (a driver-side loop around distributed aggregates — the W2V
exception sanctioned in SURVEY §7.3 for genuinely iterative ML).

Algorithm (classic word-internal BPE):

1. Collapse the corpus to its DISTINCT word table with frequencies —
   at 100 TB the word table is vocabulary-sized (Heaps' law: millions,
   not trillions), so every later round touches words, never documents.
2. Each round: explode adjacent symbol pairs weighted by word
   frequency, aggregate pair counts (map-side partial sums; the only
   shuffle is (pair, long) rows), and take the argmax pair —
   deterministic tie-break on (count DESC, left ASC, right ASC).
3. Collect THAT ONE ROW to the driver (the O(1)-per-round barrier every
   BPE implementation has — the argmax is inherently sequential), then
   rewrite the symbol arrays with a pure-Catalyst left-to-right greedy
   merge fold and start the next round.

The symbol table is cached per round and replaced (persist/unpersist
hand-over-hand), so round k+1 reads round k's materialized state, not
a k-deep lineage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_etl_literature_spark.operators.dedup import tokens


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol
    occurrences: ['a','b','b'] with (a,b) -> ['ab','b'].  A freshly
    merged token is never reused as the LEFT of another merge in the
    same pass (the fold compares the accumulator tail, which holds the
    concatenation, no longer equal to ``left`` — the standard BPE
    greedy semantics)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freq_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) corpus word frequencies — the compacted training
    input.  One corpus scan, one shuffle of (word, long) pairs."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge table [(rank, left, right, pair_count)]; stops early
    when the best remaining pair occurs fewer than ``min_pair_count``
    times.  Deterministic: ties break on (count DESC, left, right)."""
    words = word_freq_table(docs, text_col).select(
        F.split(F.col("word"), "").alias("syms"), "n"
    )
    state = words.persist()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(n_merges):
            pairs = state.select(
                F.explode(
                    F.when(
                        F.size("syms") < 2, F.array().cast("array<struct<l:string,r:string>>")
                    ).otherwise(
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("l"),
                                F.element_at("syms", i + 1).alias("r"),
                            ),
                        )
                    )
                ).alias("p"),
                "n",
            )
            best = (
                pairs.groupBy("p")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("p.l"), F.asc("p.r"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_pair_count:
                break
            left, right, cnt = best[0]["p"]["l"], best[0]["p"]["r"], best[0]["cnt"]
            merges.append((rank, left, right, int(cnt)))
            nxt = state.select(
                _merge_fold(F.col("syms"), left, right).alias("syms"), "n"
            ).persist()
            nxt.count()  # materialize before dropping the old state
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
    return merges


def bpe_merges_df(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> DataFrame:
    """The merge table as a DataFrame (rank, left, right, pair_count) —
    the suite-facing shape."""
    spark = docs.sparkSession
    rows = bpe_train(docs, text_col, n_merges, min_pair_count)
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, pair_count BIGINT"
    )


def bpe_encode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a learned merge list (in training order) to every
    document: (id, n_words, n_subwords).  Pure map-side — the merge
    table is compiled into a chain of per-row folds, no join, no
    shuffle; exactly how a frozen tokenizer runs over 100 TB."""
    w = tokens(F.col(text_col))
    syms = lambda word: F.split(word, "")  # noqa: E731
    def encode_word(word: Column) -> Column:
        s = syms(word)
        for left, right in merges:
            s = _merge_fold(s, left, right)
        return F.size(s)
    counts = F.transform(w, encode_word)
    return docs.select(
        F.col(id_col),
        F.size(w).alias("n_words"),
        F.aggregate(counts, F.lit(0), lambda a, c: a + c).alias("n_subwords"),
    )
