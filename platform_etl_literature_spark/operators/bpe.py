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
   shuffle is (pair, long) rows), and fetch the TOP of the ranking —
   deterministic tie-break on (count DESC, left ASC, right ASC) — as a
   TakeOrderedAndProject (a few hundred rows to the driver, never the
   table).
3. Learn a BATCH of merges from that one ranking (the standard
   distributed-BPE amortization — a production vocabulary is 32k+
   merges, and one Spark job per merge would be 32k jobs).  The batch
   is chosen so it is PROVABLY the exact prefix sequential BPE would
   have produced:

   * walk the ranking top-down, stopping at the FIRST pair that shares
     a symbol with an already-batched pair — including the batched
     pairs' concatenations, since merging (a,b) mints new "ab" symbols
     that can change the counts of any pair mentioning "ab" — or whose
     OWN concatenation aliases an existing symbol (another batch
     member's concatenation, or any symbol minted in an earlier round:
     a non-fresh mint would add converted occurrences to already-
     counted pairs, whose totals can then overtake a batch member —
     see :func:`_exact_batch`).  The batch is therefore a strict
     PREFIX of the ranking (no skip-and-continue), pairwise
     symbol-disjoint, and mints only fresh symbols;
   * trim the batch to counts STRICTLY ABOVE the stopping row's count
     c*.  Disjoint pairs' counts are invariant under each other's
     merges (replacing "l r" elsewhere in a word cannot create or
     destroy an adjacency of two symbols outside {l, r}), and every
     pair a merge CAN affect — (x,l), (r,y), and the newly minted
     (x,lr), (lr,y), whose count is bounded by the old (x,l)/(r,y) —
     shares a symbol with the batch, so it sits at or below the
     stopping row: its count never exceeds c*.  Every batched pair
     outranks c* strictly, so at each sequential step the next batch
     member is still the unique global argmax — same merges, same
     order, same counts, no tie-break ambiguity (pinned against the
     literal python reference in tests/test_properties.py);
   * a batch that trims to nothing falls back to the single top pair
     (the true argmax — always exact).

   All batch merges are applied in ONE pure-Catalyst pass (a chain of
   greedy left-to-right merge folds — order is immaterial for disjoint
   pairs, and the chain replays sequential order anyway), so a round
   costs two jobs (ranking + materialize) for up to ``batch_cap``
   merges.

The symbol table is cached per round and replaced (persist/unpersist
hand-over-hand), so round k+1 reads round k's materialized state, not
a k-deep lineage.
"""

from __future__ import annotations

from platform_etl_literature_spark.localdf import local_df
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


#: rounds (Spark ranking jobs) taken by the most recent bpe_train call
#: — the batching's amortization claim is tested against this.
last_train_rounds: int = 0


def _exact_batch(
    ranked: list,
    remaining: int,
    min_pair_count: int,
    truncated: bool,
    minted: frozenset[str] = frozenset(),
) -> list[tuple[str, str, int]]:
    """Select the provably-sequential-exact merge batch from a ranked
    (count DESC, l ASC, r ASC) pair list — see the module docstring for
    the prefix/disjoint/strict-count argument.  ``truncated`` means the
    ranking was cut at the fetch limit, so unseen pairs may have counts
    equal to the last fetched row's.

    ``minted`` is the set of every multi-char symbol an EARLIER round's
    merge created.  A batched pair whose concatenation ``l+r`` equals a
    PRE-EXISTING symbol (or another batch member's concatenation) would
    not mint a fresh symbol: the merge would ADD converted occurrences
    to already-counted (x, lr) pairs, whose post-merge count can then
    reach old(x,lr)+old(x,l) <= 2·c* and overtake a later batch member
    — breaking the count-invariance step of the exactness proof.  The
    walk therefore stops at the first such collision (the alphabet is
    single characters, so ``len >= 2`` membership in ``minted``/``used``
    is a complete collision test)."""
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    c_star = None
    for row in ranked:
        left, right, cnt = row["p"]["l"], row["p"]["r"], int(row["cnt"])
        cat = left + right
        if (
            len(batch) >= remaining
            or left in used
            or right in used
            or cat in used
            or cat in minted
        ):
            c_star = cnt
            break
        batch.append((left, right, cnt))
        used.update((left, right, cat))
    else:
        # consumed every fetched row: if the fetch was truncated, an
        # unseen pair may tie the last count — be conservative
        c_star = ranked[-1]["cnt"] if truncated else None
    if c_star is not None:
        batch = [m for m in batch if m[2] > c_star]
    return [m for m in batch if m[2] >= min_pair_count]


def _greedy_batch(
    ranked: list,
    remaining: int,
    min_pair_count: int,
    minted: frozenset[str] = frozenset(),
) -> list[tuple[str, str, int]]:
    """Select the GREEDY disjoint merge batch: walk the ranking
    top-down and keep every pair that is symbol-disjoint from the
    batch so far (skip-and-continue, vs :func:`_exact_batch`'s
    stop-at-first-conflict), still refusing concatenation collisions
    so every recorded count is the pair's true round-start count.

    This is the standard distributed-BPE amortization (frequency-
    threshold batching): all batched counts are exact as of the round
    start (disjoint merges cannot change each other's counts), but the
    merge ORDER can diverge from sequential BPE when a merge's PRODUCT
    pair would have outranked a later batch member.  On natural-
    language corpora the exact rule degrades to ~1 merge/round (the
    top character pairs all share 'e'/'t'/'i'...), so this mode is
    what makes 32k-merge vocabularies trainable in hundreds, not tens
    of thousands, of Spark rounds."""
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for row in ranked:
        if len(batch) >= remaining:
            break
        left, right, cnt = row["p"]["l"], row["p"]["r"], int(row["cnt"])
        if cnt < min_pair_count:
            break
        cat = left + right
        if left in used or right in used or cat in used or cat in minted:
            continue
        batch.append((left, right, cnt))
        used.update((left, right, cat))
    return batch


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_pair_count: int = 2,
    batch_cap: int = 24,
    exact: bool = True,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the
    ordered merge table [(rank, left, right, pair_count)]; stops early
    when the best remaining pair occurs fewer than ``min_pair_count``
    times.  Deterministic: ties break on (count DESC, left, right).

    Learns up to ``batch_cap`` merges per Spark round; ``batch_cap``
    also bounds the depth of the chained merge-fold expression a
    single rewrite pass compiles to.  Two batching modes:

    * ``exact=True`` (default): the batch is PROVABLY the exact prefix
      sequential BPE would produce (module docstring) — but on
      natural-language corpora the stop-at-first-conflict rule
      degrades to ~1 merge/round, because the highest-count character
      pairs share letters;
    * ``exact=False``: greedy disjoint batching
      (:func:`_greedy_batch`) — every batched count is still the true
      round-start count, merge order may diverge from sequential
      where a merge's product pair would outrank a later batch
      member.  The production mode for 32k-merge vocabularies.

    Sets :data:`last_train_rounds`.
    """
    global last_train_rounds
    words = word_freq_table(docs, text_col).select(
        F.split(F.col("word"), "").alias("syms"), "n"
    )
    state = words.persist()
    merges: list[tuple[int, str, str, int]] = []
    minted: set[str] = set()  # every multi-char symbol created so far
    rounds = 0
    try:
        while len(merges) < n_merges:
            rounds += 1
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
            fetch = 4 * batch_cap
            ranked = (
                pairs.groupBy("p")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("p.l"), F.asc("p.r"))
                .limit(fetch)
                .collect()
            )
            if not ranked or ranked[0]["cnt"] < min_pair_count:
                break
            if exact:
                batch = _exact_batch(
                    ranked,
                    remaining=min(batch_cap, n_merges - len(merges)),
                    min_pair_count=min_pair_count,
                    truncated=len(ranked) == fetch,
                    minted=frozenset(minted),
                )
            else:
                batch = _greedy_batch(
                    ranked,
                    remaining=min(batch_cap, n_merges - len(merges)),
                    min_pair_count=min_pair_count,
                    minted=frozenset(minted),
                )
            if not batch:  # conflict right at the top — single exact step
                top = ranked[0]
                batch = [(top["p"]["l"], top["p"]["r"], int(top["cnt"]))]
            for left, right, cnt in batch:
                merges.append((len(merges), left, right, cnt))
                minted.add(left + right)
            folded = F.col("syms")
            for left, right, _ in batch:
                folded = _merge_fold(folded, left, right)
            # localCheckpoint, not persist: the loop feeds its output
            # back in, and persist keeps the whole k-round lineage —
            # analysis time then grows geometrically with rounds (the
            # components.py module docstring's rule: persist for DAG
            # reuse, CHECKPOINT for iteration; measured here too —
            # per-round apply went 0.2s → 1.6s by round 12 on a
            # 31-word vocab with persist, flat with checkpoint).
            nxt = state.select(folded.alias("syms"), "n").localCheckpoint(
                eager=True
            )
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
        last_train_rounds = rounds
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
    return local_df(
        spark, rows, "rank INT, left STRING, right STRING, pair_count BIGINT"
    )


def bpe_encode(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    compact_vocab: bool = True,
) -> DataFrame:
    """Apply a learned merge list (in training order) to every
    document: (id, n_words, n_subwords).

    ``compact_vocab=True`` (default) encodes each DISTINCT word once
    and joins the per-word subword count back onto the occurrence
    stream — the compaction every production tokenizer pipeline does,
    because the merge-fold chain is the expensive part and word
    frequency is Zipfian: occurrences outnumber types by orders of
    magnitude (the sf0.1 corpus is 270 k occurrences over 31 types;
    r6 measured the compaction ~10× on the bench cell, 10.0 s →
    ~1.0 s steady-state).  The plan is: map-side explode → map-side-combined
    ``distinct`` of bare words (shuffles only the vocabulary) → fold
    once per type → broadcast-hash-join back (occurrences never
    shuffle) → per-doc count/sum, partial-aggregated map-side.  For a
    corpus whose TYPE table itself outgrows a broadcast (~100 M+
    types), drop to ``compact_vocab=False``: the zero-shuffle fold of
    every occurrence, which never materializes a vocabulary at all.

    Both paths run the identical greedy fold (:func:`_merge_fold`) and
    return identical values — pinned against the pure-Python reference
    in tests/test_properties.py.
    """
    def encode_word(word: Column) -> Column:
        s = F.split(word, "")
        for left, right in merges:
            s = _merge_fold(s, left, right)
        return F.size(s)

    w = tokens(F.col(text_col))
    if not compact_vocab:
        counts = F.transform(w, encode_word)
        return docs.select(
            F.col(id_col),
            F.size(w).alias("n_words"),
            F.aggregate(
                counts, F.lit(0), lambda a, c: a + c
            ).alias("n_subwords"),
        )
    occ = docs.select(F.col(id_col), F.explode_outer(w).alias("_w"))
    enc = (
        occ.where(F.col("_w").isNotNull())
        .select("_w")
        .distinct()
        .select("_w", encode_word(F.col("_w")).alias("_n_sub"))
    )
    return (
        occ.join(F.broadcast(enc), "_w", "left")
        .groupBy(id_col)
        .agg(
            F.count("_w").cast("int").alias("n_words"),
            F.coalesce(F.sum("_n_sub"), F.lit(0))
            .cast("int")
            .alias("n_subwords"),
        )
    )
