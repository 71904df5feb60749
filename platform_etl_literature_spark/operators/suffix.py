"""Distributed suffix-array LCP dedup — longest cross-document
duplicated substring per document.

The exact-substring dedup question ("which training documents share a
verbatim run of >= L tokens with some other document?") is the
suffix-array formulation of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL'22): sort ALL suffixes of the
corpus, and every substring shared by two documents shows up as a pair
of *adjacent* suffixes in that order whose longest-common-prefix (LCP)
covers it.  N-gram membership (``dedup.contamination``,
``dedup.scrub_dup_passages``) answers "shares a gram of exactly n";
the suffix order answers "how LONG is the longest shared run" in one
pass, for every length at once (up to the suffix cap).

Why adjacency is enough (and what we compute):

* If documents ``a != b`` share a token run ``P``, then some suffix of
  ``a`` and some suffix of ``b`` both start with ``P``, so the sorted
  suffix order contains a contiguous block of suffixes with prefix
  ``P`` holding suffixes of both documents.  Inside that block the
  ``a``-suffixes form one or more runs, and at a run boundary sits an
  ADJACENT pair with exactly one side in ``a`` — its LCP is >= |P|.
* Conversely the LCP of any adjacent cross-document pair IS a shared
  run of both documents.
* Hence per document, max(LCP) over adjacent pairs whose two sides are
  different documents == the length of its longest cross-document
  duplicated substring.  We report exactly that, capped at ``k_cap``
  (suffixes are truncated to their first ``k_cap`` tokens, so any
  longer shared run reports ``k_cap`` — the cap is what bounds row
  width and sort-key size at corpus scale).

Sort-key subtlety: suffixes are ordered by their SPACE-JOINED string,
not element-wise by token array.  Byte order of the joined strings is
not token-lexicographic when token lengths differ, but it does keep
every token-prefix block contiguous — all suffixes with token-prefix
``P`` serialize to ``"P"`` or ``"P <rest>"``, and no other string
sorts between them (tokens are split on the separator, so none
contains a space, and no printable byte sorts below 0x20).  Contiguity
is all the adjacency argument needs, and a plain string order is the
one order Spark and DuckDB are guaranteed to agree on byte-for-byte
(both default to binary UTF-8 comparison), which is what lets the SQL
oracle replay the identical neighbor pairs.

Scale shape (the 100 TB story):

* Suffix explosion is map-side: one corpus scan, ~n_tokens rows of
  (id, pos, key<=k_cap tokens) — no gram distinct, no text carried.
* The global sort is :func:`operators.ranking.ordered_global_index`
  (repartitionByRange + in-partition sort + broadcast offset prefix
  sums) — NO single-partition window anywhere in the plan.
* Neighbor pairing is one equi-join on the dense rank (rnk = rnk+1),
  a shuffle of (long, string) pairs; the LCP itself is a pure
  column-level fold over the two split keys (whole-stage codegen, no
  Python).
* Per-document reduction is a map-side-combined max.

Reference anchors (parity targets, NOT ported code): the reference
deduplicates documents by exact keys only
(src/main/scala/io/opentargets/etl/literature/Processing.scala:61-63
dropDuplicates on pmid); suffix-level dedup is part of this repo's
training-data extension surface (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from platform_etl_literature_spark.operators.ranking import (
    ordered_global_index,
)

_TOKENS_SQL = (
    "filter(split({text}, ' '), t -> t != '') AS w"
)


def token_lcp(a: Column, b: Column) -> Column:
    """Token-wise longest-common-prefix length of two string arrays —
    O(len) via the first-mismatch position: zip the arrays null-safely
    (``<=>``; the shorter side pads with NULL, which can never be
    null-safe-equal to a real token), find the first ``false``.  No
    mismatch means the arrays are identical, so the LCP is their full
    length."""
    eqs = F.zip_with(a, b, lambda x, y: x.eqNullSafe(y))
    mis = F.array_position(eqs, F.lit(False))
    return F.when(mis == 0, F.size(a)).otherwise(mis - 1).cast("int")


def suffix_rows(
    docs: DataFrame, id_col: str, text_col: str, k_cap: int
) -> DataFrame:
    """(id, pos, _key) — every token suffix of every document,
    truncated to its first ``k_cap`` tokens and space-joined.  The
    joined string is the ONLY payload: it is both the sort key and
    (re-split after the neighbor join) the token array the LCP folds
    over, so the global sort shuffles one string per suffix."""
    if k_cap < 1:
        raise ValueError(f"k_cap must be >= 1, got {k_cap}")
    return (
        docs.selectExpr(
            f"`{id_col}` AS id", _TOKENS_SQL.format(text=f"`{text_col}`")
        )
        .where(F.size("w") > 0)
        .select(
            "id",
            F.explode(F.sequence(F.lit(1), F.size("w"))).alias("pos"),
            F.col("w"),
        )
        .select(
            "id",
            "pos",
            F.concat_ws(" ", F.slice("w", F.col("pos"), k_cap)).alias("_key"),
        )
    )


def suffix_lcp(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k_cap: int = 12,
    min_len: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Longest cross-document duplicated substring per document, in
    tokens, capped at ``k_cap``: (id, max_dup_tokens, dup_flag) for
    EVERY input document (0 / flag 0 when nothing is shared — or the
    document is empty).  ``dup_flag`` is 1 when the longest shared run
    reaches ``min_len`` tokens, the "duplicated passage" bar.

    See the module docstring for the construction and why
    adjacent-pair LCPs suffice.  Determinism: the suffix order
    (_key, id, pos) is a total order — equal keys are broken by
    (id, pos), which is unique per suffix — so the neighbor pairing,
    and therefore the result, is engine-independent.
    """
    suf = suffix_rows(docs, id_col, text_col, k_cap)
    ranked = ordered_global_index(
        suf,
        [F.col("_key"), F.col("id"), F.col("pos")],
        rank_col="rnk",
        num_partitions=num_partitions,
    ).select("id", "_key", "rnk")
    left = ranked.select(
        F.col("rnk").alias("_r"),
        F.col("id").alias("_ida"),
        F.col("_key").alias("_ka"),
    )
    right = ranked.select(
        (F.col("rnk") - 1).alias("_r"),
        F.col("id").alias("_idb"),
        F.col("_key").alias("_kb"),
    )
    pairs = (
        left.join(right, "_r")
        .where(F.col("_ida") != F.col("_idb"))
        .select(
            "_ida",
            "_idb",
            token_lcp(
                F.split("_ka", " "), F.split("_kb", " ")
            ).alias("_lcp"),
        )
    )
    per_doc = (
        pairs.select(
            F.explode(F.array("_ida", "_idb")).alias("id"), "_lcp"
        )
        .groupBy("id")
        .agg(F.max("_lcp").alias("_mx"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("_mx", F.lit(0)).cast("int").alias("max_dup_tokens"),
            (F.coalesce("_mx", F.lit(0)) >= min_len)
            .cast("int")
            .alias("dup_flag"),
        )
    )
