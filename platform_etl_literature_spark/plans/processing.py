"""Processing step: flatten grounded matches/co-occurrences and build
the literature index (section-weighted harmonic relevance + sentence
JSON per publication).

Re-expression of ``Processing`` (Processing.scala:28-125,180-223).
"""

from __future__ import annotations

from platform_etl_literature_spark.localdf import local_df
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from platform_etl_literature_spark.config import DEFAULT_SECTION_RANKS, SectionRank
from platform_etl_literature_spark.functions.harmonic import harmonic_sql
from platform_etl_literature_spark.plans import grounding


def section_rank_table(
    spark: SparkSession, ranks: list[SectionRank] | None = None
) -> DataFrame:
    """Lift the config section-rank list to a broadcastable table
    (Processing.scala:59-64)."""
    ranks = ranks if ranks is not None else DEFAULT_SECTION_RANKS
    return local_df(
        spark,
        [(r.section, r.rank, r.weight) for r in ranks],
        "section STRING, rank INT, weight DOUBLE",
    )


def filter_matches(df: DataFrame, is_mapped: bool = True) -> DataFrame:
    """Flatten the match struct, keep (un)mapped rows
    (Processing.filterMatches:41-51)."""
    return df.select("*", "match.*").drop("match").filter(F.col("isMapped") == is_mapped)


def filter_cooccurrences(df: DataFrame, is_mapped: bool = True) -> DataFrame:
    """Flatten the co-occurrence struct (Processing.filterCooccurrences:28-39).

    The hyphenated source column requires backtick quoting in SQL; the
    DataFrame API addresses it directly.
    """
    return (
        df.select("*", F.col("`co-occurrence`.*"))
        .drop("co-occurrence")
        .filter(F.col("isMapped") == is_mapped)
    )


def literature_index(
    df: DataFrame,
    spark: SparkSession,
    ranks: list[SectionRank] | None = None,
) -> DataFrame:
    """Per-(pmid, keyword) relevance for the search index
    (Processing.filterMatchesForCH:53-125):

    * per (pmid, section, keyword): the section weight repeated per
      mention (title fixed to its configured weight once),
    * per (pmid, keyword): weights flattened in section-rank order →
      positional harmonic sum,
    * per pmid: title/abstract mentions serialized to a JSON sentences
      blob.
    """
    ranks = ranks if ranks is not None else DEFAULT_SECTION_RANKS
    title_weight = next(r.weight for r in ranks if r.section == "title")
    rank_table = F.broadcast(section_rank_table(spark, ranks))

    # Projections and window expressions are staged as selectExpr
    # strings (round 10 expression staging) — same values, same column
    # order; the OVER clauses carry the identical partitioning/ordering
    # (and collect_list over an ORDER BY window keeps the default
    # running frame in both forms).
    fdf = df.selectExpr(
        *[
            "CAST(pmid AS BIGINT) AS pmid"
            if c == "pmid"
            else ("type AS keywordType" if c == "type" else f"`{c}`")
            for c in df.columns
        ]
    )
    # ONE exchange for the whole index (guide §2.4): partitioning by
    # pmid alone satisfies every downstream clustering requirement —
    # both windows ((pmid, section, keywordId) and (pmid, keywordId)),
    # both dropDuplicates, the sentences branch's two groupBys
    # ((pmid, section) then (pmid)) and the final join on pmid — so the
    # plan pays this single shuffle of the match stream instead of four
    # (plans/r10/literature_pipeline_frozen_before.txt).  Rows per pmid
    # are bounded by mentions per publication, so no skew hot key.
    fdf = fdf.repartition("pmid")

    sentences_df = (
        fdf.filter(F.col("section").isin("title", "abstract"))
        .groupBy("pmid", "section")
        .agg(
            F.expr(
                "struct(section, collect_list(struct("
                "label, keywordType, keywordId, startInSentence,"
                " endInSentence, sectionStart, sectionEnd)) AS matches)"
            ).alias("sentencesBySection")
        )
        .groupBy("pmid")
        .agg(F.expr("to_json(collect_list(sentencesBySection))").alias("sentences"))
    )

    return (
        fdf.join(rank_table, ["section"], "left_outer")
        .na.fill({"rank": 100, "weight": 0.01})
        .selectExpr(
            "*",
            "CASE WHEN section != 'title' THEN collect_list(weight)"
            " OVER (PARTITION BY pmid, section, keywordId)"
            f" ELSE array({title_weight!r}D) END AS keywordSectionV",
        )
        .dropDuplicates(["pmid", "section", "keywordId"])
        .selectExpr(
            "*",
            "flatten(collect_list(keywordSectionV)"
            " OVER (PARTITION BY pmid, keywordId ORDER BY rank ASC))"
            " AS relevanceV",
        )
        .selectExpr("*", f"{harmonic_sql('relevanceV')} AS relevance")
        .dropDuplicates(["pmid", "keywordId"])
        .join(sentences_df, ["pmid"], "left_outer")
        .select(
            "pmid",
            "pmcid",
            "date",
            "year",
            "month",
            "day",
            "keywordId",
            "relevance",
            "keywordType",
            "sentences",
        )
    )


def run(
    spark: SparkSession,
    epmc: DataFrame,
    epmcids: DataFrame,
    targets: DataFrame,
    diseases: DataFrame,
    drugs: DataFrame,
    ranks: list[SectionRank] | None = None,
    trace_source: bool = True,
    stemmer=None,
) -> dict[str, DataFrame]:
    """Full processing step (Processing.apply:180-223): grounding →
    persist reused branches → flatten → literature index.

    Returns the five output DataFrames; writing is the caller's choice
    (sources.write_to), so steps compose in-memory OR via files.
    """
    g = grounding.compute(
        epmc, epmcids, targets, diseases, drugs, trace_source, stemmer
    )
    for name in ("matches", "cooccurrences"):
        g[name].persist(StorageLevel.DISK_ONLY)

    matches = filter_matches(g["matches"], is_mapped=True)
    coocs = filter_cooccurrences(g["cooccurrences"], is_mapped=True)
    return {
        "failedMatches": g["matchesFailed"],
        "failedCooccurrences": g["cooccurrencesFailed"],
        "matches": matches,
        "cooccurrences": coocs,
        "literatureIndex": literature_index(matches, spark, ranks),
    }
