"""Miniature literature fixtures matching FIXTURES.md schemas, crafted
to exercise: sentinel pmid null-out, pmid repair from pmcid, the anti
join drop, grounding via stemmed-label keys (incl. possessive/plural
variation), symbol (token) keys, disambiguation, section-weighted
relevance, and GP-DS co-occurrence evidence."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

SENTENCE_T = T.StructType(
    [
        T.StructField("section", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "matches",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("label", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("startInSentence", T.LongType()),
                        T.StructField("endInSentence", T.LongType()),
                        T.StructField("sectionStart", T.LongType()),
                        T.StructField("sectionEnd", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "co-occurrence",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("label1", T.StringType()),
                        T.StructField("start1", T.LongType()),
                        T.StructField("end1", T.LongType()),
                        T.StructField("label2", T.StringType()),
                        T.StructField("start2", T.LongType()),
                        T.StructField("end2", T.LongType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("sentEvidenceScore", T.DoubleType()),
                        T.StructField("association", T.StringType()),
                        T.StructField("relation", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

EPMC_T = T.StructType(
    [
        T.StructField("pmid", T.StringType()),
        T.StructField("pmcid", T.StringType()),
        T.StructField("pubDate", T.StringType()),
        T.StructField("organisms", T.ArrayType(T.StringType())),
        T.StructField("sentences", T.ArrayType(SENTENCE_T)),
    ]
)


def _m(label, type_, s=0, e=5):
    return (label, type_, s, e, s, e)


def _cooc(l1, l2, type_, score):
    return (l1, 0, 5, l2, 10, 20, type_, score, None, None)


def epmc_df(spark: SparkSession):
    rows = [
        # fully-grounded publication: GP + DS in title, DS in methods,
        # GP-DS co-occurrence
        (
            "101",
            "PMC101",
            "2021-03-15",
            ["Homo sapiens"],
            [
                (
                    "title",
                    "BRCA1 in Alzheimer's disease",
                    [_m("BRCA1", "GP"), _m("Alzheimer's disease", "DS", 10, 28)],
                    [_cooc("BRCA1", "Alzheimer's disease", "GP-DS", 7.0)],
                ),
                (
                    "Methods",
                    "aspirin dosing for Alzheimer disease",
                    [_m("aspirin", "CD"), _m("Alzheimer disease", "DS", 19, 36)],
                    [],
                ),
            ],
        ),
        # second pub sharing the GP/DS pair (evidence self-join needs ≥1
        # shared publication; cooc present too)
        (
            "102",
            None,
            "2020-07-01",
            [],
            [
                (
                    "title",
                    "BRCA1 and Alzheimer diseases",
                    [_m("BRCA1", "GP"), _m("Alzheimer diseases", "DS", 10, 28)],
                    [_cooc("BRCA1", "Alzheimer diseases", "GP-DS", 9.0)],
                ),
                ("abstract", "aspirin echoes", [_m("aspirin", "CD")], []),
            ],
        ),
        # pmid recoverable from pmcid via the lookup
        (
            None,
            "PMC103",
            "2019-01-02",
            [],
            [("title", "BRCA1 study", [_m("BRCA1", "GP")], [])],
        ),
        # pmid "0" sentinel + no pmcid → unresolvable, dropped
        ("0", None, "2018-05-05", [], [("title", "noise", [], [])]),
        # pmid known in the lut but pmcid missing → dropped by the anti join
        ("104", None, "2017-09-09", [], [("title", "anti-join victim", [], [])]),
        # ungroundable mention → failedMatches
        (
            "105",
            "PMC105",
            "2022-11-30",
            [],
            [("title", "XYZZY curious", [_m("XYZZY", "GP")], [])],
        ),
    ]
    return spark.createDataFrame(rows, EPMC_T)


def epmcids_df(spark: SparkSession):
    return spark.createDataFrame(
        [
            (101, "PMC101", "d1"),
            (103, "PMC103", "d3"),
            (104, "PMC104", "d4"),
            (105, "PMC105", "d5"),
        ],
        "PMID BIGINT, PMCID STRING, DOI STRING",
    )


def diseases_df(spark: SparkSession):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField(
                "synonyms",
                T.StructType(
                    [
                        T.StructField("hasExactSynonym", T.ArrayType(T.StringType())),
                        T.StructField("hasNarrowSynonym", T.ArrayType(T.StringType())),
                        T.StructField("hasBroadSynonym", T.ArrayType(T.StringType())),
                        T.StructField("hasRelatedSynonym", T.ArrayType(T.StringType())),
                    ]
                ),
            ),
        ]
    )
    rows = [
        (
            "EFO_0000249",
            "Alzheimer disease",
            (["Alzheimers disease"], [], [], ["senile dementia"]),
        ),
        ("EFO_0000305", "breast carcinoma", ([], [], [], [])),
    ]
    return spark.createDataFrame(rows, schema)


def targets_df(spark: SparkSession):
    lab = T.ArrayType(T.StructType([T.StructField("label", T.StringType())]))
    ids = T.ArrayType(T.StructType([T.StructField("id", T.StringType())]))
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("approvedName", T.StringType()),
            T.StructField("approvedSymbol", T.StringType()),
            T.StructField("symbolSynonyms", lab),
            T.StructField("nameSynonyms", lab),
            T.StructField("obsoleteSymbols", lab),
            T.StructField("obsoleteNames", lab),
            T.StructField("proteinIds", ids),
        ]
    )
    rows = [
        (
            "ENSG00000012048",
            "BRCA1 DNA repair associated",
            "BRCA1",
            [("RNF53",)],
            [],
            [],
            [],
            [("P38398",)],
        ),
    ]
    return spark.createDataFrame(rows, schema)


def drugs_df(spark: SparkSession):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("tradeNames", T.ArrayType(T.StringType())),
            T.StructField("synonyms", T.ArrayType(T.StringType())),
        ]
    )
    rows = [("CHEMBL25", "ASPIRIN", ["Ecotrin"], ["acetylsalicylic acid"])]
    return spark.createDataFrame(rows, schema)
