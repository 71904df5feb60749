"""Literature-shaped corpus derived deterministically from the driver's
test tables, so the flagship grounding pipeline can run — and be
benchmarked — at any scale factor without synthesizing external data.

Mapping (all pure DataFrame ops over the provided parquet):
* diseases  ← nation  (id EFO_{key}, name lowercase)
* targets   ← part    (id ENSG{key}, symbol P{key}, name p_name)
* drugs     ← supplier (id CHEMBL{key}, name s_name)
* epmc      ← documents: one publication per doc; its text is the
  document body and its NER matches mention the entities chosen by
  doc_id modulo each entity table's size (so every publication grounds
  deterministically).
* epmcids   ← documents (PMID=doc_id, PMCID="PMC{doc_id}")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # read_table memoizes the bind per session — a raw read.parquet
    # re-reads the footer (~80 ms of driver latency) on EVERY call, and
    # one literature-chain construction binds 8 tables (4 of them
    # duplicates of the entity builders' reads).  Same normalization
    # contract as suite._t; none of the corpus tables carries a time
    # column, so this is bind reuse only.
    from platform_etl_literature_spark.sources.events import read_table

    return read_table(spark, sf_dir, name)


def _nrows(sf_dir: str, name: str) -> int:
    """Row count of an input table straight from the parquet footer
    metadata — the same number a distributed ``count()`` job returns,
    read per invocation from the same input file (no caching).  Round
    10: ``epmc_from`` needs three table sizes for its modulo keys, and
    three count() JOBS cost ~0.3 s of scheduling per construction
    (guide §1.2: don't compute things you throw away — the scan is
    thrown away, only the footer's row count is used)."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(f"{path}/*.parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def diseases_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        F.concat(F.lit("EFO_"), F.col("n_nationkey")).alias("id"),
        F.lower("n_name").alias("name"),
        F.struct(
            F.array(F.lower("n_name")).alias("hasExactSynonym"),
            F.lit([]).cast("array<string>").alias("hasNarrowSynonym"),
            F.lit([]).cast("array<string>").alias("hasBroadSynonym"),
            F.lit([]).cast("array<string>").alias("hasRelatedSynonym"),
        ).alias("synonyms"),
    )


def targets_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    empty_lab = F.lit([]).cast("array<struct<label:string>>")
    return part.select(
        F.concat(F.lit("ENSG"), F.col("p_partkey")).alias("id"),
        F.col("p_name").alias("approvedName"),
        F.concat(F.lit("P"), F.col("p_partkey")).alias("approvedSymbol"),
        empty_lab.alias("symbolSynonyms"),
        empty_lab.alias("nameSynonyms"),
        empty_lab.alias("obsoleteSymbols"),
        empty_lab.alias("obsoleteNames"),
        F.lit([]).cast("array<struct<id:string>>").alias("proteinIds"),
    )


def drugs_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    return sup.select(
        F.concat(F.lit("CHEMBL"), F.col("s_suppkey")).alias("id"),
        F.col("s_name").alias("name"),
        F.lit([]).cast("array<string>").alias("tradeNames"),
        F.lit([]).cast("array<string>").alias("synonyms"),
    )


def epmc_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_dsk"), F.lower("n_name").alias("_ds_label")
    )
    # mention the (unique) symbol, not p_name: TPC-H part names collide
    # heavily after stem+sort normalization, which makes every GP label
    # ground to hundreds of tied candidates — a pathological corpus, not
    # a representative one (the ambiguity path is covered by fixtures)
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("_gpk"),
        F.concat(F.lit("P"), F.col("p_partkey")).alias("_gp_label"),
    )
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("_cdk"), F.col("s_name").alias("_cd_label")
    )
    n_ds = _nrows(sf_dir, "nation")
    n_gp = _nrows(sf_dir, "part")
    n_cd = _nrows(sf_dir, "supplier")

    base = (
        docs.withColumn("_dsk", (F.col("doc_id") % n_ds).cast("int"))
        .withColumn("_gpk", F.col("doc_id") % n_gp)
        .withColumn("_cdk", (F.col("doc_id") % n_cd).cast("int"))
        .join(F.broadcast(nation), "_dsk")
        .join(part, "_gpk")
        .join(F.broadcast(sup), "_cdk")
    )

    def match(label, type_):
        return F.struct(
            label.alias("label"),
            F.lit(type_).alias("type"),
            F.lit(0).cast("long").alias("startInSentence"),
            F.lit(5).cast("long").alias("endInSentence"),
            F.lit(0).cast("long").alias("sectionStart"),
            F.lit(5).cast("long").alias("sectionEnd"),
        )

    cooc = F.struct(
        F.col("_gp_label").alias("label1"),
        F.lit(0).cast("long").alias("start1"),
        F.lit(5).cast("long").alias("end1"),
        F.col("_ds_label").alias("label2"),
        F.lit(6).cast("long").alias("start2"),
        F.lit(12).cast("long").alias("end2"),
        F.lit("GP-DS").alias("type"),
        (F.col("doc_id") % 100 / 10.0).alias("sentEvidenceScore"),
    )

    sentence = F.struct(
        F.element_at(
            F.array(F.lit("title"), F.lit("abstract"), F.lit("methods"), F.lit("results")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("section"),
        F.col("text").alias("text"),
        F.array(
            match(F.col("_ds_label"), "DS"),
            match(F.col("_gp_label"), "GP"),
            match(F.col("_cd_label"), "CD"),
        ).alias("matches"),
        F.array(cooc).alias("co-occurrence"),
    )

    return base.select(
        F.col("doc_id").cast("string").alias("pmid"),
        F.concat(F.lit("PMC"), F.col("doc_id")).alias("pmcid"),
        F.lit("2021-06-15").alias("pubDate"),
        F.array(F.lit("Homo sapiens")).alias("organisms"),
        F.array(sentence).alias("sentences"),
    )


def epmcids_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("PMID"),
        F.concat(F.lit("PMC"), F.col("doc_id")).alias("PMCID"),
        F.lit("doi").alias("DOI"),
    )


def run_literature_pipeline(
    spark: SparkSession, sf_dir: str, stemmer=None
) -> DataFrame:
    """Grounding + processing end-to-end over the derived corpus;
    returns the literatureIndex (the flagship output).  ``stemmer``
    (None = live Porter UDF) selects the LT stemming strategy —
    functions.text.frozen_stem_terms makes the whole run
    SQL-replayable (the literature_pipeline_frozen suite row)."""
    from platform_etl_literature_spark.plans import processing

    out = processing.run(
        spark,
        epmc_from(spark, sf_dir),
        epmcids_from(spark, sf_dir),
        targets_from(spark, sf_dir),
        diseases_from(spark, sf_dir),
        drugs_from(spark, sf_dir),
        trace_source=False,  # derived multi-source corpus
        stemmer=stemmer,
    )
    return out["literatureIndex"]
