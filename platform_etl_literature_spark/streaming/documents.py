"""Structured Streaming ingest of the documents corpus: the curation
policy applied to arriving training data.

The decision logic lives in ``operators.textstats.curation_flags`` and
is deliberately stateless (one projection pipeline, no joins, no
aggregation), so the IDENTICAL plan runs over the historical corpus in
batch and over the ingest stream in append mode with no watermark and
no state store at all — a curation policy is written once and applied
everywhere.  Stateful corpus-level passes (exact dedup, MinHash) stay
batch/periodic; per-document filtering happens at ingest.

At scale the ingest source is a bucketed landing directory (or Kafka);
the file source here demonstrates the identical-plan contract the
tests pin (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from platform_etl_literature_spark.operators.textstats import curation_flags


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the documents parquet (schema from a
    driver-side metadata read, as streaming sources require)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def curated_documents(docs: DataFrame) -> DataFrame:
    """Per-document curation verdicts (quality, lang_pred, flagged,
    kept) — works identically on a batch or streaming ``docs``."""
    return curation_flags(docs, "doc_id", "text", carry_cols=["source"])
