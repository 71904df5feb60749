"""Vectors step: the Word2Vec vector table with category + L2 norm.

Re-expression of ``Vectors`` (Vectors.scala:13-52).  The reference uses
a JVM UDF for the norm and keeps ml VectorUDT; here the model boundary
is crossed once with ``vector_to_array`` and the norm is a native HOF —
no UDF, no VectorUDT downstream (SURVEY.md §2.9 note).
"""

from __future__ import annotations

from pyspark.ml.feature import Word2VecModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platform_etl_literature_spark.functions.vectors import array_norm

COLUMNS = ["category", "word", "norm", "vector"]


def compute(vectors: DataFrame) -> DataFrame:
    """(word, vector) → (category, word, norm, vector:array<double>)
    with prefix-dispatched category (Vectors.compute:21-36)."""
    return (
        vectors.withColumn(
            "category",
            F.when(F.col("word").startswith("ENSG"), F.lit("target"))
            .when(F.col("word").startswith("CHEMBL"), F.lit("drug"))
            .otherwise(F.lit("disease")),
        )
        .withColumn("vector", vector_to_array(F.col("vector")))
        .withColumn("norm", array_norm(F.col("vector")))
        .select(*COLUMNS)
    )


def run(model: Word2VecModel) -> DataFrame:
    """Full vectors step (Vectors.apply:38-52)."""
    return compute(model.getVectors())
