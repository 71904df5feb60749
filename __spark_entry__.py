"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship harmonic-relevance query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator suite from
``platform_etl_literature_spark.suite`` (one entry per operator family
in SURVEY.md §2 plus the training-data-pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from platform_etl_literature_spark.suite import SUITE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SUITE["harmonic_relevance"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in SUITE.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in SUITE.items() if spec.oracle is not None
    }
