"""SparkSession factory.

Mirrors the session knobs of the reference ETL
(``spark/Helpers.scala:38-58`` in opentargets/platform-etl-literature):
``driver.maxResultSize=0``, ``mapKeyDedupPolicy=LAST_WIN``,
``broadcastTimeout=3000``, optional explicit master — plus the
modern-Spark settings the reference predates (AQE, Arrow).

Designed for a multi-executor cluster: nothing here assumes local mode.
``shuffle_partitions`` should be sized to cluster cores at deploy time
(AQE coalesces down at runtime, so err high for 100 TB inputs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "platform-etl-literature-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the SparkSession with engine defaults.

    Parameters mirror the reference's ``getOrCreateSparkSession``
    (Helpers.scala:38-58); cluster deploys pass ``master=None`` and let
    spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    # local mode: the driver IS the executor — size its heap to the box
    # (only effective at first JVM launch; harmless afterwards)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", driver_mem)
        # reference session conf (Helpers.scala:40-46)
        .config("spark.driver.maxResultSize", "0")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.broadcastTimeout", "3000")
        .config("spark.sql.debug.maxToStringFields", "2000")
        # modern engine defaults (post-date the reference's Spark 3.1)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The round-10 expression staging renders hot projections as
        # SQL strings; their backslash escapes (e.g. the grounding
        # `RLIKE '[^\\x20-\\x7e]'`) assume the modern parser default
        # escapedStringLiterals=false.  Pin it explicitly so a legacy
        # override can never silently change a staged regex (ADVICE
        # r10); the driver's bare session gets the same value as the
        # Spark default.
        .config("spark.sql.parser.escapedStringLiterals", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
