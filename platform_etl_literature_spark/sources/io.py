"""Config-driven multi-format IO layer.

Re-expresses the reference's generic reader/writer
(``spark/Helpers.scala:108-126`` ``readFrom``/``loadFileToDF`` and
``:208-235`` ``writeTo``): a map of name → {format, path, options,
partitionBy} in, a map of name → (config, DataFrame) out.

Formats: json, parquet, csv (gzip transparent) — the full end-to-end
surface of the reference (reference.conf:21, 22.09_parquet.conf:7).

Scale notes
-----------
* Reads are lazy scans; schema inference is opt-in per source (the
  reference infers for JSON/CSV, self-describes for parquet).  For a
  100 TB corpus pass an explicit ``schema`` to skip the inference job.
* Writes support ``partition_by`` so outputs land hive-partitioned and
  downstream readers get partition pruning for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass
class IOResourceConfig:
    """One named input/output (Helpers.scala:20-27 ``IOResourceConfig``)."""

    format: str
    path: str
    options: dict[str, str] = field(default_factory=dict)
    partition_by: list[str] = field(default_factory=list)
    schema: StructType | None = None


@dataclass
class IOResource:
    """A loaded resource: the DataFrame plus the config that produced it."""

    data: DataFrame
    config: IOResourceConfig


def load_df(spark: SparkSession, cfg: IOResourceConfig) -> DataFrame:
    """Port of ``Helpers.loadFileToDF`` (spark/Helpers.scala:117-126)."""
    reader = spark.read.format(cfg.format).options(**cfg.options)
    if cfg.schema is not None:
        reader = reader.schema(cfg.schema)
    return reader.load(cfg.path)


def read_from(
    spark: SparkSession, configs: dict[str, IOResourceConfig]
) -> dict[str, IOResource]:
    """Port of ``Helpers.readFrom`` (spark/Helpers.scala:108-115)."""
    return {name: IOResource(load_df(spark, cfg), cfg) for name, cfg in configs.items()}


def write_to(resources: dict[str, IOResource]) -> dict[str, IOResource]:
    """Port of ``Helpers.writeTo`` (spark/Helpers.scala:208-235)."""
    for res in resources.values():
        writer = res.data.write.format(res.config.format).options(**res.config.options)
        if res.config.partition_by:
            writer = writer.partitionBy(*res.config.partition_by)
        writer.mode("overwrite").save(res.config.path)
    return resources
