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
    """One named input/output (Helpers.scala:20-27 ``IOResourceConfig``).

    ``bucket_by``/``n_buckets`` (+ optional ``sort_by``, ``table``)
    write a bucketed, optionally sorted table — the layout that gives
    exchange-free sort-merge joins on the bucket key for every
    downstream stage (see tests/test_bucketing.py).  Bucketed writes go
    through the catalog (``saveAsTable`` with an explicit ``path``), as
    Spark requires.
    """

    format: str
    path: str
    options: dict[str, str] = field(default_factory=dict)
    partition_by: list[str] = field(default_factory=list)
    schema: StructType | None = None
    bucket_by: list[str] = field(default_factory=list)
    n_buckets: int = 0
    sort_by: list[str] = field(default_factory=list)
    table: str | None = None


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
    """Port of ``Helpers.writeTo`` (spark/Helpers.scala:208-235), plus
    bucketed-table writes for co-located joins."""
    for name, res in resources.items():
        cfg = res.config
        writer = res.data.write.format(cfg.format).options(**cfg.options)
        if cfg.partition_by:
            writer = writer.partitionBy(*cfg.partition_by)
        if cfg.bucket_by:
            if cfg.n_buckets <= 0:
                raise ValueError(f"{name}: bucket_by requires n_buckets > 0")
            if not cfg.table:
                # bucketed writes go through the catalog; defaulting the
                # table name to the resource name silently overwrites an
                # unrelated table when two configs share a name
                raise ValueError(
                    f"{name}: bucketed writes require an explicit "
                    "cfg.table (catalog table names are global; an "
                    "implicit default can collide across resources)"
                )
            writer = writer.bucketBy(cfg.n_buckets, *cfg.bucket_by)
            if cfg.sort_by:
                writer = writer.sortBy(*cfg.sort_by)
            writer.option("path", cfg.path).mode("overwrite").saveAsTable(cfg.table)
        else:
            writer.mode("overwrite").save(cfg.path)
    return resources
