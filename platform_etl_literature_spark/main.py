"""CLI entry point: step dispatch by name, config-driven IO.

Re-expression of the reference's ``Main`` + ``ETLSessionContext``
(Main.scala:8-62, ETLSessionContext.scala:14-17): steps are named
``processing | embedding | vectors | evidence``; ``all`` runs them in
order.  Unlike the reference (which re-reads every intermediate from
disk even under ``all`` — SURVEY.md §0), ``all`` here passes DataFrames
between steps in memory and only writes the configured outputs.

Config is a JSON file::

    {
      "inputs": {
        "epmc":     {"format": "json",    "path": "..."},
        "epmcids":  {"format": "csv",     "path": "...", "options": {"header": "true", "inferSchema": "true"}},
        "targets":  {"format": "parquet", "path": "..."},
        "diseases": {"format": "parquet", "path": "..."},
        "drugs":    {"format": "parquet", "path": "..."}
      },
      "output": {"dir": "/tmp/out", "format": "parquet"},
      "word2vec": {"vector_size": 100, "seed": 42},
      "evidence": {"threshold": 0.01}
    }
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from platform_etl_literature_spark.config import (
    EvidenceConfig,
    Word2VecConfig,
)
from platform_etl_literature_spark.plans import (
    embedding as embedding_plan,
)
from platform_etl_literature_spark.plans import (
    evidence as evidence_plan,
)
from platform_etl_literature_spark.plans import (
    processing as processing_plan,
)
from platform_etl_literature_spark.plans import (
    vectors as vectors_plan,
)
from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.sources import (
    IOResource,
    IOResourceConfig,
    read_from,
    write_to,
)

STEPS = ["processing", "embedding", "vectors", "evidence"]


def _io_configs(cfg: dict) -> dict[str, IOResourceConfig]:
    return {
        name: IOResourceConfig(
            format=c["format"], path=c["path"], options=c.get("options", {})
        )
        for name, c in cfg.items()
    }


def _out(cfg: dict, name: str, df) -> dict[str, IOResource]:
    return {
        name: IOResource(
            df, IOResourceConfig(cfg["output"]["format"], f"{cfg['output']['dir']}/{name}")
        )
    }


def run_all(spark: SparkSession, cfg: dict, steps: list[str]) -> None:
    inputs = read_from(spark, _io_configs(cfg["inputs"]))
    out_fmt = cfg["output"]["format"]
    out_dir = cfg["output"]["dir"]

    processed = None
    if "processing" in steps:
        processed = processing_plan.run(
            spark,
            inputs["epmc"].data,
            inputs["epmcids"].data,
            inputs["targets"].data,
            inputs["diseases"].data,
            inputs["drugs"].data,
        )
        write_to(
            {
                name: IOResource(
                    df, IOResourceConfig(out_fmt, f"{out_dir}/{name}")
                )
                for name, df in processed.items()
            }
        )

    def matches():
        if processed is not None:
            return processed["matches"]
        return spark.read.format(out_fmt).load(f"{out_dir}/matches")

    model = None
    if "embedding" in steps:
        w2v = Word2VecConfig(**cfg.get("word2vec", {}))
        model, training = embedding_plan.run(spark, matches(), w2v)
        write_to({"trainingSet": IOResource(training, IOResourceConfig(out_fmt, f"{out_dir}/trainingSet"))})
        model.write().overwrite().save(f"{out_dir}/w2v_model")

    def load_model():
        if model is not None:
            return model
        from pyspark.ml.feature import Word2VecModel

        return Word2VecModel.load(f"{out_dir}/w2v_model")

    if "vectors" in steps:
        write_to(_out(cfg, "vectors", vectors_plan.run(load_model())))

    if "evidence" in steps:
        coocs = (
            processed["cooccurrences"]
            if processed is not None
            else spark.read.format(out_fmt).load(f"{out_dir}/cooccurrences")
        )
        ev_conf = EvidenceConfig(**cfg.get("evidence", {}))
        ev = evidence_plan.run(spark, load_model(), matches(), coocs, ev_conf)
        write_to(_out(cfg, "evidence", ev))


def run_curate(spark: SparkSession, cfg: dict) -> None:
    """Training-data curation over a ``documents`` input: per-document
    verdicts (quality, language, repetition — the same stateless policy
    the streaming ingest applies), exact-dedup winners, and two
    outputs: ``curated`` (surviving rows, full schema) and
    ``curation_report`` (one verdict row per input document)."""
    from platform_etl_literature_spark.operators.dedup import exact_dedup
    from platform_etl_literature_spark.operators.textstats import curation_flags

    ccfg = cfg.get("curate", {})
    id_col = ccfg.get("id_col", "doc_id")
    text_col = ccfg.get("text_col", "text")
    docs = read_from(spark, _io_configs(cfg["inputs"]))["documents"].data
    flags = curation_flags(
        docs,
        id_col,
        text_col,
        quality_min=ccfg.get("quality_min", 0.5),
        want_lang=ccfg.get("lang", "en"),
        rep_threshold=ccfg.get("rep_threshold", 0.3),
    )
    winners = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept_ids = (
        flags.filter(F.col("kept") == 1)
        .select(id_col)
        .join(winners, id_col, "left_semi")
    )
    curated = docs.join(kept_ids, id_col, "left_semi")
    out_fmt, out_dir = cfg["output"]["format"], cfg["output"]["dir"]
    write_to(
        {
            "curated": IOResource(
                curated, IOResourceConfig(out_fmt, f"{out_dir}/curated")
            ),
            "curation_report": IOResource(
                flags, IOResourceConfig(out_fmt, f"{out_dir}/curation_report")
            ),
        }
    )


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        prog="platform-etl-literature-spark",
        description=(
            "PySpark literature ETL: processing | embedding | vectors | "
            "evidence | all; plus the training-data step: curate"
        ),
    )
    p.add_argument("steps", nargs="+", choices=STEPS + ["all", "curate"])
    p.add_argument("--config", required=True, help="JSON config file")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    with open(args.config) as fh:
        cfg = json.load(fh)
    spark = build_session("platform-etl-literature-spark", master=args.master)
    if "curate" in args.steps:
        run_curate(spark, cfg)
    steps = STEPS if "all" in args.steps else [s for s in STEPS if s in args.steps]
    if steps:
        run_all(spark, cfg, steps)


if __name__ == "__main__":
    main()
