"""Measure candidate bench-promotion rows on BOTH engines at sf0.1
(min of N against the suite oracle), before adding them to bench.py's
HEADLINE — the measured-before-promotion rule.

Usage: python tools/measure_promotions.py [query ...]
"""
from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.suite import SUITE

SF_DIR = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
DEFAULT = [
    "isotonic_calibration", "jaro_winkler_join", "corr_matrix",
    "bootstrap_ci", "w2v_frozen_synonyms", "literature_relevance",
    "ingest_dedup_replay", "winsorized_stats", "zipf_fit",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    reps = 3
    spark = build_session("measure-promotions")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for name in names:
        spec = SUITE[name]
        best_s = None
        for _ in range(reps):
            t0 = time.time()
            spec.fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best_s = dt if best_s is None else min(best_s, dt)
        spark.catalog.clearCache()
        best_d = None
        if spec.oracle:
            for _ in range(reps):
                t0 = time.time()
                con.execute(spec.oracle).fetchall()
                dt = time.time() - t0
                best_d = dt if best_d is None else min(best_d, dt)
        print(
            f"{name}: spark {best_s:.2f}s duckdb "
            f"{'-' if best_d is None else f'{best_d:.2f}s'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
