"""Decompose where a small-SF bench query's wall time goes: python
plan build, parquet read/listing, first execution vs steady state —
and A/B key session confs (AQE on/off, shuffle partitions).

Usage: python tools/profile_overhead.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.suite import SUITE

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = sys.argv[2:] or ["pricing_summary", "two_level_window_min", "ann_cosine_topk", "tfidf_terms"]


def t(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = build_session("profile")
    spark.read.parquet(f"{SF}/region.parquet").count()  # JVM warm

    # cost of the raw read path (file listing + footer/schema)
    for tbl in ["lineitem", "documents", "embeddings"]:
        c1 = t(lambda: spark.read.parquet(f"{SF}/{tbl}.parquet"))
        c2 = t(lambda: spark.read.parquet(f"{SF}/{tbl}.parquet"))
        print(f"read-df {tbl}: first={c1}s repeat={c2}s")

    for name in QUERIES:
        fn = SUITE[name].fn
        build = t(lambda: fn(spark, SF))
        runs = []
        for _ in range(4):
            df = fn(spark, SF)
            runs.append(t(lambda: df.write.format("noop").mode("overwrite").save()))
        spark.catalog.clearCache()
        print(f"{name}: build={build}s runs={runs}")

    # A/B: AQE off for the same queries (new conf on same session scope)
    for conf, val in [
        ("spark.sql.adaptive.enabled", "false"),
        ("spark.sql.adaptive.enabled", "true"),
    ]:
        spark.conf.set(conf, val)
        for name in QUERIES:
            df = SUITE[name].fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()  # warm plan
            dts = [t(lambda: SUITE[name].fn(spark, SF).write.format("noop").mode("overwrite").save()) for _ in range(3)]
            spark.catalog.clearCache()
            print(f"AQE={val} {name}: {dts}")


if __name__ == "__main__":
    main()
