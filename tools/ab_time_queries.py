"""Minimal per-query timer for interleaved A/B runs: min/median of N
noop-sink reps per named query in ONE session (bench.py methodology,
without the DuckDB side).

Usage: python tools/ab_time_queries.py [--reps N] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.suite import SUITE


def main() -> None:
    args = sys.argv[1:]
    reps = 4
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ab-time")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in args:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            df = SUITE[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        spark.catalog.clearCache()
        print(
            f"{name}: min {min(ts):.3f} med {statistics.median(ts):.3f} "
            f"reps {[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
