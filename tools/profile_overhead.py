"""Measure the per-query scheduling FLOOR both engines pay in
bench.py — the fixed cost a query suffers regardless of its plan:
Python->JVM round trip, analysis, job scheduling, task launch, noop
commit (Spark) / statement parse + execute (DuckDB).

Why it matters: 40+ headline queries are sub-second, so the aggregate
Spark/DuckDB ratio depends as much on HEADLINE COMPOSITION (how many
floors are being summed) as on plan quality.  BENCH_NOTES.md
publishes a floor-adjusted subtotal next to the raw one so future
headline rotations can't silently flatter or penalize the ratio by
adding/removing floor-dominated rows.

Probes (each min-of-warm-reps, like bench.py's per-query rule):
  * spark_norow:  noop write of spark.range(1) — pure scheduling floor
  * spark_scan:   tiny parquet scan (region, 5 rows) + agg + noop —
                  the minimal shape a real headline query can have
  * duckdb_scan:  the same tiny scan + agg through duckdb.sql().df()

Usage: python tools/profile_overhead.py [sf_dir]
Prints one JSON line; paste the numbers into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_etl_literature_spark.session import build_session

REPS = 21


def _best(fn) -> float:
    fn()  # warmup (codegen/JIT) discarded
    best = None
    for _ in range(REPS):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("profile-overhead")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def spark_norow():
        spark.range(1).write.format("noop").mode("overwrite").save()

    def spark_scan():
        (
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .groupBy()
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW region AS SELECT * FROM "
        f"read_parquet('{sf_dir}/region.parquet')"
    )

    def duckdb_scan():
        con.sql("SELECT count(*) AS n FROM region").df()

    out = {
        "spark_norow_floor_sec": _best(spark_norow),
        "spark_scan_floor_sec": _best(spark_scan),
        "duckdb_scan_floor_sec": _best(duckdb_scan),
        "reps": REPS,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
