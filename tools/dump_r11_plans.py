"""Capture .explain('formatted') for bench headline queries into
plans/r11/<query>_<tag>.txt (tag = before/after) — the optimization
round's evidence files.

Usage: python tools/dump_r11_plans.py <tag> [query ...]
       (no query args = every bench.py HEADLINE query)

Note: building a suite DataFrame runs any eager setup the query
performs (iterative loops, schedule collects), so this tool costs
roughly one bench rep per iterative query.  Run on an otherwise idle
box; plan SHAPE does not depend on machine state.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.suite import SUITE


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-r11-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = SUITE[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, "->", path, flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
