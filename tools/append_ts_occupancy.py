"""One-off: compute the ts_similar signature-occupancy cells at the
probe factors and append the SCALE.md section the instrumented
scale_probe generates — used when SCALE.md was produced by a probe run
predating the instrument.  Future scale_probe runs emit the section
natively; this script then becomes redundant.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from platform_etl_literature_spark.operators import timeseries as TSX
from platform_etl_literature_spark.session import build_session

FACTORS = [1, 4, 16]


def main() -> None:
    spark = build_session("ts-occupancy-append")
    lines = [
        "## ts_similar signature-bucket occupancy (valve = 256)",
        "",
        "Pre-valve candidate volume Σ s·(s−1)/2, the series the "
        "hot-bucket valve drops, and the post-valve candidate volume "
        "the verify stage actually pays, per factor.",
        "",
        "| factor | series | buckets | max bucket | mean | cand pairs "
        "| hot-dropped | cand after valve |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for f in FACTORS:
        ev = spark.read.parquet(f"/tmp/scale_probe/ev_x{f}.parquet")
        cells = (
            ev.where(
                F.col("user_id").isNotNull() & (F.dayofmonth("ts") <= 28)
            )
            .groupBy(
                F.col("user_id").alias("id"),
                (F.dayofmonth("ts") - 1).cast("long").alias("p"),
            )
            .agg(F.count(F.lit(1)).alias("v"))
        )
        o = TSX.ts_sig_occupancy(
            cells, "id", "p", "v", length=28, n_segments=7,
            max_bucket_size=256,
        ).first()
        lines.append(
            f"| {f}x | {o['n_series']:,} | {o['n_buckets']:,} | "
            f"{o['max_bucket']:,} | {o['mean_bucket']} | "
            f"{o['n_cand_pairs']:,} | {o['n_hot_dropped']:,} | "
            f"{o['n_cand_after_valve']:,} |"
        )
    lines.append("")
    with open("/root/repo/SCALE.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended", len(FACTORS), "rows")


if __name__ == "__main__":
    main()
