"""A/B: simhash32 aggregate width — 32 conditional ±1 sums (current)
vs packed bit-counters (k counters per long, popcount-style).

Run: python tools/ab_simhash.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.operators.dedup import simhash32, token_hash, tokens


def simhash32_packed(df: DataFrame, id_col: str, text_col: str, per_long: int = 4) -> DataFrame:
    """Packed-counter variant: ones_j = count of tokens with bit j set,
    accumulated `per_long` counters per 64-bit long (16-bit fields at
    per_long=4 — safe below 65536 tokens/doc), plus one total count n.
    bit_j of the signature = (2*ones_j > n)."""
    width = 64 // per_long
    n_longs = (32 + per_long - 1) // per_long
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t")
    ).withColumn("h", token_hash(F.col("t")))
    packed_cols = []
    for g in range(n_longs):
        expr = None
        for i in range(per_long):
            j = g * per_long + i
            if j >= 32:
                break
            term = (
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(1 << (width * i)).cast("long")
            )
            expr = term if expr is None else expr + term
        packed_cols.append(expr.alias(f"p{g}"))
    tok = tok.select("id", *packed_cols)
    aggs = [F.sum(f"p{g}").alias(f"p{g}") for g in range(n_longs)] + [
        F.count(F.lit(1)).alias("n")
    ]
    wide = tok.groupBy("id").agg(*aggs)
    sig = None
    mask = (1 << width) - 1
    for j in range(32):
        g, i = j // per_long, j % per_long
        ones = F.shiftright(F.col(f"p{g}"), width * i).bitwiseAND(F.lit(mask))
        term = F.when(ones * 2 > F.col("n"), F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return wide.select("id", sig.alias("simhash"))


def timed(label, df):
    best = None
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: min {best:.3f}s")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("ab-simhash")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    cur = simhash32(docs, "doc_id", "text")
    p4 = simhash32_packed(docs, "doc_id", "text", per_long=4)
    p2 = simhash32_packed(docs, "doc_id", "text", per_long=2)

    # correctness first: packed must equal current exactly
    diff4 = cur.join(p4, "id").filter(cur.simhash != p4.simhash).count()
    diff2 = cur.join(p2, "id").filter(cur.simhash != p2.simhash).count()
    print("diff packed4 vs current:", diff4, "| packed2 vs current:", diff2)

    timed("current-32agg", cur)
    timed("packed-4per (8 sums)", p4)
    timed("packed-2per (16 sums)", p2)
    # interleave a second round to control for drift
    timed("current-32agg (r2)", cur)
    timed("packed-4per (r2)", p4)
    spark.stop()


if __name__ == "__main__":
    main()
