"""A/B micro-bench for the dedup candidate-pair family at sf0.1.

Variants per path:
  minhash_pairs:  staged+ckpt (r03) | staged+persist | inline+persist |
                  inline+none (ReuseExchange) | staged+none
  Run each twice (cold, warm); report both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.operators.dedup import (
    MINHASH_SEEDS,
    _MH_PRIME,
    shingles,
    staged_gram_arrays,
    token_hash,
    tokens,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sig_inline(df):
    sh = df.select(
        F.col("doc_id").alias("id"),
        F.explode(shingles(F.col("text"), 2)).alias("s"),
    ).withColumn("h", token_hash(F.col("s")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MH_PRIME)).alias(f"sig{i}")
        for i, a, b in MINHASH_SEEDS
    ]
    wide = sh.groupBy("id").agg(*aggs)
    k = len(MINHASH_SEEDS)
    stack = ", ".join(f"{i}, sig{i}" for i, _, _ in MINHASH_SEEDS)
    return wide.selectExpr("id", f"stack({k}, {stack}) as (seed, sig)")


def sig_staged(df):
    sh = (
        staged_gram_arrays(df, "doc_id", "text", 2, hashed=False)
        .select("id", F.explode("_grams").alias("s"))
        .withColumn("h", token_hash(F.col("s")))
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MH_PRIME)).alias(f"sig{i}")
        for i, a, b in MINHASH_SEEDS
    ]
    wide = sh.groupBy("id").agg(*aggs)
    k = len(MINHASH_SEEDS)
    stack = ", ".join(f"{i}, sig{i}" for i, _, _ in MINHASH_SEEDS)
    return wide.selectExpr("id", f"stack({k}, {stack}) as (seed, sig)")


def pairs(sigs: DataFrame, mat: str) -> DataFrame:
    k = len(MINHASH_SEEDS)
    if mat == "ckpt":
        sigs = sigs.localCheckpoint(eager=True)
    elif mat == "persist":
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    a = sigs.select(F.col("id").alias("id_a"), "seed", "sig")
    b = sigs.select(F.col("id").alias("id_b"), "seed", "sig")
    return (
        a.join(b, ["seed", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching"))
        .filter(F.col("n_matching") >= 3)
        .withColumn("est_jaccard", F.round(F.col("n_matching") / F.lit(float(k)), 6))
    )


def run(spark, label, fn):
    times = []
    for _ in range(3):
        t0 = time.time()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 2))
        spark.catalog.clearCache()
    print(f"{label:28s} {times}", flush=True)


def main():
    spark = build_session("ab")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.count()  # warm

    run(spark, "staged+ckpt (r03)", lambda: pairs(sig_staged(docs), "ckpt"))
    run(spark, "staged+persist", lambda: pairs(sig_staged(docs), "persist"))
    run(spark, "inline+persist (r01)", lambda: pairs(sig_inline(docs), "persist"))
    run(spark, "inline+none (reuse)", lambda: pairs(sig_inline(docs), "none"))
    run(spark, "staged+none (reuse)", lambda: pairs(sig_staged(docs), "none"))


if __name__ == "__main__":
    main()
