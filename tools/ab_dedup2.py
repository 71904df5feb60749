"""A/B part 2: banded, simhash pairs, simhash agg, ngram jaccard."""

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
    staged_gram_arrays,
    token_hash,
    tokens,
)
from tools.ab_dedup import sig_inline

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def banded(sigs: DataFrame, mat: str) -> DataFrame:
    band_size, n_bands = 2, 4
    b = (
        sigs.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .filter(F.col("band") < n_bands)
        .groupBy("id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("seed", "sig"))).alias("_tuple"))
        .select(
            "id",
            "band",
            F.array_join(
                F.transform("_tuple", lambda e: e["sig"].cast("string")), ":"
            ).alias("band_key"),
        )
    )
    if mat == "ckpt":
        b = b.localCheckpoint(eager=True)
    elif mat == "persist":
        b = b.persist(StorageLevel.MEMORY_AND_DISK)
    aa = b.select(F.col("id").alias("id_a"), "band", "band_key")
    bb = b.select(F.col("id").alias("id_b"), "band", "band_key")
    return (
        aa.join(bb, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= 1)
    )


def simhash32_v(df, packed: bool) -> DataFrame:
    tok = df.select(
        F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("t")
    ).withColumn("h", token_hash(F.col("t")))
    if not packed:
        bit_sums = tok.groupBy("id").agg(
            *[
                F.sum(
                    F.when(
                        F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                ).alias(f"b{j}")
                for j in range(32)
            ]
        )
        sig = None
        for j in range(32):
            term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            sig = term if sig is None else sig + term
        return bit_sums.select("id", sig.alias("simhash"))
    # packed: per-bit SET counts s_j (non-negative), 3 packed longs of
    # 10 fields x 20 bits? -> use 2 fields of 30 bits x 16 longs? Try:
    # 4 counts of 15 bits per long => 8 sum aggs + 1 count agg.
    # sign rule: bit j set iff 2*s_j > n_tok
    packs = []
    for p in range(8):  # 4 bits per pack
        expr = None
        for f in range(4):
            j = p * 4 + f
            term = (
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)).cast("long")
                * F.lit(1 << (15 * f)).cast("long")
            )
            expr = term if expr is None else expr + term
        packs.append(F.sum(expr).alias(f"p{p}"))
    agg = tok.groupBy("id").agg(F.count(F.lit(1)).alias("n"), *packs)
    sig = None
    for p in range(8):
        for f in range(4):
            j = p * 4 + f
            s = F.shiftright(F.col(f"p{p}"), 15 * f).bitwiseAND(F.lit((1 << 15) - 1))
            term = F.when(s * 2 > F.col("n"), F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            sig = term if sig is None else sig + term
    return agg.select("id", sig.alias("simhash"))


def sim_pairs(signed: DataFrame, mat: str) -> DataFrame:
    n_blocks, bits_per = 4, 8
    if mat == "ckpt":
        signed = signed.select("id", "simhash").localCheckpoint(eager=True)
    elif mat == "persist":
        signed = signed.select("id", "simhash").persist(StorageLevel.MEMORY_AND_DISK)
    blocks = signed.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("simhash"), i * bits_per)
                        .bitwiseAND(F.lit((1 << bits_per) - 1))
                        .alias("block_val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.block_idx"), F.col("b.block_val"))
    a = blocks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"), "block_idx", "block_val"
    )
    b = blocks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"), "block_idx", "block_val"
    )
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


def jac_inline_grams(df) -> DataFrame:
    w = tokens(F.col("text"))
    grams = F.when(F.size(w) < 2, F.array().cast("array<bigint>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(w) - 1), lambda i: F.xxhash64(F.slice(w, i, 2)))
    )
    return df.select(
        F.col("doc_id").alias("id"), F.array_distinct(grams).alias("_grams")
    )


def jaccard(compact_fn, mat: str) -> DataFrame:
    compact = compact_fn().select("id", F.size("_grams").alias("n_sh"), "_grams")
    if mat == "ckpt":
        compact = compact.localCheckpoint(eager=True)
    elif mat == "persist":
        compact = compact.persist(StorageLevel.MEMORY_AND_DISK)
    sh = compact.select("id", "n_sh", F.explode("_grams").alias("s"))
    a = sh.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "s")
    b = sh.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "s")
    return (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def run(spark, label, fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 2))
        spark.catalog.clearCache()
    print(f"{label:30s} {times}", flush=True)


def main():
    spark = build_session("ab2")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.count()

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "banded"):
        run(spark, "banded ckpt (r03)", lambda: banded(sig_inline(docs), "ckpt"))
        run(spark, "banded persist", lambda: banded(sig_inline(docs), "persist"))
        run(spark, "banded none", lambda: banded(sig_inline(docs), "none"))
    if which in ("all", "simhash"):
        run(spark, "simhash 32-agg (r03)", lambda: simhash32_v(docs, False))
        run(spark, "simhash packed-8agg", lambda: simhash32_v(docs, True))
    if which in ("all", "simpairs"):
        run(spark, "simpairs ckpt (r03)", lambda: sim_pairs(simhash32_v(docs, False), "ckpt"))
        run(spark, "simpairs persist", lambda: sim_pairs(simhash32_v(docs, False), "persist"))
        run(spark, "simpairs packed+persist", lambda: sim_pairs(simhash32_v(docs, True), "persist"))
        run(spark, "simpairs packed+none", lambda: sim_pairs(simhash32_v(docs, True), "none"))
    if which in ("all", "jaccard"):
        staged = lambda: staged_gram_arrays(docs, "doc_id", "text", 2, hashed=True)  # noqa: E731
        inline = lambda: jac_inline_grams(docs)  # noqa: E731
        run(spark, "jaccard staged+ckpt (r03)", lambda: jaccard(staged, "ckpt"))
        run(spark, "jaccard staged+persist", lambda: jaccard(staged, "persist"))
        run(spark, "jaccard inline+persist", lambda: jaccard(inline, "persist"))
        run(spark, "jaccard inline+none", lambda: jaccard(inline, "none"))


if __name__ == "__main__":
    main()
