"""One-off profiler for the emb_lsh 16x cell: time the current
implementation stage by stage, then candidate variants, at x4 and x16.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.operators import dedup as D
from platform_etl_literature_spark.operators.similarity import _bucket_rows
from platform_etl_literature_spark.functions.vectors import array_cosine

spark = build_session("emb-lsh-profile")


def timeit(label, df):
    best = None
    for i in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if i > 0:
            best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f}s")
    spark.catalog.clearCache()
    D.release_cached()
    return best


def variant_slim(df, bits):
    """Slim candidate join: ids only through bucket join + pair dedup,
    vectors joined back for the verify."""
    bucketed = D._materialize_once(
        _bucket_rows(df, "id", "vec_id", "embedding", 8, bits, 64)
    )
    slim = bucketed.select("id", "tbl", "bucket")
    cand = (
        slim.select(F.col("id").alias("id_a"), "tbl", "bucket")
        .join(slim.select(F.col("id").alias("id_b"), "tbl", "bucket"),
              ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = bucketed.filter(F.col("tbl") == 0).select("id", "_v_id")
    return (
        cand.join(vecs.select(F.col("id").alias("id_a"),
                              F.col("_v_id").alias("_va")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"),
                          F.col("_v_id").alias("_vb")), "id_b")
        .withColumn("cos", array_cosine("_va", "_vb"))
        .filter(F.col("cos") >= 0.4)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def variant_verify_first(df, bits):
    """Verify before dedup: cosine+filter on the raw bucket-join
    candidates (duplicates included), dedup only survivors."""
    bucketed = D._materialize_once(
        _bucket_rows(df, "id", "vec_id", "embedding", 8, bits, 64)
    )
    a = bucketed.select(F.col("id").alias("id_a"), F.col("_v_id").alias("_va"),
                        "tbl", "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("_v_id").alias("_vb"),
                        "tbl", "bucket")
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", array_cosine("_va", "_vb"))
        .filter(F.col("cos") >= 0.4)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .dropDuplicates(["id_a", "id_b"])
    )


for factor, bits in [(4, 9), (16, 11)]:
    emb = spark.read.parquet(f"/tmp/scale_probe/emb_x{factor}.parquet")
    n = emb.count()
    print(f"=== x{factor}: {n} vecs, {bits} bits ===")
    timeit("current", D.embedding_cosine_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.4, n_tables=8,
        n_bits=bits, dim=64))
    timeit("slim-join", variant_slim(emb, bits))
    timeit("verify-first", variant_verify_first(emb, bits))
    # stage decomposition for the current shape
    bucketed = D._materialize_once(
        _bucket_rows(emb, "id", "vec_id", "embedding", 8, bits, 64))
    t0 = time.time(); bucketed.count(); print(f"  bucket+persist: {time.time()-t0:.2f}s")
    a = bucketed.select(F.col("id").alias("id_a"), F.col("_v_id").alias("_va"), "tbl", "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("_v_id").alias("_vb"), "tbl", "bucket")
    j = a.join(b, ["tbl", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
    t0 = time.time(); j.write.format("noop").mode("overwrite").save(); print(f"  join-only: {time.time()-t0:.2f}s")
    t0 = time.time(); j.dropDuplicates(["id_a", "id_b"]).write.format("noop").mode("overwrite").save(); print(f"  join+dedup: {time.time()-t0:.2f}s")
    spark.catalog.clearCache(); D.release_cached()
