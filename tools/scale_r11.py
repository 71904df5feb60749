"""Round-11 targeted scale validation (VERDICT r10 ask 5): the round-10
wins that were justified at sf0.1 — the fan-out family (ngram_jaccard,
semantic_dedup), the gap-fill keyed repartition, the emb-LSH adaptive
schedule, and the k_core single-action loop — probed at 1x/4x/16x the
sf0.1 corpus for a rows/s trend.  Reuses scale_probe's scaled-corpus
builders (same derivation contract, same /tmp cache); results are
appended to SCALE.md as a round-11 section by hand from the JSON lines.

Usage: python tools/scale_r11.py [factors...]   (default: 1 4 16)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from platform_etl_literature_spark.operators import dedup as D
from platform_etl_literature_spark.operators import graph as GR
from platform_etl_literature_spark.operators import similarity as SIM
from platform_etl_literature_spark.session import build_session
from tools.scale_probe import (
    _ev_gap_interp,
    scaled_docs,
    scaled_embeddings,
    scaled_events,
    scaled_lineitem,
)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = build_session("scale-r11")

    def probe(name, factor, fn, df, n_rows):
        best = None
        for i in range(3):  # run 0 = codegen warmup, discarded
            t0 = time.time()
            fn(df).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i > 0:
                best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "op": name,
                    "x": factor,
                    "sec": round(best, 2),
                    "rows_per_sec": int(n_rows / best),
                }
            ),
            flush=True,
        )

    for factor in factors:
        docs = spark.read.parquet(scaled_docs(spark, factor))
        n_docs = docs.count()
        probe(
            "ngram_jaccard",
            factor,
            lambda df: D.ngram_jaccard_pairs(
                df, "doc_id", "text", shingle_n=3, threshold=0.08
            ),
            docs,
            n_docs,
        )

        emb = spark.read.parquet(scaled_embeddings(spark, factor))
        n_emb = emb.count()
        probe(
            "dedup_embedding_lsh",
            factor,
            lambda df: D.embedding_cosine_pairs_lsh(
                df,
                "vec_id",
                "embedding",
                threshold=0.4,
                n_tables=8,
                dim=64,
                adaptive_bits=True,
            ),
            emb,
            n_emb,
        )
        cents = SIM.ivf_train_centroids(
            emb, "embedding", n_lists=max(8, n_emb // 250), seed=42
        )
        probe(
            "semantic_dedup",
            factor,
            lambda df: D.semantic_dedup_pairs(
                df, "vec_id", "embedding", centroids=cents, threshold=0.4
            ),
            emb,
            n_emb,
        )

        li = spark.read.parquet(scaled_lineitem(spark, factor))
        n_li = li.count()
        probe(
            "k_core",
            factor,
            lambda df: GR.k_core(
                GR.pair_edges(
                    df, "l_orderkey", "l_partkey", max_group=64
                ).where(
                    (F.col("u") * 2654435761 + F.col("v") * 40503) % 29 == 0
                ),
                k=3,
            ),
            li,
            n_li,
        )

        ev = spark.read.parquet(scaled_events(spark, factor))
        n_ev = ev.count()
        probe("gap_fill_interpolate", factor, _ev_gap_interp, ev, n_ev)


if __name__ == "__main__":
    main()
