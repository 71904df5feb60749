"""Recall-vs-knob sweep for the approximate ANN paths — the evidence
that each path's accuracy dial works as designed (recall rises toward
1.0 as the candidate set widens) while the plan shape stays fixed.

Sweeps, against the exact brute-force top-5 on the same query sample:
  * IVF: n_probe 1..8 (8 probed lists == every list == exact ranking)
  * binary sign: shortlist 10/20/40/80
  * LSH: n_tables 2/4/8/16

Usage: python tools/ann_recall_sweep.py [sf_dir]   (default sf0.01)
Prints one JSON line per cell; paste the summary into COVERAGE.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from platform_etl_literature_spark.operators import similarity as SIM
from platform_etl_literature_spark.operators.ivf_quantizer import (
    IVF_CENTROIDS_8x64,
)
from platform_etl_literature_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("ann-recall-sweep")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = (
        SIM.cosine_topk(emb, q, k=5)
        .select("query_id", "neighbor_id")
        .persist()
    )
    n_total = exact.count()

    def recall(df) -> float:
        hits = df.select("query_id", "neighbor_id").join(
            F.broadcast(exact), ["query_id", "neighbor_id"], "left_semi"
        ).count()
        return round(hits / n_total, 3)

    for n_probe in range(1, 9):
        r = recall(
            SIM.ivf_cosine_topk(
                emb, q, k=5, n_lists=8, n_probe=n_probe,
                centroids=IVF_CENTROIDS_8x64,
            )
        )
        print(json.dumps({"method": "ivf", "n_probe": n_probe, "recall": r}))
    for shortlist in (10, 20, 40, 80):
        r = recall(SIM.binary_ann_topk(emb, q, k=5, shortlist=shortlist))
        print(
            json.dumps(
                {"method": "binary", "shortlist": shortlist, "recall": r}
            )
        )
    for n_tables in (2, 4, 8, 16):
        r = recall(
            SIM.lsh_cosine_topk(
                emb, q, k=5, n_tables=n_tables, n_bits=4, dim=64
            )
        )
        print(
            json.dumps({"method": "lsh", "n_tables": n_tables, "recall": r})
        )
    # two-phase refine: IVF-PQ shortlist m -> exact re-rank to k=5.
    # m widens the candidate pool PQ ranks into; the refined recall is
    # capped by the n_probe=3 IVF candidate ceiling, which the m=raw
    # row (no refine, k=5) sits far below.
    r = recall(SIM.ivfpq_topk(emb, q, k=5, n_probe=3))
    print(json.dumps({"method": "ivfpq_raw", "recall": r}))
    for m in (10, 20, 50, 100):
        r = recall(
            SIM.refine_topk(
                emb, q, SIM.ivfpq_topk(emb, q, k=m, n_probe=3), k=5
            )
        )
        print(
            json.dumps({"method": "ivfpq_rerank", "m": m, "recall": r})
        )
    # JL random projection: raw projected-space recall per out_dim,
    # then the compress-then-refine dial at out_dim=16 — monotone in
    # m and exact at m = corpus (pytest-pinned).
    for out_dim in (8, 16, 32):
        p = SIM.jl_project(emb, in_dim=64, out_dim=out_dim).select(
            "vec_id", F.col("rp").alias("embedding")
        )
        r = recall(SIM.cosine_topk(p, p.filter(F.col("vec_id") < 10), k=5))
        print(json.dumps({"method": "rp_raw", "out_dim": out_dim, "recall": r}))
    p16 = SIM.jl_project(emb, in_dim=64, out_dim=16).select(
        "vec_id", F.col("rp").alias("embedding")
    )
    pq16 = p16.filter(F.col("vec_id") < 10)
    for m in (20, 50, 100):
        short = SIM.cosine_topk(p16, pq16, k=m)
        r = recall(SIM.refine_topk(emb, q, short, k=5))
        print(json.dumps({"method": "rp_rerank", "m": m, "recall": r}))


if __name__ == "__main__":
    main()
