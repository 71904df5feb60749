"""Regenerate the frozen product-quantization codebooks
(platform_etl_literature_spark/operators/pq_codebooks.py).

Run after a corpus change:  python tools/train_pq_codebooks.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from platform_etl_literature_spark.operators.similarity import ivf_train_centroids
from platform_etl_literature_spark.session import build_session

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "platform_etl_literature_spark",
    "operators",
    "pq_codebooks.py",
)

HEADER = '''"""Fixed product-quantization codebooks (the build-once artifact).

Trained ONCE per 8-dim subspace with seeded k-means (K=16, seed=42+m)
on the sf0.01 embeddings table and frozen as literals (rounded to 6
decimals so Spark and the DuckDB oracle parse bit-identical doubles).
Like the IVF coarse quantizer, ANY fixed codebook is a valid product
quantizer — training buys reconstruction quality, not correctness —
so the same constants serve every scale factor.  At 100 TB these live
in a versioned artifact store next to the corpus; regenerate with
tools/train_pq_codebooks.py after a corpus change.

Layout: PQ_CODEBOOKS_8x16x8[m][k] = the 8-dim centroid k of subspace m
(subspace m covers embedding dims m*8+1 .. m*8+8, 1-based).
"""

PQ_CODEBOOKS_8x16x8: list[list[list[float]]] = [
'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("train-pq")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = []
    for m in range(8):
        sub = emb.select(
            F.slice(F.col("embedding").cast("array<double>"), m * 8 + 1, 8).alias(
                "embedding"
            )
        )
        cb = ivf_train_centroids(sub, "embedding", n_lists=16, seed=42 + m)
        books.append([[round(x, 6) for x in c] for c in cb])
        print(f"subspace {m}: {len(cb)} centroids", flush=True)
    with open(OUT, "w") as fh:
        fh.write(HEADER)
        for m, book in enumerate(books):
            fh.write("    [  # subspace %d\n" % m)
            for c in book:
                fh.write("        %r,\n" % (c,))
            fh.write("    ],\n")
        fh.write("]\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
