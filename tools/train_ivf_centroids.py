"""Regenerate the frozen IVF coarse-quantizer centroids
(platform_etl_literature_spark/operators/ivf_quantizer.py).

Run after a corpus change:  python tools/train_ivf_centroids.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from platform_etl_literature_spark.session import build_session
from platform_etl_literature_spark.operators.similarity import ivf_train_centroids

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "platform_etl_literature_spark",
    "operators",
    "ivf_quantizer.py",
)

HEADER = '''"""Fixed IVF coarse-quantizer centroids (the build-once artifact).

Trained ONCE with ivf_train_centroids(n_lists=8, seed=42) on the
sf0.01 embeddings table and frozen as literals (rounded to 6 decimals
so Spark and the DuckDB oracle parse bit-identical doubles).  Like the
md5-derived LSH hyperplanes, a frozen quantizer makes the IVF probe
fully deterministic and SQL-expressible: ANY fixed centroid set is a
valid coarse quantizer — assignment quality, not correctness, is what
training buys — so the same constants serve every scale factor.  At
100 TB these would live in a versioned artifact store next to the
corpus; regenerate with tools/train_ivf_centroids.py after a corpus
change.
"""

'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("ivftrain")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [round(x, 6) for x in c]
        for c in ivf_train_centroids(emb, n_lists=8, seed=42)
    ]
    with open(OUT, "w") as f:
        f.write(HEADER)
        f.write("IVF_CENTROIDS_8x64: list[list[float]] = [\n")
        for c in cents:
            f.write("    " + json.dumps(c) + ",\n")
        f.write("]\n")
    print(f"wrote {len(cents)} centroids to {OUT}")


if __name__ == "__main__":
    main()
