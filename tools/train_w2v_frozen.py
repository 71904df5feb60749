"""Regenerate the frozen Word2Vec evidence vectors
(platform_etl_literature_spark/plans/w2v_frozen.py) — the PQ-codebook
build-once pattern (tools/train_pq_codebooks.py) applied to the
evidence pipeline: train the seeded reduced-shape model ONCE on the
sf0.01 grounded slice (the same slice + Word2VecConfig the
evidence_pipeline suite query uses), extract the (word, vector) table,
round to 6 decimals and freeze as literals so Spark and the DuckDB
oracle parse bit-identical doubles.

Run after a corpus change:  python tools/train_w2v_frozen.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from platform_etl_literature_spark.session import build_session

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "platform_etl_literature_spark",
    "plans",
    "w2v_frozen.py",
)

HEADER = '''"""Frozen Word2Vec evidence vectors (the build-once artifact).

Trained ONCE with the seeded reduced-shape Word2VecConfig
(num_partitions=4, max_iter=2, vector_size=32, seed=42) on the sf0.01
grounded literature slice (pmid < 1000 — the evidence_pipeline suite
slice) and frozen as literals rounded to 6 decimals, so Spark and the
DuckDB oracle parse bit-identical doubles.  Like the PQ codebooks
(operators/pq_codebooks.py), ANY fixed embedding table is a valid
input to the embedding-agnostic evidence step
(plans/evidence.py:evidence_from_matches) — training buys vector
quality, not correctness — so the same constants serve every scale
factor whose entity keys they cover (the synthetic corpus mentions
ENSG{doc_id % n_part} / EFO_{doc_id % 25}, and sf0.001/sf0.01/sf0.1
key ranges all fall inside the sf0.01-slice vocabulary).  At 100 TB
this lives in a versioned artifact store next to the corpus;
regenerate with tools/train_w2v_frozen.py after a corpus change.

W2V_FROZEN_DIM = vector size; W2V_FROZEN = [(word, [f0, ..]), ...].
"""

'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session("train-w2v-frozen")

    from platform_etl_literature_spark import benchdata as B
    from platform_etl_literature_spark.config import Word2VecConfig
    from platform_etl_literature_spark.plans import embedding as emb
    from platform_etl_literature_spark.plans import processing as proc
    from platform_etl_literature_spark.plans.evidence import model_vectors

    epmc = B.epmc_from(spark, sf_dir).filter(F.col("pmid").cast("long") < 1000)
    out = proc.run(
        spark,
        epmc,
        B.epmcids_from(spark, sf_dir),
        B.targets_from(spark, sf_dir),
        B.diseases_from(spark, sf_dir),
        B.drugs_from(spark, sf_dir),
        trace_source=False,
    )
    conf = Word2VecConfig(num_partitions=4, max_iter=2, vector_size=32)
    model, _training = emb.run(spark, out["matches"], conf=conf)
    rows = sorted(
        (r["word"], [round(float(x), 6) for x in r["vector"]])
        for r in model_vectors(model).collect()
    )
    with open(OUT, "w") as fh:
        fh.write(HEADER)
        fh.write(f"W2V_FROZEN_DIM = {conf.vector_size}\n\n")
        fh.write("W2V_FROZEN: list[tuple[str, list[float]]] = [\n")
        for word, vec in rows:
            fh.write(f"    ({word!r}, {vec!r}),\n")
        fh.write("]\n")
    print(f"froze {len(rows)} vectors -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
