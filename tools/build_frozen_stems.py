"""Regenerate the frozen Porter-stem lookup
(platform_etl_literature_spark/functions/stem_frozen.py) — the
w2v_frozen / PQ-codebook build-once pattern applied to the literature
pipeline's single Python stage (VERDICT r9 item 4): the pipeline's
OUTPUT depends only on entity-label tokens (document text is never
keyed — matches carry label strings), so the Porter vocabulary is the
label-token space of the fixture entity tables.  This tool collects
every token that can reach the stemmer — the post-split /
post-stopword / lowered / punctuation-cleaned ``label_terms_unstemmed``
output of every label the derived corpus or its LUTs key (nation
names, part names, part symbols, supplier names) across the three
fixture scale factors — stems each once with the production Porter
implementation, and freezes only the CHANGED (token → stem) pairs
(identity pairs fall out of the COALESCE both engines apply).

With the frozen map, the whole 5-step pipeline is SQL-replayable:
``literature_pipeline_frozen`` runs the PRODUCTION plans with
``stemmer=frozen_stem_terms`` and its DuckDB oracle replays the same
map — both sides coalesce unseen tokens to identity, so parity holds
at ANY scale factor by construction (tokens beyond the frozen
vocabulary pass through unstemmed on BOTH engines).  At 100 TB this
lives in a versioned artifact store next to the corpus; regenerate
after a fixture change:  python tools/build_frozen_stems.py [sf_dir...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from platform_etl_literature_spark.functions.porter import stem
from platform_etl_literature_spark.functions.text import (
    label_terms_unstemmed,
    normalise,
)
from platform_etl_literature_spark.session import build_session

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "platform_etl_literature_spark",
    "functions",
    "stem_frozen.py",
)

HEADER = '''"""Frozen Porter-stem lookup (the build-once artifact).

(token -> stem) pairs for every label token the derived literature
corpus and its entity LUTs can send through the Porter stage, built
ONCE by tools/build_frozen_stems.py from the fixture entity tables
(sf0.001/sf0.01/sf0.1 union) with the production stemmer
(functions/porter.py) — only pairs where the stem DIFFERS from the
token are frozen; both Spark (functions.text.frozen_stem_terms) and
the DuckDB oracle COALESCE unseen tokens to identity, so the frozen
pipeline is deterministic and engine-identical at any scale factor by
construction.  Regenerate after a fixture change.

STEM_FROZEN = [(token, stem), ...] sorted by token.
"""

STEM_FROZEN: list[tuple[str, str]] = [
'''


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = build_session()
    vocab: set[str] = set()
    for sf in sf_dirs:
        nation = spark.read.parquet(f"{sf}/nation.parquet")
        part = spark.read.parquet(f"{sf}/part.parquet")
        sup = spark.read.parquet(f"{sf}/supplier.parquet")
        labels = (
            nation.select(F.lower("n_name").alias("label"))
            .unionByName(part.select(F.col("p_name").alias("label")))
            .unionByName(
                part.select(
                    F.concat(F.lit("P"), F.col("p_partkey")).alias("label")
                )
            )
            .unionByName(sup.select(F.col("s_name").alias("label")))
            .distinct()
        )
        toks = (
            labels.select(
                F.explode(
                    label_terms_unstemmed(normalise(F.col("label")))
                ).alias("tok")
            )
            .distinct()
            .collect()
        )
        vocab.update(r["tok"] for r in toks)
    pairs = sorted(
        (t, stem(t)) for t in vocab if stem(t) != t
    )
    with open(OUT, "w") as fh:
        fh.write(HEADER)
        for tok, st in pairs:
            fh.write(f"    ({tok!r}, {st!r}),\n")
        fh.write("]\n")
    print(f"{len(vocab)} tokens scanned, {len(pairs)} changed pairs -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
