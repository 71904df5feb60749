"""Scaling probe: run representative operators at 1x/4x/16x the sf0.1
corpus and record wall time + throughput, regenerating SCALE.md.

Scaled corpora are derived by unioning PER-TOKEN-TAGGED copies of the
sf0.1 documents table: every token of copy i gets an ``xi`` suffix, so
the original shingle structure (and so the real within-copy near-dup
rate) is preserved exactly while no shingle survives across copies.
(A prefix-only tag left the copies near-identical — every copy pair
collided in every MinHash band, so the 16x cell measured a
quadratic-in-copies pair explosion manufactured by the corpus
derivation; interleaving the tag BETWEEN tokens was degenerate the
other way — every bigram then contained the tag token, collapsing the
shingle space so every same-copy document looked like a near-dup.)

Usage: python tools/scale_probe.py [factors...]   (default: 1 4 16)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from platform_etl_literature_spark.operators import bpe as B
from platform_etl_literature_spark.operators import components as CC
from platform_etl_literature_spark.operators import dedup as D
from platform_etl_literature_spark.operators import edjoin as EJ
from platform_etl_literature_spark.operators import evalmetrics as EVM
from platform_etl_literature_spark.operators import graph as GR
from platform_etl_literature_spark.operators import kmv as KMV
from platform_etl_literature_spark.operators import pagerank as PGR
from platform_etl_literature_spark.operators import quality_checks as QC
from platform_etl_literature_spark.operators import robust as RB
from platform_etl_literature_spark.operators import infotheory as IT
from platform_etl_literature_spark.operators import lm as LM
from platform_etl_literature_spark.operators import layout as LAY
from platform_etl_literature_spark.operators import profile as PRO
from platform_etl_literature_spark.operators import retrieval as RET
from platform_etl_literature_spark.operators import similarity as SIM
from platform_etl_literature_spark.operators import sketch as SK
from platform_etl_literature_spark.operators import suffix as SX
from platform_etl_literature_spark.operators import textstats as TS
from platform_etl_literature_spark.session import build_session

SF_DIR = "/root/testdata/sf0.1"
WORK = "/tmp/scale_probe"


def scaled_docs(spark, factor: int) -> str:
    path = f"{WORK}/docs_x{factor}.parquet"
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{i}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(path)
    return path


def _ranking_eval(df):
    from pyspark.sql.window import Window

    from platform_etl_literature_spark.operators import evalmetrics as EVM

    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = df.select(
        F.col("lang").alias("query_id"),
        F.row_number().over(w).alias("rank"),
        (F.col("doc_id") % 7 == 0).cast("int").alias("relevant"),
    )
    return EVM.ranking_metrics(ranked, k=10)


def _record_linkage(df):
    """Mirror of suite q_record_linkage: vocab -> FastSS d=2 pairs ->
    connected components -> canonical label per word."""
    vocab = (
        df.select(F.explode(D.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = EJ.edit_distance_pairs(vocab, "w", d=2)
    comp = CC.connected_components(pairs, "w1", "w2")
    return (
        vocab.join(comp.select(F.col("id").alias("w"), "component"), "w", "left")
        .select(
            "w", "c", F.coalesce(F.col("component"), F.col("w")).alias("canon")
        )
    )


def _scd2_temporal(df):
    """Mirror of suite q_scd2_temporal_join: build a 2-version SCD2
    history (every 7th doc re-drops uppercased, every 97th also
    inserts as a new id), then point-in-time join a corpus-sized fact
    set stamped with alternating versions."""
    from platform_etl_literature_spark.operators.merge import (
        scd2_apply,
        scd2_init,
        scd2_temporal_join,
    )

    docs = df.select("doc_id", "text", "lang", "source", "n_chars")
    upd = docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "text", F.upper(F.col("text"))
    )
    ins = docs.where(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 100000000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    h2 = scd2_apply(
        scd2_init(docs, ["text"], version=1),
        upd.unionByName(ins),
        ["doc_id"],
        ["text"],
        version=2,
    )
    facts = docs.select(
        "doc_id", (F.lit(1) + F.col("doc_id") % 2).alias("fact_version")
    )
    return scd2_temporal_join(
        facts,
        h2.select("doc_id", "text", "valid_from", "valid_to"),
        ["doc_id"],
        "fact_version",
    ).select("doc_id", "fact_version", F.md5("text").alias("dim_text_md5"))


OPS = {
    "doc_profile": lambda df: TS.document_profile(df, "doc_id", "text"),
    # sketch-family quantiles: build shuffles only (lang, bucket) cells;
    # the quantile walk is sketch-sized regardless of corpus
    "hdr_quantiles": lambda df: SK.hdr_quantiles(
        SK.hdr_build(df, "n_chars", m=32, keys=["lang"]),
        [0.5, 0.9, 0.99],
        m=32,
        keys=["lang"],
    ),
    "tfidf_terms": lambda df: TS.tfidf_top_terms(df, "doc_id", "text", 3),
    "exact_dedup": lambda df: D.exact_dedup(df, "text", "doc_id"),
    "simhash": lambda df: D.simhash32(df, "doc_id", "text"),
    "minhash_sigs": lambda df: D.minhash_signatures(df, "doc_id", "text", 2),
    "minhash_banded": lambda df: D.minhash_banded_pairs(
        D.minhash_signatures(df, "doc_id", "text", 2), band_size=2
    ),
    "dedup_components": lambda df: CC.connected_components(
        D.minhash_banded_pairs(
            D.minhash_signatures(df, "doc_id", "text", 2), band_size=2
        )
    ),
    "hash_split": lambda df: D.hash_split(df, "doc_id"),
    "repetition": lambda df: TS.repetition_stats(df, "doc_id", "text", 0.3),
    "decontaminate": lambda df: D.contamination(
        df.filter(F.col("doc_id") % 17 != 0),
        df.filter(F.col("doc_id") % 17 == 0),
        "doc_id",
        "text",
        n=4,
    ),
    "mixture_sample": lambda df: D.mixture_sample(
        df, "doc_id", "lang", {"en": 2000, "zh": 5000, "es": 8000}
    ),
    "doc_chunks": lambda df: TS.chunk_tokens(df, "doc_id", "text", 32, 8),
    "curation_flags": lambda df: TS.curation_flags(
        df, "doc_id", "text", carry_cols=["source"]
    ),
    "window_dup_stats": lambda df: D.window_dup_stats(df, "doc_id", "text", window=8),
    "scrub_passages": lambda df: D.scrub_dup_passages(df, "doc_id", "text", window=8),
    # query terms carry copy-0's token tag (the probe corpus suffixes
    # every token); stats/ranking still span the whole corpus
    "bm25_topk": lambda df: RET.bm25_topk(
        df, "doc_id", "text", ["sparkx0", "vectorx0", "mergex0"], k=15
    ),
    "prefix_jaccard": lambda df: D.prefix_jaccard_pairs(
        df, "doc_id", "text", threshold=0.85
    ),
    # the round-10 output-collapsed emission mode (VERDICT r9 item 7):
    # identical candidate chain + verify, but a clique of size c emits
    # c rows instead of c²/2 — the cell that shows the wall when the
    # quadratic true-pair volume skips the output exchange and sink
    "prefix_jaccard_best": lambda df: D.prefix_jaccard_best_match(
        df, "doc_id", "text", threshold=0.85
    ),
    "winnow_pairs": lambda df: D.winnow_candidate_pairs(
        D.winnow_fingerprints(df, "doc_id", "text", k=3, window=4), min_shared=2
    ),
    "lm_logprob": lambda df: LM.lm_doc_logprob(df, "doc_id", "text"),
    "kn_lm_score": lambda df: LM.kn_doc_neg_micro_nats(
        df, "doc_id", "text"
    ),
    # 4 merges (not the suite's 8): the probe measures how the per-round
    # distributed aggregates scale with corpus size, not round count
    "bpe_merges": lambda df: B.bpe_merges_df(df, "text", n_merges=4),
    "zorder_bins": lambda df: LAY.zorder_bins(df, ["doc_id", "n_chars"], bits=8),
    "table_profile": lambda df: PRO.table_profile(
        df, ["doc_id", "lang", "source", "n_chars"]
    ),
    # round-6 additions
    "char_entropy": lambda df: TS.char_class_entropy(df, "doc_id", "text"),
    "quality_logreg": lambda df: TS.quality_logreg(df, "doc_id", "text"),
    "cdc_chunk_dedup": lambda df: D.cdc_dedup_stats(
        D.cdc_chunks(df, "doc_id", "text")
    ),
    "sorted_neighborhood": lambda df: D.sorted_neighborhood_pairs(
        df, "doc_id", F.lower(F.substring("text", 1, 12)), window=4
    ),
    "lm_cross_score": lambda df: LM.lm_doc_logprob_against(
        df.filter(F.col("lang") == "en"), df, "doc_id", "text"
    ),
    # round-6 additions (late)
    "bloom_decontaminate": lambda df: D.bloom_contamination(
        df.filter(F.col("doc_id") % 17 != 0),
        df.filter(F.col("doc_id") % 17 == 0),
        "doc_id",
        "text",
        n=4,
    ),
    "suffix_lcp": lambda df: SX.suffix_lcp(
        df, "doc_id", "text", k_cap=8, min_len=4
    ),
    "bpe_encode": lambda df: B.bpe_encode(
        df, "doc_id", "text", _FROZEN_MERGES
    ),
    # round-6 additions (this session).  The probe vocabulary grows
    # linearly with the factor (every copy's tokens carry a distinct
    # xi suffix), which is exactly the FastSS stress axis.
    "edit_distance_join": lambda df: EJ.edit_distance_pairs(
        df.select(F.explode(D.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c")),
        "w",
        d=2,
        keep_cols=["c"],
    ),
    "robust_outliers": lambda df: RB.robust_outliers(
        df, ["lang"], "n_chars", cutoff=3.5, id_cols=["doc_id"]
    ),
    # round-7 headline additions: the composed entity-resolution chain
    # (FastSS candidates -> verify -> star-contraction components ->
    # canonical labels) and the SCD2 point-in-time enrichment (history
    # build + backward as-of carry).  Vocabulary again scales linearly
    # with the factor (tagged copies), the fact set with the corpus.
    "record_linkage": _record_linkage,
    # bigram PMI: vocab-keyed hash aggregates; the xi copy tag grows
    # the bigram vocabulary linearly with the factor (no cross-copy
    # pair survives), so cells scale with data, never quadratically
    "pmi_collocations": lambda df: TS.pmi_collocations(
        df, "doc_id", "text", min_pair_count=30
    ),
    # round-8 corpus statistics: heaps rides ONE range exchange (two
    # prefix sums share it); zipf is one vocab count + bounded top-R;
    # skipgram is k zip_with slices, no join (the xi tag grows the
    # pair vocabulary linearly, as with PMI); MI folds
    # vocabulary-sized level counts
    "heaps_law": lambda df: TS.heaps_law(
        df, "doc_id", "text", checkpoint_every=50
    ),
    "zipf_fit": lambda df: TS.zipf_fit(df, "text"),
    "skipgram_cooc": lambda df: TS.skipgram_cooc(
        df, "text", window_k=3, min_pair_count=30
    ),
    "categorical_mi": lambda df: IT.categorical_mi(df, "lang", "source"),
    # JW linkage: the vocabulary (and with it the xi-tagged variant
    # families) grows linearly; candidates stay block-bounded
    "jaro_winkler_join": lambda df: EJ.jaro_winkler_pairs(
        df.select(F.explode(D.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c")),
        "w",
        threshold=0.6,
        keep_cols=["c"],
    ),
    "lift_table": lambda df: EVM.lift_table(
        df.withColumn("y", (F.col("doc_id") % 3 == 0).cast("long")),
        "n_chars", "y", "doc_id", n_buckets=5, group_cols=["lang"],
    ),
    "gini": lambda df: RB.gini(df, "n_chars", key_cols=["lang"]),
    "auc_roc": lambda df: EVM.auc_roc(
        df.withColumn("y", (F.col("doc_id") % 3 == 0).cast("long")),
        "n_chars", "y", group_cols=["lang"],
    ),
    # NB train+score: classes x token-occurrences is the declared
    # data-sized pass; the vocab equijoin carries the rest
    "naive_bayes": lambda df: LM.nb_confusion(
        df, "doc_id", "lang", "text"
    ),
    "woe_iv": lambda df: EVM.woe_iv(
        df.withColumn("y", (F.col("lang") == "en").cast("long")),
        "source", "y",
    ),
    "scd2_temporal_join": _scd2_temporal,
    "dq_verify": lambda df: QC.verify(
        df,
        [
            {"check": "completeness", "column": "text", "min_ratio": 1.0},
            {"check": "distinctness", "column": "lang", "min_ratio": 0.001},
            {"check": "compliance", "name": "nonempty",
             "predicate": "n_chars > 0", "min_ratio": 1.0},
            {"check": "uniqueness", "column": "doc_id", "min_ratio": 1.0},
        ],
    ),
    # round-7 third batch: the containment join stresses the same
    # inverted-index axis as ngram_jaccard (shared-shingle volume);
    # Moore-Lewis scores the growing corpus against the growing
    # English subcorpus — both LM count tables scale with the factor.
    "ngram_containment": lambda df: D.ngram_containment_pairs(
        df, "doc_id", "text", shingle_n=3, threshold=0.2
    ),
    "moore_lewis": lambda df: LM.moore_lewis_select(
        df,
        df.filter(F.col("lang") == "en"),
        "doc_id",
        "text",
        "source",
        keep_frac=0.25,
    ),
    # evaluation metrics: the ranked input grows with the corpus, the
    # metric reduction is one (query-keyed) aggregation
    "ranking_eval": _ranking_eval,
    # source-overlap matrix: the data-sized pass is ONE grouped sketch
    # build; pair estimates run on k-row sketches however large the
    # corpus grows (xi-suffixed copies keep cross-copy vocab disjoint,
    # so overlap structure does not densify with the factor)
    "kmv_source_overlap": lambda df: KMV.kmv_pairwise_jaccard(
        KMV.kmv_sketch(
            df.select(
                "source", F.explode(D.tokens(F.col("text"))).alias("t")
            ),
            "t",
            128,
            key_cols=["source"],
        ),
        128,
        "source",
    ),
}

# the suite's frozen 8-merge tokenizer (suite.BPE_FROZEN_MERGES
# inlined: the probe must not import suite, which would register all
# 113 queries)
_FROZEN_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]


def scaled_embeddings(spark, factor: int) -> str:
    """Scaled embeddings: copy i rolls each vector left by i components
    — norms (and so similarity statistics within a copy) are preserved,
    while rolled copies point in unrelated directions, so no artificial
    cross-copy near-dups."""
    path = f"{WORK}/emb_x{factor}.parquet"
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = base.count()
    dim = 64
    copies = []
    for i in range(factor):
        v = F.col("embedding")
        rolled = (
            F.concat(F.slice(v, i % dim + 1, dim - (i % dim)), F.slice(v, 1, i % dim))
            if i % dim
            else v
        )
        copies.append(
            base.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(path)
    return path


# n_bits grows with log(corpus) so expected bucket size stays ~constant
# (~25 vectors: 2^bits ≈ n/25) — THE point of the LSH scale path: hold
# per-bucket pair work fixed and let bucket COUNT absorb growth.  A
# fixed bit width would let bucket size grow linearly and pair volume
# quadratically (measured: 4 bits at 16x ≈ 6.4k/bucket ≈ billions of
# candidate pairs — indistinguishable from brute force).
def _bits_for(n_rows: int) -> int:
    import math

    return max(4, int(math.ceil(math.log2(max(n_rows, 1) / 25))))


EMB_OPS = {
    "emb_lsh_near_pairs": lambda df, bits, cents: D.embedding_cosine_pairs_lsh(
        df, "vec_id", "embedding", threshold=0.4, n_tables=8, n_bits=bits, dim=64
    ),
    # cluster count grows with the corpus (n/250, the SemDeDup contract:
    # L scales so cluster width — and per-cluster pair volume — stays
    # bounded); training the quantizer is the untimed build-once step.
    "semantic_dedup": lambda df, bits, cents: D.semantic_dedup_pairs(
        df, "vec_id", "embedding", centroids=cents, threshold=0.4
    ),
    "lsh_ann_topk": lambda df, bits, cents: SIM.lsh_cosine_topk(
        df, df.filter(F.col("vec_id") < 10), k=5, n_tables=8, n_bits=bits, dim=64
    ),
    "ann_topk_blocked": lambda df, bits, cents: SIM.cosine_topk_blocked(
        df, df.filter(F.col("vec_id") < 10), k=5
    ),
    # round-8: semi-hard mining for a FIXED anchor batch (batch-sized
    # by contract) against the growing corpus — two blocked kernels
    "hard_negatives": lambda df, bits, cents: SIM.semi_hard_negatives(
        df, df.filter(F.col("vec_id") < 120), k=5
    ),
    "binary_ann_topk": lambda df, bits, cents: SIM.binary_ann_topk(
        df, df.filter(F.col("vec_id") < 10), k=5, shortlist=20
    ),
    # frozen codebooks: the build-once artifact serves every factor
    "pq_ann_topk": lambda df, bits, cents: SIM.pq_adc_topk(
        df, df.filter(F.col("vec_id") < 10), k=5
    ),
    # two-phase refine: IVF-PQ shortlist (m=50) -> exact re-rank; cost
    # follows the shortlist, so cells should track ivfpq, not corpus^2
    "ivfpq_rerank": lambda df, bits, cents: SIM.refine_topk(
        df,
        df.filter(F.col("vec_id") < 10),
        SIM.ivfpq_topk(df, df.filter(F.col("vec_id") < 10), k=50, n_probe=3),
        k=5,
    ),
}


def scaled_lineitem(spark, factor: int) -> str:
    """Scaled co-purchase input: copy i shifts BOTH keys by i·max, so
    each copy is a disjoint, structure-identical subgraph — node and
    edge counts scale linearly with no artificial cross-copy edges."""
    path = f"{WORK}/li_x{factor}.parquet"
    base = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    no, np_ = base.agg(
        F.max("l_orderkey") + 1, F.max("l_partkey") + 1
    ).first()
    copies = [
        base.select(
            (F.col("l_orderkey") + F.lit(i * no)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * np_)).alias("l_partkey"),
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(path)
    return path


def scaled_events(spark, factor: int) -> str:
    """Scaled events: copy i shifts user_id and event_id by i·max, so
    every copy is a disjoint population with an IDENTICAL per-user event
    distribution — session counts, funnels and cohorts scale linearly
    with no artificial cross-copy interference; timestamps are shared
    (cohort weeks line up, as a real growing product's would)."""
    from platform_etl_literature_spark.sources.events import read_table

    path = f"{WORK}/ev_x{factor}.parquet"
    base = read_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    nu, ne = base.agg(
        F.max("user_id") + 1, F.max("event_id") + 1
    ).first()
    copies = [
        base.select(
            (F.col("event_id") + F.lit(i * ne)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * nu)).alias("user_id"),
            "event_type",
            "value",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(path)
    return path


def _ev_sessionize(ev):
    from platform_etl_literature_spark.operators.sessionize import sessionize

    return sessionize(ev)


def _ev_ewma(ev):
    from platform_etl_literature_spark.operators.timeseries import (
        user_value_ewma_segmented,
    )

    return user_value_ewma_segmented(ev, alpha=0.2)


def _ev_funnel(ev):
    from platform_etl_literature_spark.operators.funnel import (
        funnel_conversion,
    )

    return funnel_conversion(ev, ["view", "click", "purchase"])


def _ev_retention(ev):
    from platform_etl_literature_spark.operators.funnel import (
        retention_cohorts,
    )

    return retention_cohorts(ev, max_periods=8)


def _ev_gap_fill(ev):
    from platform_etl_literature_spark.operators.timeseries import (
        gap_fill_ffill,
    )

    return gap_fill_ffill(ev, bucket_seconds=3600)


def _ev_asof(ev):
    from platform_etl_literature_spark.operators.asof import asof_join

    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    return asof_join(p, c, "user_id", "ts", "ts")


def _ev_asof_segmented(ev):
    from platform_etl_literature_spark.operators.asof import (
        asof_join_segmented,
    )

    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    return asof_join_segmented(p, c, "user_id", "ts", "ts")


def _ev_interval_overlap(ev, users_1x: int):
    """Intervals sampled from events; copy i's axis is offset by
    100k days (copy = user_id div users_1x), so interval density per
    copy — and so the OUTPUT pair count — scales linearly with the
    corpus instead of quadratically with shared-axis density."""
    from platform_etl_literature_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    s = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
        + (F.col("user_id") / users_1x).cast("long") * 100000
    )
    iv = (
        ev.where(F.col("event_id") % 199 == 0)
        .select(
            F.col("event_id").alias("id"),
            s.alias("s"),
            (s + F.col("event_id") % 14).alias("e"),
        )
    )
    return interval_overlap_join(iv, bin_width=16)


def _ev_ohlc(ev):
    from platform_etl_literature_spark.operators.timeseries import ohlc_bars

    return ohlc_bars(ev, ["event_type"], width_seconds=6 * 3600)


def _ev_gap_interp(ev):
    from platform_etl_literature_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    return gap_fill_interpolate(ev, bucket_seconds=3600)


def _ev_attribution(ev):
    from platform_etl_literature_spark.operators.funnel import (
        touch_attribution,
    )

    return touch_attribution(ev)


def _ev_funnel_windowed(ev):
    from platform_etl_literature_spark.operators.funnel import (
        funnel_conversion_windowed,
    )

    return funnel_conversion_windowed(
        ev, ["view", "click", "purchase"], max_step_seconds=21_600
    )


def _ev_psi_drift(ev):
    from platform_etl_literature_spark.operators import sketch as SK

    src = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
        (F.dayofmonth("ts") <= 15).alias("_first"),
    ).where(F.col("v") >= 1)
    sa = SK.hdr_build(src.where("_first").drop("_first"), "v", m=8, keys=["g"])
    sb = SK.hdr_build(
        src.where("NOT _first").drop("_first"), "v", m=8, keys=["g"]
    )
    return SK.psi_drift(sa, sb, keys=["g"])


def _ev_ks_drift(ev):
    from platform_etl_literature_spark.operators import robust as RB

    src = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
        (F.dayofmonth("ts") <= 15).alias("s"),
    )
    return RB.ks_2samp(src, "v", "s", key_cols=["g"])


def _ev_chi2_drift(ev):
    from platform_etl_literature_spark.operators import (
        quality_checks as QCX,
    )

    src = ev.select(
        F.dayofweek("ts").alias("dow"),
        F.col("event_type").alias("cat"),
        (F.dayofmonth("ts") <= 15).alias("s"),
    )
    return QCX.chi2_drift(src, "cat", "s", key_cols=["dow"])


def _ev_grouped_ols(ev):
    from platform_etl_literature_spark.operators import robust as RB

    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("g"),
        F.dayofmonth("ts").cast("long").alias("x"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("y")
    )
    return RB.grouped_ols(daily, "x", "y", key_cols=["g"])


def _ev_ts_similar(ev):
    from platform_etl_literature_spark.operators import timeseries as TSX

    cells = (
        ev.where(
            F.col("user_id").isNotNull() & (F.dayofmonth("ts") <= 28)
        )
        .groupBy(
            F.col("user_id").alias("id"),
            (F.dayofmonth("ts") - 1).cast("long").alias("p"),
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return TSX.ts_similar_pairs(
        cells, "id", "p", "v", length=28, n_segments=7, min_r=0.3,
        max_bucket_size=256,
    )


def _ev_cusum(ev):
    from platform_etl_literature_spark.operators import timeseries as TSX

    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("g"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("y")
    )
    return TSX.cusum_changepoint(daily, "g", "d", "y")


def _ev_transitions(ev):
    from platform_etl_literature_spark.operators import sessionize as SSX

    return SSX.event_transitions(ev)


def _ev_metric_health(ev):
    import sys

    sys.path.insert(0, "/root/repo")
    from platform_etl_literature_spark.operators import robust as RB
    from platform_etl_literature_spark.operators import timeseries as TSX

    cents = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    evv = ev.where(F.col("value").isNotNull())
    daily = evv.groupBy(
        F.col("event_type").alias("g"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).agg(F.sum(cents).alias("y"))
    ols = RB.grouped_ols(daily, "d", "y", key_cols=["g"]).select(
        "g", "slope", "r2"
    )
    cus = (
        TSX.cusum_changepoint(daily, "g", "d", "y")
        .withColumnRenamed("id", "g")
        .select("g", "cp_pos", "cusum")
    )
    ks = RB.ks_2samp(
        evv.select(
            F.col("event_type").alias("g"),
            cents.alias("v"),
            (F.dayofmonth("ts") <= 15).alias("s"),
        ),
        "v", "s", key_cols=["g"],
    ).select("g", "ks_d", "ks_lambda")
    return ols.join(cus, "g").join(ks, "g")


def _ev_theil_sen(ev):
    from platform_etl_literature_spark.operators import robust as RB

    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("g"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("y")
    )
    return RB.grouped_theil_sen(daily, "d", "y", key_cols=["g"])


def _ev_seasonal(ev):
    from platform_etl_literature_spark.operators.timeseries import (
        seasonal_profile,
    )

    return seasonal_profile(ev, ["event_type"], period="hour")


def _ev_rfm(ev):
    # the rank persists are dropped by the probe's clearCache()
    from platform_etl_literature_spark.operators import sessionize as SSX

    prep = ev.select(
        "user_id", "ts",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
    )
    out = SSX.rfm_segments(prep, "user_id", "ts", "v", n_bins=5)
    return out


def _ev_burstiness(ev):
    from platform_etl_literature_spark.operators import timeseries as TSX

    return TSX.burstiness(ev, "user_id", "ts")


def _ev_benford(ev):
    from platform_etl_literature_spark.operators import quality_checks as QCX

    vals = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
    )
    return QCX.benford_first_digit(vals, "v", key_cols=["event_type"])


def _ev_acf(ev):
    from platform_etl_literature_spark.operators import timeseries as TSX

    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("g"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("y")
    )
    return TSX.acf_lags(daily, "g", "d", "y", max_lag=7)


def _ev_mk(ev):
    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("g"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("y")
    )
    return RB.mann_kendall(daily, "d", "y", key_cols=["g"])


def _ev_kendall(ev):
    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("event_type").alias("g"),
        F.dayofmonth("ts").cast("long").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    return RB.kendall_tau(daily, "x", "y", key_cols=["g"])


def _ev_winsor(ev):
    v = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
    )
    return RB.winsorized_stats(v, "v", key_cols=["g"])


def _ev_isotonic(ev):
    base = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value"), 0).cast("long").alias("s"),
        (F.col("user_id") % 2).cast("long").alias("y"),
    )
    return EVM.isotonic_calibration(base, "s", "y", key_cols=["g"])


def _ev_bootstrap(ev):
    base = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("g"),
        F.col("event_id").alias("id"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("x"),
    )
    return RB.poisson_bootstrap_ci(
        base, "id", "x", key_cols=["g"], n_boot=50
    )


def _ev_corr_matrix(ev):
    base = ev.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value"), 0).cast("long").alias("v"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
    )
    return RB.corr_matrix(base, ["v", "d", "h"], key_cols=["g"])


def _ev_logrank(ev):
    from platform_etl_literature_spark.operators import survival as SVX

    per_user = ev.groupBy(
        (F.col("user_id") % 3).alias("cohort"), "user_id"
    ).agg(
        F.min(F.dayofmonth("ts")).alias("_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.dayofmonth("ts"))
        ).alias("_fp"),
        F.max(F.dayofmonth("ts")).alias("_last"),
    )
    ttp = F.col("_fp") - F.col("_first")
    observed = F.col("_fp").isNotNull() & (ttp <= 7)
    subjects = per_user.select(
        "cohort",
        F.when(F.expr("(user_id div 3) % 2 = 0"), F.lit("ctl"))
        .otherwise(F.lit("trt"))
        .alias("arm"),
        F.when(observed, ttp)
        .otherwise(F.least(F.col("_last") - F.col("_first"), F.lit(7)))
        .cast("long")
        .alias("dur"),
        observed.cast("long").alias("ev"),
    )
    return SVX.logrank_test(subjects, "dur", "ev", "arm", key_cols=["cohort"])


def _ev_na(ev):
    from platform_etl_literature_spark.operators import survival as SVX

    per_user = ev.groupBy(
        (F.col("user_id") % 3).alias("cohort"), "user_id"
    ).agg(
        F.min(F.dayofmonth("ts")).alias("_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.dayofmonth("ts"))
        ).alias("_fp"),
        F.max(F.dayofmonth("ts")).alias("_last"),
    )
    ttp = F.col("_fp") - F.col("_first")
    observed = F.col("_fp").isNotNull() & (ttp <= 7)
    subjects = per_user.select(
        "cohort",
        F.when(observed, ttp)
        .otherwise(F.least(F.col("_last") - F.col("_first"), F.lit(7)))
        .cast("long")
        .alias("dur"),
        observed.cast("long").alias("ev"),
    )
    return SVX.nelson_aalen(subjects, "dur", "ev", group_cols=["cohort"])


def _ev_km(ev):
    from platform_etl_literature_spark.operators import survival as SVX

    per_user = ev.groupBy(
        (F.col("user_id") % 3).alias("cohort"), "user_id"
    ).agg(
        F.min(F.dayofmonth("ts")).alias("_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.dayofmonth("ts"))
        ).alias("_fp"),
        F.max(F.dayofmonth("ts")).alias("_last"),
    )
    ttp = F.col("_fp") - F.col("_first")
    observed = F.col("_fp").isNotNull() & (ttp <= 7)
    subjects = per_user.select(
        "cohort",
        F.when(observed, ttp)
        .otherwise(F.least(F.col("_last") - F.col("_first"), F.lit(7)))
        .cast("long")
        .alias("dur"),
        observed.cast("long").alias("ev"),
    )
    return SVX.kaplan_meier(subjects, "dur", "ev", group_cols=["cohort"])


def _ev_ccf(ev):
    from platform_etl_literature_spark.operators import timeseries as TSX

    cents = F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    cells = ev.where(
        F.col("value").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    ).select(
        (F.col("user_id") % 8).alias("cohort"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.when(F.col("event_type") == "click", cents).otherwise(0).alias("x"),
        F.when(F.col("event_type") == "purchase", cents)
        .otherwise(0)
        .alias("y"),
    )
    return TSX.ccf_lags(cells, "cohort", "d", "x", "y", max_lag=3)


def _ev_ab_welch(ev):
    from platform_etl_literature_spark.operators import evalmetrics as EVM

    arms = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
    )
    return EVM.ab_welch(arms, "event_type", "v", control="view")


EVENTS_OPS = {
    "sessionize": _ev_sessionize,
    "seasonal_profile": _ev_seasonal,
    "ohlc_bars": _ev_ohlc,
    "user_ewma_segmented": _ev_ewma,
    "funnel_steps": _ev_funnel,
    "retention_cohorts": _ev_retention,
    "gap_fill_ffill": _ev_gap_fill,
    "gap_fill_interpolate": _ev_gap_interp,
    "touch_attribution": _ev_attribution,
    "funnel_windowed": _ev_funnel_windowed,
    "psi_drift": _ev_psi_drift,
    # exact-drift family: all three collapse to cells map-side, so the
    # shuffled volume is (key x distinct-value) cells, not rows
    "ks_drift": _ev_ks_drift,
    "chi2_drift": _ev_chi2_drift,
    "grouped_ols": _ev_grouped_ols,
    # series-similarity: per-user 28-day count series; signature
    # buckets absorb population growth (disjoint copies share shape
    # vocabularies, so bucket COUNT grows, not bucket size)
    "ts_similar": _ev_ts_similar,
    # trend family: cell-collapse shapes, shuffles carry cells not rows
    "cusum_changepoint": _ev_cusum,
    "event_transitions": _ev_transitions,
    "metric_health": _ev_metric_health,
    "theil_sen": _ev_theil_sen,
    "acf_lags": _ev_acf,
    "ccf_lags": _ev_ccf,
    "kaplan_meier": _ev_km,
    "mann_kendall": _ev_mk,
    # round-8: tau-b pairs on the bounded daily frame (cell collapse
    # absorbs population growth); winsorized means sort group-parallel
    "kendall_tau": _ev_kendall,
    "winsorized_stats": _ev_winsor,
    # PAV minimax: score cells are dollar-bounded, so the quadratic
    # interval frame stays flat while the population grows
    "isotonic_calibration": _ev_isotonic,
    # corr matrix: one wide aggregate, M²-sized unpivot
    "corr_matrix": _ev_corr_matrix,
    # bootstrap: rows×B map-side explode → (g, b) cells; the rank
    # window is B rows per group regardless of population
    "bootstrap_ci": _ev_bootstrap,
    "nelson_aalen": _ev_na,
    "logrank": _ev_logrank,
    "ab_welch": _ev_ab_welch,
    "burstiness": _ev_burstiness,
    "benford": _ev_benford,
    "rfm_segments": _ev_rfm,
    "asof_join": _ev_asof,
    "asof_join_segmented": _ev_asof_segmented,
}


def _li_bfs(li):
    edges = GR.pair_edges(
        li, "l_orderkey", "l_partkey", max_group=64
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    seeds = nodes.where(F.col("node") % 4999 == 0)
    return GR.bfs_distances(edges, seeds, max_hops=3, edges_distinct=True)


GRAPH_OPS = {
    "graph_triangles": lambda li: GR.triangle_stats(
        GR.pair_edges(li, "l_orderkey", "l_partkey", max_group=64)
    ),
    "pagerank_5it": lambda li: PGR.pagerank(
        PGR.symmetrize(
            GR.pair_edges(li, "l_orderkey", "l_partkey", max_group=64)
        ),
        n_iter=5,
    ),
    # mirrors suite q_k_core: the raw co-purchase graph is too dense
    # to peel, so the query keeps the deterministic 1/29 edge slice
    "k_core_3": lambda li: GR.k_core(
        GR.pair_edges(li, "l_orderkey", "l_partkey", max_group=64).where(
            (F.col("u") * 2654435761 + F.col("v") * 40503) % 29 == 0
        ),
        k=3,
    ),
    # mirrors suite q_label_propagation (same sparsified slice)
    "label_prop_4r": lambda li: GR.label_propagation(
        GR.pair_edges(li, "l_orderkey", "l_partkey", max_group=64).where(
            (F.col("u") * 2654435761 + F.col("v") * 40503) % 29 == 0
        ),
        rounds=4,
    ),
    # mirrors suite q_link_prediction: capped wedge centers bound the
    # candidate volume as density grows with the factor
    "link_prediction": lambda li: GR.link_prediction_scores(
        GR.pair_edges(li, "l_orderkey", "l_partkey", max_group=64)
    ).filter(F.col("cn") >= 2),
    # landmark BFS: seeds spread by hash (min-id seeds would all land
    # in copy 0 of the disjoint scaled subgraphs), seed count grows
    # with the graph so the reached set scales with the factor
    "bfs_3hop": _li_bfs,
}


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = build_session("scale-probe")
    results: dict[str, dict[int, dict]] = {
        name: {}
        for name in (
            list(OPS)
            + list(EMB_OPS)
            + list(GRAPH_OPS)
            + list(EVENTS_OPS)
            + ["interval_overlap"]
        )
    }
    n_docs: dict[int, int] = {}
    occupancy: dict[int, dict] = {}
    ts_occupancy: dict[int, dict] = {}
    graph_volume: dict[int, dict] = {}

    def probe(name, fn, df, factor, n_rows):
        # run 0 is codegen/JIT warmup (a first execution of a large
        # generated method can cost several seconds regardless of
        # data size) and is discarded; the cell is min of 2 timed runs
        best = None
        for i in range(3):
            t0 = time.time()
            fn(df).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i > 0:
                best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        results[name][factor] = {
            "sec": round(best, 2),
            "docs_per_sec": int(n_rows / best),
        }
        print(json.dumps({"op": name, "x": factor, **results[name][factor]}))

    for factor in factors:
        path = scaled_docs(spark, factor)
        df = spark.read.parquet(path)
        n_docs[factor] = df.count()
        for name, fn in OPS.items():
            probe(name, fn, df, factor, n_docs[factor])
        epath = scaled_embeddings(spark, factor)
        emb = spark.read.parquet(epath)
        n_emb = emb.count()
        bits = _bits_for(n_emb)
        cents = SIM.ivf_train_centroids(
            emb, "embedding", n_lists=max(8, n_emb // 250), seed=42
        )
        for name, fn in EMB_OPS.items():
            probe(name, lambda d, f=fn: f(d, bits, cents), emb, factor, n_emb)
        # bucket-occupancy accountability (the emb_lsh_occupancy suite
        # row, probed per factor at the factor's bit width): the
        # r7 verdict's check that the log2(n/25) bit-growth schedule
        # actually holds expected bucket size — and so per-bucket
        # quadratic verify work — constant across factors
        occ = (
            D.embedding_lsh_occupancy(
                emb, "vec_id", "embedding", n_tables=8, n_bits=bits, dim=64
            )
            .agg(
                F.max("max_bucket").alias("max_bucket"),
                F.round(F.avg("mean_bucket"), 2).alias("mean_bucket"),
                F.sum("n_cand_pairs").alias("cand_pairs"),
            )
            .first()
        )
        occupancy.setdefault(factor, {}).update(
            bits=bits,
            n_vecs=n_emb,
            max_bucket=occ["max_bucket"],
            mean_bucket=float(occ["mean_bucket"]),
            cand_pairs=occ["cand_pairs"],
        )
        print(json.dumps({"op": "emb_lsh_occupancy", "x": factor,
                          **occupancy[factor]}))
        lpath = scaled_lineitem(spark, factor)
        li = spark.read.parquet(lpath)
        n_li = li.count()
        for name, fn in GRAPH_OPS.items():
            probe(name, fn, li, factor, n_li)
        # graph candidate-volume accountability (VERDICT r9 item 5:
        # the r9 triangles-dip debate was settled by re-runs, not
        # data) — collected ONCE per factor, untimed: triangle_stats
        # already computes the exact intermediate volumes (n_wedges,
        # the oriented wedge-pair candidates, the realized out-degree
        # bound), the k_core/label_prop slice edge count sizes their
        # peeling input, and a single untimed BFS run records the
        # reached frontier, so a drifting graph cell is attributed
        # from the probe output alone
        _tri = GRAPH_OPS["graph_triangles"](li).first()
        _slice_edges = (
            GR.pair_edges(li, "l_orderkey", "l_partkey", max_group=64)
            .where((F.col("u") * 2654435761 + F.col("v") * 40503) % 29 == 0)
            .count()
        )
        _bfs_reached = _li_bfs(li).count()
        graph_volume[factor] = {
            "n_edges": int(_tri["n_edges"]),
            "n_wedges": int(_tri["n_wedges"]),
            "n_candidates": int(_tri["n_candidates"]),
            "max_out_degree": int(_tri["max_out_degree"]),
            "n_triangles": int(_tri["n_triangles"]),
            "slice_edges": int(_slice_edges),
            "bfs_reached": int(_bfs_reached),
        }
        print(json.dumps({"op": "graph_volume", "x": factor,
                          **graph_volume[factor]}))
        evpath = scaled_events(spark, factor)
        ev = spark.read.parquet(evpath)
        n_ev = ev.count()
        for name, fn in EVENTS_OPS.items():
            probe(name, fn, ev, factor, n_ev)
        # ts_similar signature-occupancy accountability (the
        # emb_lsh_occupancy pattern, r8 verdict item 6): attribute any
        # ts_similar cell drift to candidate volume vs hot-bucket skew
        from platform_etl_literature_spark.operators import (
            timeseries as TSX,
        )

        _ts_cells = (
            ev.where(
                F.col("user_id").isNotNull() & (F.dayofmonth("ts") <= 28)
            )
            .groupBy(
                F.col("user_id").alias("id"),
                (F.dayofmonth("ts") - 1).cast("long").alias("p"),
            )
            .agg(F.count(F.lit(1)).alias("v"))
        )
        tso = (
            TSX.ts_sig_occupancy(
                _ts_cells, "id", "p", "v", length=28, n_segments=7,
                max_bucket_size=256,
            ).first()
        )
        ts_occupancy[factor] = {
            k: tso[k]
            for k in (
                "extra_bits", "n_series", "n_buckets", "max_bucket",
                "n_cand_pairs", "n_hot_dropped", "n_cand_after_valve",
                "mean_bucket_micros",
            )
        }
        # the join's TRUE output (r >= 0.3) — the denominator that
        # shows whether candidate volume is signature saturation or
        # irreducible output (the round-10 saturation-fix test:
        # cand/true should FALL or stay flat as the corpus grows)
        ts_occupancy[factor]["n_true_pairs"] = (
            TSX.ts_similar_pairs(
                _ts_cells, "id", "p", "v", length=28, n_segments=7,
                min_r=0.3, max_bucket_size=256,
            ).count()
        )
        print(json.dumps({"op": "ts_sig_occupancy", "x": factor,
                          **{k: int(v)
                             for k, v in ts_occupancy[factor].items()}}))
        # copy i holds user ids [i*u, (i+1)*u) -> u recovers the copy
        users_1x = ev.agg(F.max("user_id")).first()[0] // factor + 1
        probe(
            "interval_overlap",
            lambda d: _ev_interval_overlap(d, users_1x),
            ev,
            factor,
            n_ev,
        )
        # execute_compaction: real files in, real files out — timed end
        # to end (listing + plan + clustered rewrite + commit), dest
        # recreated per rep so every run pays the full write
        import os
        import shutil

        csrc = f"{WORK}/compact_src_x{factor}"
        cdst = f"{WORK}/compact_dst_x{factor}"
        if not os.path.exists(f"{csrc}/_SUCCESS"):
            df.select("doc_id", "text").repartition(64).write.mode(
                "overwrite"
            ).parquet(csrc)
        total = sum(
            os.path.getsize(os.path.join(csrc, f))
            for f in os.listdir(csrc)
            if f.endswith(".parquet")
        )
        best = None
        for i in range(3):
            shutil.rmtree(cdst, ignore_errors=True)
            t0 = time.time()
            LAY.execute_compaction(
                spark, csrc, cdst, total // 8, cluster_col="doc_id"
            )
            dt = time.time() - t0
            if i > 0:
                best = dt if best is None else min(best, dt)
        results.setdefault("execute_compaction", {})[factor] = {
            "sec": round(best, 2),
            "docs_per_sec": int(n_docs[factor] / best),
        }
        print(json.dumps({"op": "execute_compaction", "x": factor,
                          **results["execute_compaction"][factor]}))

    lines = [
        "# SCALE — measured scaling of the training-data operators",
        "",
        "Corpus: sf0.1 documents unioned with per-token-tagged copies "
        "(every token of copy i carries an `xi` suffix, so the original "
        "shingle structure — and the real near-dup rate — is preserved "
        "within a copy while no shingle collides across copies) — "
        f"{', '.join(f'{f}x = {n_docs[f]:,} docs' for f in factors)}, "
        "local[32].  Embedding rows (emb_/..._topk) scale the "
        "embeddings table the same way (copy i rolls each vector by i "
        "components: norms preserved, no cross-copy near-dups), with "
        "LSH bits growing as log2(n/25) so expected bucket size stays "
        "constant — the knob that makes bucketed candidate generation "
        "scale; semantic_dedup's k-means cluster count grows as n/250 "
        "for the same reason (its untimed build-once quantizer is "
        "re-trained per factor).  Graph rows (graph_triangles, "
        "pagerank_5it) scale the sf0.1 lineitem co-purchase input the "
        "same way (copy i shifts both keys — disjoint "
        "structure-identical subgraphs, rows/sec is lineitem "
        "rows).  Events rows (sessionize/ewma/funnel/retention) scale "
        "the events table by shifting user and event ids per copy — "
        "disjoint populations with identical per-user distributions, "
        "shared timestamps; asof_join matches scaled purchases to "
        "scaled clicks per user, and interval_overlap samples "
        "intervals from the scaled events with a per-copy axis offset "
        "so pair density — and so the OUTPUT — scales linearly rather "
        "than quadratically with shared-axis crowding.  Per "
        "cell: steady-state seconds (min of 2) and "
        "rows/sec.  Linear ops should hold rows/sec roughly constant as "
        "the corpus grows; pair-generating ops grow with candidate "
        "volume, which the banding keeps near-linear.",
        "",
        "Regenerate: `python tools/scale_probe.py`.",
        "",
        "| operator | " + " | ".join(f"{f}x" for f in factors) + " |",
        "|---|" + "|".join(["---"] * len(factors)) + "|",
    ]
    for name in (
        list(OPS)
        + list(EMB_OPS)
        + list(GRAPH_OPS)
        + list(EVENTS_OPS)
        + ["interval_overlap", "execute_compaction"]
    ):
        cells = [
            f"{results[name][f]['sec']}s · {results[name][f]['docs_per_sec']:,}/s"
            for f in factors
        ]
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    lines.append("")

    # LSH bucket-occupancy accountability: the emb_lsh_occupancy suite
    # row probed at each factor's bit width — the measured check that
    # the log2(n/25) schedule holds expected bucket size (and the
    # per-bucket quadratic verify volume) roughly constant
    lines += [
        "## LSH bucket occupancy vs the log2(n/25) bit schedule",
        "",
        "Max/mean bucket size and total candidate-pair volume "
        "(Σ s·(s−1)/2 across buckets, 8 tables) for emb_lsh_near_pairs "
        "at each factor's bit width.  The schedule holds when "
        "mean_bucket stays ~flat and cand_pairs grows ~linearly with "
        "n_vecs; a drifting max_bucket is the hot-bucket signal.",
        "",
        "| factor | n_vecs | bits | max bucket | mean bucket | candidate pairs |",
        "|---|---|---|---|---|---|",
    ]
    for f in factors:
        o = occupancy[f]
        lines.append(
            f"| {f}x | {o['n_vecs']:,} | {o['bits']} | {o['max_bucket']:,}"
            f" | {o['mean_bucket']} | {o['cand_pairs']:,} |"
        )
    lines.append("")

    # ts_similar signature-occupancy accountability (r8 verdict item
    # 6; round-10 adaptive resolution): extra_bits is the
    # floor(log2(n/1500)) refinement schedule engaging — the schedule
    # holds when mean occupancy stays ~flat and candidate volume
    # grows ~linearly (the probe's scaled copies are IDENTICAL
    # series, so a per-user floor of copies² true-dup candidates is
    # irreducible output, not saturation)
    lines += [
        "## ts_similar signature-bucket occupancy (valve = 256, "
        "adaptive resolution)",
        "",
        "Extra refinement bits per the floor(log2(n/1500)) schedule, "
        "pre-valve candidate volume Σ s·(s−1)/2, the series the "
        "hot-bucket valve drops, and the post-valve candidate volume "
        "the verify stage actually pays, per factor.  Mean occupancy "
        "is exact micros (integer parity policy).",
        "",
        "| factor | series | extra bits | buckets | max bucket | "
        "mean | cand pairs | hot-dropped | cand after valve | "
        "true pairs | cand/true |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for f in factors:
        if f not in ts_occupancy:
            continue
        o = ts_occupancy[f]
        ct = (
            o["n_cand_after_valve"] / o["n_true_pairs"]
            if o["n_true_pairs"]
            else float("inf")
        )
        lines.append(
            f"| {f}x | {o['n_series']:,} | {o['extra_bits']} | "
            f"{o['n_buckets']:,} | {o['max_bucket']:,} | "
            f"{o['mean_bucket_micros'] / 1e6:.2f} | "
            f"{o['n_cand_pairs']:,} | {o['n_hot_dropped']:,} | "
            f"{o['n_cand_after_valve']:,} | {o['n_true_pairs']:,} | "
            f"{ct:.2f} |"
        )
    lines.append("")

    # graph candidate-volume accountability (VERDICT r9 item 5):
    # intermediate volumes per factor so a drifting graph cell is
    # attributed from data (candidate growth vs variance), not re-runs
    lines += [
        "## Graph candidate-volume accountability",
        "",
        "Exact intermediate volumes per factor for the graph cells: "
        "co-purchase edges, open wedges Σ C(deg,2), the oriented "
        "wedge-pair candidates the triangle intersection pays "
        "(n_candidates), the realized orientation out-degree bound, "
        "triangles found, the k_core/label_prop sparsified-slice edge "
        "count, and the BFS reached-node count.  A super-linear wall "
        "cell with linear volumes here is session variance by "
        "elimination; volume growth names the guilty stage directly.",
        "",
        "| factor | edges | wedges | tri candidates | max outdeg | "
        "triangles | slice edges | bfs reached |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for f in factors:
        if f not in graph_volume:
            continue
        o = graph_volume[f]
        lines.append(
            f"| {f}x | {o['n_edges']:,} | {o['n_wedges']:,} | "
            f"{o['n_candidates']:,} | {o['max_out_degree']:,} | "
            f"{o['n_triangles']:,} | {o['slice_edges']:,} | "
            f"{o['bfs_reached']:,} |"
        )
    lines.append("")

    # tokenizer-scale BPE probe (VERDICT r6 item 6): production merge
    # budget (n_merges=1024, batch_cap=64), trained to vocabulary
    # exhaustion.  The amortization claim is rounds ≪ merges; the
    # exact-prefix mode is probed once at 1x as the honesty row — on
    # natural-ish text its stop-at-first-conflict rule degrades toward
    # one merge per round, which is exactly why bpe_train grew the
    # greedy disjoint mode (exact=False) for production vocabularies.
    lines += [
        "## Tokenizer-scale BPE training (n_merges=1024, batch_cap=64)",
        "",
        "| corpus | mode | merges learned | Spark rounds | wall |",
        "|---|---|---|---|---|",
    ]
    bpe_cells = [(1, False), (1, True), (max(factors), False)]
    for factor, exact in bpe_cells:
        df = spark.read.parquet(f"{WORK}/docs_x{factor}.parquet")
        # min of 2: a single-shot wall after the 80+ cells above is
        # GC/codegen-polluted (observed 6.6s vs 36.5s for the same
        # deterministic 26-round training across two probe runs); the
        # rounds count is the deterministic claim either way
        wall = None
        for _ in range(2):
            t0 = time.time()
            merges = B.bpe_train(
                df, "text", n_merges=1024, min_pair_count=2, batch_cap=64,
                exact=exact,
            )
            dt = time.time() - t0
            wall = dt if wall is None else min(wall, dt)
        mode = "exact prefix" if exact else "greedy disjoint"
        lines.append(
            f"| {factor}x | {mode} | {len(merges)} (vocab exhausted) "
            f"| {B.last_train_rounds} | {round(wall, 1)}s |"
        )
        print(
            json.dumps(
                {
                    "op": "bpe_train_1024",
                    "x": factor,
                    "mode": mode,
                    "merges": len(merges),
                    "rounds": B.last_train_rounds,
                    "sec": round(wall, 1),
                }
            )
        )
    lines.append("")
    with open("/root/repo/SCALE.md", "w") as fh:
        fh.write("\n".join(lines))
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
