"""Text-analysis operators: tokenization stats, quality scoring,
language ID, document fingerprinting, token counting.

All pure Catalyst expressions (split / filter / aggregate HOFs) — the
whole module runs inside whole-stage codegen, which is what makes these
viable as per-document map-side ops on a 100 TB corpus (no shuffle at
all except for corpus-level rollups the caller adds).
"""

from __future__ import annotations

from platform_etl_literature_spark.localdf import fan_out, local_df
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from platform_etl_literature_spark.operators.dedup import tokens

# Tiny per-language marker lexicons for the n-gram/stopword heuristic
# language ID.  Deliberately small: the operator contract is "argmax of
# marker hits with deterministic tie-break", not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "est", "un"],
    "es": ["el", "la", "y", "es", "un"],
}

STOPWORDS_EN = ["the", "a", "an", "of", "and", "or", "is", "in", "to"]

# A BPE-ish token splitter: words, numbers, or single punctuation marks —
# the standard pre-tokenization regex shape used by GPT-style BPE.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def doc_stats(text: Column) -> dict[str, Column]:
    """Per-document stats: token count, distinct count, TTR, mean token
    length, stopword ratio.  All deterministic per-row expressions."""
    return doc_stats_from_tokens(tokens(text))


def doc_stats_from_tokens(w: Column) -> dict[str, Column]:
    """doc_stats over a pre-tokenized ``array<string>`` column.

    Splitting once and reusing the array column matters: Catalyst does
    not CSE lambda-bearing expressions across projection items, so the
    text-column variants re-split per stat — ~7 splits per row in the
    full profile."""
    n = F.size(w)
    nd = F.size(F.array_distinct(w))
    total_len = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    n_stop = F.size(F.filter(w, lambda t: t.isin(STOPWORDS_EN)))
    nn = F.greatest(n, F.lit(1)).cast("double")
    # raw (unrounded) ratios — callers round at output time, so derived
    # scores (quality) compose from full-precision values
    return {
        "n_tokens": n,
        "n_distinct": nd,
        "ttr": nd / nn,
        "mean_token_len": total_len / nn,
        "stopword_ratio": n_stop / nn,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs with
    lexical diversity and a sane stopword rate."""
    return quality_from_stats(doc_stats(text))


def quality_from_stats(s: dict[str, Column]) -> Column:
    len_term = F.least(s["n_tokens"] / F.lit(50.0), F.lit(1.0))
    return F.round((len_term + s["ttr"] + s["stopword_ratio"]) / F.lit(3.0), 6)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-token hits, 'und' when no
    markers hit; ties break by language code order (deterministic)."""
    return lang_id_from_tokens(tokens(text))


def lang_id_from_tokens(w: Column) -> Column:
    def marker_hits(markers: list[str]) -> Column:
        # closure (not a default arg: PySpark lambda introspection binds
        # a Column to every parameter, including defaulted ones)
        return F.size(F.filter(w, lambda t: t.isin(markers)))

    entries = F.array(
        *[
            F.struct(
                marker_hits(LANG_MARKERS[code]).alias("hits"),
                F.lit(code).alias("code"),
            )
            for code in sorted(LANG_MARKERS)
        ]
    )
    max_hits = F.array_max(F.transform(entries, lambda e: e["hits"]))
    first_best = F.filter(entries, lambda e: e["hits"] == max_hits)[0]["code"]
    return F.when(max_hits > 0, first_best).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over token lengths+first-char codes —
    an order-sensitive 63-bit document fingerprint.

    h = fold(tokens, 0, (h, t) -> (h*31 + len(t)*131 + ascii(t[0])) mod P)
    Deterministic and engine-portable (mirrors in ANSI SQL).
    """
    return fingerprint_from_tokens(tokens(text))


def fingerprint_from_tokens(w: Column) -> Column:
    p = F.lit(2147483647)
    return F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda h, t: (h * 31 + F.length(t) * 131 + F.ascii(t)) % p,
    )


#: character classes for the entropy signal, in FIXED summation order
#: (the float-parity contract needs both engines to add terms in the
#: same sequence).  Patterns are "everything that is NOT the class" —
#: the class count is length(text) - length(stripped).
_CHAR_CLASSES: list[tuple[str, str]] = [
    ("n_lower", "[a-z]"),
    ("n_upper", "[A-Z]"),
    ("n_digit", "[0-9]"),
    ("n_space", r"[ \t\n]"),
]


def char_class_counts(text: Column) -> dict[str, Column]:
    """Exact integer counts of lower/upper/digit/whitespace/other
    characters — one JVM regex strip per class, no explode, no
    shuffle."""
    total = F.length(text)
    counts = {
        name: total - F.length(F.regexp_replace(text, pat, ""))
        for name, pat in _CHAR_CLASSES
    }
    counts["n_other"] = total - sum(counts.values(), F.lit(0))
    return counts


def char_entropy_expr(text: Column) -> Column:
    """The entropy column alone (rounded to 6, micro-nat exact sum) —
    reused by :func:`char_class_entropy` and the frozen quality
    classifier so both score from the identical expression."""
    counts = char_class_counts(text)
    n = F.length(text)
    nn = n.cast("double")

    def term_micro(c: Column) -> Column:
        p = c.cast("double") / nn
        return F.when(
            c > 0, F.round(-p * F.log(p) * 1000000.0, 0).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    order = ["n_lower", "n_upper", "n_digit", "n_space", "n_other"]
    micro = term_micro(counts[order[0]])
    for name in order[1:]:
        micro = micro + term_micro(counts[name])
    return (
        F.when(n > 0, F.round(micro / 1000000.0, 6))
        .otherwise(F.lit(0.0))
    )


def char_class_entropy(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document Shannon entropy over the five character classes —
    the cheap compressibility/quality signal that separates prose
    (~1.2-1.5 nats), code and tables (digit/punct-heavy, higher), and
    degenerate pad text (~0).  Returns (id, n_chars, n_lower, n_upper,
    n_digit, n_space, n_other, entropy).

    Scale shape: pure map-side projection (five regex strips + fixed
    arithmetic per row); nothing shuffles.  Float parity: each class
    term -p·ln(p) is rounded to integer MICRO-NATS and the entropy is
    the exact integer sum divided once at output (the lm.py micro-nat
    contract), so the DuckDB oracle reproduces it bit-for-bit.
    """
    text = F.col(text_col)
    counts = char_class_counts(text)
    n = F.length(text)
    order = ["n_lower", "n_upper", "n_digit", "n_space", "n_other"]
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        *[counts[name].cast("long").alias(name) for name in order],
        char_entropy_expr(text).alias("entropy"),
    )


#: Frozen quality-classifier weights — the fastText-style linear
#: quality filter as a build-once artifact (the contract shared with
#: the IVF centroids / PQ codebooks / frozen BPE merges): trained
#: offline, shipped as literals, so scoring is pure map-side
#: arithmetic and the SQL oracle replays it term for term.  The
#: FEATURE ORDER is part of the artifact: z sums left-to-right in
#: exactly this sequence on both engines.
QUALITY_LOGREG_WEIGHTS: list[tuple[str, float]] = [
    ("bias", -3.1),
    ("log_len", 0.75),         # ln(1 + n_tokens), capped at 6
    ("ttr", 1.9),              # lexical diversity
    ("stopword_ratio", 3.2),   # function-word rate (prose signal)
    ("mean_token_len", -0.12), # penalize long-token (code/url) text
    ("entropy", 0.85),         # char-class entropy, nats
]


def quality_logreg(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Model-based quality filtering with a FROZEN logistic classifier
    (the CCNet/fastText-style quality gate): engineered features →
    fixed linear form → sigmoid probability → keep flag.  Returns
    (id, n_tokens, z, prob, keep).

    Scale shape: one map-side projection per document — the token
    array stages once, every feature is a HOF over it or a regex
    strip, no join, no shuffle, no Python.  Float parity: features
    divide exact integers; z rounds to 6 before the sigmoid and prob
    rounds to 6 after it (the lm.py exp contract), so the DuckDB
    oracle reproduces every row bit-for-bit.
    """
    text = F.col(text_col)
    w = tokens(text)
    staged = df.select(F.col(id_col), text.alias("_t"), w.alias("_w"))
    s = doc_stats_from_tokens(F.col("_w"))
    feats = {
        "bias": F.lit(1.0),
        "log_len": F.least(
            F.log(F.lit(1.0) + s["n_tokens"].cast("double")), F.lit(6.0)
        ),
        "ttr": s["ttr"],
        "stopword_ratio": s["stopword_ratio"],
        "mean_token_len": s["mean_token_len"],
        "entropy": char_entropy_expr(F.col("_t")),
    }
    name0, w0 = QUALITY_LOGREG_WEIGHTS[0]
    z = F.lit(w0) * feats[name0]
    for name, wt in QUALITY_LOGREG_WEIGHTS[1:]:
        z = z + F.lit(wt) * feats[name]
    z = F.round(z, 6)
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return staged.select(
        F.col(id_col),
        s["n_tokens"].alias("n_tokens"),
        z.alias("z"),
        prob.alias("prob"),
        (prob >= F.lit(threshold)).cast("int").alias("keep"),
    )


def token_count_bpeish(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenization regex."""
    return F.size(
        F.filter(
            F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0), lambda t: t != ""
        )
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tf = in-document term count; df = number of documents containing the
    term; idf = ln(N/df).  Ranking uses the integer-exact key
    (tf desc, df asc, term asc) — same order as tf·idf for fixed tf, and
    deterministic across engines (a float-ranked top-k could flip on the
    last ulp of ln).  The reported tfidf rounds idf before the product
    so the value is engine-portable too.

    Scale shape: ONE pass over the corpus — the (doc,term) tf
    aggregation, then the document frequency as a window count over
    ``term`` on that (vocabulary × doc)-sized table (a self-join
    against a re-aggregated corpus would scan and tokenize twice), a
    broadcast of the single-row corpus count (metadata-only parquet
    count), and the top-k window shuffling on doc_id only.
    """
    # NO fan_out: A/B'd 1.64 -> 2.55 s at sf0.1 (round 10) — the explode
    # feeds a map-side-combining (doc, term) aggregation, the LM-family
    # negative-result class (the fan-out shuffle + wider exchange cost
    # more than the single-task scan they spread).
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    total = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(total))
        .withColumn("idf", F.round(F.log(F.col("n_docs") / F.col("df")), 6))
        .withColumn("tfidf", F.round(F.col("tf") * F.col("idf"), 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, flag_threshold: float = 0.3
) -> DataFrame:
    """Duplicate-n-gram repetition signals (the Gopher/C4-style quality
    filter for generated/boilerplate text): for n in {2, 3}, the
    fraction of n-gram occurrences that are repeats of an earlier
    n-gram in the same document.  0 = no repetition; docs above
    ``flag_threshold`` on the 3-gram ratio are flagged.

    Pure per-row HOF expressions — map-side only, no shuffle.  The token
    array and each n-gram multiset are staged through intermediate
    projections (as in document_profile) so the text is split once per
    row and each gram array is built once — an inline expression tree
    would re-split the document inside every slice() lambda, turning the
    pass O(tokens²) per document (measured 22 s → ~1 s on sf0.1).

    Grams are represented as xxhash64 of the token slice, not a
    concat_ws string: the ratios only count gram occurrences, so an
    8-byte long is as good as the string and the distinct pass compares
    longs instead of allocating + comparing strings (round 2 measured
    the string variant at 8.9× the single-node oracle; hashing removes
    most of the constant factor).  A 64-bit collision within one
    document is vanishingly unlikely (~n²/2⁶⁵).
    """
    from platform_etl_literature_spark.operators.dedup import tokens

    def grams(n: int) -> Column:
        # shingles() distincts; build the full multiset for the ratio
        w = F.col("_toks")
        return F.when(
            F.size(w) < n, F.array().cast("array<bigint>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.xxhash64(F.slice(w, i, n)),
            )
        )

    def dup_ratio(gram_col: str) -> Column:
        g = F.col(gram_col)
        total = F.size(g)
        nd = F.size(F.array_distinct(g))
        return F.when(total > 0, F.round((total - nd) / total, 6)).otherwise(0.0)

    staged = fan_out(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), grams(2).alias("_g2"), grams(3).alias("_g3"))
    r3 = dup_ratio("_g3")
    return staged.select(
        F.col(id_col),
        dup_ratio("_g2").alias("dup_2gram_ratio"),
        r3.alias("dup_3gram_ratio"),
        (r3 > flag_threshold).cast("int").alias("flagged"),
    )


def greedy_packs(
    df: DataFrame,
    id_col: str,
    size_col: str,
    shard_col: str,
    capacity: int,
) -> DataFrame:
    """Assign documents to fixed-capacity packs (training-shard /
    sequence-packing assignment): within each shard, documents in
    ``id_col`` order go to pack ⌊running_total_before / capacity⌋.

    Deterministic (no RNG, stable order), one shuffle on the shard key,
    one running-sum window per shard.  The shard key bounds the window's
    sort — a single global pack sequence would serialize; shards are the
    scale unit, exactly how training data is laid out anyway.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.select(
        id_col,
        shard_col,
        F.col(size_col).alias("size"),
        cum.alias("cum_size"),
        ((cum - F.col(size_col)) / capacity).cast("long").alias("pack_id"),
    )


def document_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Full per-document profile — the map-side text-analysis pass.

    Two-stage projection: tokenize once, then derive every stat from the
    token array.  The intermediate alias survives CollapseProject (the
    split is non-cheap and multiply referenced), so the corpus is split
    once per row instead of once per stat — measured ~3× on sf0.1."""
    # fan_out: a pure map over a single-row-group scan otherwise runs
    # the whole profile (every HOF below) as ONE task — 1.1 s of the
    # query's 1.2 s at sf0.1.
    staged = fan_out(df).select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("_toks")
    )
    w = F.col("_toks")
    s = doc_stats_from_tokens(w)
    rounded = {
        name: (F.round(c, 6) if name in ("ttr", "mean_token_len", "stopword_ratio") else c)
        for name, c in s.items()
    }
    return staged.select(
        F.col(id_col),
        *[c.alias(name) for name, c in rounded.items()],
        quality_from_stats(s).alias("quality"),
        lang_id_from_tokens(w).alias("lang_pred"),
        fingerprint_from_tokens(w).alias("fingerprint"),
        token_count_bpeish(F.col(text_col)).alias("n_bpe_tokens"),
    )


def vocab_coverage(
    df: DataFrame, text_col: str, coverage: float = 0.9
) -> DataFrame:
    """Zipf vocabulary construction: global token frequencies ranked
    descending, with the cumulative corpus fraction each prefix of the
    ranking covers.  ``in_vocab`` marks the smallest prefix reaching
    ``coverage`` (the token that crosses the threshold is included) —
    the frequency-cutoff step of building a tokenizer vocabulary.

    Scale shape: the heavy part is the token-count aggregation, which
    map-side combines to one row per distinct token; the ranking runs
    over that *vocabulary*-sized table via the range-partitioned
    zipWithIndex of :mod:`operators.ranking` — rank, running sum, and
    the grand total all come from ONE range exchange plus a
    #partitions-row broadcast offset lookup, with no single-reducer
    window anywhere in the plan (a web-scale vocabulary is 10⁸–10⁹
    rows; the old ``row_number() OVER (ORDER BY ...)`` shape sorted it
    all in one task).  The total is NOT a second aggregation of the
    corpus — it falls out of the same per-partition stats.  The
    threshold test compares exact integer counts
    ((cum - freq) < coverage * total) — no accumulated float error.
    """
    from platform_etl_literature_spark.operators.dedup import tokens
    from platform_etl_literature_spark.operators.ranking import (
        ordered_global_index,
    )

    tf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = ordered_global_index(
        tf,
        [F.col("freq").desc(), F.col("term").asc()],
        rank_col="rnk",
        running_sum_col="freq",
        running_sum_out="cum",
        total_out="_total",
    )
    return ranked.select(
        "term",
        "freq",
        "rnk",
        F.round(F.col("cum") / F.col("_total"), 6).alias("cum_frac"),
        ((F.col("cum") - F.col("freq")) < coverage * F.col("_total"))
        .cast("int")
        .alias("in_vocab"),
    )


def curation_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    carry_cols: list[str] | None = None,
    quality_min: float = 0.5,
    want_lang: str = "en",
    rep_threshold: float = 0.3,
) -> DataFrame:
    """Stateless per-document curation decision: quality score, language
    ID, 3-gram repetition flag, and the combined ``kept`` verdict in ONE
    projection pipeline — no joins, no aggregation, no state.

    Statelessness is the point: the same plan runs on a batch DataFrame
    and on a Structured Streaming ingest (append mode, no watermark
    needed), so a curation policy is written once and applied both to
    the historical corpus and to arriving data
    (streaming/documents.py).  Token and gram arrays are staged through
    projections per the repetition_stats pattern.
    """
    from platform_etl_literature_spark.operators.dedup import tokens

    carry = list(carry_cols or [])
    w = F.col("_toks")
    # hashed-gram representation, as in repetition_stats: the flag only
    # counts gram occurrences, so longs beat string allocation
    g3 = F.when(F.size(w) < 3, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.xxhash64(F.slice(w, i, 3)),
        )
    )
    staged = df.select(
        F.col(id_col), *carry, tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), *carry, F.col("_toks"), g3.alias("_g3"))
    s = doc_stats_from_tokens(w)
    quality = quality_from_stats(s)
    total, nd = F.size("_g3"), F.size(F.array_distinct("_g3"))
    r3 = F.when(total > 0, F.round((total - nd) / total, 6)).otherwise(0.0)
    flagged = (r3 > rep_threshold).cast("int")
    lang_pred = lang_id_from_tokens(w)
    return staged.select(
        F.col(id_col),
        *carry,
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
        flagged.alias("flagged"),
        (
            (quality >= quality_min)
            & (lang_pred == want_lang)
            & (flagged == 0)
        )
        .cast("int")
        .alias("kept"),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-length sequence builder of a training pipeline.  Chunk i
    covers tokens [1 + i·stride, …][:chunk_size] with
    stride = chunk_size − overlap; the final partial chunk is kept
    (training pads it).

    Map-side only: stage the token array, posexplode the chunk starts,
    slice per chunk — rows fan out by ~n_tokens/stride with no shuffle;
    at 100 TB chunking composes with the scan and never materializes
    the corpus twice.
    """
    from platform_etl_literature_spark.operators.dedup import tokens

    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError(
            f"chunk_size ({chunk_size}) must exceed overlap ({overlap})"
        )
    w = F.col("_toks")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(w) - overlap, F.lit(1)), F.lit(stride)
    )
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(F.col(id_col), "_toks", F.posexplode(starts).alias("chunk_id", "_start"))
    piece = F.slice(w, F.col("_start"), chunk_size)
    return staged.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def epoch_repeat(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights_bps: dict[str, int],
    default_bps: int = 10000,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic fractional upsampling: repeat each row
    ⌊w⌋ or ⌈w⌉ times so a group's expected multiplicity equals its
    weight (in basis points; 25000 = 2.5 epochs).  The ⌈w⌉ decision is
    by content hash — reproducible across engines, runs, and corpus
    growth, like mixture_sample's downsampling (weights ≤ 1) which
    this composes with for full mixture control.

    Map-side: broadcast weight table, one explode by the per-row copy
    count; emitted rows carry ``copy`` (0-based) so downstream shard
    packing can interleave epochs.
    """
    from platform_etl_literature_spark.operators.dedup import token_hash

    spark = df.sparkSession
    rows = [(k, int(v)) for k, v in sorted(weights_bps.items())]
    wt = F.broadcast(local_df(spark, rows, f"{group_col} string, _bps int"))
    bucket = token_hash(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 10000
    bps = F.coalesce(F.col("_bps"), F.lit(default_bps))
    n_copies = (bps / 10000).cast("long") + (
        bucket < bps % 10000
    ).cast("long")
    return (
        df.join(wt, group_col, "left")
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("copy")
        )
        .drop("_bps", "_n")
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_width: int = 32,
    batch_size: int = 16,
    n_shards: int = 4,
    salt: str = "batch",
) -> DataFrame:
    """Length-bucketed batch assignment: group documents of similar
    token length into fixed-count batches so per-batch padding (to the
    batch max) is minimized — the batching strategy dynamic-padding
    training loaders use, precomputed corpus-side.

    Returns per-BATCH stats: (shard, bucket, batch_idx, n_docs,
    batch_tokens, padded_tokens, waste_frac) where padded_tokens =
    batch_max × n_docs (what the accelerator actually processes) and
    waste_frac the padding overhead.

    Deterministic and scale-safe: documents are first sharded by
    content hash (the :func:`~platform_etl_literature_spark.operators.dedup.hash_split`
    md5 bucket trick), THEN length-bucketed, so each
    (shard, bucket) window partition holds ~1/(shards·buckets) of the
    corpus — at 100 TB ``n_shards`` grows with the cluster and no
    window partition serializes; within a partition assignment is
    row_number order on (n_tokens, id), reproducible across engines
    and repartitionings.
    """
    from platform_etl_literature_spark.operators.dedup import token_hash, tokens

    if bucket_width < 1 or batch_size < 1 or n_shards < 1:
        raise ValueError("bucket_width, batch_size, n_shards must be >= 1")
    idc = F.col(id_col)
    base = df.select(
        idc,
        (token_hash(F.concat(F.lit(salt), idc.cast("string"))) % n_shards).alias(
            "shard"
        ),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    ).withColumn("bucket", F.floor(F.col("n_tokens") / bucket_width).cast("long"))
    w = Window.partitionBy("shard", "bucket").orderBy("n_tokens", id_col)
    assigned = base.withColumn(
        "batch_idx", F.floor((F.row_number().over(w) - 1) / batch_size).cast("long")
    )
    return assigned.groupBy("shard", "bucket", "batch_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("batch_tokens"),
        (F.max("n_tokens") * F.count(F.lit(1))).alias("padded_tokens"),
        F.round(
            F.when(
                F.max("n_tokens") == 0, F.lit(0.0)
            ).otherwise(
                1.0
                - F.sum("n_tokens")
                / (F.max("n_tokens") * F.count(F.lit(1))).cast("double")
            ),
            6,
        ).alias("waste_frac"),
    )


def training_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shuf1",
) -> DataFrame:
    """Deterministic global training-order shuffle into shards — the
    "randomize the corpus, reproducibly" step every training run needs
    at 100 TB, where a naive orderBy(rand()) is neither reproducible
    nor resumable.

    Each row's position is its rank in ``(md5(seed:id), id)`` order —
    pseudo-random with respect to any data attribute, identical across
    engines/runs/partitionings, and stable under reshards of the same
    corpus.  The rank rides :func:`ranking.ordered_global_index`
    (range exchange + broadcast offsets — no SinglePartition sort), and
    shards deal round-robin so every shard is a uniform sample of the
    shuffled order: ``shard = pos % n_shards``,
    ``pos_in_shard = pos div n_shards``.

    Returns the input columns + (pos, shard, pos_in_shard), 0-based.
    Compose downstream with ``repartitionByRange(shard, pos_in_shard)``
    + ``sortWithinPartitions`` to materialize shard files in order.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from platform_etl_literature_spark.operators.dedup import token_hash
    from platform_etl_literature_spark.operators.ranking import (
        ordered_global_index,
    )

    h = token_hash(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    ranked = ordered_global_index(
        df.withColumn("_h", h),
        [F.col("_h").asc(), F.col(id_col).asc()],
        rank_col="_rnk",
    )
    pos = F.col("_rnk") - 1
    return ranked.select(
        *df.columns,
        pos.alias("pos"),
        (pos % n_shards).cast("int").alias("shard"),
        F.expr(f"(_rnk - 1) div {n_shards}").alias("pos_in_shard"),
    )


def pmi_collocations(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_pair_count: int = 5,
) -> DataFrame:
    """Bigram collocations ranked by pointwise mutual information
    (Church & Hanks, CL 1990: "Word Association Norms, Mutual
    Information, and Lexicography") — the classic corpus-linguistics
    signal for multi-word expressions, and a standard training-data
    diagnostic (boilerplate n-grams surface as impossibly-high-PMI
    pairs).

        pmi(a, b) = ln( p(a,b) / (p(a) · p(b)) )

    with p(a,b) over adjacent-token bigrams and p(a) over unigrams.

    Float parity (suite module docstring policy): every count is an
    exact order-free BIGINT; the PMI is computed in ONE canonical
    double expression — ``(n_pair·N1/n_a) · (N1/(n_b·N2))`` folded
    left-to-right then ln then round 6 — which an SQL oracle replays
    operand-for-operand.  The BIGINT-squaring trap is avoided by
    never forming ``N1²`` (corpus token counts square past 2^63 at
    ~3·10⁹ tokens); every product has a division interleaved.

    Scale shape: bigrams come from zip_with over the per-doc token
    array (no positional self-join, no window); unigram and bigram
    counts are map-side-combinable hash aggregates keyed by
    vocabulary-sized keys; the ``min_pair_count`` filter applies
    BEFORE the unigram joins, so the join inputs are
    (filtered-pair-vocabulary × unigram-vocabulary) equijoins — never
    corpus-shaped.  Corpus totals attach via the one sanctioned
    single-row broadcast.  Returns (w1, w2, n_pair, pmi).
    """
    from platform_etl_literature_spark.operators.dedup import tokens

    toks = docs.select(tokens(F.col(text_col)).alias("_t"))
    uni = toks.select(F.explode("_t").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    bg = toks.filter(F.size("_t") >= 2).select(
        F.explode(
            F.expr(
                "zip_with(slice(_t, 1, size(_t) - 1),"
                " slice(_t, 2, size(_t) - 1),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("_bg")
    ).select("_bg.w1", "_bg.w2")
    bc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_count)
    )
    # corpus totals: one row each, derived from the SAME exploded
    # frames the counts came from (order-free integer sums)
    totals = uni.agg(F.count(F.lit(1)).alias("n1")).crossJoin(
        F.broadcast(bg.agg(F.count(F.lit(1)).alias("n2")))
    )
    j = (
        bc.join(
            uc.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")),
            "w1",
        )
        .join(
            uc.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ratio = (d("n_pair") * d("n1") / d("n_w1")) * (
        d("n1") / (d("n_w2") * d("n2"))
    )
    return j.select(
        "w1",
        "w2",
        "n_pair",
        F.round(F.log(ratio), 6).alias("pmi"),
    )


def heaps_law(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    checkpoint_every: int = 50,
) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve with a fitted exponent
    (Heaps 1978; Herdan 1960): reading the corpus in ``id_col`` order,
    emit the running token count N(r) and running type (distinct
    token) count V(r) at every ``checkpoint_every``-th document plus
    the last, and fit V = K·N^β by least squares in log-log space —
    the standard check that a corpus keeps contributing NEW vocabulary
    as it grows (a flattening curve = the crawl is saturating; β for
    natural language sits near 0.4-0.6, β near 0 flags boilerplate).

    Construction (all order-free integer folds until the final fit):
    * each token's FIRST document = min(doc id) over its postings —
      one vocabulary-keyed aggregate;
    * per-doc new_types = count of tokens whose first doc is this doc;
      per-doc n_tokens = posting count;
    * BOTH running sums ride ONE range exchange
      (ranking.ordered_global_index multi-sum form) — no
      single-partition window;
    * the fit uses per-checkpoint quantized-log coordinates
      round(ln(N)·1e4), round(ln(V)·1e4) as BIGINTs, so the OLS
      sufficient statistics are exact integer sums (order-free,
      SQL-replayable); slope/intercept are two divisions on those
      integers.  The 1e-4 log quantization is PART OF the defined
      semantics (the oracle replays it), and a 1e-4 ln error moves
      the fitted exponent by < 1e-4/spread(ln N) — noise next to the
      curve's own fit residuals.

    Overflow: |quantized-log| ≤ ln(2⁶³)·1e4 < 4.4·10⁵, so the binding
    term c·Σx² ≤ C²·1.94·10¹¹ stays under 2⁶³ for C up to ~6,800
    checkpoints (1e6-scaled logs overflowed at ~450 — measured at
    sf0.1 with checkpoint_every=10); ``checkpoint_every`` exists
    precisely to keep C bounded (the fit is over the curve's SHAPE,
    not every document).

    Returns (doc_rank, cum_tokens, cum_types, beta, log_k) — beta and
    log_k constant across rows (attached from the one-row fit).
    """
    from platform_etl_literature_spark.operators import ranking as RK

    posts = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens(F.col(text_col))).alias("_w"),
    )
    per_doc_tokens = posts.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("_ntok")
    )
    first_doc = posts.groupBy("_w").agg(F.min("_doc").alias("_doc"))
    per_doc_new = first_doc.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("_ntypes")
    )
    per_doc = (
        per_doc_tokens.join(per_doc_new, "_doc", "left")
        .withColumn("_ntypes", F.coalesce("_ntypes", F.lit(0).cast("long")))
    )
    cum = RK.ordered_global_index(
        per_doc,
        [F.col("_doc")],
        rank_col="doc_rank",
        running_sum_col=["_ntok", "_ntypes"],
        running_sum_out=["cum_tokens", "cum_types"],
    )
    n_docs = per_doc.groupBy().agg(F.count(F.lit(1)).alias("_nd"))
    pts = cum.crossJoin(F.broadcast(n_docs)).filter(
        (F.col("doc_rank") % checkpoint_every == 0)
        | (F.col("doc_rank") == F.col("_nd"))
    )
    mlog = lambda c: F.round(  # noqa: E731
        F.log(F.col(c).cast("double")) * 10_000, 0
    ).cast("long")
    fit_in = pts.filter(F.col("cum_types") > 0).select(
        mlog("cum_tokens").alias("_lx"), mlog("cum_types").alias("_ly")
    )
    s = fit_in.agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum("_lx").alias("_sx"),
        F.sum("_ly").alias("_sy"),
        F.sum(F.col("_lx") * F.col("_ly")).alias("_sxy"),
        F.sum(F.col("_lx") * F.col("_lx")).alias("_sxx"),
    )
    det = F.col("_c") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    beta = F.when(
        det != 0,
        (F.col("_c") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
            "double"
        )
        / det.cast("double"),
    )
    # intercept in quantized-log space, reported in nats: ln K =
    # (Σy − β·Σx)/c — computed from the SAME integer sums
    log_k = F.when(
        det != 0,
        (
            F.col("_sy").cast("double")
            - (
                (
                    F.col("_c") * F.col("_sxy")
                    - F.col("_sx") * F.col("_sy")
                ).cast("double")
                / det.cast("double")
            )
            * F.col("_sx").cast("double")
        )
        / (F.col("_c").cast("double") * 10_000.0),
    )
    fit = s.select(
        F.round(beta, 6).alias("beta"), F.round(log_k, 6).alias("log_k")
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "doc_rank", "cum_tokens", "cum_types", "beta", "log_k"
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str,
    top_r: int = 256,
    skip_top: int = 10,
) -> DataFrame:
    """Zipf rank-frequency exponent (Zipf 1949): rank terms by
    frequency, fit ln(freq) = intercept − s·ln(rank) over ranks
    ``skip_top+1 .. top_r`` by least squares — the corpus-health twin
    of :func:`heaps_law` (natural text sits near s ≈ 1; machine
    boilerplate skews flat or cliff-shaped).  The head ranks are
    SKIPPED by default: Zipf's law notoriously bends for the few most
    frequent function words, and the standard practice is to fit the
    body of the distribution.

    Exactness: term counts are BIGINTs; the top-R selection is a
    bounded TakeOrdered (freq desc, term asc — total order) so ranks
    are deterministic; per-rank logs are quantized to 1e-4 BIGINT
    coordinates and the OLS sufficient statistics are exact integer
    sums (the heaps_law scheme, incl. its overflow bound) —
    SQL-replayable bit-for-bit.

    Scale shape: ONE vocabulary-keyed count aggregate, then a bounded
    top-R (orderBy + limit → TakeOrderedAndProject, no global sort
    materialization); the R-row fit is metadata-sized by contract.

    Returns ONE row (n_terms_ranked, n_fit, s_zipf, intercept) —
    ``s_zipf`` is the positive exponent (−slope).
    """
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    top = counts.orderBy(F.col("_n").desc(), F.col("_w").asc()).limit(top_r)
    w = Window.orderBy(F.col("_n").desc(), F.col("_w").asc())
    ranked = top.withColumn("_r", F.row_number().over(w))
    mlog = lambda c: F.round(  # noqa: E731
        F.log(F.col(c).cast("double")) * 10_000, 0
    ).cast("long")
    fit_in = ranked.filter(F.col("_r") > skip_top).select(
        mlog("_r").alias("_lx"), mlog("_n").alias("_ly")
    )
    s = fit_in.agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum("_lx").alias("_sx"),
        F.sum("_ly").alias("_sy"),
        F.sum(F.col("_lx") * F.col("_ly")).alias("_sxy"),
        F.sum(F.col("_lx") * F.col("_lx")).alias("_sxx"),
    )
    det = F.col("_c") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        det != 0,
        (F.col("_c") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
            "double"
        )
        / det.cast("double"),
    )
    icpt = F.when(
        det != 0,
        (
            F.col("_sy").cast("double")
            - (
                (
                    F.col("_c") * F.col("_sxy")
                    - F.col("_sx") * F.col("_sy")
                ).cast("double")
                / det.cast("double")
            )
            * F.col("_sx").cast("double")
        )
        / (F.col("_c").cast("double") * 10_000.0),
    )
    n_ranked = ranked.agg(F.count(F.lit(1)).alias("n_terms_ranked"))
    return n_ranked.crossJoin(
        F.broadcast(
            s.select(
                F.col("_c").alias("n_fit"),
                F.round(-slope, 6).alias("s_zipf"),
                F.round(icpt, 6).alias("intercept"),
            )
        )
    )


def skipgram_cooc(
    docs: DataFrame,
    text_col: str,
    window_k: int = 3,
    min_pair_count: int = 5,
) -> DataFrame:
    """Skip-gram co-occurrence counts with 1/d distance weighting
    (the word2vec-style context-window statistic; Mikolov et al. 2013
    weight context positions by distance exactly this way) — the
    windowed generalization of :func:`pmi_collocations`'s adjacent
    bigrams, and the sufficient statistic for any count-based
    embedding (GloVe's X_ij is exactly this table).

    DIRECTIONAL pairs (w1 precedes w2 within ``window_k`` tokens):
    * ``n_cooc``  = exact BIGINT occurrence count;
    * ``w_micro`` = Σ round(1e6/d) as BIGINT — the distance-weighted
      count in exact micro-units (order-free integer sum; 1/d over
      doubles would be accumulation-order-dependent).

    Scale shape: NO join AT ALL — the pmi_collocations bigram shape
    generalized: for each distance d = 1..k, the pair stream is a
    zip_with of the token array against its d-shifted self (two
    slices), all k distances flattened into ONE explode, so the whole
    operator is a map-side projection feeding one map-side-combinable
    count aggregate on vocabulary-pair keys (``min_pair_count``
    filters in the same aggregate).  The per-distance weight
    round(1e6/d) is a DRIVER-SIDE literal baked into each branch —
    no per-row division.  (The first formulation probed a (doc, pos)
    equijoin; at 16× corpus scale the join shuffled two
    corpus-of-tokens-sized sides — 4.0 s — where this shape only
    shuffles the pair-vocabulary counts.)  Returns
    (w1, w2, n_cooc, w_micro).
    """
    if window_k < 1:
        raise ValueError(f"window_k must be >= 1, got {window_k}")
    branches = []
    for d in range(1, window_k + 1):
        # half-UP (not banker's) so the literal matches SQL round()
        # semantics for every d (first divergence at d=128: .5 case).
        wd = int(1_000_000 / d + 0.5)
        branches.append(
            f"CASE WHEN size(_t) > {d} THEN "
            f"zip_with(slice(_t, 1, size(_t) - {d}),"
            f" slice(_t, 1 + {d}, size(_t) - {d}),"
            f" (a, b) -> struct(a AS w1, b AS w2, {wd}L AS wm))"
            f" ELSE array() END"
        )
    pairs_expr = "flatten(array(" + ", ".join(branches) + "))"
    toks = fan_out(docs).select(tokens(F.col(text_col)).alias("_t"))
    return (
        toks.select(F.explode(F.expr(pairs_expr)).alias("_p"))
        .select("_p.w1", "_p.w2", "_p.wm")
        .groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).alias("n_cooc"),
            F.sum("wm").alias("w_micro"),
        )
        .filter(F.col("n_cooc") >= min_pair_count)
    )
