"""Operator-level tests on crafted micro-fixtures (dedup, similarity,
sessionize, multimodal, textstats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_literature_spark.operators import dedup as D
from platform_etl_literature_spark.operators import multimodal as MM
from platform_etl_literature_spark.operators import sessionize as SS
from platform_etl_literature_spark.operators import similarity as SIM
from platform_etl_literature_spark.operators import suffix as SX
from platform_etl_literature_spark.operators import textstats as TS


def test_shingles_short_doc(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("a",), ("",)], ["text"]
    ).select(D.shingles(F.col("text"), 3).alias("s"))
    rows = [r["s"] for r in df.collect()]
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == []  # fewer tokens than n
    assert rows[2] == []
    assert rows[3] == []


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = {r["keep_id"]: r["n_dupes"] for r in D.exact_dedup(df, "text", "doc_id").collect()}
    assert out == {1: 2, 3: 1}


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "w x y z"), (2, "w x y z"), (3, "p q r s")], ["doc_id", "text"]
    )
    rows = D.ngram_jaccard_pairs(df, "doc_id", "text", 2, 0.5).collect()
    assert len(rows) == 1
    assert (rows[0]["id_a"], rows[0]["id_b"], rows[0]["jaccard"]) == (1, 2, 1.0)


def test_minhash_identical_docs_agree_everywhere(spark):
    df = spark.createDataFrame(
        [(1, "w x y z w x"), (2, "w x y z w x"), (3, "aa bb cc dd ee ff")],
        ["doc_id", "text"],
    )
    sigs = D.minhash_signatures(df, "doc_id", "text", 2)
    pairs = D.minhash_candidate_pairs(sigs, min_matching=len(D.MINHASH_SEEDS)).collect()
    assert len(pairs) == 1
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2)
    assert pairs[0]["est_jaccard"] == 1.0


def test_minhash_banded_duplicates_collide_all_bands(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "x y z w")],
        ["doc_id", "text"],
    )
    sigs = D.minhash_signatures(df, "doc_id", "text", 2)
    pairs = D.minhash_banded_pairs(sigs, band_size=2).collect()
    assert len(pairs) == 1
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (1, 2)
    assert pairs[0]["n_bands"] == 4  # identical docs agree in every band


def test_simhash_near_pairs_blocking_finds_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "p q r s t")],
        ["doc_id", "text"],
    )
    signed = D.simhash32(df, "doc_id", "text")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in D.simhash_near_pairs(signed).collect()}
    assert pairs.get((1, 2)) == 0  # identical docs: hamming 0
    assert all(h <= 3 for h in pairs.values())


def test_simhash_deterministic_and_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zz yy xx qq")],
        ["doc_id", "text"],
    )
    out = {r["id"]: r["simhash"] for r in D.simhash32(df, "doc_id", "text").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert 0 <= out[1] < 2**32


def test_cosine_topk_ranks(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [1.0, 0.05]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = SIM.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in out]
    assert got == [(3, 1), (1, 2)]  # 3 is closest to 0, then 1


def test_lsh_recall_on_exact_duplicates(spark):
    rows = [(i, [float(i % 5 == j) for j in range(5)]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = SIM.lsh_cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    got = {r["neighbor_id"]: r["sim"] for r in out.collect()}
    # vec 5 is identical to vec 0 → must share every bucket → found with sim 1
    assert got.get(5) == pytest.approx(1.0)


def test_sessionize_gap_logic(spark):
    df = spark.createDataFrame(
        [
            (1, 7, "2024-01-01 00:00:00"),
            (2, 7, "2024-01-01 00:10:00"),   # same session (gap 600)
            (3, 7, "2024-01-01 01:00:00"),   # new session (gap 3000)
            (4, 8, "2024-01-01 00:00:00"),
        ],
        ["event_id", "user_id", "ts_s"],
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {
        r["event_id"]: r["session_id"]
        for r in SS.sessionize(df, gap_seconds=1800).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = {r["user_id"]: r for r in SS.session_stats(df, gap_seconds=1800).collect()}
    assert stats[7]["n_sessions"] == 2
    assert stats[8]["n_sessions"] == 1


def test_multimodal_media_table_packing(spark):
    df = spark.createDataFrame([(1, "hello", "s")], ["doc_id", "text", "source"])
    media = MM.to_media_table(df, "doc_id", "text", "source")
    row = media.collect()[0]
    assert bytes(row["payload"]) == b"hello"
    assert row["meta"]["n_bytes"] == 5
    # a text payload has no local codec and no learned model: the REAL
    # extractor must refuse rather than ship synthetic features
    with pytest.raises(Exception, match="no extractor|ValueError"):
        MM.decode_features(media).collect()


def test_multimodal_decode_features_real_bmp_and_wav(spark):
    """decode_features' BMP leg must agree value-for-value with
    decode_bmp_features (same block partition, packed as a vector);
    the WAV leg must equal a hand-computed windowed |amplitude| mean
    over the regenerated LCG PCM; mime dispatch works inside one
    mixed batch."""
    import hashlib

    ids = spark.createDataFrame([(3,), (8,)], ["mid"])
    imgs = MM.synth_bmp_media(ids, "mid")
    clips = MM.synth_wav_media(ids.select((F.col("mid") + 100).alias("mid")), "mid")
    media = imgs.select("media_id", "payload").unionByName(
        clips.select("media_id", "payload")
    )
    got = {r["media_id"]: r for r in MM.decode_features(media, gx=2, gy=2).collect()}
    assert sorted(got) == [3, 8, 103, 108]

    # BMP leg == decode_bmp_features packed by feat_idx
    long = MM.decode_bmp_features(imgs, gx=2, gy=2).collect()
    want_img = {}
    for r in long:
        want_img.setdefault(r["media_id"], {})[r["feat_idx"]] = r["feat_val"]
    for mid in (3, 8):
        vec = got[mid]["features"]
        assert len(vec) == 12
        assert vec == [want_img[mid][i] for i in range(12)]
        assert got[mid]["n_bytes"] == 278  # 54 header + 32-stride x 7

    # WAV leg == windowed abs-mean over the regenerated PCM
    for mid in (103, 108):
        samples = [((mid * 7919 + i * 104729) % 65536) - 32768 for i in range(256)]
        want = []
        for k in range(12):
            w = [abs(s) for i, s in enumerate(samples) if i * 12 // 256 == k]
            want.append(round(sum(w) / len(w), 6))
        assert got[mid]["features"] == want
        assert got[mid]["n_bytes"] == 556  # 44 header + 512 PCM
        # digest is the real payload hash (lineage column)
        assert len(got[mid]["digest"]) == 64

    # fake-era plumbing is gone for good
    assert not hasattr(MM, "frame_sample")
    assert not hasattr(MM, "resize_media")
    assert not hasattr(MM, "_fake_features")
    payload = [r for r in imgs.collect() if r["media_id"] == 3][0]["payload"]
    assert got[3]["digest"] == hashlib.sha256(bytes(payload)).hexdigest()


def test_document_profile_values(spark):
    df = spark.createDataFrame([(1, "the cat sat on the mat")], ["doc_id", "text"])
    r = TS.document_profile(df, "doc_id", "text").collect()[0]
    assert r["n_tokens"] == 6
    assert r["n_distinct"] == 5  # 'the' twice
    assert r["stopword_ratio"] == pytest.approx(2 / 6, abs=1e-6)
    assert r["lang_pred"] == "en"
    assert r["n_bpe_tokens"] == 6
    assert 0 <= r["fingerprint"] < 2147483647


def test_lang_id_und_for_no_markers(spark):
    df = spark.createDataFrame([(1, "zz qq ww")], ["doc_id", "text"])
    r = TS.document_profile(df, "doc_id", "text").collect()[0]
    assert r["lang_pred"] == "und"


def test_contamination_flags_and_counts(spark):
    bench = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "a b c d x"),  # shares 4-gram "a b c d"
            (2, "x y z w v"),  # clean
            (3, "a b c"),  # too short for any 4-gram
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in D.contamination(corpus, bench, "doc_id", "text", n=4).collect()
    }
    assert len(rows) == 3  # every corpus doc reported, clean ones included
    assert (rows[1]["shared_ngrams"], rows[1]["contaminated"]) == (1, 1)
    assert (rows[2]["shared_ngrams"], rows[2]["contaminated"]) == (0, 0)
    assert (rows[3]["n_grams"], rows[3]["contaminated"]) == (0, 0)


def test_contamination_counts_distinct_grams_once(spark):
    # repeated shared gram in the corpus doc counts once (distinct grams)
    bench = spark.createDataFrame([(9, "a b a b")], ["doc_id", "text"])
    corpus = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    row = D.contamination(corpus, bench, "doc_id", "text", n=2).collect()[0]
    # corpus distinct 2-grams: {"a b", "b a"}; both appear in benchmark
    assert (row["n_grams"], row["shared_ngrams"]) == (2, 2)


def test_bloom_contamination_matches_exact_at_low_load(spark):
    # At 2^20 bits / k=3 over a five-gram benchmark, the false-positive
    # probability per gram is ~(15/2^20)^3 — the Bloom answer must equal
    # the exact broadcast-set answer on the micro-fixture.
    bench = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "a b c d x"), (2, "x y z w v"), (3, "a b c")],
        ["doc_id", "text"],
    )
    exact = {
        r["doc_id"]: r
        for r in D.contamination(corpus, bench, "doc_id", "text", n=4).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in D.bloom_contamination(
            corpus, bench, "doc_id", "text", n=4
        ).collect()
    }
    assert set(bloom) == set(exact) == {1, 2, 3}
    for i in exact:
        assert bloom[i]["n_grams"] == exact[i]["n_grams"]
        assert bloom[i]["bloom_hits"] == exact[i]["shared_ngrams"]
        assert bloom[i]["contaminated"] == exact[i]["contaminated"]


def test_bloom_contamination_one_sided_under_saturation(spark):
    # Tiny filter (64 bits, k=1) forced far past saturation: false
    # positives abound, but the Bloom guarantee — no false negatives,
    # hits >= true shared count per document — must still hold.
    bench = spark.createDataFrame(
        [(100 + j, f"t{j} u{j} v{j} w{j} x{j}") for j in range(20)],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [(1, "t0 u0 v0 w0 q"), (2, "m n o p q r s")],
        ["doc_id", "text"],
    )
    exact = {
        r["doc_id"]: r["shared_ngrams"]
        for r in D.contamination(corpus, bench, "doc_id", "text", n=4).collect()
    }
    bloom = {
        r["doc_id"]: r
        for r in D.bloom_contamination(
            corpus, bench, "doc_id", "text", n=4, m_bits=64, k=1
        ).collect()
    }
    assert exact[1] >= 1
    for i, true_shared in exact.items():
        assert bloom[i]["bloom_hits"] >= true_shared
        if true_shared > 0:
            assert bloom[i]["contaminated"] == 1


def test_bloom_filter_words_shape_and_validation(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["g"])
    arr = D.bloom_filter_words(df, "g", m_bits=256, k=2)
    assert len(arr) == 4  # m_bits / 64 words, zero-filled where unset
    assert any(w != 0 for w in arr)
    with pytest.raises(ValueError):
        D.bloom_filter_words(df, "g", m_bits=100, k=2)  # not a multiple of 64
    with pytest.raises(ValueError):
        D.bloom_filter_words(df, "g", m_bits=256, k=0)


def test_suffix_lcp_finds_longest_shared_run(spark):
    # doc1/doc2 share "quick brown fox" (3 tokens) mid-string; doc1/doc4
    # share "the lazy dog"; doc3 shares nothing; doc5 is empty.  The
    # per-doc answer is the LONGEST run, wherever it starts.
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox leaps high"),
            (3, "completely different words here"),
            (4, "the lazy dog sleeps"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["max_dup_tokens"], r["dup_flag"])
        for r in SX.suffix_lcp(docs, "doc_id", "text", min_len=3).collect()
    }
    assert got == {1: (3, 1), 2: (3, 1), 3: (0, 0), 4: (3, 1), 5: (0, 0)}


def test_suffix_lcp_cap_and_internal_repeats(spark):
    # A 6-token run shared across docs reports k_cap when capped at 4;
    # a SAME-document internal repeat ("x y x y") must NOT count — only
    # cross-document sharing does.
    docs = spark.createDataFrame(
        [
            (1, "p q r s t u tail1"),
            (2, "head p q r s t u"),
            (3, "x y x y"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["max_dup_tokens"]
        for r in SX.suffix_lcp(
            docs, "doc_id", "text", k_cap=4, min_len=4
        ).collect()
    }
    assert got[1] == 4 and got[2] == 4  # capped at k_cap, not 6
    assert got[3] == 0  # internal repeat is not cross-doc duplication
    with pytest.raises(ValueError):
        SX.suffix_lcp(docs, "doc_id", "text", k_cap=0)


def test_token_lcp_edges(spark):
    df = spark.createDataFrame(
        [
            (["a", "b", "c"], ["a", "b", "c"]),
            (["a", "b", "c"], ["a", "b"]),
            (["a", "b"], ["a", "b", "c"]),
            (["a"], ["z"]),
            ([], ["a"]),
        ],
        ["a", "b"],
    ).select(SX.token_lcp(F.col("a"), F.col("b")).alias("l"))
    assert [r["l"] for r in df.collect()] == [3, 2, 2, 0, 0]


def test_bpe_encode_compacted_equals_direct(spark):
    # The vocabulary-compacted plan and the zero-shuffle per-occurrence
    # fold are the same function: identical (n_words, n_subwords) on a
    # corpus with repeats, multi-merge chains, and an empty doc.
    from platform_etl_literature_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [
            (1, "lower lower newest newest newest wide"),
            (2, "low lowest new newer"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"), ("n", "e")]
    fast = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in B.bpe_encode(docs, "doc_id", "text", merges).collect()
    }
    slow = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in B.bpe_encode(
            docs, "doc_id", "text", merges, compact_vocab=False
        ).collect()
    }
    assert fast == slow
    assert fast[3] == (0, 0)


def test_cms_merge_equals_direct_and_one_sided(spark):
    from platform_etl_literature_spark.operators import sketch as SK

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, ["v"])
    b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 4, ["v"])
    both = a.unionByName(b)
    # counter addition is exact: merged grids == direct build cells
    merged = {
        (r["r"], r["p"]): r["cnt"]
        for r in SK.cms_merge(
            SK.cms_build(a, "v", w=16, d=2), SK.cms_build(b, "v", w=16, d=2)
        ).collect()
    }
    direct = {
        (r["r"], r["p"]): r["cnt"]
        for r in SK.cms_build(both, "v", w=16, d=2).collect()
    }
    assert merged == direct
    # one-sided: est >= true everywhere; exact at collision-free width
    true = {"x": 6, "y": 2, "z": 4}
    for w, exact in ((4, False), (4096, True)):
        est = {
            r["v"]: r["est_count"]
            for r in SK.cms_topk(both, "v", w=w, d=2, k=10).collect()
        }
        for v, t in true.items():
            assert est[v] >= t
            if exact:
                assert est[v] == t
    with pytest.raises(ValueError):
        SK.cms_build(a, "v", w=0, d=2)


def test_weighted_sample_matches_python_reference(spark):
    # Exact replay of the Efraimidis-Spirakis keys in pure Python:
    # same md5 uniform, same micro-rounded ln(u)/w ranking.
    import hashlib
    import math

    rows = [(i, "g" if i < 8 else "h", float(1 + (i * 7) % 13)) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])

    def key(i, w):
        h = int(hashlib.md5(f"ws1:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967297.0
        return round(math.log(u) / w * 1000000.0)

    expected = {}
    for grp in ("g", "h"):
        members = sorted(
            (r for r in rows if r[1] == grp),
            key=lambda r: (-key(r[0], r[2]), r[0]),
        )[:3]
        expected[grp] = [r[0] for r in members]
    got = D.weighted_sample(df, "doc_id", "grp", "w", k=3)
    out = {}
    for r in got.collect():
        out.setdefault(r["grp"], []).append((r["sample_rank"], r["doc_id"]))
        assert r["es_key_micro"] == key(r["doc_id"], dict((x[0], x[2]) for x in rows)[r["doc_id"]])
    for grp in ("g", "h"):
        assert [d for _, d in sorted(out[grp])] == expected[grp]


def test_weighted_sample_excludes_nonpositive_and_validates_k(spark):
    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 0.0), (3, "g", -1.0), (4, "g", None)],
        ["doc_id", "grp", "w"],
    )
    got = D.weighted_sample(df, "doc_id", "grp", "w", k=10).collect()
    assert [r["doc_id"] for r in got] == [1]  # k > group size: all valid rows
    with pytest.raises(ValueError):
        D.weighted_sample(df, "doc_id", "grp", "w", k=0)


def test_mixture_sample_deterministic_and_rate_bounded(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(400)], ["doc_id", "lang"]
    )
    out = D.mixture_sample(df, "doc_id", "lang", {"en": 0}, default_bps=10000)
    rows = out.collect()
    # rate 0 drops every en row; unlisted lang falls back to default 100%
    assert all(r["lang"] == "xx" for r in rows)
    assert len(rows) == 200
    # deterministic: same rows on re-run
    again = D.mixture_sample(df, "doc_id", "lang", {"en": 0}, default_bps=10000)
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_vocab_coverage_prefix_property(spark):
    df = spark.createDataFrame(
        [("a a a a a a b b c",)], ["text"]
    )  # freqs: a=6 (2/3), b=2, c=1
    rows = {r["term"]: r for r in TS.vocab_coverage(df, "text", 0.9).collect()}
    assert rows["a"]["rnk"] == 1 and rows["a"]["in_vocab"] == 1
    # a covers 6/9=0.667 < 0.9 so b is needed; a+b cover 8/9=0.889 < 0.9
    # so c (the crossing token) is in too
    assert rows["b"]["in_vocab"] == 1
    assert rows["c"]["in_vocab"] == 1
    assert rows["c"]["cum_frac"] == 1.0
    # a 50%-coverage vocab keeps only the head token
    half = {r["term"]: r["in_vocab"] for r in TS.vocab_coverage(df, "text", 0.5).collect()}
    assert half == {"a": 1, "b": 0, "c": 0}


def test_privacy_redact_pseudonymize_generalize(spark):
    from platform_etl_literature_spark.operators import privacy as PV

    df = spark.createDataFrame(
        [(1, "User#004217", 1234.56), (2, "User#004218", -50.0)],
        ["id", "name", "bal"],
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            PV.redact_digits("name").alias("red"),
            PV.pseudonymize("name", "pep").alias("pseu"),
            PV.generalize_band("bal", 1000).alias("band"),
        ).collect()
    }
    assert out[1]["red"] == "User#******"
    assert out[1]["band"] == 1000
    assert out[2]["band"] == -1000  # floor, not truncation, below zero
    import hashlib

    assert out[1]["pseu"] == hashlib.sha256(b"pepUser#004217").hexdigest()
    # same identity -> same pseudonym (join-preserving)
    again = df.select(PV.pseudonymize("name", "pep").alias("p")).collect()
    assert again[0]["p"] == out[1]["pseu"]


def test_k_anonymity_audit_flags_small_classes(spark):
    from platform_etl_literature_spark.operators import privacy as PV

    rows = [(i, "a") for i in range(5)] + [(99, "b")]
    df = spark.createDataFrame(rows, ["id", "quasi"])
    out = {r["id"]: r for r in PV.k_anonymity_audit(df, ["quasi"], k=5).collect()}
    assert out[0]["n_in_class"] == 5 and out[0]["k_anon"] == 1
    assert out[99]["n_in_class"] == 1 and out[99]["k_anon"] == 0


def test_incremental_dedup_corpus_and_batch_internal(spark):
    corpus = spark.createDataFrame(
        [(1, "already seen text")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "already seen text"),  # dup of corpus -> dropped
            (11, "fresh text"),  # first holder -> kept
            (12, "fresh text"),  # batch-internal dup -> dropped
            (13, "other fresh"),  # kept
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"]
        for r in D.incremental_dedup(batch, corpus, "doc_id", "text").collect()
    )
    assert kept == [11, 13]


def test_incremental_dedup_prefix_key(spark):
    corpus = spark.createDataFrame([(1, "AAAA tail-one")], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(10, "AAAA tail-two"), (11, "BBBB tail-two")], ["doc_id", "text"]
    )
    kept = sorted(
        r["doc_id"]
        for r in D.incremental_dedup(
            batch, corpus, "doc_id", "text", prefix_chars=4
        ).collect()
    )
    # 10 collides with the corpus on the 4-char head despite a new tail
    assert kept == [11]


def test_chunk_tokens_overlap_and_partial_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "")], ["doc_id", "text"])
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in TS.chunk_tokens(df, "doc_id", "text", chunk_size=6, overlap=2).collect()
    )
    # stride 4: starts 1, 5 (len-overlap = 8); chunks overlap by 2 tokens
    assert rows[0] == (1, 0, "t0 t1 t2 t3 t4 t5", 6)
    assert rows[1] == (1, 1, "t4 t5 t6 t7 t8 t9", 6)
    # empty doc yields one empty chunk (training pads it away)
    assert rows[2] == (2, 0, "", 0)


def test_epoch_repeat_multiplicities(spark):
    df = spark.createDataFrame(
        [(i, "hi" if i % 2 == 0 else "lo") for i in range(500)], ["doc_id", "grp"]
    )
    out = TS.epoch_repeat(df, "doc_id", "grp", {"hi": 25000, "lo": 0})
    rows = out.collect()
    # lo weight 0 -> gone entirely
    assert all(r["grp"] == "hi" for r in rows)
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = max(per_doc.get(r["doc_id"], 0), r["copy"] + 1)
    # every hi doc gets 2 or 3 copies; expected multiplicity ~2.5
    assert set(per_doc.values()) <= {2, 3}
    mean = sum(per_doc.values()) / len(per_doc)
    assert 2.2 < mean < 2.8
    # deterministic across invocations
    again = TS.epoch_repeat(df, "doc_id", "grp", {"hi": 25000, "lo": 0})
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_simhash_blocking_invariant_enforced(spark):
    """Pigeonhole completeness requires max_hamming < n_blocks; the
    operator must refuse argument combinations that would silently
    drop pairs."""
    df = spark.createDataFrame([(1, 3), (2, 0)], ["id", "simhash"])
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_near_pairs(df, max_hamming=4, n_blocks=4)
    with pytest.raises(ValueError, match="divide 32"):
        D.simhash_near_pairs(df, max_hamming=2, n_blocks=5)


def test_hash_split_weight_validation(spark):
    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError, match="sum to 100"):
        D.hash_split(df, "doc_id", weights={"train": 90, "val": 5})


def test_chunk_tokens_stride_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="exceed overlap"):
        TS.chunk_tokens(df, "doc_id", "text", chunk_size=4, overlap=4)


def test_pair_generators_release_cached_state(spark):
    """Round-2 advice item, round-4 contract: candidate generation may
    persist its self-join intermediates (measured 2-4× faster than the
    round-3 eager-checkpoint variant, and clearCache-able, unlike
    checkpoint blocks), but every persisted plan must be tracked and
    released by release_cached() so long-lived sessions do not leak."""
    spark.catalog.clearCache()
    D.release_cached()
    docs = spark.createDataFrame(
        [(i, f"w{i} common text body shared tail") for i in range(20)],
        ["doc_id", "text"],
    )
    sigs = D.minhash_signatures(docs, "doc_id", "text", 2)
    D.minhash_candidate_pairs(sigs, min_matching=1).count()
    D.minhash_banded_pairs(D.minhash_signatures(docs, "doc_id", "text", 2)).count()
    D.simhash_near_pairs(D.simhash32(docs, "doc_id", "text")).count()
    D.ngram_jaccard_pairs(docs, "doc_id", "text", 2, 0.1).count()
    released = D.release_cached()
    assert released == 4, f"expected 4 tracked intermediates, got {released}"
    jvm_cache = spark._jsparkSession.sharedState().cacheManager()
    assert jvm_cache.isEmpty(), "release_cached left persisted plans behind"


def test_ewma_null_value_poisons_not_resets(spark):
    """ADVICE round 3: a NULL value mid-stream must propagate to the
    final EWMA (list_reduce contagion semantics), not silently reset
    the fold at the next non-null value."""
    from platform_etl_literature_spark.operators.timeseries import user_value_ewma

    rows = [
        (1, 1, 10.0), (1, 2, None), (1, 3, 99.0),   # null mid-stream
        (2, 1, 4.0), (2, 2, 8.0),                   # clean
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000))
    out = {r["user_id"]: r["ewma"] for r in user_value_ewma(ev).collect()}
    assert out[1] is None, "null value must poison the fold to the end"
    assert out[2] == round(0.2 * 8.0 + 0.8 * 4.0, 6)


def test_ewma_segmented_matches_flat_and_contagion(spark):
    """The two-level segment composition must agree with the flat fold
    (same recurrence re-associated — equal after 6-dp rounding on tame
    values) including NULL contagion across segment boundaries."""
    from platform_etl_literature_spark.operators.timeseries import (
        user_value_ewma,
        user_value_ewma_segmented,
    )

    day = 86_400
    rows = [
        # user 1: three days, null on day 2 poisons the rest
        (1, 1, 10.0, 0), (1, 2, 20.0, 1), (1, 3, None, day), (1, 4, 5.0, 2 * day),
        # user 2: two days clean
        (2, 1, 4.0, 0), (2, 2, 8.0, day), (2, 3, 6.0, day + 60),
        # user 3: single event
        (3, 1, 7.5, 5 * day),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, value double, sec long"
    ).withColumn("ts", F.timestamp_micros(F.col("sec") * 1_000_000))
    flat = {r["user_id"]: (r["n_events"], r["ewma"]) for r in user_value_ewma(ev).collect()}
    segd = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in user_value_ewma_segmented(ev).collect()
    }
    assert segd[1] == (4, None) and flat[1] == (4, None)
    assert segd[3] == flat[3] == (1, 7.5)
    assert segd[2][0] == flat[2][0] == 3
    assert abs(segd[2][1] - flat[2][1]) < 1e-9


def test_ewma_segmented_whale_user(spark):
    """One user with 10^6 events across ~700 days: the flat shape holds
    the whole history in a single task's array — the segmented shape
    folds ~700 bounded day summaries.  Results must still agree."""
    from platform_etl_literature_spark.operators.timeseries import (
        user_value_ewma,
        user_value_ewma_segmented,
    )

    n = 1_000_000
    ev = (
        spark.range(n)
        .select(
            F.lit(42).alias("user_id"),
            F.col("id").alias("event_id"),
            # deterministic value in [0, 100): no RNG in tests
            (F.pmod(F.col("id") * 37 + 11, F.lit(10_000)) / 100.0).alias("value"),
            F.timestamp_micros(F.col("id") * 60 * 1_000_000).alias("ts"),
        )
    )
    seg = user_value_ewma_segmented(ev).collect()
    assert len(seg) == 1 and seg[0]["n_events"] == n
    flat = user_value_ewma(ev).collect()
    assert abs(seg[0]["ewma"] - flat[0]["ewma"]) < 1e-6


def test_connected_components_chain_triangle_singleton(spark):
    from platform_etl_literature_spark.operators import components as CC

    # chain 1-2-3-4, triangle 10-11-12 (with redundant edge), pair 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        ["id_a", "id_b"],
    )
    comp = {r["id"]: r["component"] for r in CC.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    D.release_cached()


def test_connected_components_long_path_converges(spark):
    """A 64-node path is the worst case for naive propagation (needs
    O(n) rounds); star contraction must still converge quickly."""
    from platform_etl_literature_spark.operators import components as CC

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["id_a", "id_b"]
    )
    comp = CC.connected_components(edges).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == 65
    D.release_cached()


def test_dedup_survivors_keeps_min_per_cluster_and_singletons(spark):
    from platform_etl_literature_spark.operators import components as CC

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 9)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: (r["component"], r["is_survivor"])
        for r in CC.dedup_survivors(docs, pairs, "doc_id").collect()
    }
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        7: (7, True), 9: (9, True),
    }
    D.release_cached()


def test_window_dup_stats_fraction_and_short_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # windows(3): abc bcd cde def
            (2, "a b c d x y"),      # shares abc, bcd with doc 1
            (3, "p q r s"),          # unique windows
            (4, "t u"),              # too short: 0 windows
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: (r["n_windows"], r["n_dup_windows"], r["dup_fraction"])
        for r in D.window_dup_stats(docs, "doc_id", "text", window=3).collect()
    }
    assert out[1] == (4, 2, 0.5)
    assert out[2] == (4, 2, 0.5)
    assert out[3] == (2, 0, 0.0)
    assert out[4] == (0, 0, 0.0)


def test_embedding_lsh_pairs_subset_of_bruteforce_with_full_recall_on_dups(spark):
    """LSH pairs must be a subset of the brute-force pairs at the same
    threshold, and identical vectors (which share every bucket) must
    always be found."""
    rows = [(i, [float(i % 4 == j) for j in range(4)]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    brute = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_cosine_pairs(df, "vec_id", "embedding", 0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_cosine_pairs_lsh(
            df, "vec_id", "embedding", 0.9, n_tables=4, n_bits=2
        ).collect()
    }
    assert lsh <= brute
    # i and i+4 are identical unit vectors -> cosine 1, same buckets
    assert {(0, 4), (1, 5), (2, 6), (3, 7)} <= lsh
    D.release_cached()


def test_embedding_lsh_occupancy_accounts_for_candidate_volume(spark):
    """The occupancy row's invariants: every table sees every vector
    exactly once (n_vecs = corpus size), mean = n_vecs/n_buckets, and
    n_cand_pairs = sum over buckets of s·(s−1)/2 — cross-checked
    against a direct bucket replay."""
    rows = [(i, [float(i % 4 == j) for j in range(4)]) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    occ = D.embedding_lsh_occupancy(
        df, "vec_id", "embedding", n_tables=4, n_bits=2
    ).collect()
    assert len(occ) == 4
    from platform_etl_literature_spark.operators.similarity import (
        _bucket_rows,
    )

    raw = (
        _bucket_rows(df, "id", "vec_id", "embedding", 4, 2, None)
        .groupBy("tbl", "bucket")
        .count()
        .collect()
    )
    import collections

    per_tbl = collections.defaultdict(list)
    for r in raw:
        per_tbl[r["tbl"]].append(r["count"])
    for r in occ:
        sizes = per_tbl[r["tbl"]]
        assert r["n_vecs"] == 12 == sum(sizes)
        assert r["n_buckets"] == len(sizes)
        assert r["max_bucket"] == max(sizes)
        assert r["n_cand_pairs"] == sum(s * (s - 1) // 2 for s in sizes)
        assert abs(r["mean_bucket"] - round(12 / len(sizes), 6)) < 1e-9


def test_scrub_dup_passages_keeps_first_occurrence_only(spark):
    """C4-style passage scrub: first corpus-wide occurrence (by id, pos)
    of each passage survives, later ones — across docs AND within one
    doc — are removed; fully-duplicated docs survive as empty strings;
    zero-token docs ride through."""
    rows = [
        (1, "a b c d"),          # passages (w=2): "a b", "c d"
        (2, "c d a b x"),        # all dup except trailing "x"
        (3, "a b a b"),          # within-doc repeat: second "a b" dropped
        (4, ""),                 # zero tokens
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        r["id"]: (r["text_scrubbed"], r["n_passages"], r["n_kept"])
        for r in D.scrub_dup_passages(df, "doc_id", "text", window=2).collect()
    }
    assert out[1] == ("a b c d", 2, 2)
    assert out[2] == ("x", 3, 1)
    assert out[3] == ("", 2, 0)
    assert out[4] == ("", 0, 0)


def test_semantic_dedup_pairs_exactly_bruteforce_within_clusters(spark):
    """Cluster-bucketed semantic dedup must return EXACTLY the
    brute-force pairs whose two members are assigned to the same
    (nearest) frozen centroid — no extra pairs, none lost, and
    identical duplicates (same vector -> same cluster) always found."""
    import numpy as np

    # two well-separated 4-d centroids; vectors hug one or the other
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    rows = [
        (0, [1.0, 0.05, 0.0, 0.0]),
        (1, [1.0, 0.05, 0.0, 0.0]),   # dup of 0, cluster 0
        (2, [0.9, -0.1, 0.0, 0.0]),   # near 0/1, cluster 0
        (3, [0.0, 0.05, 0.0, 1.0]),
        (4, [0.0, 0.05, 0.0, 1.0]),   # dup of 3, cluster 1
        (5, [0.7, 0.0, 0.0, 0.72]),   # borderline — nearest cluster 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"])
        for r in D.semantic_dedup_pairs(
            df, "vec_id", "embedding", centroids, threshold=0.9
        ).collect()
    }
    # reference: numpy assignment + brute-force cosine within clusters
    C = np.array(centroids)
    assign = {
        i: int(np.argmin(((np.array(v) - C) ** 2).sum(axis=1)))
        for i, v in rows
    }
    want = set()
    for i, vi in rows:
        for j, vj in rows:
            if i < j and assign[i] == assign[j]:
                cos = float(
                    np.dot(vi, vj) / (np.linalg.norm(vi) * np.linalg.norm(vj))
                )
                if cos >= 0.9:
                    want.add((i, j))
    assert got == want
    assert {(0, 1), (3, 4)} <= got  # exact dups always recovered
    D.release_cached()


def test_dedup_clusters_membership_view(spark):
    from platform_etl_literature_spark.operators import components as CC

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 8)], ["id_a", "id_b"]
    )
    out = {
        r["component"]: (r["cluster_size"], r["member_ids"])
        for r in CC.dedup_clusters(pairs).collect()
    }
    assert out == {1: (3, [1, 2, 3]), 8: (2, [8, 9])}


def test_dedup_survivors_by_keeps_best_scored(spark):
    from platform_etl_literature_spark.operators import components as CC

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (7, 1.0)], ["doc_id", "quality"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: (r["component"], r["is_survivor"])
        for r in CC.dedup_survivors_by(docs, pairs, "doc_id", "quality").collect()
    }
    # cluster {1,2,3}: doc 2 has the best quality; singleton 7 survives
    assert out == {1: (1, False), 2: (1, True), 3: (1, False), 7: (7, True)}


def test_hot_bucket_cap_drops_viral_minhash_bucket(spark):
    """max_bucket_size must drop only the viral bucket's pairs; pairs
    from sane buckets survive."""
    rows = [(i, 0, 100) for i in range(1, 6)]   # viral: 5 members
    rows += [(1, 1, 200), (2, 1, 200)]          # sane: 2 members
    sigs = spark.createDataFrame(rows, ["id", "seed", "sig"])
    capped = {
        (r["id_a"], r["id_b"]): r["n_matching"]
        for r in D.minhash_candidate_pairs(
            sigs, min_matching=1, max_bucket_size=4
        ).collect()
    }
    assert capped == {(1, 2): 1}
    uncapped = D.minhash_candidate_pairs(sigs, min_matching=1).count()
    assert uncapped == 10  # C(5,2) from the viral bucket; (1,2) merges
    D.release_cached()


def test_capped_jaccard_is_exact_over_retained_shingles(spark):
    """Round-4 ADVICE fix: with max_bucket_size, per-doc sizes are
    recomputed over surviving shingles, so surviving pairs score their
    exact jaccard in the retained universe (1.0 for identical docs),
    not a biased-down ratio against pre-drop sizes."""
    docs = spark.createDataFrame(
        [
            (1, "x y a b"), (2, "x y a b"),      # identical
            (3, "x y q r"), (4, "x y s t"), (5, "x y u v"),
        ],
        ["doc_id", "text"],
    )
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", 2, 0.1, max_bucket_size=4
        ).collect()
    }
    # 'x y' (df=5) dropped; only the identical pair shares retained
    # grams, and its jaccard stays exactly 1.0 (2 shared / 2+2-2)
    assert capped == {(1, 2): 1.0}
    uncapped = D.ngram_jaccard_pairs(docs, "doc_id", "text", 2, 0.1).count()
    assert uncapped == 10  # every pair shares at least 'x y'
    D.release_cached()


def test_hot_bucket_cap_validates(spark):
    sigs = spark.createDataFrame([(1, 0, 1)], ["id", "seed", "sig"])
    with pytest.raises(ValueError, match="max_bucket_size"):
        D.minhash_candidate_pairs(sigs, max_bucket_size=1)


def test_window_dup_stats_cap_consistent_fraction(spark):
    """A capped-out hot window disappears from numerator AND
    denominator — fractions stay internally consistent."""
    hot = "h1 h2 h3"  # one shared 3-window across all docs
    docs = spark.createDataFrame(
        [
            (1, f"{hot} a b c"), (2, f"{hot} a b c"),
            (3, f"{hot} p q r"), (4, f"{hot} s t u"), (5, f"{hot} v w x"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: (r["n_windows"], r["n_dup_windows"])
        for r in D.window_dup_stats(
            docs, "doc_id", "text", window=3, max_bucket_size=4
        ).collect()
    }
    # doc 1 windows: [h1h2h3, h2h3a, h3ab, abc] -> hot dropped -> 3
    # retained; docs 1&2 share all 3 retained windows
    assert out[1] == (3, 3)
    assert out[2] == (3, 3)
    assert out[3] == (3, 0)


def test_connected_components_triangle_shrink_not_premature_fixpoint(spark):
    """A triangle's first round strictly SHRINKS the edge set (drops
    the redundant edge) without adding any: subset-only fixpoint
    detection would stop there; the exact check (no new edges AND no
    lost edges) must run one more round and still label correctly."""
    from platform_etl_literature_spark.operators import components as CC

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (5, 6), (6, 7), (5, 7)], ["id_a", "id_b"]
    )
    comp = {r["id"]: r["component"] for r in CC.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 5}


def test_bm25_scoring_ranks_and_filters(spark):
    """tf monotonicity, non-match exclusion, and the dl normalization:
    with one query term, a doc repeating it twice in the same length
    outranks a single mention; longer docs are penalized."""
    from platform_etl_literature_spark.operators import retrieval as RET

    docs = spark.createDataFrame(
        [
            (1, "cat cat dog"),
            (2, "cat dog bird"),
            (3, "cat dog bird fish mouse lion bear wolf"),
            (4, "dog bird fish"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["score"])
        for r in RET.bm25_scores(docs, "doc_id", "text", ["cat"]).collect()
    }
    assert set(out) == {1, 2, 3}  # doc 4 has no hit
    assert out[1][0] == 2 and out[2][0] == 1
    assert out[1][1] > out[2][1]  # higher tf wins at equal dl
    assert out[2][1] > out[3][1]  # same tf, longer doc penalized

    top = RET.bm25_topk(docs, "doc_id", "text", ["cat"], k=2).collect()
    assert [r["doc_id"] for r in top] == [1, 2]


def test_bm25_validates_terms(spark):
    from platform_etl_literature_spark.operators import retrieval as RET

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        RET.bm25_scores(docs, "doc_id", "text", [])
    with pytest.raises(ValueError):
        RET.bm25_scores(docs, "doc_id", "text", ["a", "a"])


def test_wav_decode_is_real(spark):
    """The audio path is a genuine RIFF/WAVE codec: a WAV built by hand
    with the stdlib writer decodes to the exact header fields and
    sample stats, and a corrupt payload fails loudly."""
    import io
    import math
    import wave

    ids = spark.createDataFrame([(7,)], ["doc_id"])
    media = MM.synth_wav_media(ids, "doc_id", n_frames=4, rate=8000)
    payload = bytes(media.collect()[0]["payload"])
    # independently parse with the stdlib reader
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()) == (1, 2, 8000, 4)

    row = MM.decode_wav_stats(media).collect()[0]
    samples = [((7 * 7919 + i * 104729) % 65536) - 32768 for i in range(4)]
    assert row["n_frames"] == 4 and row["sample_rate"] == 8000
    assert row["peak"] == max(abs(s) for s in samples)
    assert row["rms"] == round(math.sqrt(sum(s * s for s in samples) / 4), 6)

    bad = media.select("media_id", F.lit(b"not a wav").alias("payload"))
    with pytest.raises(Exception):
        MM.decode_wav_stats(bad).collect()


def test_bmp_roundtrip_real_codec_and_corrupt_payload(spark):
    """The BMP payload must be a genuine 24-bit bitmap: headers parse
    with stdlib struct, the bottom-up padded pixel rows decode to the
    exact test-pattern values (checked pixel-for-pixel against the
    integer formula, including the padding bytes), and corrupt or
    truncated payloads fail loudly."""
    import struct

    ids = spark.createDataFrame([(9,)], ["doc_id"])
    media = MM.synth_bmp_media(ids, "doc_id", width=10, height=7)
    payload = bytes(media.collect()[0]["payload"])
    magic, fsize, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
    assert magic == b"BM" and off == 54 and fsize == len(payload)
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    assert (w, h, bpp, comp) == (10, 7, 24, 0)
    stride = 32  # 10*3 padded to 4 bytes — padding genuinely present
    assert len(payload) == 54 + stride * 7
    # bottom row of the file is image row y=0; check pixel (x=3, y=0)
    x = 3
    bgr = payload[54 + stride * 6 + 3 * x : 54 + stride * 6 + 3 * x + 3]
    assert bgr[0] == (9 * 31 + 0 * 17 + x * 7) % 256  # B
    assert bgr[1] == (9 * 37 + 0 * 13 + x * 11) % 256  # G
    assert bgr[2] == (9 * 41 + 0 * 19 + x * 5) % 256  # R

    row = MM.decode_bmp_stats(media).collect()[0]
    rs = [(9 * 41 + y * 19 + x * 5) % 256 for y in range(7) for x in range(10)]
    assert row["n_pixels"] == 70 and row["width"] == 10
    assert row["mean_r"] == round(sum(rs) / 70, 6)

    for bad_bytes in (b"not a bmp at all, but long enough " * 2, payload[:60]):
        bad = media.select("media_id", F.lit(bad_bytes).alias("payload"))
        with pytest.raises(Exception):
            MM.decode_bmp_stats(bad).collect()


def test_bmp_synth_vectorized_bytes_identical(spark):
    """The batch-vectorized BMP writer must emit byte-identical
    payloads to the per-media formulation it replaced."""
    import struct

    import numpy as np

    width, height = 10, 7
    stride = (width * 3 + 3) // 4 * 4
    img_size = stride * height

    def ref_payload(media_id: int) -> bytes:
        r, g, b = MM._bmp_pixels(media_id, width, height)
        rows = np.zeros((height, stride), dtype=np.uint8)
        px = (
            np.stack([b, g, r], axis=-1).astype(np.uint8).reshape(height, width * 3)
        )
        rows[:, : width * 3] = px[::-1]
        header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 0, 0, 0, 0
        )
        return header + info + rows.tobytes()

    ids = spark.createDataFrame([(0,), (11,), (255,)], ["doc_id"])
    got = {
        r["media_id"]: bytes(r["payload"])
        for r in MM.synth_bmp_media(ids, "doc_id").collect()
    }
    for mid in (0, 11, 255):
        assert got[mid] == ref_payload(mid), f"payload drift for media {mid}"


def test_avi_synth_vectorized_bytes_identical(spark):
    """The round-10 batch-vectorized AVI writer (constant RIFF template
    + whole-batch pixel fill) must emit byte-identical payloads to the
    straightforward per-(media, frame) formulation it replaced."""
    import struct

    import numpy as np

    width, height, n_frames, fps = 10, 7, 9, 4
    stride = (width * 3 + 3) // 4 * 4
    fsize = stride * height

    def ref_payload(media_id: int) -> bytes:
        # the pre-vectorization writer, kept verbatim as the reference
        def frame_dib(m: int, f: int) -> bytes:
            r, g, b = MM._avi_pixels(m, f, width, height)
            px = (
                np.stack([b, g, r], axis=-1)
                .astype(np.uint8)
                .reshape(height, width * 3)
            )
            rows = np.zeros((height, stride), dtype=np.uint8)
            rows[:, : width * 3] = px[::-1]
            return rows.tobytes()

        avih = struct.pack(
            "<14I", 1_000_000 // fps, fsize * fps, 0, 0x10, n_frames,
            0, 1, fsize, width, height, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIiI4h", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps,
            0, n_frames, fsize, -1, 0, 0, 0, width, height,
        )
        strf = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fsize, 0, 0, 0, 0
        )
        hdrl = MM._riff_list(
            b"hdrl",
            MM._riff_chunk(b"avih", avih)
            + MM._riff_list(
                b"strl",
                MM._riff_chunk(b"strh", strh) + MM._riff_chunk(b"strf", strf),
            ),
        )
        frames = [frame_dib(media_id, f) for f in range(n_frames)]
        movi = MM._riff_list(
            b"movi", b"".join(MM._riff_chunk(b"00db", fb) for fb in frames)
        )
        idx_entries, off = [], 4
        for fb in frames:
            idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(fb)))
            off += 8 + len(fb) + (len(fb) % 2)
        idx1 = MM._riff_chunk(b"idx1", b"".join(idx_entries))
        body = b"AVI " + hdrl + movi + idx1
        return b"RIFF" + struct.pack("<I", len(body)) + body

    ids = spark.createDataFrame([(0,), (7,), (123,)], ["doc_id"])
    got = {
        r["media_id"]: bytes(r["payload"])
        for r in MM.synth_avi_media(ids, "doc_id").collect()
    }
    for mid in (0, 7, 123):
        assert got[mid] == ref_payload(mid), f"payload drift for media {mid}"


def test_avi_roundtrip_real_codec_and_corrupt_payload(spark):
    """The video payload must be a genuine RIFF/AVI container: the
    chunk tree parses with stdlib struct (RIFF size, avih frame count,
    strf geometry, word-aligned movi '00db' chunks, idx1 index), the
    sampled DIB frames decode to the exact test-pattern values, and
    corrupt / truncated / frame-count-mismatched payloads fail
    loudly."""
    import struct

    ids = spark.createDataFrame([(9,)], ["doc_id"])
    media = MM.synth_avi_media(ids, "doc_id", width=10, height=7, n_frames=9)
    payload = bytes(media.collect()[0]["payload"])
    magic, total, ftype = struct.unpack_from("<4sI4s", payload, 0)
    assert magic == b"RIFF" and ftype == b"AVI " and total == len(payload) - 8
    # walk top-level chunks: LIST hdrl, LIST movi, idx1
    kinds = []
    pos = 12
    while pos + 8 <= len(payload):
        fourcc, size = struct.unpack_from("<4sI", payload, pos)
        kinds.append(
            payload[pos + 8 : pos + 12] if fourcc == b"LIST" else fourcc
        )
        pos += 8 + size + (size % 2)
    assert kinds == [b"hdrl", b"movi", b"idx1"]

    rows = {r["frame_idx"]: r for r in MM.decode_avi_frame_stats(media, every=4).collect()}
    assert sorted(rows) == [0, 4, 8]
    # frame 4, checked against the integer formula
    rs = [
        (9 * 41 + 4 * 23 + y * 19 + x * 5) % 256
        for y in range(7)
        for x in range(10)
    ]
    assert rows[4]["n_pixels"] == 70 and rows[4]["width"] == 10
    assert rows[4]["mean_r"] == round(sum(rs) / 70, 6)

    # corrupt: not RIFF; truncated; avih/movi frame-count mismatch
    truncated = payload[: len(payload) // 2]
    mismatched = bytearray(payload)
    # dwTotalFrames lives 16 bytes into avih data; avih data starts at
    # 12 (RIFF hdr) + 12 (LIST hdr+type) + 8 (avih chunk hdr) = 32
    assert payload[24:28] == b"avih"
    struct.pack_into("<I", mismatched, 32 + 16, 99)
    for bad_bytes in (b"not an avi, but long enough " * 4, truncated, bytes(mismatched)):
        bad = media.select("media_id", F.lit(bad_bytes).alias("payload"))
        with pytest.raises(Exception):
            MM.decode_avi_frame_stats(bad).collect()


def test_avi_decode_corrupt_media_policies(spark):
    """The on_error policy a 100 TB crawl needs: a mixed batch of good
    and corrupt AVI payloads must (skip) drop only the bad media, and
    (flag) emit exactly one frame_idx=-1 quarantine row per bad media
    with NULL stats — while the good media's decoded frames are
    identical under every policy."""
    ids = spark.createDataFrame([(3,), (5,)], ["doc_id"])
    media = MM.synth_avi_media(ids, "doc_id", n_frames=9)
    # corrupt media 5's payload, keep 3's intact
    mixed = media.select(
        "media_id",
        F.when(F.col("media_id") == 5, F.lit(b"garbage payload"))
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    with pytest.raises(Exception):
        MM.decode_avi_frame_stats(mixed).collect()

    skipped = MM.decode_avi_frame_stats(mixed, on_error="skip").collect()
    assert {r["media_id"] for r in skipped} == {3}
    assert sorted(r["frame_idx"] for r in skipped) == [0, 4, 8]

    flagged = MM.decode_avi_frame_stats(mixed, on_error="flag").collect()
    bad = [r for r in flagged if r["media_id"] == 5]
    assert len(bad) == 1 and bad[0]["frame_idx"] == -1
    assert bad[0]["n_pixels"] is None and bad[0]["mean_r"] is None
    good_rows = {
        (r["media_id"], r["frame_idx"]): (r["n_pixels"], r["xy_luma_sum"])
        for r in flagged
        if r["media_id"] == 3
    }
    clean_rows = {
        (r["media_id"], r["frame_idx"]): (r["n_pixels"], r["xy_luma_sum"])
        for r in MM.decode_avi_frame_stats(media).collect()
        if r["media_id"] == 3
    }
    assert good_rows == clean_rows

    with pytest.raises(ValueError):
        MM.decode_avi_frame_stats(media, on_error="quarantine")


def test_zorder_interleave_matches_python_reference(spark):
    """z-values must equal a pure-Python Morton interleave of the same
    integer bins (4-bit, 2 columns)."""
    from platform_etl_literature_spark.operators.layout import zorder_bins

    rows = [(i, (i * 7) % 13, (i * 11) % 17) for i in range(40)]
    df = spark.createDataFrame(rows, ["rid", "a", "b"])
    got = {
        r["rid"]: (r["_bin_a"], r["_bin_b"], r["_z"])
        for r in zorder_bins(df, ["a", "b"], bits=4).collect()
    }

    amin, amax = min(r[1] for r in rows), max(r[1] for r in rows)
    bmin, bmax = min(r[2] for r in rows), max(r[2] for r in rows)

    def interleave(bp, bs):
        z = 0
        for bit in range(4):
            z |= ((bp >> bit) & 1) << (2 * bit + 1)
            z |= ((bs >> bit) & 1) << (2 * bit)
        return z

    for rid, a, b in rows:
        bp = (a - amin) * 16 // (amax - amin + 1)
        bs = (b - bmin) * 16 // (bmax - bmin + 1)
        assert got[rid] == (bp, bs, interleave(bp, bs)), rid


def test_key_skew_stats_flags_hot_key(spark):
    from platform_etl_literature_spark.operators.skew import key_skew_stats

    rows = [(1, i) for i in range(90)] + [(k, 0) for k in range(2, 12)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = key_skew_stats(df, ["k"], n_salts_target=8).collect()[0]
    assert r["n_keys"] == 11 and r["n_rows"] == 100
    assert r["max_key_rows"] == 90 and r["hot_share"] == 0.9
    assert r["suggested_salts"] == 8  # capped (true ratio ~9.9)


def test_table_profile_nulls_and_distincts(spark):
    from platform_etl_literature_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (3, "b")], ["k", "s"]
    )
    got = {r["col_name"]: r for r in table_profile(df, ["k", "s"]).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_nulls"] == 0
    assert got["k"]["n_distinct"] == 3
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("1", "3")
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
    with pytest.raises(ValueError):
        table_profile(df, [])


def test_upsert_and_snapshot_diff(spark):
    from platform_etl_literature_spark.operators.merge import snapshot_diff, upsert

    base = spark.createDataFrame(
        [(1, "a", "s"), (2, "b", "s"), (3, "c", "s")], ["k", "v", "src"]
    )
    updates = spark.createDataFrame(
        [(2, "B", "s"), (4, "d", "s")], ["k", "v", "src"]
    )
    merged = {r["k"]: r["v"] for r in upsert(base, updates, ["k"]).collect()}
    assert merged == {1: "a", 2: "B", 3: "c", 4: "d"}

    new = spark.createDataFrame(
        [(1, "a", "s"), (2, "B", "s"), (4, "d", "s")], ["k", "v", "src"]
    )
    diff = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(base, new, ["k"], ["v", "src"]).collect()
    }
    assert diff == {1: "unchanged", 2: "changed", 3: "deleted", 4: "inserted"}


def test_snapshot_diff_null_encoding_not_aliased(spark):
    """(NULL, 'x') and ('x', NULL) must NOT collide in the row digest
    (concat_ws silently drops nulls; the encoding guards it)."""
    from platform_etl_literature_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "k long, a string, b string")
    diff = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    assert diff[0]["change_type"] == "changed"


def test_mixture_weights_temperature_flattening(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else ("mid" if i < 99 else "small")) for i in range(100)],
        ["id", "src"],
    )
    w = {r["src"]: (r["n"], r["weight_bps"]) for r in
         D.mixture_weights(df, "src", alpha=0.5).collect()}
    assert w["small"] == (1, 10000)          # smallest group keeps all
    assert w["mid"][1] == int(10000 * (9 ** -0.5))
    assert w["big"][1] == int(10000 * (90 ** -0.5))
    assert w["big"][1] < w["mid"][1] < 10000  # monotone downsampling


def test_cluster_split_no_pair_straddles_and_covers_all(spark):
    """The leakage invariant: every near-dup pair lands in ONE split;
    singletons keep the row-hash assignment they'd get from hash_split
    on their own id (stability under corpus growth)."""
    from platform_etl_literature_spark.operators import components as CC
    from platform_etl_literature_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (10, 17)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: (r["component"], r["split"])
        for r in CC.cluster_split(docs, pairs, "doc_id").collect()
    }
    assert set(out) == set(range(20))
    for u, v in [(1, 2), (2, 3), (1, 3), (5, 6), (10, 17)]:
        assert out[u][1] == out[v][1], (u, v)
    # singleton parity with plain hash_split on the id
    singles = spark.createDataFrame(
        [(i,) for i in (0, 4, 7, 19)], ["component"]
    )
    expected = {
        r["component"]: r["split"]
        for r in D.hash_split(singles, "component").collect()
    }
    for i in (0, 4, 7, 19):
        assert out[i] == (i, expected[i])
    D.release_cached()


def test_winnow_and_lm_degenerate_documents(spark):
    """Short-document conventions: < k tokens -> no fingerprints /
    no bigrams (row absent); < window grams -> exactly one fingerprint;
    empty text contributes nothing anywhere."""
    from platform_etl_literature_spark.operators import dedup as D
    from platform_etl_literature_spark.operators import lm as LM

    docs = spark.createDataFrame(
        [
            (1, ""),                 # no tokens
            (2, "a"),                # 1 token: no 3-gram, no bigram
            (3, "a b c"),            # 1 gram -> 1 fingerprint; 2 bigrams
            (4, "a b c d e"),        # 3 grams < window=4 -> 1 fingerprint
            (5, "a b c d e f g h"),  # 6 grams -> sliding windows
        ],
        ["doc_id", "text"],
    )
    fps = (
        D.winnow_fingerprints(docs, "doc_id", "text", k=3, window=4)
        .groupBy("id")
        .count()
        .collect()
    )
    by_id = {r["id"]: r["count"] for r in fps}
    assert 1 not in by_id and 2 not in by_id
    assert by_id[3] == 1 and by_id[4] == 1 and by_id[5] >= 1

    lm = {
        r["id"]: r["n_bigrams"]
        for r in LM.lm_doc_logprob(docs, "doc_id", "text").collect()
    }
    assert 1 not in lm and 2 not in lm
    assert lm[3] == 2 and lm[4] == 4 and lm[5] == 7
    D.release_cached()


def test_length_bucketed_batches_counts_and_waste(spark):
    """Every document lands in exactly one batch; no batch exceeds
    batch_size; uniform-length batches have zero padding waste."""
    from platform_etl_literature_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 if i < 40 else 70))) for i in range(60)],
        ["doc_id", "text"],
    )
    out = TS.length_bucketed_batches(
        docs, "doc_id", "text", bucket_width=32, batch_size=8, n_shards=2
    ).collect()
    assert sum(r["n_docs"] for r in out) == 60
    assert all(r["n_docs"] <= 8 for r in out)
    # all docs in a bucket share one length here -> padding-free
    assert all(r["waste_frac"] == 0.0 for r in out)
    assert {r["bucket"] for r in out} == {0, 2}


def test_hll_rollup_merge_equals_direct(spark):
    """The mergeable-sketch contract: unioning per-fine-key sketches
    gives the SAME estimate as sketching the coarse grain directly
    (lossless re-aggregation, fixed lgK), and estimates match exact
    counts in the sketch's exact (sparse) regime."""
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators import sketch as SK

    rows = [
        (f"u{i % 97}", f"s{i % 3}", f"d{i % 5}") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, ["user", "source", "day"])
    fine = SK.distinct_sketches(df, ["source", "day"], "user")
    merged = {
        r["source"]: (r["n_rows"], r["n_distinct_est"])
        for r in SK.rollup_sketches(fine, ["source"]).collect()
    }
    direct = {
        r["source"]: (r["n_rows"], r["n_distinct_est"])
        for r in SK.rollup_sketches(
            SK.distinct_sketches(df, ["source"], "user"), ["source"]
        ).collect()
    }
    assert merged == direct
    exact = {
        r["source"]: r["n"]
        for r in df.groupBy("source")
        .agg(F.countDistinct("user").alias("n"))
        .collect()
    }
    for s, (n_rows, est) in merged.items():
        assert est == exact[s], (s, est, exact[s])
    assert sum(n for n, _ in merged.values()) == 2000


def test_prefix_jaccard_edges_and_brute_force_equality(spark):
    """Prefix-filter completeness on a handcrafted corpus: identical
    sets (j=1.0), subset overlap, disjoint sets, single-token docs —
    the output equals the brute-force all-pairs result, including at
    threshold=1.0 where the prefix shrinks to a single token."""
    from platform_etl_literature_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "d c b a"),       # same set as 1, different order
            (3, "a b c x"),       # 3/5 with 1
            (4, "p q r s"),       # disjoint
            (5, "a"),             # single token
            (6, "a"),             # identical single token
        ],
        ["doc_id", "text"],
    )

    def brute(th):
        sets = {1: set("abcd"), 2: set("abcd"), 3: set("abcx"),
                4: set("pqrs"), 5: {"a"}, 6: {"a"}}
        out = set()
        for x in sets:
            for y in sets:
                if x < y:
                    j = len(sets[x] & sets[y]) / len(sets[x] | sets[y])
                    if round(j, 6) >= th:
                        out.add((x, y, round(j, 6)))
        return out

    for th in (1.0, 0.6, 0.2):
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in D.prefix_jaccard_pairs(
                docs, "doc_id", "text", threshold=th
            ).collect()
        }
        assert got == brute(th), th
        D.release_cached()


def test_quality_logreg_orders_prose_above_degenerate_text(spark):
    """The frozen quality classifier must rank natural-ish prose above
    degenerate inputs (single repeated token, pure digits), and emit
    a deterministic (z, prob, keep) row per document."""
    from platform_etl_literature_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog and runs off"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, "111 111 111 111 111 111 111 111"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in TS.quality_logreg(docs, "doc_id", "text").collect()
    }
    assert rows[1]["prob"] > rows[2]["prob"]
    assert rows[1]["prob"] > rows[3]["prob"]
    assert rows[1]["keep"] == 1
    assert rows[2]["keep"] == 0 and rows[3]["keep"] == 0
    assert rows[4]["n_tokens"] == 0 and rows[4]["prob"] is not None
    # determinism: identical rerun, identical values
    again = {
        r["doc_id"]: r["prob"]
        for r in TS.quality_logreg(docs, "doc_id", "text").collect()
    }
    assert again == {i: rows[i]["prob"] for i in rows}


def test_cdc_chunks_python_reference_and_edit_resilience(spark):
    """CDC chunking vs a literal python transcription (same md5 gear
    hash, window, divisor), plus THE content-defined property: after
    inserting a token near the front of a long document, the chunk
    digests re-synchronize — all but the edited neighborhood's chunks
    are shared with the original, where fixed-size chunking would
    shift every later chunk."""
    import hashlib
    import random as _r

    from platform_etl_literature_spark.operators import dedup as D

    def th(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def py_chunks(toks, window=3, divisor=8):
        n = len(toks)
        bpos = (
            []
            if n < window
            else [
                i
                for i in range(window, n + 1)
                if th(" ".join(toks[i - window : i])) % divisor == 0
            ]
        )
        bounds = sorted(set([0] + bpos + [n]))
        out = []
        for j in range(len(bounds) - 1):
            seg = toks[bounds[j] : bounds[j + 1]]
            out.append(
                (
                    j,
                    bounds[j] + 1,
                    len(seg),
                    hashlib.md5(" ".join(seg).encode()).hexdigest(),
                )
            )
        return out

    rng = _r.Random(99)
    vocab = [f"t{i}" for i in range(30)]
    base = [rng.choice(vocab) for _ in range(120)]
    docs = [
        (1, " ".join(base)),
        (2, " ".join(base[:5] + ["INSERTED"] + base[5:])),
        (3, "a b"),  # shorter than window -> single chunk
        (4, ""),     # empty -> dropped
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got: dict = {}
    for r in D.cdc_chunks(sdf, "doc_id", "text").collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["start"], r["n_tokens"], r["digest"])
        )
    for i in got:
        got[i].sort()
    toks_of = {i: [t for t in s.split(" ") if t] for i, s in docs}
    assert 4 not in got
    for i in (1, 2, 3):
        assert got[i] == py_chunks(toks_of[i]), i

    # edit resilience: the doc-2 digest multiset re-syncs with doc 1
    d1 = {d for *_, d in got[1]}
    d2 = {d for *_, d in got[2]}
    shared = d1 & d2
    assert len(shared) >= len(d1) - 3, (len(shared), len(d1))
    # while FIXED-size chunking shares (at most) the chunks before the
    # insertion point — digests after it all shift
    def fixed(toks, size=8):
        return [
            hashlib.md5(" ".join(toks[i : i + size]).encode()).hexdigest()
            for i in range(0, len(toks), size)
        ]
    f1, f2 = set(fixed(toks_of[1])), set(fixed(toks_of[2]))
    assert len(f1 & f2) <= 1


def test_sorted_neighborhood_pairs_edges(spark):
    """SNM blocking vs a literal python slide: duplicate keys (tie-broken
    by id), window at the tail, window=2 minimum, and the exact
    (window-1)·n − tail candidate count."""
    from platform_etl_literature_spark.operators import dedup as D
    from platform_etl_literature_spark.operators import ranking as R

    rows = [
        (1, "bb"), (2, "aa"), (3, "aa"), (4, "cc"), (5, "ab"), (6, "ba")
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # python reference: sort by (key, id), pair each with next w-1
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]

    for w in (2, 4):
        want = {
            (order[i], order[j], j - i)
            for i in range(len(order))
            for j in range(i + 1, min(i + w, len(order)))
        }
        got = {
            (r["id_a"], r["id_b"], r["gap"])
            for r in D.sorted_neighborhood_pairs(
                df, "doc_id", F.col("text"), window=w
            ).collect()
        }
        assert got == want, w
        n = len(order)
        assert len(got) == (w - 1) * n - sum(range(1, w))
        R.release_cached()

    with pytest.raises(ValueError):
        D.sorted_neighborhood_pairs(df, "doc_id", F.col("text"), window=1)


def test_prefix_jaccard_random_losslessness_with_all_filters(spark):
    """Randomized completeness proof for the compounded prefix + length
    + positional filters: a skewed-df corpus (Zipf-ish word choice, so
    rare-first prefixes, size ratios, and position bounds all genuinely
    engage) must reproduce the brute-force all-pairs answer exactly at
    several thresholds."""
    import random as _r

    from platform_etl_literature_spark.operators import dedup as D

    rng = _r.Random(20260814)
    vocab = [f"w{i}" for i in range(40)]
    docs, sets = [], {}
    for i in range(45):
        n = rng.randint(1, 12)
        # Zipf-ish: low-index words are far more common
        ws = {vocab[min(int(rng.expovariate(0.12)), 39)] for _ in range(n)}
        docs.append((i, " ".join(sorted(ws))))
        sets[i] = ws
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])

    for th in (0.85, 0.5, 0.3):
        want = set()
        for x in sets:
            for y in sets:
                if x < y and (sets[x] or sets[y]):
                    j = len(sets[x] & sets[y]) / len(sets[x] | sets[y])
                    if round(j, 6) >= th:
                        want.add((x, y, round(j, 6)))
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in D.prefix_jaccard_pairs(
                sdf, "doc_id", "text", threshold=th
            ).collect()
        }
        assert got == want, th
        D.release_cached()


def test_prefix_jaccard_stats_consistent_with_pairs(spark):
    """The accountability row's counts must satisfy the filter-chain
    invariants on the same corpus: n_prefix_pairs >= n_after_positional
    >= n_verified, and n_verified equals the pairs operator's output
    row count (the positional prune is lossless)."""
    import random as _r

    from platform_etl_literature_spark.operators import dedup as D

    rng = _r.Random(20260816)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = rng.randint(1, 10)
        ws = {vocab[min(int(rng.expovariate(0.15)), 29)] for _ in range(n)}
        docs.append((i, " ".join(sorted(ws))))
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    th = 0.5
    [st] = D.prefix_jaccard_stats(sdf, "doc_id", "text", threshold=th).collect()
    n_pairs = D.prefix_jaccard_pairs(sdf, "doc_id", "text", threshold=th).count()
    assert st["n_prefix_pairs"] >= st["n_after_positional"] >= st["n_verified"]
    assert st["n_verified"] == n_pairs
    D.release_cached()


def test_prefix_jaccard_best_match_collapses_cliques(spark):
    """The collapsed emission mode (VERDICT r9 item 7): a duplicate
    clique of c documents emits c rows (each with its best partner
    and its duplication degree c−1), not c·(c−1)/2 pairs; ties on
    jaccard break to the SMALLEST partner id; values agree with the
    all-pairs operator collapsed by hand."""
    from platform_etl_literature_spark.operators import dedup as D

    # clique of 4 identical docs + an unrelated singleton
    docs = [(i, "alpha beta gamma delta") for i in range(4)]
    docs.append((9, "zeta eta theta iota"))
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in D.prefix_jaccard_best_match(
            sdf, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for i in range(4):
        assert out[i]["n_pairs"] == 3
        assert out[i]["jaccard"] == 1.0
        assert out[i]["best_id"] == (0 if i != 0 else 1)
    # hand-collapsed all-pairs agreement on a mixed corpus
    import random as _r

    rng = _r.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    mixed = [
        (i, " ".join(sorted({rng.choice(vocab) for _ in range(6)})))
        for i in range(30)
    ]
    mdf = spark.createDataFrame(mixed, ["doc_id", "text"])
    pairs = D.prefix_jaccard_pairs(
        mdf, "doc_id", "text", threshold=0.5
    ).collect()
    want: dict[int, tuple] = {}
    cnt: dict[int, int] = {}
    for p in pairs:
        for me, other in ((p["id_a"], p["id_b"]), (p["id_b"], p["id_a"])):
            cnt[me] = cnt.get(me, 0) + 1
            cur = want.get(me)
            if cur is None or (-p["jaccard"], other) < cur:
                want[me] = (-p["jaccard"], other)
    got = {
        r["id"]: r
        for r in D.prefix_jaccard_best_match(
            mdf, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert set(got) == set(want)
    for i, (nj, partner) in want.items():
        assert got[i]["best_id"] == partner
        assert got[i]["jaccard"] == -nj
        assert got[i]["n_pairs"] == cnt[i]
    D.release_cached()


def test_zorder_bins_rejects_non_integral_columns(spark):
    """ADVICE r4: the docstring promises integral-only input — a double
    column must raise, not silently truncate into engine-dependent
    bins."""
    from platform_etl_literature_spark.operators.layout import zorder_bins

    df = spark.createDataFrame([(1, 2.5)], "a long, b double")
    with pytest.raises(ValueError, match="integral"):
        zorder_bins(df, ["a", "b"])
    with pytest.raises(ValueError, match="no such column"):
        zorder_bins(df, ["missing"])


def test_scd2_close_open_unchanged_insert_and_immutability(spark):
    """SCD2 semantics on a crafted frame: changed key closes v1 + opens
    v2, unchanged key keeps its single open row, new key inserts, and a
    second apply never touches closed rows."""
    from platform_etl_literature_spark.operators.merge import (
        scd2_apply,
        scd2_init,
    )

    base = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    h1 = scd2_init(base, ["text"], version=1)
    upd2 = spark.createDataFrame(
        [(1, "ALPHA"), (2, "beta"), (3, "gamma")], ["doc_id", "text"]
    )
    h2 = scd2_apply(h1, upd2, ["doc_id"], ["text"], version=2)
    rows = {
        (r["doc_id"], r["valid_from"]): (r["text"], r["valid_to"])
        for r in h2.collect()
    }
    assert rows[(1, 1)] == ("alpha", 2)      # closed
    assert rows[(1, 2)] == ("ALPHA", None)   # opened
    assert rows[(2, 1)] == ("beta", None)    # unchanged: still open, no v2
    assert rows[(3, 2)] == ("gamma", None)   # inserted
    assert len(rows) == 4

    # second apply: key 1 changes again; closed (1,1) row is immutable
    h3 = scd2_apply(
        h2,
        spark.createDataFrame([(1, "alpha3")], ["doc_id", "text"]),
        ["doc_id"],
        ["text"],
        version=3,
    )
    rows3 = {
        (r["doc_id"], r["valid_from"]): (r["text"], r["valid_to"])
        for r in h3.collect()
    }
    assert rows3[(1, 1)] == ("alpha", 2)
    assert rows3[(1, 2)] == ("ALPHA", 3)
    assert rows3[(1, 3)] == ("alpha3", None)
    assert rows3[(2, 1)] == ("beta", None) and rows3[(3, 2)] == ("gamma", None)

    # time travel: every version reconstructs exactly the snapshot that
    # was current then (including versions BETWEEN two applies)
    from platform_etl_literature_spark.operators.merge import scd2_as_of

    def snap(v):
        return {
            (r["doc_id"], r["text"]) for r in scd2_as_of(h3, v).collect()
        }

    assert snap(1) == {(1, "alpha"), (2, "beta")}
    assert snap(2) == {(1, "ALPHA"), (2, "beta"), (3, "gamma")}
    assert snap(3) == {(1, "alpha3"), (2, "beta"), (3, "gamma")}
    assert snap(99) == snap(3)  # future reads see the current snapshot
    assert "valid_from" not in scd2_as_of(h3, 1).columns


def test_salted_join_equals_plain_join(spark):
    """salted_join must produce exactly the plain join's multiset, for
    inner and left joins, including unmatched-left rows and duplicate
    big-side rows."""
    from platform_etl_literature_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c"), (9, "z")], ["k", "v"]
    )
    small = spark.createDataFrame([(1, "X"), (2, "Y"), (3, "W")], ["k", "d"])

    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(big, small, ["k"], n_salts=4, how=how).collect())
        )
        want = sorted(map(tuple, big.join(small, ["k"], how).collect()))
        assert got == want, how

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="full")


def _lev(a: str, b: str) -> int:
    """Reference DP Levenshtein for the edjoin losslessness proof."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_join_random_losslessness(spark):
    """Deletion-neighborhood candidate generation must reproduce the
    brute-force all-pairs levenshtein answer exactly at d=1 and d=2 —
    over a random vocabulary dense enough that near-miss pairs
    (ed = d+1, which share a key but must be verified away) occur."""
    import random as _r

    from platform_etl_literature_spark.operators import edjoin as EJ

    rng = _r.Random(20260814)
    words = {"".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
             for _ in range(120)}
    vdf = spark.createDataFrame([(w,) for w in words], ["w"])

    for d in (1, 2):
        want = {
            (a, b, _lev(a, b))
            for a in words for b in words
            if a < b and _lev(a, b) <= d
        }
        got = {
            (r["w1"], r["w2"], r["ed"])
            for r in EJ.edit_distance_pairs(vdf, "w", d=d).collect()
        }
        assert got == want, d
        # the verify step genuinely engaged: some candidate key-sharing
        # pair must sit at ed > d (else the test proves nothing)
        near = [
            (a, b) for a in words for b in words
            if a < b and _lev(a, b) == d + 1
        ]
        assert near, "vocabulary too sparse for a meaningful proof"


def test_edit_join_edges_and_payload(spark):
    """Empty string (the sequence(1,0) Spark gotcha), single chars, and
    keep_cols payload carriage on both sides of the pair."""
    from platform_etl_literature_spark.operators import edjoin as EJ

    vdf = spark.createDataFrame(
        [("", 5), ("a", 7), ("ab", 3), ("xy", 1)], ["w", "c"]
    )
    got = {
        tuple(r)
        for r in EJ.edit_distance_pairs(vdf, "w", d=1, keep_cols=["c"])
        .select("w1", "w2", "ed", "c1", "c2")
        .collect()
    }
    assert got == {
        ("", "a", 1, 5, 7),
        ("a", "ab", 1, 7, 3),
    }

    with pytest.raises(ValueError, match=">= 0"):
        EJ.edit_distance_pairs(vdf, "w", d=-1)


def test_edit_join_plan_no_cartesian(spark):
    """Candidate generation must stay an equijoin on deletion keys —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    from platform_etl_literature_spark.operators import edjoin as EJ

    vdf = spark.createDataFrame([("abc",), ("abd",), ("xyz",)], ["w"])
    plan = (
        EJ.edit_distance_pairs(vdf, "w", d=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouped_median_matches_statistics_median(spark):
    """Distinct-value rank-selection median == statistics.median on
    random duplicate-heavy groups, odd and even sizes, singletons."""
    import random as _r
    import statistics as _st

    from platform_etl_literature_spark.operators import robust as RB

    rng = _r.Random(42)
    rows, want = [], {}
    for gi, size in enumerate([1, 2, 3, 10, 11, 200]):
        vals = [float(rng.randint(0, 8)) for _ in range(size)]
        rows += [(f"g{gi}", v) for v in vals]
        want[f"g{gi}"] = float(_st.median(vals))
    rows.append(("gnull", None))
    rows.append(("gnull", 5.0))
    want["gnull"] = 5.0
    df = spark.createDataFrame(rows, "k string, v double")

    got = {
        r["k"]: r["med"]
        for r in RB.grouped_median(df, ["k"], "v").collect()
    }
    assert got == want


def test_robust_outliers_flags_and_mad_zero_guard(spark):
    """A planted far point is flagged with the textbook z; a group
    whose MAD is 0 (majority at one value) flags nothing."""
    from platform_etl_literature_spark.operators import robust as RB

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 100]]
    rows += [("z", 5.0)] * 6 + [("z", 999.0)]
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "event_id long, k string, v double",
    )
    out = RB.robust_outliers(
        df, ["k"], "v", cutoff=3.5, id_cols=["event_id"]
    ).collect()
    # group a: med 4.5, MAD 2.0, z(100) = .6745*95.5/2 = 32.21 -> flagged
    assert [(r["k"], r["v"], r["med"], r["mad"], r["z"]) for r in out] == [
        ("a", 100.0, 4.5, 2.0, round(0.6745 * 95.5 / 2.0, 6))
    ]


def test_dq_verify_report_values_and_failures(spark):
    """Dirty fixture: nulls, a duplicated key, an out-of-bound value,
    and an orphan foreign key — every check kind must compute the
    textbook metric and judge it."""
    from platform_etl_literature_spark.operators import quality_checks as QC

    df = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (2, 10, -1.0),     # dup fk 10, negative value
            (3, None, 2.0),    # null fk
            (3, 99, None),     # dup id 3, orphan fk 99, null value
        ],
        "id long, fk long, v double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "k long")

    rep = QC.verify(
        df,
        [
            {"check": "completeness", "column": "fk", "min_ratio": 1.0},
            {"check": "distinctness", "column": "id", "min_ratio": 1.0},
            {"check": "compliance", "name": "v_pos", "predicate": "v > 0",
             "min_ratio": 0.5},
            {"check": "min", "column": "v", "bound": 0.0},
            {"check": "max", "column": "v", "bound": 10.0},
            {"check": "uniqueness", "column": "id", "min_ratio": 1.0},
        ],
    ).unionByName(QC.referential_integrity(df, "fk", dim, "k"))

    got = {
        (r["check"], r["target"]): (r["metric"], r["threshold"], r["passed"])
        for r in rep.collect()
    }
    assert got == {
        ("completeness", "fk"): (0.75, 1.0, False),
        ("distinctness", "id"): (0.75, 1.0, False),
        ("compliance", "v_pos"): (0.5, 0.5, True),
        ("min", "v"): (-1.0, 0.0, False),
        ("max", "v"): (5.0, 10.0, True),
        ("uniqueness", "id"): (0.5, 1.0, False),
        ("referential", "fk"): (round(2 / 3, 6), 1.0, False),
    }

    with pytest.raises(ValueError, match="unknown check"):
        QC.verify(df, [{"check": "nope"}])
    with pytest.raises(ValueError, match="no checks"):
        QC.verify(df, [])


def test_triangle_stats_known_and_random_graphs(spark):
    """K4 (4 triangles, clustering 1.0), a triangle-free star, and a
    random graph checked against a brute-force python census."""
    import itertools as _it
    import random as _r

    from platform_etl_literature_spark.operators import graph as GR

    def stats(edge_list):
        df = spark.createDataFrame(edge_list, "u long, v long")
        [r] = GR.triangle_stats(df).collect()
        return r

    k4 = [(a, b) for a, b in _it.combinations(range(4), 2)]
    r = stats(k4)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["clustering"] == 1.0
    assert r["max_degree"] == 3 and r["n_wedges"] == 12

    star = [(0, i) for i in range(1, 6)]
    r = stats(star)
    assert r["n_triangles"] == 0 and r["clustering"] == 0.0

    rng = _r.Random(7)
    nodes = range(30)
    rand = [
        (a, b) for a, b in _it.combinations(nodes, 2) if rng.random() < 0.25
    ]
    adj = {n: set() for n in nodes}
    for a, b in rand:
        adj[a].add(b)
        adj[b].add(a)
    want = sum(
        1 for a, b, c in _it.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    r = stats(rand)
    assert r["n_triangles"] == want
    assert r["n_wedges"] == sum(
        len(s) * (len(s) - 1) // 2 for s in adj.values()
    )


def _k_core_ref(edge_list, k):
    """Python reference peel: returns {node: core_deg}."""
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    while True:
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        weak = {n for n, d in deg.items() if d < k}
        if not weak:
            return deg
        edges = {(u, v) for u, v in edges if u not in weak and v not in weak}


def test_k_core_known_and_random_graphs(spark):
    """K5 survives k=4 intact; a pendant path peels away entirely; a
    clique with a pendant tail keeps exactly the clique; random graphs
    match the python reference peel node-for-node."""
    import itertools as _it
    import random as _r

    from platform_etl_literature_spark.operators import graph as GR

    def core(edge_list, k):
        df = spark.createDataFrame(edge_list, "u long, v long")
        return {r["node"]: r["core_deg"] for r in GR.k_core(df, k).collect()}

    k5 = [(a, b) for a, b in _it.combinations(range(5), 2)]
    assert core(k5, 4) == {n: 4 for n in range(5)}

    # clique {0..4} + tail 4-10-11-12: the tail peels in MULTIPLE
    # rounds (12 first, then 11, then 10) — exercises iteration depth
    tail = k5 + [(4, 10), (10, 11), (11, 12)]
    assert core(tail, 2) == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    assert GR.last_peel_rounds >= 3

    # a path has no 2-core at all -> empty result
    path = [(i, i + 1) for i in range(6)]
    assert core(path, 2) == {}

    rng = _r.Random(11)
    for k in (2, 3):
        rand = [
            (a, b)
            for a, b in _it.combinations(range(40), 2)
            if rng.random() < 0.08
        ]
        assert core(rand, k) == _k_core_ref(rand, k)
        assert GR.last_peel_rounds <= 20  # the suite oracle's unroll bound

    # loop-scoped shuffle confs must restore on success AND on raise
    before = (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )
    with pytest.raises(ValueError, match=">= 1"):
        core(k5, 0)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        df = spark.createDataFrame(tail, "u long, v long")
        GR.k_core(df, 2, max_rounds=1)
    assert (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    ) == before


def _lpa_ref(edge_list, rounds):
    """Python reference synchronous LPA with min-label tie-break:
    returns {node: community} after `rounds` simultaneous updates."""
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            new[n] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lbl = new
    return lbl


def test_label_propagation_known_and_random_graphs(spark):
    """Two cliques joined by one bridge edge resolve to two
    communities labeled by each clique's min node; random graphs match
    the python reference label-for-label at several round counts
    (synchronous + min-tie is a pure function of (edges, rounds))."""
    import itertools as _it
    import random as _r

    from platform_etl_literature_spark.operators import graph as GR

    def lpa(edge_list, rounds):
        df = spark.createDataFrame(edge_list, "u long, v long")
        return {
            r["node"]: r["community"]
            for r in GR.label_propagation(df, rounds).collect()
        }

    # two K4s {0..3} and {10..13} bridged by 3-10: after 2+ rounds each
    # clique agrees on its min label; the bridge does not merge them
    c1 = [(a, b) for a, b in _it.combinations(range(4), 2)]
    c2 = [(a, b) for a, b in _it.combinations(range(10, 14), 2)]
    got = lpa(c1 + c2 + [(3, 10)], 3)
    assert got == _lpa_ref(c1 + c2 + [(3, 10)], 3)
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}

    rng = _r.Random(7)
    for rounds in (1, 2, 4):
        rand = [
            (a, b)
            for a, b in _it.combinations(range(40), 2)
            if rng.random() < 0.08
        ]
        assert lpa(rand, rounds) == _lpa_ref(rand, rounds)

    # loop-scoped shuffle confs must restore on success AND on raise
    before = (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )
    with pytest.raises(ValueError, match=">= 1"):
        lpa(c1, 0)
    assert (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    ) == before


def test_pair_edges_dedup_and_group_valve(spark):
    """Duplicate group memberships collapse; a group over the valve is
    excluded entirely (its exclusive pairs vanish, shared pairs survive
    via smaller groups)."""
    from platform_etl_literature_spark.operators import graph as GR

    rows = (
        [("g1", i) for i in (1, 2, 3)]
        + [("g1", 2)]                      # duplicate membership
        + [("g2", 2), ("g2", 3)]           # pair (2,3) also via g2
        + [("gBIG", i) for i in range(10)]  # over the valve
    )
    df = spark.createDataFrame(rows, "g string, i long")
    got = {
        (r["u"], r["v"])
        for r in GR.pair_edges(df, "g", "i", max_group=5).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3)}


def _pagerank_ref(arcs, n_iter=5, dp=85, scale=10**9):
    """Python replay of the exact-integer PageRank recurrence."""
    nodes = sorted({n for a in arcs for n in a})
    n = len(nodes)
    outdeg = {}
    for s, _ in arcs:
        outdeg[s] = outdeg.get(s, 0) + 1
    tp = ((100 - dp) * scale) // (100 * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0 for v in nodes}
        for s, d in arcs:
            contrib[d] += rank[s] // outdeg[s]
        dang = sum(rank[v] for v in nodes if v not in outdeg)
        rank = {
            v: tp + (dp * (contrib[v] + dang // n)) // 100 for v in nodes
        }
    return rank


def test_pagerank_matches_python_reference_with_dangling(spark):
    """Directed graph with a dangling sink and a hub: every rank_nano
    equals the python replay exactly, and the hub outranks leaves."""
    from platform_etl_literature_spark.operators import pagerank as PR

    arcs = [(1, 9), (2, 9), (3, 9), (9, 1), (4, 5)]  # 5 is dangling
    df = spark.createDataFrame(arcs, "src long, dst long")
    got = {r["node"]: r["rank_nano"] for r in PR.pagerank(df).collect()}
    assert got == _pagerank_ref(arcs)
    assert got[9] == max(got.values())

    with pytest.raises(ValueError, match="0..100"):
        PR.pagerank(df, damping_pct=101)


def test_pagerank_cycle_uniform_and_mass_conserved(spark):
    """A directed cycle is perfectly symmetric → all ranks equal; total
    mass stays within the documented floor-loss bound of 1.0."""
    from platform_etl_literature_spark.operators import pagerank as PR

    n, n_iter, scale = 7, 4, 10**9
    arcs = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(arcs, "src long, dst long")
    rows = PR.pagerank(df, n_iter=n_iter).collect()
    ranks = {r["node"]: r["rank_nano"] for r in rows}
    assert len(set(ranks.values())) == 1
    total = sum(ranks.values())
    assert total <= scale
    assert scale - total <= n_iter * (len(arcs) + n + 1) + n


def test_symmetrize_emits_both_arcs(spark):
    from platform_etl_literature_spark.operators import pagerank as PR

    df = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    got = sorted(map(tuple, PR.symmetrize(df).collect()))
    assert got == [(1, 2), (2, 1), (2, 3), (3, 2)]


def test_cms_join_size_one_sided_and_exact_when_roomy(spark):
    """Inner-product estimate >= the true equi-join size always; EXACT
    when the grid is wide enough that no two keys collide in any row;
    disjoint key sets estimate 0 when some cell pair is empty."""
    from platform_etl_literature_spark.operators import sketch as SK

    a = spark.createDataFrame(
        [(k,) for k in ["x", "x", "y", "z", "z", "z"]], "k string"
    )
    b = spark.createDataFrame(
        [(k,) for k in ["x", "y", "y", "w"]], "k string"
    )
    true_size = a.join(b, "k").count()  # 2*1 + 1*2 = 4

    for w, d in [(8192, 3), (4, 2)]:
        est = SK.cms_join_size(
            SK.cms_build(a, "k", w, d), SK.cms_build(b, "k", w, d), d
        ).first()["est_join_size"]
        assert est >= true_size, (w, d, est)
        if w == 8192:
            assert est == true_size

    disj = spark.createDataFrame([("p",), ("q",)], "k string")
    est0 = SK.cms_join_size(
        SK.cms_build(a, "k", 8192, 3), SK.cms_build(disj, "k", 8192, 3), 3
    ).first()["est_join_size"]
    assert est0 == 0


def test_kmv_merge_equals_direct_and_exact_below_k(spark):
    """Bottom-k of unioned bottom-k sets == the direct sketch of the
    union (EXACT mergeability, row for row); a group below k estimates
    its true distinct count exactly."""
    from platform_etl_literature_spark.operators import kmv as KMV

    rows = [(f"u{i % 37}", f"g{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "v string, part string")
    k = 16

    parts = [
        KMV.kmv_sketch(df.filter(F.col("part") == f"g{i}"), "v", k)
        for i in range(3)
    ]
    merged = sorted(
        (r["h"], r["pos"]) for r in KMV.kmv_merge(*parts, k=k).collect()
    )
    direct = sorted(
        (r["h"], r["pos"]) for r in KMV.kmv_sketch(df, "v", k).collect()
    )
    assert merged == direct and len(direct) == k

    small = df.filter(F.col("v").isin("u0", "u1", "u2"))
    [r] = KMV.kmv_estimate(KMV.kmv_sketch(small, "v", k), k).collect()
    assert (r["n_sampled"], r["est_distinct"]) == (3, 3)

    with pytest.raises(ValueError, match=">= 2"):
        KMV.kmv_sketch(df, "v", 1)


def test_kmv_estimate_accuracy_and_grouped(spark):
    """k=256 over 10k distinct values: the (k-1)/u_k estimate lands
    within 25% (≈ 4σ at 1/√k relative error); grouped sketches
    estimate per group independently."""
    from platform_etl_literature_spark.operators import kmv as KMV

    k = 256
    df = spark.createDataFrame(
        [(f"v{i}", "a" if i % 2 else "b") for i in range(10_000)],
        "v string, g string",
    )
    [r] = KMV.kmv_estimate(KMV.kmv_sketch(df, "v", k), k).collect()
    assert abs(r["est_distinct"] - 10_000) / 10_000 < 0.25

    got = {
        r["g"]: r["est_distinct"]
        for r in KMV.kmv_estimate(
            KMV.kmv_sketch(df, "v", k, key_cols=["g"]), k, ["g"]
        ).collect()
    }
    assert set(got) == {"a", "b"}
    for est in got.values():
        assert abs(est - 5_000) / 5_000 < 0.25


def test_kmv_intersect_exact_sides_and_disjoint(spark):
    """Both sides below k → theta is the sentinel and the intersection
    estimate is EXACT; disjoint sets estimate 0."""
    from platform_etl_literature_spark.operators import kmv as KMV

    k = 64
    a = spark.createDataFrame([(f"x{i}",) for i in range(30)], "v string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(20, 50)], "v string")
    sa, sb = KMV.kmv_sketch(a, "v", k), KMV.kmv_sketch(b, "v", k)
    [r] = KMV.kmv_intersect_estimate(sa, sb, k).collect()
    assert (r["n_common"], r["est_intersection"]) == (10, 10)

    c = spark.createDataFrame([(f"y{i}",) for i in range(10)], "v string")
    [r0] = KMV.kmv_intersect_estimate(
        sa, KMV.kmv_sketch(c, "v", k), k
    ).collect()
    assert (r0["n_common"], r0["est_intersection"]) == (0, 0)


# ---------------------------------------------------------------------------
# HDR log-linear quantile sketch
# ---------------------------------------------------------------------------


def test_hdr_merge_equals_direct(spark):
    """Bucket counters are exact, so merge(build(A), build(B)) must have
    cells IDENTICAL to build(A ∪ B) — the mergeability theorem."""
    from platform_etl_literature_spark.operators import sketch as SK

    a = spark.createDataFrame([(v,) for v in range(1, 500, 3)], "v long")
    b = spark.createDataFrame([(v,) for v in range(2, 800, 5)], "v long")
    merged = {
        r["b"]: r["cnt"]
        for r in SK.hdr_merge(
            SK.hdr_build(a, "v", m=8), SK.hdr_build(b, "v", m=8)
        ).collect()
    }
    direct = {
        r["b"]: r["cnt"]
        for r in SK.hdr_build(a.unionByName(b), "v", m=8).collect()
    }
    assert merged == direct


def test_hdr_quantile_error_bound(spark):
    """Every estimate must sit within the bucket of the true
    nearest-rank value: relative error <= 1/(2m) + half-bucket slack
    (the documented guarantee), checked over an adversarial mix of
    octaves."""
    import math

    from platform_etl_literature_spark.operators import sketch as SK

    vals = [int(1.37**i) + j for i in range(1, 40) for j in range(3)]
    vals = [v for v in vals if v >= 1]
    m = 16
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = [0.1, 0.5, 0.9, 0.99]
    out = {
        r["q"]: r["est_q"]
        for r in SK.hdr_quantiles(SK.hdr_build(df, "v", m=m), qs, m=m).collect()
    }
    sv = sorted(vals)
    for q in qs:
        target = max(1, math.ceil(q * len(sv)))
        exact = sv[target - 1]
        assert abs(out[q] - exact) / exact <= 1.0 / m, (q, out[q], exact)


def test_hdr_domain_and_args(spark):
    """Values < 1 and NULLs are out of domain (excluded, not crashed);
    m < 1 raises."""
    import pytest as _pt

    from platform_etl_literature_spark.operators import sketch as SK

    df = spark.createDataFrame(
        [(None,), (0,), (-5,), (1,), (7,)], "v long"
    )
    cells = SK.hdr_build(df, "v", m=4).collect()
    assert sum(r["cnt"] for r in cells) == 2
    with _pt.raises(ValueError):
        SK.hdr_build(df, "v", m=0)


def test_hdr_grouped_quantiles_match_python(spark):
    """Grouped quantiles replayed in pure python bucket-for-bucket:
    the Spark walk (cum >= target, first bucket) must agree exactly."""
    import math

    from platform_etl_literature_spark.operators import sketch as SK

    rows = [("a", v) for v in range(1, 200)] + [
        ("b", v * v) for v in range(1, 60)
    ]
    m = 8
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["q"]): r["est_q"]
        for r in SK.hdr_quantiles(
            SK.hdr_build(df, "v", m=m, keys=["g"]), [0.5, 0.9], m=m, keys=["g"]
        ).collect()
    }

    def bucket(v):
        e = v.bit_length() - 1
        return e * m + ((v - (1 << e)) * m) // (1 << e)

    for g in ("a", "b"):
        vs = sorted(v for gg, v in rows if gg == g)
        counts = {}
        for v in vs:
            counts[bucket(v)] = counts.get(bucket(v), 0) + 1
        for q in (0.5, 0.9):
            target = max(1, math.ceil(q * len(vs)))
            cum = 0
            for b in sorted(counts):
                cum += counts[b]
                if cum >= target:
                    e, sub = b // m, b % m
                    lo = 2.0**e * (1 + sub / m)
                    hi = 2.0**e * (1 + (sub + 1) / m)
                    assert got[(g, q)] == round((lo + hi) / 2, 6), (g, q)
                    break


# ---------------------------------------------------------------------------
# Incremental view maintenance
# ---------------------------------------------------------------------------


def test_ivm_apply_equals_direct_build(spark):
    """apply(build(A), +B, −C) must equal build((A ∪ B) − C)
    row-for-row, including a group that empties out entirely."""
    from platform_etl_literature_spark.operators import ivm as IVM

    a = spark.createDataFrame(
        [("g1", 10), ("g1", 20), ("g2", 5), ("g3", 7)], "g string, v long"
    )
    b = spark.createDataFrame([("g1", 30), ("g4", 1)], "g string, v long")
    # deletes: both g2 rows' worth (g2 empties), one g1 row
    c = spark.createDataFrame([("g2", 5), ("g1", 10)], "g string, v long")

    state = IVM.agg_state_apply(
        IVM.agg_state_build(a, ["g"], ["v"]),
        ["g"],
        ["v"],
        inserts=b,
        deletes=c,
    )
    direct_rows = [("g1", 20), ("g1", 30), ("g3", 7), ("g4", 1)]
    direct = IVM.agg_state_build(
        spark.createDataFrame(direct_rows, "g string, v long"), ["g"], ["v"]
    )
    got = {r["g"]: (r["n_rows"], r["sum_v"]) for r in state.collect()}
    want = {r["g"]: (r["n_rows"], r["sum_v"]) for r in direct.collect()}
    assert got == want
    assert "g2" not in got  # emptied group leaves the state


def test_ivm_negative_count_raises_at_read(spark):
    """Deleting rows that were never inserted (violated CDC contract)
    must trip the read-boundary guard loudly."""
    import pytest as _pt

    from platform_etl_literature_spark.operators import ivm as IVM

    a = spark.createDataFrame([("g1", 10)], "g string, v long")
    c = spark.createDataFrame([("g1", 10), ("g1", 99)], "g string, v long")
    state = IVM.agg_state_apply(
        IVM.agg_state_build(a, ["g"], ["v"]), ["g"], ["v"], deletes=c
    )
    with _pt.raises(Exception, match="negative group count"):
        IVM.agg_state_read(state, ["v"]).collect()


def test_ivm_idempotent_groups_untouched(spark):
    """A delta touching one group must leave every other group's
    state row bit-identical (counts and integer sums)."""
    from platform_etl_literature_spark.operators import ivm as IVM

    a = spark.createDataFrame(
        [(f"g{i}", i * 11) for i in range(20)], "g string, v long"
    )
    before = {
        r["g"]: (r["n_rows"], r["sum_v"])
        for r in IVM.agg_state_build(a, ["g"], ["v"]).collect()
    }
    delta = spark.createDataFrame([("g3", 100)], "g string, v long")
    after = {
        r["g"]: (r["n_rows"], r["sum_v"])
        for r in IVM.agg_state_apply(
            IVM.agg_state_build(a, ["g"], ["v"]), ["g"], ["v"], inserts=delta
        ).collect()
    }
    assert after["g3"] == (2, 133)
    for g, v in before.items():
        if g != "g3":
            assert after[g] == v


# ---------------------------------------------------------------------------
# Bloom-pruned join
# ---------------------------------------------------------------------------


def test_bloom_join_equals_plain_join(spark):
    """No false negatives: the bloom-pruned join result must equal the
    plain join exactly, even with a deliberately tiny filter (64 bits
    for 3 keys) that guarantees false positives pass the prefilter."""
    from platform_etl_literature_spark.operators import skew as SKW

    big = spark.createDataFrame(
        [(i % 50, i) for i in range(400)], "k long, v long"
    )
    small = spark.createDataFrame([(3,), (17,), (42,)], "k2 long")
    got = sorted(
        (r["k"], r["v"])
        for r in SKW.bloom_join(
            big, small, "k", "k2", m_bits=64, k=2
        ).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in big.join(small, big["k"] == small["k2"]).collect()
    )
    assert got == want and len(got) == 24


def test_bloom_join_semi_and_validation(spark):
    """Semi mode returns big-side rows only; unsupported join types
    raise."""
    import pytest as _pt

    from platform_etl_literature_spark.operators import skew as SKW

    big = spark.createDataFrame(
        [(i % 10, i) for i in range(100)], "k long, v long"
    )
    small = spark.createDataFrame([(4,)], "k2 long")
    out = SKW.bloom_join(big, small, "k", "k2", how="left_semi", m_bits=64, k=2)
    assert out.columns == ["k", "v"]
    assert sorted(r["k"] for r in out.collect()) == [4] * 10
    with _pt.raises(ValueError):
        SKW.bloom_join(big, small, "k", "k2", how="full_outer")


def test_bloom_join_prunes_before_join(spark):
    """With a selective small side and an adequately sized filter, the
    prefilter must pass far fewer rows than the scan while keeping
    every true match (count equality via the join itself)."""
    from platform_etl_literature_spark.operators.dedup import (
        bloom_filter_words,
        bloom_positions_sql,
    )

    from pyspark.sql import functions as F2

    big = spark.createDataFrame(
        [(i % 1000, i) for i in range(5000)], "k long, v long"
    )
    small = spark.createDataFrame([(7,), (500,)], "k2 long")
    m_bits, kk = 4096, 3
    arr = bloom_filter_words(
        small.selectExpr("CAST(k2 AS STRING) AS _g"), "_g", m_bits, kk
    )
    bloom_row = F2.broadcast(
        spark.createDataFrame([(arr,)], "_bloom array<long>")
    )
    pos = bloom_positions_sql("CAST(k AS STRING)", m_bits, kk)
    tests = [
        f"(element_at(_bloom, CAST(shiftright({p}, 6) AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) & 63 AS INT))) != 0"
        for p in pos
    ]
    n_pass = (
        big.crossJoin(bloom_row)
        .where(F2.expr(" AND ".join(f"({t})" for t in tests)))
        .count()
    )
    assert 10 <= n_pass <= 100, n_pass  # true 10, FP slack, ≪ 5000


def test_zonemap_skip_zorder_beats_natural_on_nonclustered(spark, sf_dir):
    """The accountability numbers must show the point of the layout:
    the natural (ingest-order) layout scans ~every file for the
    non-clustered column's band, z-order scans a small fraction for
    BOTH columns; every file is counted exactly once per layout."""
    from platform_etl_literature_spark.operators.layout import (
        zonemap_skip_stats,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = {
        (r["layout"], r["pred_col"]): (r["n_files_total"], r["n_scanned"])
    for r in zonemap_skip_stats(
            orders, ["o_custkey", "o_orderkey"], "o_orderkey",
            n_files=64, bits=8,
        ).collect()
    }
    assert len(rows) == 4
    nat_cust = rows[("natural", "o_custkey")]
    z_cust = rows[("zorder", "o_custkey")]
    z_ord = rows[("zorder", "o_orderkey")]
    assert nat_cust[1] == nat_cust[0]          # natural: full scan
    assert z_cust[1] <= z_cust[0] // 2         # zorder: ≥2x skip
    assert z_ord[1] <= z_ord[0] // 2
    # zone maps can never skip a file containing a matching row: the
    # band rows must all live in scanned files (spot via count>0)
    assert all(v[1] >= 1 for v in rows.values())


def _hilbert_ref(x, y, bits):
    """Python reference xy→d: the classic iterative quadrant-rotate
    loop, full-width complement (same as the Spark/SQL expressions)."""
    M = (1 << bits) - 1
    d = 0
    for lv in range(bits - 1, -1, -1):
        rx = (x >> lv) & 1
        ry = (y >> lv) & 1
        d += (1 << (2 * lv)) * (3 * rx + ry - 2 * rx * ry)
        if ry == 0:
            if rx == 1:
                x, y = M - x, M - y
            x, y = y, x
    return d


def test_hilbert_reference_is_a_hilbert_curve():
    """The reference is a true Hilbert curve: a bijection onto
    [0, 4^bits) whose CONSECUTIVE d-values are always grid neighbors
    (manhattan distance exactly 1) — the locality property Morton
    order lacks and the reason hilbert_bins exists."""
    for bits in (1, 2, 3, 4):
        n = 1 << bits
        inv = {}
        for x in range(n):
            for y in range(n):
                d = _hilbert_ref(x, y, bits)
                assert 0 <= d < n * n
                assert d not in inv, ("collision", x, y, d)
                inv[d] = (x, y)
        for d in range(n * n - 1):
            (x1, y1), (x2, y2) = inv[d], inv[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, (bits, d)


def test_hilbert_spark_expr_matches_reference(spark):
    """The aggregate-HOF fold computes the reference d for EVERY cell
    of the full bits=4 grid (256 cells) — the same exhaustive pin the
    Morton interleave test uses.  (The DuckDB side is pinned by the
    hilbert_skip oracle; its list_reduce formulation is BANNED per the
    DuckDB 1.0.0 vectorization hazard — see hilbert_duckdb_ctes.)"""
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators.layout import _hilbert_sql

    bits = 4
    n = 1 << bits
    cells = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "bx long, by long")
    got = {
        (r["bx"], r["by"]): r["d"]
        for r in df.select(
            "bx", "by", F.expr(_hilbert_sql("bx", "by", bits)).alias("d")
        ).collect()
    }
    for x, y in cells:
        assert got[(x, y)] == _hilbert_ref(x, y, bits), (x, y)


def test_hilbert_bins_validation_and_skip_quality(spark, sf_dir):
    """hilbert_bins rejects non-2-D column lists; on the orders table
    the Hilbert layout scans at most as many files as z-order for BOTH
    banded predicates (the no-Morton-seams claim, measured) and beats
    natural order on the non-clustered column."""
    import pytest as _pytest

    from platform_etl_literature_spark.operators.layout import (
        hilbert_bins,
        zonemap_skip_stats,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with _pytest.raises(ValueError, match="exactly 2"):
        hilbert_bins(orders, ["o_custkey"])
    with _pytest.raises(ValueError, match="exactly 2"):
        hilbert_bins(orders, ["o_custkey", "o_orderkey", "o_shippriority"])
    with _pytest.raises(ValueError, match="zorder|hilbert"):
        zonemap_skip_stats(
            orders, ["o_custkey", "o_orderkey"], "o_orderkey", curve="peano"
        )

    def scans(curve):
        return {
            (r["layout"], r["pred_col"]): (r["n_files_total"], r["n_scanned"])
            for r in zonemap_skip_stats(
                orders, ["o_custkey", "o_orderkey"], "o_orderkey",
                n_files=64, bits=8, curve=curve,
            ).collect()
        }

    h = scans("hilbert")
    z = scans("zorder")
    assert h[("natural", "o_custkey")] == z[("natural", "o_custkey")]
    for c in ("o_custkey", "o_orderkey"):
        assert h[("hilbert", c)][1] <= z[("zorder", c)][1], (c, h, z)
    nat = h[("natural", "o_custkey")]
    assert nat[1] == nat[0]  # natural: full scan on non-clustered col
    assert h[("hilbert", "o_custkey")][1] <= nat[0] // 2


def test_lm_neg_micro_nats_matches_avg_metric(spark, sf_dir):
    """The integer totals and the averaged metric must describe the
    same scores: avg_logp == -neg_lp_micro / 1e6 / n_bigrams to the
    metric's own rounding."""
    from platform_etl_literature_spark.operators import lm as LM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    avg = {
        r["id"]: (r["n_bigrams"], r["avg_logp"])
        for r in LM.lm_doc_logprob(docs, "doc_id", "text").collect()
    }
    tot = {
        r["id"]: (r["n_bigrams"], r["neg_lp_micro"])
        for r in LM.lm_doc_neg_micro_nats(docs, "doc_id", "text").collect()
    }
    assert set(avg) == set(tot)
    for i, (n, a) in avg.items():
        nt, neg = tot[i]
        assert nt == n
        assert a == round(-neg / 1e6 / n, 6), (i, a, neg, n)


def test_funnel_strict_order_and_ties(spark):
    """Funnel semantics: progress requires STRICTLY later timestamps
    (same-instant ties never count), order of arrival is irrelevant,
    and repeated step types need a strictly later recurrence."""
    from datetime import datetime

    from platform_etl_literature_spark.operators.funnel import (
        funnel_conversion,
    )

    T = datetime
    rows = [
        # u1 completes a->b->c in order
        (1, "a", T(2024, 1, 1, 0)), (1, "b", T(2024, 1, 1, 1)), (1, "c", T(2024, 1, 1, 2)),
        # u2: b at the SAME instant as a — tie must not count as after
        (2, "a", T(2024, 1, 1, 0)), (2, "b", T(2024, 1, 1, 0)),
        # u3: b before a only — no progress past step 1
        (3, "b", T(2024, 1, 1, 0)), (3, "a", T(2024, 1, 1, 1)),
        # u4: never does step 1
        (4, "b", T(2024, 1, 1, 0)), (4, "c", T(2024, 1, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_conversion(df, ["a", "b", "c"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1}

    # repeated type: a->a needs a second strictly later 'a'
    got2 = {
        r["step_idx"]: r["n_users"]
        for r in funnel_conversion(df, ["a", "a"]).collect()
    }
    assert got2 == {1: 3, 2: 0}


def test_touch_attribution_micro(spark):
    """Hand-built stream: purchase credits the latest in-window touch
    (last) and the earliest (first); a touch OUTSIDE the lookback is
    ignored; a touch stamped exactly at the conversion counts
    (inclusive edge); equal-ts touches resolve by max/min event_id;
    a touchless conversion survives with NULLs and n_touches=0."""
    import datetime as dt

    from platform_etl_literature_spark.operators.funnel import (
        touch_attribution,
    )

    def t(d, h=0, m=0):
        return dt.datetime(2024, 1, d, h, m)

    rows = [
        # user 1: click(d1) too old for 48h lookback from d4; view(d3),
        # click(d4 exactly at purchase ts) in window; two touches at the
        # SAME ts (ids 4,5) -> max id wins last, min id wins first-at-ts
        (1, t(1), 1, "click"),
        (2, t(3), 1, "view"),
        (4, t(3, 12), 1, "click"),
        (5, t(3, 12), 1, "view"),
        (6, t(4), 1, "click"),      # exactly at purchase ts
        (7, t(4), 1, "purchase"),
        # user 2: purchase with no touch at all
        (8, t(2), 2, "signup"),
        (9, t(2, 1), 2, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, ty, 0.0) for (i, ts, u, ty) in rows],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = {
        r["conversion_id"]: r.asDict()
        for r in touch_attribution(df, lookback_seconds=48 * 3600).collect()
    }
    a = out[7]
    assert a["last_touch_id"] == 6 and a["last_touch_type"] == "click"
    assert a["first_touch_id"] == 2 and a["first_touch_type"] == "view"
    assert a["n_touches"] == 4  # ids 2,4,5,6 — id 1 is outside 48 h
    b = out[9]
    assert b["last_touch_id"] is None and b["first_touch_id"] is None
    assert b["n_touches"] == 0

    # equal-ts tie inside the window: drop id-6 so the last touch is
    # decided between ids 4 and 5 at the same timestamp -> max id (5)
    df2 = df.filter("event_id != 6")
    out2 = {
        r["conversion_id"]: r.asDict()
        for r in touch_attribution(df2, lookback_seconds=48 * 3600).collect()
    }
    assert out2[7]["last_touch_id"] == 5
    assert out2[7]["last_touch_type"] == "view"


def test_retention_cohorts_micro(spark):
    """Crafted cohorts: two users starting in different weeks, one
    returning in period 1, period buckets calendar-exact."""
    from datetime import datetime

    from platform_etl_literature_spark.operators.funnel import (
        retention_cohorts,
    )

    T = datetime
    rows = [
        (1, T(2024, 1, 1)), (1, T(2024, 1, 9)),   # u1: wk of Jan 1, back day 8 → period 1
        (2, T(2024, 1, 2)), (2, T(2024, 1, 8)),   # u2: same cohort wk, day 6 → period 0
        (3, T(2024, 1, 10)),                       # u3: wk of Jan 8, never back
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"], r["period"]): (r["cohort_size"], r["n_active"])
        for r in retention_cohorts(df, max_periods=4).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2),
        ("2024-01-01", 1): (2, 1),
        ("2024-01-08", 0): (1, 1),
    }


def test_gap_fill_ffill_micro(spark):
    """Hand-built stream: user 10 observes at buckets 0, 3 (two obs in
    bucket 3 — the later one wins), user 20 at a single bucket.  The
    grid densifies every intermediate bucket, carries the last value
    forward, and flags exactly the carried rows."""
    import datetime as dt

    from platform_etl_literature_spark.operators.timeseries import (
        gap_fill_ffill,
    )

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    df = spark.createDataFrame(
        [
            (1, t(0), 10, 1.5),
            (2, t(3, 10), 10, 2.5),
            (3, t(3, 40), 10, 4.5),  # later in same bucket -> wins
            (4, t(5), 20, 9.0),
        ],
        ["event_id", "ts", "user_id", "value"],
    )
    out = gap_fill_ffill(df, bucket_seconds=3600)
    rows = {
        (r["user_id"], r["bucket_id"]): (r["value_ff"], r["is_filled"])
        for r in out.collect()
    }
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    # Spark session TZ may shift the bucket origin; recompute from output.
    b0 = min(b for (u, b) in rows if u == 10)
    assert len([k for k in rows if k[0] == 10]) == 4  # buckets 0..3
    assert rows[(10, b0)] == (1.5, 0)
    assert rows[(10, b0 + 1)] == (1.5, 1)
    assert rows[(10, b0 + 2)] == (1.5, 1)
    assert rows[(10, b0 + 3)] == (4.5, 0)  # in-bucket last obs wins
    assert len([k for k in rows if k[0] == 20]) == 1
    (k20,) = [k for k in rows if k[0] == 20]
    assert rows[k20] == (9.0, 0)
    assert base > 0  # silence unused; origin asserted via relative offsets


def test_gap_fill_interpolate_micro(spark):
    """Hand-built stream: user 10 observes 1.0 at bucket 0 and 4.0 at
    bucket 3 — the two empty buckets interpolate to 2.0 and 3.0; two
    obs in one bucket -> the later wins before interpolation; a
    single-observation user yields exactly its one observed bucket."""
    import datetime as dt

    from platform_etl_literature_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    df = spark.createDataFrame(
        [
            (1, t(0), 10, 1.0),
            (2, t(3, 10), 10, 2.5),
            (3, t(3, 40), 10, 4.0),  # later in same bucket -> wins
            (4, t(5), 20, 9.0),
        ],
        ["event_id", "ts", "user_id", "value"],
    )
    out = gap_fill_interpolate(df, bucket_seconds=3600)
    rows = {
        (r["user_id"], r["bucket_id"]): (r["value_interp"], r["is_observed"])
        for r in out.collect()
    }
    b0 = min(b for (u, b) in rows if u == 10)
    assert len([k for k in rows if k[0] == 10]) == 4  # buckets 0..3
    assert rows[(10, b0)] == (1.0, 1)
    assert rows[(10, b0 + 1)] == (2.0, 0)  # 1 + (4-1)*1/3
    assert rows[(10, b0 + 2)] == (3.0, 0)  # 1 + (4-1)*2/3
    assert rows[(10, b0 + 3)] == (4.0, 1)  # in-bucket last obs wins
    (k20,) = [k for k in rows if k[0] == 20]
    assert rows[k20] == (9.0, 1)


def test_asof_join_semantics_micro(spark):
    """Backward/forward/tolerance/no-match legs against hand-derivable
    answers, the inclusive equal-ts rule, and the duplicate-right-ts
    deterministic winner (max payload struct = max first payload col)."""
    from platform_etl_literature_spark.operators.asof import asof_join

    l = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 5, "L3")],
        "k int, ts int, lv string",
    )
    r = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (1, 15, "c"), (2, 99, "z")],
        "k int, ts int, p string",
    )
    back = {
        (x["k"], x["ts"]): (x["ts_r"], x["p"])
        for x in asof_join(l, r, "k", "ts", "ts").collect()
    }
    # inclusive at equal ts; duplicate right ts=15 -> max struct (ts
    # is the first payload column, tie broken by p: "c" wins)
    assert back == {
        (1, 10): (10, "a"),
        (1, 20): (15, "c"),
        (2, 5): (None, None),
    }
    fwd = {
        (x["k"], x["ts"]): (x["ts_r"], x["p"])
        for x in asof_join(l, r, "k", "ts", "ts", direction="forward").collect()
    }
    assert fwd == {
        (1, 10): (10, "a"),  # inclusive both directions
        (1, 20): (None, None),
        (2, 5): (99, "z"),
    }
    tol = {
        (x["k"], x["ts"]): x["p"]
        for x in asof_join(l, r, "k", "ts", "ts", tolerance=4).collect()
    }
    assert tol == {(1, 10): "a", (1, 20): None, (2, 5): None}
    # collision naming: right ts -> ts_r always; unique names untouched
    out = asof_join(l, r, "k", "ts", "ts")
    assert out.columns == ["k", "ts", "lv", "ts_r", "p"]


def test_asof_join_equals_bruteforce_randomized(spark):
    """Property: the union+carry plan equals the obvious-but-quadratic
    definition (theta join, keep max (ts, payload) per left row) on a
    seeded random dataset with key gaps and duplicate timestamps."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from platform_etl_literature_spark.operators.asof import asof_join

    rng = random.Random(20260815)
    lrows = [
        (i, rng.randrange(8), rng.randrange(50)) for i in range(300)
    ]
    rrows = [
        (1000 + i, rng.randrange(10), rng.randrange(50), float(i))
        for i in range(400)
    ]
    l = spark.createDataFrame(lrows, "lid int, k int, ts int")
    r = spark.createDataFrame(rrows, "rid int, k int, ts int, v double")
    got = {
        (x["lid"]): (x["ts_r"], x["rid"], x["v"])
        for x in asof_join(l, r, "k", "ts", "ts").collect()
    }
    w = Window.partitionBy("lid").orderBy(
        F.col("rts").desc(), F.col("rid").desc()
    )
    brute = (
        l.join(r.selectExpr("rid", "k", "ts rts", "v"), "k", "left")
        .where(F.col("rts").isNull() | (F.col("rts") <= F.col("ts")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    want = {
        x["lid"]: (x["rts"], x["rid"], x["v"]) for x in brute.collect()
    }
    # left rows whose key never matches fall out of the brute left
    # join only when rts is null -> they appear with None legs
    for lid, _, _ in lrows:
        assert got[lid] == want.get(lid, (None, None, None)), lid
    assert len(got) == len(lrows)


def test_interval_overlap_join_equals_bruteforce(spark):
    """Losslessness of bin-explode + meeting-bin dedup: equality with
    the brute theta join on seeded random intervals spanning negative
    coordinates, at several bin widths (incl. width 1 and width far
    above every interval length)."""
    import random

    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(42)
    rows = []
    for i in range(250):
        s = rng.randrange(-100, 100)
        rows.append((i, s, s + rng.randrange(0, 25)))
    iv = spark.createDataFrame(rows, "id int, s int, e int")
    a, b = iv.alias("a"), iv.alias("b")
    brute = {
        (x["a_id"], x["b_id"], x["ov"])
        for x in a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            (
                F.least("a.e", "b.e") - F.greatest("a.s", "b.s")
            ).alias("ov"),
        )
        .collect()
    }
    assert brute  # non-trivial instance
    for w in (1, 7, 16, 1000):
        got = {
            tuple(x)
            for x in interval_overlap_join(iv, bin_width=w).collect()
        }
        assert got == brute, f"bin_width={w}"
    # min_overlap filter
    got3 = {
        tuple(x)
        for x in interval_overlap_join(
            iv, bin_width=16, min_overlap=3
        ).collect()
    }
    assert got3 == {t for t in brute if t[2] >= 3}


def test_interval_overlap_exact_at_epoch_micros_scale(spark):
    """Bin ids are computed in long arithmetic: at epoch-micros
    magnitude (~2^51) a double-division floor can misround a boundary
    coordinate into the wrong bin and silently drop a pair."""
    from platform_etl_literature_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    base = 4_503_599_627_370_496  # 2^52
    rows = [
        (1, base - 3, base - 1),
        (2, base - 1, base + 1),  # overlaps 1 (at base-1) and 3
        (3, base + 1, base + 5),
        (4, base + 7, base + 9),  # disjoint from all
    ]
    iv = spark.createDataFrame(rows, "id long, s long, e long")
    got = {
        tuple(x) for x in interval_overlap_join(iv, bin_width=4).collect()
    }
    assert got == {(1, 2, 0), (2, 3, 0)}


def test_point_in_interval_join_equals_bruteforce(spark):
    """Asymmetric binned range join == brute theta join on seeded
    random data (negative coords, boundary points, several widths)."""
    import random

    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    rng = random.Random(7)
    ivs = []
    for i in range(80):
        s = rng.randrange(-60, 60)
        ivs.append((i, s, s + rng.randrange(0, 20)))
    pts = [(1000 + j, rng.randrange(-70, 90)) for j in range(300)]
    # boundary points: exactly on some starts/ends
    pts += [(2000, ivs[0][1]), (2001, ivs[0][2]), (2002, ivs[3][1])]
    ivdf = spark.createDataFrame(ivs, "id int, s int, e int")
    pdf = spark.createDataFrame(pts, "pid int, x int")
    brute = {
        (r["pid"], r["id"])
        for r in pdf.join(
            ivdf,
            (F.col("x") >= F.col("s")) & (F.col("x") <= F.col("e")),
        ).collect()
    }
    assert brute
    for w in (1, 5, 16, 500):
        got = {
            (r["pid"], r["iv_id"])
            for r in point_in_interval_join(
                pdf, ivdf, point_col="x", bin_width=w
            ).collect()
        }
        assert got == brute, f"bin_width={w}"


def test_compaction_plan_packing_invariants(spark):
    """Contiguous cumsum packing: group = starting-offset div target.
    Every group except possibly the last must reach the target once its
    straddling file is counted; files larger than the target span their
    own groups; the assignment is deterministic."""
    from platform_etl_literature_spark.operators import ranking
    from platform_etl_literature_spark.operators.layout import (
        compaction_plan,
    )

    files = spark.createDataFrame(
        [(1, 70), (2, 40), (3, 40), (4, 30), (5, 10), (6, 250), (7, 5)],
        "file_id int, size_bytes int",
    )
    out = {
        r["file_id"]: (r["grp"], r["grp_offset"])
        for r in compaction_plan(files, target_bytes=100).collect()
    }
    ranking.release_cached()
    # order: 250(6), 70(1), 40(2), 40(3), 30(4), 10(5), 5(7)
    # offsets: 0, 250, 320, 360, 400, 430, 440
    assert out == {
        6: (0, 0),
        1: (2, 250),
        2: (3, 320),
        3: (3, 360),
        4: (4, 400),
        5: (4, 430),
        7: (4, 440),
    }
    # grouped view: every group's bytes + straddle reach the target
    # (group 2 holds 70 but file 6 straddles into it)
    again = {
        r["file_id"]: (r["grp"], r["grp_offset"])
        for r in compaction_plan(files, target_bytes=100).collect()
    }
    ranking.release_cached()
    assert again == out  # deterministic


def test_decode_bmp_features_block_means_and_corrupt(spark):
    """Hand-checkable 1x1 grid (features == whole-image channel means,
    already value-pinned by the stats oracle) plus a 2x2 grid block
    assignment sanity check and the corrupt-payload contract."""
    import pytest

    from platform_etl_literature_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(3,), (4,)], "doc_id long")
    media = MM.synth_bmp_media(docs, "doc_id")
    stats = {
        r["media_id"]: (r["mean_r"], r["mean_g"], r["mean_b"])
        for r in MM.decode_bmp_stats(media).collect()
    }
    f1 = MM.decode_bmp_features(media, gx=1, gy=1)
    got = {
        (r["media_id"], r["feat_idx"]): r["feat_val"] for r in f1.collect()
    }
    for mid, (mr, mg, mb) in stats.items():
        assert got[(mid, 0)] == mr
        assert got[(mid, 1)] == mg
        assert got[(mid, 2)] == mb
    # 2x2: every media contributes exactly 12 features; block pixel
    # counts partition the 10x7 image as (5x4, 5x4, 5x3, 5x3)
    f2 = MM.decode_bmp_features(media, gx=2, gy=2).collect()
    assert len(f2) == 2 * 12
    # corrupt payload fails loudly
    bad = spark.createDataFrame(
        [(9, bytearray(b"JUNK" * 20))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a BMP"):
        MM.decode_bmp_features(bad).collect()


def test_asof_join_multikey_and_distinct_ts_names(spark):
    """Composite keys and differently-named timestamp columns."""
    from platform_etl_literature_spark.operators.asof import asof_join

    l = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 10), ("b", 1, 10)],
        "sym string, venue int, t_exec int",
    )
    r = spark.createDataFrame(
        [("a", 1, 5, 1.5), ("a", 2, 9, 2.5), ("a", 2, 11, 9.9), ("b", 2, 1, 7.0)],
        "sym string, venue int, t_quote int, px double",
    )
    out = {
        (x["sym"], x["venue"]): (x["t_quote_r"], x["px"])
        for x in asof_join(
            l, r, ["sym", "venue"], left_ts="t_exec", right_ts="t_quote"
        ).collect()
    }
    assert out == {
        ("a", 1): (5, 1.5),
        ("a", 2): (9, 2.5),
        ("b", 1): (None, None),  # venue mismatch: composite key respected
    }


def test_asof_join_forward_equal_ts_tie_rule_matches_backward(spark):
    """Equal-ts duplicate rights must resolve to the SAME winner (max
    payload struct) in both directions — regression: the forward
    ordering originally inverted the tie to min-struct."""
    from platform_etl_literature_spark.operators.asof import asof_join

    l = spark.createDataFrame([(1, 15)], "k int, ts int")
    r = spark.createDataFrame(
        [(1, 15, "a"), (1, 15, "b")], "k int, ts int, p string"
    )
    fwd = asof_join(l, r, "k", direction="forward").collect()[0]
    back = asof_join(l, r, "k", direction="backward").collect()[0]
    assert fwd["p"] == back["p"] == "b"


def test_training_shuffle_is_a_permutation_and_balanced(spark):
    """Positions are a 0..n-1 permutation; round-robin shards differ in
    size by at most 1; re-running yields the identical assignment."""
    from platform_etl_literature_spark.operators import ranking
    from platform_etl_literature_spark.operators.textstats import (
        training_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(101)], "doc_id long")
    out = training_shuffle(df, "doc_id", n_shards=4).collect()
    ranking.release_cached()
    pos = sorted(r["pos"] for r in out)
    assert pos == list(range(101))
    by_shard = {}
    for r in out:
        assert r["shard"] == r["pos"] % 4
        assert r["pos_in_shard"] == r["pos"] // 4
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    sizes = sorted(len(v) for v in by_shard.values())
    assert max(sizes) - min(sizes) <= 1
    for v in by_shard.values():  # in-shard positions are dense
        assert sorted(v) == list(range(len(v)))
    again = {
        r["doc_id"]: (r["pos"], r["shard"])
        for r in training_shuffle(df, "doc_id", n_shards=4).collect()
    }
    ranking.release_cached()
    assert again == {r["doc_id"]: (r["pos"], r["shard"]) for r in out}


def test_resize_bmp_identity_upscale_corrupt(spark):
    """Identity resize reproduces the source stats exactly; nearest
    upscale replicates pixels (means preserved per mapped source);
    corrupt payloads fail loudly."""
    import pytest

    from platform_etl_literature_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(5,), (6,)], "doc_id long")
    media = MM.synth_bmp_media(docs, "doc_id")  # 10x7
    src = {
        r["media_id"]: (
            r["mean_r"], r["mean_g"], r["mean_b"],
            r["peak_luma"], r["xy_luma_sum"],
        )
        for r in MM.decode_bmp_stats(media).collect()
    }
    ident = {
        r["media_id"]: (
            r["mean_r"], r["mean_g"], r["mean_b"],
            r["peak_luma"], r["xy_luma_sum"],
        )
        for r in MM.decode_bmp_stats(MM.resize_bmp(media, 10, 7)).collect()
    }
    assert ident == src
    # 2x nearest upscale: every source pixel appears exactly 4 times ->
    # channel means and peak luma are preserved bit-for-bit
    up = {
        r["media_id"]: (r["width"], r["height"], r["mean_r"], r["peak_luma"])
        for r in MM.decode_bmp_stats(MM.resize_bmp(media, 20, 14)).collect()
    }
    for mid in src:
        assert up[mid][:2] == (20, 14)
        assert up[mid][2] == src[mid][0]
        assert up[mid][3] == src[mid][3]
    bad = spark.createDataFrame(
        [(1, bytearray(b"nope" * 40))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a BMP"):
        MM.resize_bmp(bad, 4, 4).collect()


def test_asof_join_nearest_semantics(spark):
    """Nearest picks the closer side, ties prefer backward (pandas
    merge_asof), tolerance voids both sides, forward-only and
    backward-only legs fall through."""
    from platform_etl_literature_spark.operators.asof import asof_join

    l = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 13), (1, 20), (2, 5), (3, 7)],
        "k int, ts int",
    )
    r = spark.createDataFrame(
        [(1, 8, "a"), (1, 16, "b"), (2, 99, "z")], "k int, ts int, p string"
    )
    near = {
        (x["k"], x["ts"]): x["p"]
        for x in asof_join(l, r, "k", direction="nearest").collect()
    }
    assert near == {
        (1, 10): "a",   # 2 vs 6
        (1, 12): "a",   # tie 4 vs 4 -> backward
        (1, 13): "b",   # 5 vs 3
        (1, 20): "b",   # forward-only leg null, backward 'b'
        (2, 5): "z",    # forward-only match
        (3, 7): None,   # no key
    }
    tol = {
        (x["k"], x["ts"]): x["p"]
        for x in asof_join(l, r, "k", direction="nearest", tolerance=3).collect()
    }
    assert tol == {
        (1, 10): "a",
        (1, 12): None,  # both gaps 4 > 3
        (1, 13): "b",
        (1, 20): None,
        (2, 5): None,
        (3, 7): None,
    }

def test_asof_join_segmented_equals_flat_all_directions(spark):
    """The segmented plan is an exact re-association of the flat
    carry: bit-identical rows in every direction, with and without
    tolerance, on a seeded dataset whose keys straddle many
    segments, share timestamps across sides, and include one-sided
    keys."""
    import datetime
    import random

    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators.asof import (
        asof_join,
        asof_join_segmented,
    )

    rng = random.Random(20260815)
    base = datetime.datetime(2024, 1, 1)

    def ts(h):
        return base + datetime.timedelta(hours=h)

    lrows = [
        (f"k{rng.randrange(5)}", ts(rng.randrange(240)), i)
        for i in range(300)
    ]
    rrows = [
        (f"k{rng.randrange(7)}", ts(rng.randrange(240)), 1000 + i, float(i))
        for i in range(250)
    ]
    # force equal timestamps across sides and duplicate right ts
    rrows += [(k, t, 5000 + i, 0.5) for i, (k, t, _) in enumerate(lrows[:30])]
    l = spark.createDataFrame(lrows, "k string, ts timestamp, lid long")
    r = spark.createDataFrame(
        rrows, "k string, ts timestamp, event_id long, v double"
    )

    def canon(df):
        return sorted(map(tuple, df.collect()))

    for direction in ("backward", "forward", "nearest"):
        assert canon(
            asof_join_segmented(l, r, "k", direction=direction)
        ) == canon(asof_join(l, r, "k", direction=direction)), direction

    # numeric axis requires an explicit segment; tolerance composes
    lN = l.select("k", F.unix_micros("ts").alias("ts"), "lid")
    rN = r.select("k", F.unix_micros("ts").alias("ts"), "event_id", "v")
    seg = lambda c: F.floor(c / F.lit(86_400_000_000))  # noqa: E731
    for direction in ("backward", "forward", "nearest"):
        assert canon(
            asof_join_segmented(
                lN, rN, "k", direction=direction,
                tolerance=3_600_000_000, segment=seg,
            )
        ) == canon(
            asof_join(lN, rN, "k", direction=direction, tolerance=3_600_000_000)
        ), f"numeric {direction}"

    import pytest

    with pytest.raises(ValueError, match="segment is required"):
        asof_join_segmented(lN, rN, "k")


def test_asof_join_segmented_whale_key_splits_the_sort(spark):
    """A single 1M-row key does NOT serialize into one task: the
    carry windows partition on (key, segment) — pinned in the
    physical plan — and the job completes with the per-slice rows
    bounded by the largest single segment."""
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators.asof import (
        asof_join_segmented,
    )

    n = 1_000_000
    # one key, timestamps spread over ~116 days -> day segments
    l = (
        spark.range(n)
        .select(
            F.lit("whale").alias("k"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 10).alias(
                "ts"
            ),
            F.col("id").alias("lid"),
        )
    )
    r = (
        spark.range(0, n, 100)
        .select(
            F.lit("whale").alias("k"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 10 + 5).alias(
                "ts"
            ),
            F.col("id").alias("rid"),
        )
    )
    out = asof_join_segmented(l, r, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the carry exchange is keyed by (k, _seg), not k alone
    assert "hashpartitioning(k" in plan and "_seg" in plan.split(
        "hashpartitioning(k", 1
    )[1][:80], plan[:2000]
    # backward match for lid=i: rid = latest multiple of 100 at
    # ts+5 <= ts(i) -> floor((i-1)/100)*100 for i>0, null for i=0
    got = out.where(F.col("lid").isin(0, 1, 99, 100, 101, 999_999)).select(
        "lid", "rid"
    ).collect()
    want = {0: None, 1: 0, 99: 0, 100: 0, 101: 100, 999_999: 999_900}
    assert {x["lid"]: x["rid"] for x in got} == want


def test_hdr_build_overflow_domain_guard(spark):
    """(v - 2^e) * m runs in BIGINT: the top octaves overflow for
    v > (2^63-1) div m.  hdr_build must bucket the boundary value
    exactly and raise loudly one past it — never silently flip
    bucket ids (reachable for nano-unit fixed-point scaling)."""
    from platform_etl_literature_spark.operators import sketch as SK

    m = 32
    maxv = SK.hdr_domain_max(m)
    ok = spark.createDataFrame([(1,), (maxv,)], "v long")
    got = {r["b"]: r["cnt"] for r in SK.hdr_build(ok, "v", m=m).collect()}
    e = maxv.bit_length() - 1
    want_top = e * m + (maxv - 2**e) * m // 2**e
    assert got == {0: 1, want_top: 1}
    bad = spark.createDataFrame([(maxv + 1,)], "v long")
    with pytest.raises(Exception, match="exceeds domain max"):
        SK.hdr_build(bad, "v", m=m).collect()


def test_scd2_temporal_join_semantics(spark):
    """Point-in-time dim join legs: before-validity (NULL), mid-history
    (old attrs), current (new attrs), DELETED key (interval closed
    with no successor -> match nulled, the _stale leg scd2_apply never
    produces), and a never-existing key."""
    from platform_etl_literature_spark.operators.merge import (
        scd2_temporal_join,
    )

    hist = spark.createDataFrame(
        [
            # key 1: v1..v3 "a", v3.. "b"  (updated at v3)
            (1, "a", 1, 3),
            (1, "b", 3, None),
            # key 2: v2..v4 "x", then DELETED (closed, no successor)
            (2, "x", 2, 4),
        ],
        "k long, attr string, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2), (1, 3), (2, 3), (2, 4), (2, 9), (7, 5)],
        "k long, v long",
    )
    out = {
        (r["k"], r["v"]): r["attr"]
        for r in scd2_temporal_join(facts, hist, "k", "v").collect()
    }
    assert out == {
        (1, 0): None,   # before validity
        (1, 1): "a",    # inclusive start
        (1, 2): "a",
        (1, 3): "b",    # boundary: old closed at 3, new opens at 3
        (2, 3): "x",
        (2, 4): None,   # deleted exactly at v=4 (valid_to <= v)
        (2, 9): None,   # stays deleted
        (7, 5): None,   # never existed
    }
    # column plumbing: valid_from suffixed, valid_to rides un-suffixed
    cols = scd2_temporal_join(facts, hist, "k", "v").columns
    assert "valid_from_dim" in cols and "valid_to" in cols


def test_ohlc_bars_values(spark):
    """Hand-computed bars: open/close follow the (ts, id) total order
    (including an equal-ts tie broken by id), high/low are extrema,
    sums are exact cents."""
    from platform_etl_literature_spark.operators import timeseries as TSO

    rows = [
        # key A, bucket 0 (width 100): open 3.5 (t=5), close 1.25 (t=90)
        (1, "A", 5, 3.5), (2, "A", 50, 9.0), (3, "A", 90, 1.25),
        # equal-ts tie in bucket 100: ids 4 < 5 -> open 2.0, close 7.0
        (4, "A", 110, 2.0), (5, "A", 110, 7.0),
        # key B single event
        (6, "B", 10, -4.125),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, k string, s long, value double"
    ).select("event_id", "k", F.timestamp_seconds("s").alias("ts"), "value")
    got = {
        (r["k"], r["bucket_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["sum_value"]
        )
        for r in TSO.ohlc_bars(ev, ["k"], width_seconds=100).collect()
    }
    assert got == {
        ("A", 0): (3.5, 9.0, 1.25, 1.25, 3, 13.75),
        ("A", 100): (2.0, 7.0, 2.0, 7.0, 2, 9.0),
        # -4.125 cents-rounds HALF_UP (away from zero) to -413 once,
        # so every column agrees at -4.13 — the one rounding, applied
        # at ingestion, not four independent ones
        ("B", 0): (-4.13, -4.13, -4.13, -4.13, 1, -4.13),
    }


def test_ohlc_bars_null_ticks_skipped_consistently(spark):
    """A NULL-valued tick must not contribute to ANY bar column: the
    order struct is (ts, id), so without the explicit filter a NULL
    first/last tick would null open/close while the NULL-skipping
    high/low came from real ticks — an inconsistent bar.  An all-NULL
    bucket produces no bar at all."""
    from platform_etl_literature_spark.operators import timeseries as TSO

    rows = [
        (1, "A", 5, None), (2, "A", 50, 9.0), (3, "A", 90, None),
        (4, "B", 10, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, k string, s long, value double"
    ).select("event_id", "k", F.timestamp_seconds("s").alias("ts"), "value")
    got = {
        (r["k"], r["bucket_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"], r["sum_value"]
        )
        for r in TSO.ohlc_bars(ev, ["k"], width_seconds=100).collect()
    }
    assert got == {("A", 0): (9.0, 9.0, 9.0, 9.0, 1, 9.0)}


def test_bloom_index_skip_python_replay(spark):
    """The whole bloom-index harness replays in python exactly — file
    assignment, zone maps, and every Kirsch-Mitzenmacher position (so
    each false positive is deterministic, not probabilistic): counts
    for all three kinds must match the python reference, bloom ⊇ exact
    (no false negatives), zonemap ⊇ exact."""
    import hashlib

    from platform_etl_literature_spark.operators.layout import (
        bloom_index_skip_stats,
    )

    n_files, m_bits, k, probe_mod = 8, 512, 3, 7
    rows = [(i, (i * 37) % 101) for i in range(200)]  # (natural, value)
    df = spark.createDataFrame(rows, "nat long, val long")
    got = {
        r["kind"]: (r["n_probes"], r["n_scanned"])
        for r in bloom_index_skip_stats(
            df, "val", "nat", n_files=n_files, m_bits=m_bits, k=k,
            probe_mod=probe_mod,
        ).collect()
    }

    mnn, mxn = 0, 199
    fmap = {}
    for nat, val in rows:
        f = (nat - mnn) * n_files // (mxn - mnn + 1)
        fmap.setdefault(f, set()).add(val)
    probes = sorted(
        {v for _, v in rows if v % probe_mod == 0}
    )

    def positions(v):
        h1 = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        h2 = int(hashlib.md5(f"b2:{v}".encode()).hexdigest()[:8], 16)
        return {(h1 + i * h2) % m_bits for i in range(k)}

    exact = sum(1 for f, vs in fmap.items() for p in probes if p in vs)
    zonemap = sum(
        1
        for f, vs in fmap.items()
        for p in probes
        if min(vs) <= p <= max(vs)
    )
    fbits = {
        f: set().union(*(positions(v) for v in vs))
        for f, vs in fmap.items()
    }
    bloom = sum(
        1
        for f, bits in fbits.items()
        for p in probes
        if positions(p) <= bits
    )
    assert got["exact"] == (len(probes), exact)
    assert got["bloom"] == (len(probes), bloom)
    assert got["zonemap"] == (len(probes), zonemap)
    assert exact <= bloom  # no false negatives, ever
    assert exact <= zonemap

    import pytest as _pytest

    with _pytest.raises(ValueError, match="m_bits"):
        bloom_index_skip_stats(df, "val", "nat", m_bits=32)


def test_equidepth_thresholds_and_balance_python_replay(spark):
    """Exact nearest-rank thresholds and both balance histograms match
    a python replay on a skewed multiset (heavy duplicates included);
    equi-depth max-bin occupancy is within one duplicate-run of n/B
    while equi-width collapses."""
    from platform_etl_literature_spark.operators.layout import (
        binning_balance_stats,
        equidepth_thresholds,
    )

    # skewed: value i**3 repeated (i % 5 + 1) times, plus a heavy run
    vals = []
    for i in range(60):
        vals += [i ** 3] * (i % 5 + 1)
    vals += [7] * 40
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    B = 8
    got_th = {
        r["j"]: r["t"] for r in equidepth_thresholds(df, "x", B).collect()
    }
    sv = sorted(vals)
    n = len(sv)
    import math

    want_th = {
        j: sv[math.ceil(j * n / B) - 1] for j in range(1, B)
    }
    assert got_th == want_th

    got = {
        r["method"]: (r["n_bins_nonempty"], r["max_bin_rows"], r["imbalance"])
        for r in binning_balance_stats(df, "x", bits=3).collect()
    }
    # python replay of both histograms
    mn, mx = sv[0], sv[-1]
    ew = {}
    for v in sv:
        ew[(v - mn) * B // (mx - mn + 1)] = ew.get((v - mn) * B // (mx - mn + 1), 0) + 1
    ed = {}
    for v in sv:
        b = sum(1 for j in range(1, B) if v > want_th[j])
        ed[b] = ed.get(b, 0) + 1
    assert got["equiwidth"] == (
        len(ew), max(ew.values()), round(max(ew.values()) * B / n, 2)
    )
    assert got["equidepth"] == (
        len(ed), max(ed.values()), round(max(ed.values()) * B / n, 2)
    )
    # the point: cubes collapse equi-width; equi-depth stays balanced
    assert max(ew.values()) > 2 * (n // B)
    assert got["equidepth"][2] < got["equiwidth"][2]


def test_kneser_ney_python_replay_and_normalization(spark):
    """KN micro-nat totals match an exact python replay on a tiny
    corpus, and the interpolated-KN axiom holds: for every seen
    prefix, summing P(w2|w1) over the FULL vocabulary of continuation
    types is 1 (the discount mass exactly funds the continuation
    distribution) — the property add-k only meets with its own
    denominator."""
    import math

    from platform_etl_literature_spark.operators.lm import (
        kn_doc_neg_micro_nats,
    )

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the fish"),
        (3, "a dog sat on a log"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["neg_lp_micro"])
        for r in kn_doc_neg_micro_nats(df, "doc_id", "text").collect()
    }

    # python replay with identical count definitions
    insts = {}
    for i, t in docs:
        w = t.split()
        insts[i] = [(w[j], w[j + 1]) for j in range(len(w) - 1)]
    allb = [b for v in insts.values() for b in v]
    c2, cp, types = {}, {}, set(allb)
    for b in allb:
        c2[b] = c2.get(b, 0) + 1
        cp[b[0]] = cp.get(b[0], 0) + 1
    nf, nc = {}, {}
    for w1, w2 in types:
        nf[w1] = nf.get(w1, 0) + 1
        nc[w2] = nc.get(w2, 0) + 1
    T = len(types)
    D = 0.5

    def p(b):
        return (c2[b] - D) / cp[b[0]] + (D * nf[b[0]] / cp[b[0]]) * (
            nc[b[1]] / T
        )

    for i, _ in docs:
        lps = [round(math.log(p(b)) * 1e6) for b in insts[i]]
        assert got[i] == (len(insts[i]), -sum(lps)), i

    # normalization: sum over all continuation TYPES w2 of P(w2|w1)
    # equals 1 for every prefix (within float tolerance)
    vocab2 = set(nc)
    for w1 in cp:
        s = sum(
            (max(c2.get((w1, w2), 0) - D, 0.0)) / cp[w1]
            + (D * nf[w1] / cp[w1]) * (nc[w2] / T)
            for w2 in vocab2
        )
        assert abs(s - 1.0) < 1e-9, (w1, s)


def test_funnel_windowed_feasible_sets_vs_bruteforce(spark):
    """The crafted case greedy-chained-min gets WRONG: user 1's
    earliest view is too old for any click window, but a later view
    converts — feasible-set semantics counts them; random streams
    match a python brute-force chain search at every step."""
    import datetime as dt
    import itertools as _it
    import random as _r

    from platform_etl_literature_spark.operators.funnel import (
        funnel_conversion_windowed,
    )

    def t(m):
        return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m)

    W = 600  # 10-minute window
    crafted = [
        # user 1: view@0 (too early), view@30, click@35, purchase@40
        (1, "view", t(0)), (1, "view", t(30)),
        (1, "click", t(35)), (1, "purchase", t(40)),
        # user 2: view@0, click@5, purchase@30 — purchase outside 10m
        (2, "view", t(0)), (2, "click", t(5)), (2, "purchase", t(30)),
        # user 3: click before any view — never reaches step 2
        (3, "click", t(0)), (3, "view", t(5)), (3, "purchase", t(6)),
    ]

    def run(rows):
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        return {
            r["step_idx"]: r["n_users"]
            for r in funnel_conversion_windowed(
                df, ["view", "click", "purchase"], max_step_seconds=W
            ).collect()
        }

    def brute(rows):
        per_user = {}
        for u, s, ts in rows:
            per_user.setdefault(u, []).append((s, ts.timestamp()))
        reach = {1: 0, 2: 0, 3: 0}
        steps = ["view", "click", "purchase"]
        for u, evs in per_user.items():
            best = 0
            for k in (3, 2, 1):
                found = False
                for chain in _it.permutations(
                    [e for e in evs if e[0] in steps], k
                ):
                    if all(chain[i][0] == steps[i] for i in range(k)) and all(
                        chain[i][1] < chain[i + 1][1]
                        and chain[i + 1][1] <= chain[i][1] + W
                        for i in range(k - 1)
                    ):
                        found = True
                        break
                if found:
                    best = k
                    break
            for k in range(1, best + 1):
                reach[k] += 1
        return reach

    assert run(crafted) == brute(crafted) == {1: 3, 2: 2, 3: 1}

    rng = _r.Random(13)
    types = ["view", "click", "purchase", "signup"]
    for trial in range(3):
        rows = [
            (
                rng.randrange(4),
                rng.choice(types),
                t(rng.randrange(0, 120)),
            )
            for _ in range(60)
        ]
        assert run(rows) == brute(rows), trial


def test_weighted_median_python_replay_and_contract(spark):
    """Weighted lower median matches a python replay on crafted and
    random multisets (incl. duplicate values whose weights pool);
    weight 1 everywhere degrades to the plain lower median; zero/NULL
    weights raise."""
    import random as _r

    from platform_etl_literature_spark.operators.robust import (
        weighted_median,
    )

    def run(rows):
        df = spark.createDataFrame(rows, "k string, v long, w long")
        return {
            r["k"]: r["wmed"]
            for r in weighted_median(df, ["k"], "v", "w").collect()
        }

    def ref(rows):
        groups = {}
        for k, v, w in rows:
            groups.setdefault(k, {})
            groups[k][v] = groups[k].get(v, 0) + w
        out = {}
        for k, m in groups.items():
            tot = sum(m.values())
            cum = 0
            for v in sorted(m):
                cum += m[v]
                if 2 * cum >= tot:
                    out[k] = v
                    break
        return out

    crafted = [
        ("a", 1, 1), ("a", 2, 1), ("a", 100, 7),   # weight drags it high
        ("b", 5, 3), ("b", 7, 3),                  # even split -> lower
        ("c", 9, 1), ("c", 9, 4), ("c", 10, 4),    # duplicate values pool
    ]
    got = run(crafted)
    assert got == ref(crafted)
    assert got["a"] == 100 and got["b"] == 5 and got["c"] == 9

    rng = _r.Random(99)
    rand = [
        (str(rng.randrange(3)), rng.randrange(20), rng.randrange(1, 9))
        for _ in range(200)
    ]
    assert run(rand) == ref(rand)

    import pytest as _pytest

    with _pytest.raises(Exception, match="positive integers"):
        run([("a", 1, 0)])


def test_equidepth_bins_and_skew_skip(spark):
    """equidepth_bins assigns each value the count of thresholds
    strictly below it (python replay); on a skewed (cubed) column the
    equi-depth layout scans no more files than the equi-width one for
    the mid-range band — skipping survives skew."""
    from platform_etl_literature_spark.operators.layout import (
        equidepth_bins,
        equidepth_thresholds,
        zonemap_skip_stats,
    )

    rows = [(i, i ** 3, i * 7 % 101) for i in range(300)]
    df = spark.createDataFrame(rows, "nat long, skew long, other long")
    bits = 4
    B = 1 << bits
    th = sorted(
        r["t"] for r in equidepth_thresholds(df, "skew", B).collect()
    )
    got = {
        (r["nat"]): (r["_bin_skew"], r["_bin_other"])
        for r in equidepth_bins(df, ["skew", "other"], bits=bits).collect()
    }
    th_o = sorted(
        r["t"] for r in equidepth_thresholds(df, "other", B).collect()
    )
    for nat, skew, other in rows:
        want = sum(1 for t in th if skew > t)
        want_o = sum(1 for t in th_o if other > t)
        assert got[nat] == (want, want_o), nat

    def scans(bins):
        return {
            (r["layout"], r["pred_col"]): r["n_scanned"]
            for r in zonemap_skip_stats(
                df, ["skew", "other"], "nat",
                n_files=16, bits=bits, bins=bins,
            ).collect()
        }

    ew = scans("equiwidth")
    ed = scans("equidepth")
    assert ed[("zorder-eqdepth", "skew")] <= ew[("zorder", "skew")]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="equiwidth|equidepth"):
        zonemap_skip_stats(df, ["skew"], "nat", bins="quantile")
    with _pytest.raises(ValueError, match="zorder"):
        zonemap_skip_stats(
            df, ["skew", "other"], "nat", curve="hilbert", bins="equidepth"
        )


def test_psi_drift_properties(spark):
    """PSI on sketches: identical windows give exactly 0 (integer
    nano fold, no float residue); a swapped comparison gives the SAME
    value (the term is symmetric under p<->q); a genuinely shifted
    window crosses the 0.25 rule-of-thumb while a resampled same
    distribution stays tiny."""
    from platform_etl_literature_spark.operators import sketch as SK

    def build(vals, g="x"):
        df = spark.createDataFrame([(g, v) for v in vals], "g string, v long")
        return SK.hdr_build(df, "v", m=8, keys=["g"])

    base = [int(1 + (i * 37) % 400) for i in range(500)]
    same = [int(1 + (i * 53) % 400) for i in range(400)]  # same range
    shifted = [v * 64 for v in base]                      # 6 octaves up

    a = build(base)
    assert SK.psi_drift(a, build(base), keys=["g"]).collect()[0][
        "psi_nano"
    ] == 0

    ab = SK.psi_drift(a, build(shifted), keys=["g"]).collect()[0]
    ba = SK.psi_drift(build(shifted), a, keys=["g"]).collect()[0]
    assert ab["psi"] > 0.25          # shifted: flags as drifted
    assert ab["psi_nano"] == ba["psi_nano"]  # symmetric

    near = SK.psi_drift(a, build(same), keys=["g"]).collect()[0]
    assert near["psi"] < 0.1, near["psi"]   # same family: stable
    assert ab["n_buckets"] >= near["n_buckets"]


def test_metric_drift_gate_semantics(spark):
    """The anomaly gate: a stable metric passes; a collapse that
    still clears a static threshold fails here; short history gives
    UNKNOWN (NULL passed — the gate's coalesce treats it as failed);
    a zero-MAD (constant) history passes only an exactly-equal
    current value."""
    from platform_etl_literature_spark.operators.quality_checks import (
        metric_drift,
    )

    def frame(rows):
        return spark.createDataFrame(
            rows, "check string, target string, metric double"
        )

    hist = frame(
        # completeness of col_a: tight history around 0.99
        [("comp", "a", 0.99 + 0.001 * (i % 3 - 1)) for i in range(10)]
        # col_b: constant history (MAD = 0)
        + [("comp", "b", 1.0) for _ in range(10)]
        # col_c: too little history
        + [("comp", "c", 0.5) for _ in range(3)]
    )
    cur = frame(
        [
            ("comp", "a", 0.989),  # inside the envelope
            ("comp", "b", 1.0),    # equals the constant -> pass
            ("comp", "c", 0.5),    # short history -> unknown
            ("comp", "d", 0.9),    # NO history at all -> unknown
        ]
    )
    got = {
        r["target"]: (r["passed"], r["n_history"])
        for r in metric_drift(hist, cur).collect()
    }
    assert got["a"] == (True, 10)
    assert got["b"] == (True, 10)
    assert got["c"] == (None, 3)
    assert got["d"] == (None, 0)

    # the collapse: 0.97 clears a 0.95 static bound but is ~13 MAD out
    cur2 = frame([("comp", "a", 0.97), ("comp", "b", 0.999)])
    got2 = {
        r["target"]: r["passed"] for r in metric_drift(hist, cur2).collect()
    }
    assert got2["a"] is False
    assert got2["b"] is False  # zero-MAD history: only equality passes


def test_personalized_pagerank_python_replay_and_locality(spark):
    """Seeded PageRank matches an exact python replay of the integer
    recurrence on a path graph (nano-for-nano); rank decays with
    distance from the seed; absent seeds are ignored and an
    entirely-absent seed set raises."""
    from platform_etl_literature_spark.operators import pagerank as PR

    edges = [(i, i + 1) for i in range(8)]  # path 0-1-...-8
    df = spark.createDataFrame(edges, "u long, v long")
    sym = PR.symmetrize(df)
    got = {
        r["node"]: r["rank_nano"]
        for r in PR.pagerank(sym, n_iter=4, seeds=[0]).collect()
    }

    # python replay (identical integer semantics; no dangling nodes
    # on a symmetrized graph)
    scale, dp = 10**9, 85
    adj = {}
    out = {}
    for u, v in edges:
        adj.setdefault(v, []).append(u)
        adj.setdefault(u, []).append(v)
        out[u] = out.get(u, 0) + 1
        out[v] = out.get(v, 0) + 1
    ns = 1
    tp = ((100 - dp) * scale) // (100 * ns)
    rank = {n: (scale // ns if n == 0 else 0) for n in adj}
    for _ in range(4):
        contrib = {
            n: sum(rank[m] // out[m] for m in adj[n]) for n in adj
        }
        rank = {
            n: (tp if n == 0 else 0) + (dp * contrib[n]) // 100
            for n in adj
        }
    assert got == rank

    # locality theorems (mass moves one hop per iteration, so decay
    # along a path is WAVE-shaped, not monotone): the seed keeps the
    # max rank, anything farther than n_iter hops has EXACTLY zero,
    # and the frontier node at distance n_iter is reachable
    assert got[0] == max(got.values())
    assert got[5] == got[6] == got[7] == got[8] == 0  # > 4 hops away
    assert got[4] > 0                                  # == 4 hops

    # absent seeds ignored; all-absent raises
    got2 = {
        r["node"]: r["rank_nano"]
        for r in PR.pagerank(sym, n_iter=4, seeds=[0, 999]).collect()
    }
    assert got2 == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no seed"):
        PR.pagerank(sym, n_iter=1, seeds=[999])
    with _pytest.raises(ValueError, match="non-empty"):
        PR.pagerank(sym, n_iter=1, seeds=[])


# ---------------------------------------------------------------------------
# link prediction (operators.graph.link_prediction_scores)
# ---------------------------------------------------------------------------


def test_link_prediction_square_with_diagonal(spark):
    """Square 1-2, 2-4, 4-3, 3-1 plus diagonal 2-3: the only
    distance-2 non-edge is (1, 4), witnessed by BOTH centers 2 and 3
    — cn, true degrees, exact-fraction jaccard, and the integer
    Adamic-Adar sum all checkable by hand."""
    import math

    from platform_etl_literature_spark.operators.graph import (
        link_prediction_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], ["u", "v"]
    )
    rows = link_prediction_scores(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    aa_term = round(1000000.0 / math.log(3))
    assert (r["u"], r["v"], r["cn"]) == (1, 4, 2)
    assert (r["deg_u"], r["deg_v"]) == (2, 2)
    assert r["jaccard"] == 1.0  # 2 / (2 + 2 - 2)
    assert r["aa_micro"] == 2 * aa_term


def test_link_prediction_center_cap_and_validation(spark):
    """Centers above max_center_degree stop witnessing pairs (declared
    valve semantics); endpoint degrees stay the TRUE degrees."""
    from platform_etl_literature_spark.operators.graph import (
        link_prediction_scores,
    )

    # star: hub 0 connected to 1..4 — every leaf pair is distance 2
    edges = spark.createDataFrame([(0, i) for i in range(1, 5)], ["u", "v"])
    full = link_prediction_scores(edges, max_center_degree=64).collect()
    assert len(full) == 6  # C(4,2) leaf pairs, all witnessed by the hub
    assert all(r["cn"] == 1 and r["deg_u"] == 1 for r in full)
    capped = link_prediction_scores(edges, max_center_degree=3).collect()
    assert capped == []  # hub deg 4 > cap: nothing may witness
    with pytest.raises(ValueError, match="max_center_degree"):
        link_prediction_scores(edges, max_center_degree=1)


# ---------------------------------------------------------------------------
# seasonal profile (operators.timeseries.seasonal_profile)
# ---------------------------------------------------------------------------


def test_seasonal_profile_exact_decomposition(spark):
    """Hand-checkable hourly profile: phase means, offsets vs the
    grand mean, and volume shares are exact; NULL values are skipped;
    a bad period raises."""
    import datetime as dt

    from platform_etl_literature_spark.operators.timeseries import (
        seasonal_profile,
    )

    t = lambda h, m=0: dt.datetime(2024, 1, 1 + m, h, 30)  # noqa: E731
    rows = [
        ("a", t(9), 10.0), ("a", t(9, 1), 20.0),   # phase 9: mean 15
        ("a", t(17), 40.0),                         # phase 17: mean 40
        ("a", t(17, 1), None),                      # skipped
        ("b", t(3), 7.5),
    ]
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {
        (r["event_type"], r["phase"]): r
        for r in seasonal_profile(ev, ["event_type"]).collect()
    }
    assert set(out) == {("a", 9), ("a", 17), ("b", 3)}
    a9 = out[("a", 9)]
    # grand mean over a: (10+20+40)/3 = 23.333333
    assert (a9["n"], a9["mean_value"]) == (2, 15.0)
    assert a9["seasonal_offset"] == round(15.0 - 70.0 / 3 / 1, 6)
    assert a9["volume_share"] == round(2 / 3, 6)
    a17 = out[("a", 17)]
    assert (a17["n"], a17["mean_value"]) == (1, 40.0)
    b3 = out[("b", 3)]
    assert (b3["seasonal_offset"], b3["volume_share"]) == (0.0, 1.0)
    with pytest.raises(ValueError, match="period"):
        seasonal_profile(ev, ["event_type"], period="weekly")


# ---------------------------------------------------------------------------
# n-gram containment (operators.dedup.ngram_containment_pairs)
# ---------------------------------------------------------------------------


def test_ngram_containment_detects_embedded_excerpt(spark):
    """A short doc fully embedded in a long one: containment(A in B)
    = 1.0 while jaccard is small — the asymmetry the operator exists
    for.  Directions are exact fractions; disjoint docs emit no
    pair."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),                       # 3 trigrams
            (2, "x y a b c d e f g h i j"),         # 10 trigrams, embeds 1
            (3, "p q r s t u"),                     # disjoint
        ],
        ["doc_id", "text"],
    )
    rows = D.ngram_containment_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["n_inter"]) == (1, 2, 3)
    assert r["cont_a_in_b"] == 1.0
    assert r["cont_b_in_a"] == 0.3
    assert r["containment"] == 1.0


def test_ngram_containment_threshold_filters(spark):
    """Pairs below the max-direction threshold are dropped."""
    docs = spark.createDataFrame(
        [(1, "a b c x1 x2 x3 x4 x5"), (2, "a b c y1 y2 y3 y4 y5")],
        ["doc_id", "text"],
    )
    # 6 trigrams each, 1 shared ("a b c"): containment 1/6 each way
    assert (
        D.ngram_containment_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.5
        ).count()
        == 0
    )
    rows = D.ngram_containment_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.1
    ).collect()
    assert len(rows) == 1 and rows[0]["containment"] == round(1 / 6, 6)


# ---------------------------------------------------------------------------
# Moore-Lewis selection (operators.lm)
# ---------------------------------------------------------------------------


def test_moore_lewis_ranks_target_like_docs_first(spark):
    """A doc built from target-corpus bigrams outscores one sharing
    nothing with the target; per-shard quotas are exact ceil(frac·n)
    and the ranking is the declared total order."""
    from platform_etl_literature_spark.operators.lm import (
        moore_lewis_select,
        moore_lewis_weights,
    )

    target = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "the dog sat on the rug")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "s1"),
            (2, "zz qq ww ee rr tt", "s1"),
            (3, "the dog sat on the rug", "s1"),
            (4, "aa bb cc dd ee ff", "s1"),
        ],
        ["doc_id", "text", "source"],
    )
    w = {
        r["id"]: r["w_micro"]
        for r in moore_lewis_weights(docs, target, "doc_id", "text").collect()
    }
    assert w[1] > w[2] and w[3] > w[4]

    sel = moore_lewis_select(
        docs, target, "doc_id", "text", "source", keep_frac=0.25
    ).collect()
    assert len(sel) == 4
    chosen = [r["id"] for r in sel if r["selected"]]
    assert len(chosen) == 1  # ceil(0.25 * 4)
    assert chosen[0] in (1, 3)  # the target-like docs
    ranks = sorted((r["rk"], r["id"]) for r in sel)
    assert [rk for rk, _ in ranks] == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="keep_frac"):
        moore_lewis_select(
            docs, target, "doc_id", "text", "source", keep_frac=0.0
        )


# ---------------------------------------------------------------------------
# evaluation metrics (operators.evalmetrics)
# ---------------------------------------------------------------------------


def test_ranking_metrics_hand_checked(spark):
    """recall@k / MRR@k / nDCG@k against hand-computed values,
    including the zero-relevant query (trec_eval zero conventions)."""
    import math

    from platform_etl_literature_spark.operators.evalmetrics import (
        ranking_metrics,
    )

    rows = [
        ("q1", 1, 0), ("q1", 2, 1), ("q1", 3, 1), ("q1", 4, 1),
        ("q2", 1, 0), ("q2", 2, 0),
    ]
    ranked = spark.createDataFrame(rows, ["query_id", "rank", "relevant"])
    out = {r["query_id"]: r for r in ranking_metrics(ranked, k=3).collect()}

    g = lambda r: round(1000000.0 / math.log2(r + 1))  # noqa: E731
    q1 = out["q1"]
    assert (q1["n_rel"], q1["n_rel_at_k"]) == (3, 2)
    assert q1["recall_at_k"] == round(2 / 3, 6)
    assert q1["mrr_at_k"] == 0.5
    assert q1["dcg_micro"] == g(2) + g(3)
    assert q1["idcg_micro"] == g(1) + g(2) + g(3)  # min(n_rel, k) = 3
    assert q1["ndcg_at_k"] == round((g(2) + g(3)) / (g(1) + g(2) + g(3)), 6)
    q2 = out["q2"]
    assert (q2["n_rel"], q2["recall_at_k"], q2["mrr_at_k"]) == (0, 0.0, 0.0)
    assert (q2["idcg_micro"], q2["ndcg_at_k"]) == (0, 0.0)
    with pytest.raises(ValueError, match="k must be"):
        ranking_metrics(ranked, k=0)


def test_classification_report_and_kappa_hand_checked(spark):
    """Per-class precision/recall/F1 and Cohen's kappa from one
    contingency table, zero-division conventions included."""
    from platform_etl_literature_spark.operators.evalmetrics import (
        classification_report,
        cohens_kappa,
    )

    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "b")]
    labeled = spark.createDataFrame(rows, ["label", "pred"])
    rep = {r["label"]: r for r in classification_report(labeled).collect()}
    assert (rep["a"]["precision"], rep["a"]["recall"]) == (1.0, 0.5)
    assert rep["a"]["f1"] == round(2 / 3, 6)
    assert (rep["b"]["precision"], rep["b"]["recall"]) == (0.5, 1.0)
    assert (rep["c"]["n_pred"], rep["c"]["precision"], rep["c"]["f1"]) == (
        0, 0.0, 0.0,
    )

    k = cohens_kappa(labeled).collect()[0]
    # n=5, agree=3, marginal product = 2*1 + 2*4 = 10 -> pe = 0.4
    assert (k["n"], k["n_agree"], k["po"], k["pe"]) == (5, 3, 0.6, 0.4)
    assert k["kappa"] == round((0.6 - 0.4) / 0.6, 6)


def test_cohens_kappa_degenerate_total_agreement(spark):
    """A single-class table has pe = 1; kappa reports 0.0 by
    convention instead of 0/0."""
    from platform_etl_literature_spark.operators.evalmetrics import (
        cohens_kappa,
    )

    labeled = spark.createDataFrame(
        [("x", "x"), ("x", "x")], ["label", "pred"]
    )
    k = cohens_kappa(labeled).collect()[0]
    assert (k["po"], k["pe"], k["kappa"]) == (1.0, 1.0, 0.0)


# --------------------------------------------------------------------------
# batch-5: exact drift tests, grouped OLS, KMV overlap, landmark BFS
# --------------------------------------------------------------------------


def test_ks_2samp_matches_reference(spark):
    """KS distance on a crafted pair vs the hand-computed supremum."""
    from platform_etl_literature_spark.operators import robust as RB

    # A = {1,2,3,4}, B = {3,4,5,6}: ECDFs diverge most at v=2
    # (F_A=0.5, F_B=0) and v=4 (F_A=1, F_B=0.5): D = 0.5
    rows = [(v, True) for v in (1, 2, 3, 4)] + [
        (v, False) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, ["v", "s"])
    out = RB.ks_2samp(df, "v", "s").collect()[0]
    assert out["n_a"] == 4 and out["n_b"] == 4
    assert out["d_num"] == 8  # |2*4 - 0*4| at v=2
    assert out["ks_d"] == 0.5


def test_ks_2samp_identical_samples_zero(spark):
    from platform_etl_literature_spark.operators import robust as RB

    rows = [(k, v, s) for k in ("a", "b") for v in (1, 2, 3)
            for s in (True, False)]
    df = spark.createDataFrame(rows, ["k", "v", "s"])
    for r in RB.ks_2samp(df, "v", "s", key_cols=["k"]).collect():
        assert r["d_num"] == 0 and r["ks_d"] == 0.0


def test_ks_2samp_duplicates_collapse_to_cells(spark):
    """A million-copy hot value must cost one cell; verify the counts
    path with duplicate-heavy data gives the same D as the expanded
    computation."""
    from platform_etl_literature_spark.operators import robust as RB

    rows = [(1, True)] * 50 + [(2, True)] * 50 + [(2, False)] * 100
    df = spark.createDataFrame(rows, ["v", "s"])
    out = RB.ks_2samp(df, "v", "s").collect()[0]
    # F_A(1)=0.5 F_B(1)=0 -> |50*100 - 0*100| = 5000
    assert out["d_num"] == 5000 and out["ks_d"] == 0.5


def test_grouped_ols_matches_numpy(spark):
    import numpy as np

    from platform_etl_literature_spark.operators import robust as RB

    pts = {
        "g1": [(1, 10), (2, 12), (3, 15), (4, 19), (5, 20)],
        "g2": [(1, 100), (2, 80), (3, 60)],
    }
    rows = [(g, x, y) for g, ps in pts.items() for x, y in ps]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in RB.grouped_ols(df, "x", "y", ["g"]).collect()}
    for g, ps in pts.items():
        xs = np.array([p[0] for p in ps], dtype=float)
        ys = np.array([p[1] for p in ps], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(out[g]["slope"] - slope) < 1e-6
        assert abs(out[g]["intercept"] - intercept) < 1e-6
        assert abs(out[g]["r2"] - r * r) < 1e-6


def test_grouped_ols_degenerate_groups(spark):
    from platform_etl_literature_spark.operators import robust as RB

    rows = [
        ("flatx", 2, 5), ("flatx", 2, 9),        # zero x-variance
        ("flaty", 1, 7), ("flaty", 2, 7),         # zero y-variance
        ("single", 3, 4),                          # one point
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in RB.grouped_ols(df, "x", "y", ["g"]).collect()}
    assert out["flatx"]["slope"] is None and out["flatx"]["r2"] is None
    assert out["flaty"]["slope"] == 0.0 and out["flaty"]["r2"] is None
    assert out["single"]["slope"] is None


def test_chi2_drift_identical_mix_is_zero(spark):
    from platform_etl_literature_spark.operators import quality_checks as QC

    rows = [(c, s) for c in ("x", "y", "z") for s in (True, False)
            for _ in range(10)]
    df = spark.createDataFrame(rows, ["cat", "s"])
    out = QC.chi2_drift(df, "cat", "s").collect()[0]
    assert out["chi2_nano"] == 0 and out["dof"] == 2


def test_chi2_drift_matches_reference_value(spark):
    """2x2 crafted table vs the textbook chi-squared statistic."""
    from platform_etl_literature_spark.operators import quality_checks as QC

    # A: 30 x, 10 y; B: 10 x, 30 y -> chi2 = 20.0 exactly
    rows = ([("x", True)] * 30 + [("y", True)] * 10
            + [("x", False)] * 10 + [("y", False)] * 30)
    df = spark.createDataFrame(rows, ["cat", "s"])
    out = QC.chi2_drift(df, "cat", "s").collect()[0]
    assert out["n_a"] == 40 and out["n_b"] == 40
    assert abs(out["chi2"] - 20.0) < 1e-6


def test_kmv_pairwise_jaccard_exact_small_sets(spark):
    """With k larger than every set, the sketches are exact and the
    'estimates' must equal the true Jaccard/intersection."""
    from platform_etl_literature_spark.operators import kmv as KMV

    sets = {
        "a": ["p", "q", "r", "s"],
        "b": ["r", "s", "t", "u"],   # |a∩b|=2 |a∪b|=6
        "c": ["zz1", "zz2"],          # disjoint from both
    }
    rows = [(g, t) for g, ts in sets.items() for t in ts]
    df = spark.createDataFrame(rows, ["g", "t"])
    sk = KMV.kmv_sketch(df, "t", 64, key_cols=["g"])
    out = {
        (r["g_a"], r["g_b"]): r
        for r in KMV.kmv_pairwise_jaccard(sk, 64, "g").collect()
    }
    ab = out[("a", "b")]
    assert ab["n_common"] == 2 and ab["n_union"] == 6
    assert abs(ab["jaccard"] - round(2 / 6, 6)) < 1e-9
    assert out[("a", "c")]["n_common"] == 0
    assert out[("b", "c")]["jaccard"] == 0.0 or out[("b", "c")]["n_common"] == 0


def test_kmv_pairwise_jaccard_theta_truncation(spark):
    """When one side's sketch is full, only hashes below the smaller
    theta may count — n_common/n_union never exceed k."""
    from platform_etl_literature_spark.operators import kmv as KMV

    k = 8
    rows = [("big", f"tok{i}") for i in range(100)] + [
        ("small", f"tok{i}") for i in range(50, 55)
    ]
    df = spark.createDataFrame(rows, ["g", "t"])
    sk = KMV.kmv_sketch(df, "t", k, key_cols=["g"])
    r = KMV.kmv_pairwise_jaccard(sk, k, "g").collect()[0]
    assert r["n_union"] <= 2 * k
    assert 0 <= r["n_common"] <= k
    assert 0.0 <= r["jaccard"] <= 1.0


def test_bfs_distances_path_graph(spark):
    from platform_etl_literature_spark.operators import graph as GR

    # path 1-2-3-4-5, seed {1}: dist = hops along the path
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r["dist"]
           for r in GR.bfs_distances(edges, seeds, max_hops=10).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    assert GR.last_bfs_hops == 4


def test_bfs_distances_multi_seed_min(spark):
    from platform_etl_literature_spark.operators import graph as GR

    # path 1-2-3-4-5 with seeds {1,5}: node 3 is 2 from both
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(1,), (5,)], ["node"])
    out = {r["node"]: r["dist"]
           for r in GR.bfs_distances(edges, seeds, max_hops=10).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


def test_bfs_distances_hop_bound_and_unreached(spark):
    from platform_etl_literature_spark.operators import graph as GR

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r["dist"]
           for r in GR.bfs_distances(edges, seeds, max_hops=2).collect()}
    # bounded at 2 hops; disconnected component absent entirely
    assert out == {1: 0, 2: 1, 3: 2}


def test_bfs_distances_shuffle_path_matches_broadcast(spark):
    from platform_etl_literature_spark.operators import graph as GR

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4), (4, 5), (5, 3)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(3,)], ["node"])
    a = {r["node"]: r["dist"]
         for r in GR.bfs_distances(edges, seeds, 5, True).collect()}
    b = {r["node"]: r["dist"]
         for r in GR.bfs_distances(edges, seeds, 5, False).collect()}
    assert a == b == {3: 0, 2: 1, 5: 1, 1: 2, 4: 2}


def test_ks_and_chi2_from_counts_match_raw(spark):
    """The counts-based entry points (the stream-state composition
    path) must equal the raw-row twins exactly, including when a value
    is absent on one side."""
    from platform_etl_literature_spark.operators.quality_checks import (
        chi2_drift,
        chi2_from_counts,
    )
    from platform_etl_literature_spark.operators.robust import (
        ks_2samp,
        ks_from_counts,
    )

    a_vals = [1, 1, 2, 3, 3, 3, 7]
    b_vals = [2, 2, 3, 9]
    raw = spark.createDataFrame(
        [(v, True) for v in a_vals] + [(v, False) for v in b_vals],
        ["v", "s"],
    )
    ca = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 3), (7, 1)], ["v", "cnt"]
    )
    cb = spark.createDataFrame([(2, 2), (3, 1), (9, 1)], ["v", "cnt"])

    k_raw = ks_2samp(raw, "v", "s").collect()[0]
    k_cnt = ks_from_counts(ca, cb, "v").collect()[0]
    assert (k_raw["d_num"], k_raw["n_a"], k_raw["n_b"]) == (
        k_cnt["d_num"], k_cnt["n_a"], k_cnt["n_b"],
    )
    assert k_raw["ks_lambda"] == k_cnt["ks_lambda"]

    c_raw = chi2_drift(raw, "v", "s").collect()[0]
    c_cnt = chi2_from_counts(ca, cb, "v").collect()[0]
    assert c_raw["chi2_nano"] == c_cnt["chi2_nano"]
    assert c_raw["n_cats"] == c_cnt["n_cats"] == 5


def test_ts_shape_signature_bits_and_octave(spark):
    from platform_etl_literature_spark.operators import timeseries as TSO

    # 8 positions, 4 segments of 2: values chosen so segments 1 and 3
    # are above the series mean (total=80, mean=10/pos, seg mean over
    # 2 pos vs series mean: seg sums are 4, 36, 4, 36)
    rows = [(1, 0, 2), (1, 1, 2), (1, 2, 16), (1, 3, 20),
            (1, 4, 2), (1, 5, 2), (1, 6, 18), (1, 7, 18)]
    df = spark.createDataFrame(rows, ["id", "p", "v"])
    sig = TSO.ts_shape_signature(df, "id", "p", "v", 8, 4).collect()[0]
    # bits: seg1 (36*4=144>80) and seg3 -> 0b1010 = 10; octave =
    # length(bin(81)) = 7, shifted by 4 -> 112; sig = 122
    assert sig["total"] == 80
    assert sig["sig"] == 10 + (7 << 4)


def test_ts_similar_pairs_exact_correlation(spark):
    import numpy as np

    from platform_etl_literature_spark.operators import timeseries as TSO

    # ids 1,2: same shape bits AND same activity octave (equal totals)
    # -> candidates; their exact r comes from numpy.  id 4 is far away
    # in octave (never a candidate); a doubled copy of id 1 (id 5)
    # shares shape bits but NOT the octave -> correctly not paired
    # with id 1 despite r=1 (the volume-scale guard is the point).
    v1 = [1, 2, 3, 4, 1, 2, 3, 4]
    v2 = [1, 2, 4, 4, 1, 2, 3, 3]  # total 20 == id 1's
    rows = []
    for p in range(8):
        rows += [(1, p, v1[p]), (2, p, v2[p]),
                 (4, p, 1000 + p), (5, p, 2 * v1[p])]
    df = spark.createDataFrame(rows, ["id", "p", "v"])
    out = TSO.ts_similar_pairs(
        df, "id", "p", "v", length=8, n_segments=4, min_r=0.5,
        max_bucket_size=None,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["r"] for r in out}
    want = round(float(np.corrcoef(
        np.array(v1, dtype=float), np.array(v2, dtype=float))[0, 1]), 6)
    assert set(pairs) == {(1, 2)}
    assert abs(pairs[(1, 2)] - want) < 1e-9


def test_ts_similar_pairs_missing_positions_are_zeros(spark):
    from platform_etl_literature_spark.operators import timeseries as TSO

    # id 1 has positions {0,1}, id 2 has {1,2}: with zero-fill over
    # length 4 the exact r is computable by hand
    import numpy as np

    df = spark.createDataFrame(
        [(1, 0, 5), (1, 1, 3), (2, 1, 5), (2, 2, 3)], ["id", "p", "v"]
    )
    out = TSO.ts_similar_pairs(
        df, "id", "p", "v", length=4, n_segments=2, min_r=-1.0,
        max_bucket_size=None,
    ).collect()
    # both series sig: front-loaded bit + total 8 -> same bucket
    assert len(out) == 1
    a = np.array([5, 3, 0, 0], dtype=float)
    b = np.array([0, 5, 3, 0], dtype=float)
    want = round(float(np.corrcoef(a, b)[0, 1]), 6)
    assert abs(out[0]["r"] - want) < 1e-9


def test_ts_shape_signature_validation(spark):
    from platform_etl_literature_spark.operators import timeseries as TSO

    df = spark.createDataFrame([(1, 0, 1)], ["id", "p", "v"])
    with pytest.raises(ValueError):
        TSO.ts_shape_signature(df, "id", "p", "v", 10, 4)
    with pytest.raises(ValueError):
        TSO.ts_shape_signature(df, "id", "p", "v", 62, 31)


def test_ts_similar_planted_near_duplicates_full_recall(spark):
    """The signature's design regime: planted near-identical series
    (same totals, same segment profile, tiny within-segment jitter)
    ALWAYS bucket together — recall 1.0 over the planted pairs — while
    the unrelated decoys contribute no false candidates at the pair
    threshold."""
    import numpy as np

    from platform_etl_literature_spark.operators import timeseries as TSO

    rng = np.random.RandomState(7)
    rows = []
    planted = []
    base_id = 0
    for dup in range(6):
        base = rng.randint(5, 40, size=8)
        # jitter INSIDE segments (swap mass between the two positions
        # of one segment) keeps every segment sum — and the signature
        # — identical while the series differ pointwise
        twin = base.copy()
        for s in range(4):
            j = min(twin[2 * s], 2)
            twin[2 * s] -= j
            twin[2 * s + 1] += j
        a, b = base_id, base_id + 1
        base_id += 2
        planted.append((a, b))
        for p in range(8):
            rows += [(a, p, int(base[p])), (b, p, int(twin[p]))]
    # decoys: distinct octaves, far from everything
    for d in range(5):
        for p in range(8):
            rows.append((1000 + d, p, int(10 ** (d % 3 + 2) + p)))
    df = spark.createDataFrame(rows, ["id", "p", "v"])
    out = TSO.ts_similar_pairs(
        df, "id", "p", "v", length=8, n_segments=4, min_r=0.8,
        max_bucket_size=None,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    for pair in planted:
        # exact same segment sums -> same bits AND same octave: the
        # planted twin is always a candidate; high r clears the verify
        a, b = pair
        va = np.array([v for i, p, v in rows if i == a], dtype=float)
        vb = np.array([v for i, p, v in rows if i == b], dtype=float)
        if np.corrcoef(va, vb)[0, 1] >= 0.8:
            assert pair in got, (pair, got)


def test_cusum_changepoint_finds_planted_shift(spark):
    from platform_etl_literature_spark.operators import timeseries as TSO

    # 10 at positions 1..10, then 50 at 11..20: |S_d| peaks at the
    # shift boundary d=10 (pos 10)
    rows = [("k", p, 10) for p in range(1, 11)] + [
        ("k", p, 50) for p in range(11, 21)
    ]
    out = TSO.cusum_changepoint(
        spark.createDataFrame(rows, ["g", "p", "v"]), "g", "p", "v"
    ).collect()[0]
    assert out["n_pos"] == 20 and out["total"] == 600
    assert out["cp_pos"] == 10
    # S_10 = 100 - 10*600/20 = -200; scaled by n=20 -> 4000
    assert out["s_max_scaled"] == 4000
    assert out["cusum"] == 200.0


def test_cusum_changepoint_flat_series_and_tiebreak(spark):
    from platform_etl_literature_spark.operators import timeseries as TSO

    rows = [("flat", p, 7) for p in range(5)]
    out = TSO.cusum_changepoint(
        spark.createDataFrame(rows, ["g", "p", "v"]), "g", "p", "v"
    ).collect()[0]
    # every S_d == 0: tie -> smallest position
    assert out["s_max_scaled"] == 0 and out["cp_pos"] == 0


def test_event_transitions_counts_and_probs(spark):
    import datetime

    from platform_etl_literature_spark.operators import sessionize as SSX

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    # user 1: a -> b -> a -> b ; user 2: b -> b
    seq = {1: ["a", "b", "a", "b"], 2: ["b", "b"]}
    eid = 0
    for u, types in seq.items():
        for i, ty in enumerate(types):
            rows.append((eid, t0 + datetime.timedelta(minutes=i), u, ty))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n_steps"], r["p"])
        for r in SSX.event_transitions(df).collect()
    }
    # steps: u1 a->b, b->a, a->b ; u2 b->b
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")][0] == 1 and out[("b", "b")][0] == 1
    assert out[("b", "a")][1] == 0.5 and out[("b", "b")][1] == 0.5


def test_theil_sen_resists_outlier_ols_does_not(spark):
    from platform_etl_literature_spark.operators import robust as RB

    # perfect slope-2 line with one wrecked day
    rows = [("k", x, 2 * x) for x in range(1, 10)] + [("k", 10, 100000)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    ts = RB.grouped_theil_sen(df, "x", "y", ["g"]).collect()[0]
    ols = RB.grouped_ols(df, "x", "y", ["g"]).collect()[0]
    assert ts["n"] == 10 and ts["n_pairs"] == 45
    assert ts["slope"] == 2.0          # the median slope ignores the spike
    assert ts["intercept"] == 0.0
    assert ols["slope"] > 1000         # OLS is dragged by the outlier


def test_theil_sen_exact_small_case(spark):
    from platform_etl_literature_spark.operators import robust as RB

    # 3 points -> 3 pairwise slopes: (1,1),(2,3),(3,4): s = 2, 1, 1.5
    # -> median 1.5; residuals y-1.5x: -0.5, 0, -0.5 -> median -0.5
    df = spark.createDataFrame(
        [("k", 1, 1), ("k", 2, 3), ("k", 3, 4)], ["g", "x", "y"]
    )
    out = RB.grouped_theil_sen(df, "x", "y", ["g"]).collect()[0]
    assert out["slope"] == 1.5 and out["intercept"] == -0.5


def test_theil_sen_group_cap_excludes_loudly(spark):
    from platform_etl_literature_spark.operators import robust as RB

    rows = [("big", x, x) for x in range(20)] + [
        ("small", x, 3 * x) for x in range(5)
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in RB.grouped_theil_sen(
        df, "x", "y", ["g"], max_group_points=10
    ).collect()}
    assert set(out) == {"small"}       # over-cap group absent, countable
    assert out["small"]["slope"] == 3.0


def test_pmi_collocations_hand_counts(spark):
    from platform_etl_literature_spark.operators import textstats as TS

    import math

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),
            (2, "a b x"),
            (3, "b c"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in TS.pmi_collocations(
            docs, "doc_id", "text", min_pair_count=2
        ).collect()
    }
    # unigrams: a=3 b=4 c=2 x=1, N1=10; bigrams: ab=3 ba=1 bc=2 bx=1, N2=7
    assert set(out) == {("a", "b"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab["n_pair"] == 3
    assert abs(ab["pmi"] - math.log((3 * 10 / 3) * (10 / (4 * 7)))) < 1e-6
    bc = out[("b", "c")]
    assert bc["n_pair"] == 2
    assert abs(bc["pmi"] - math.log((2 * 10 / 4) * (10 / (2 * 7)))) < 1e-6


def test_acf_lags_matches_numpy_paired_pearson(spark):
    import numpy as np

    from platform_etl_literature_spark.operators import timeseries as TSO

    ys = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame(
        [("s", i, y) for i, y in enumerate(ys)], ["id", "p", "y"]
    )
    out = {
        r["lag"]: r
        for r in TSO.acf_lags(df, "id", "p", "y", max_lag=3).collect()
    }
    arr = np.array(ys, dtype=float)
    for k in (1, 2, 3):
        x, y = arr[k:], arr[:-k]
        want = np.corrcoef(x, y)[0, 1]
        assert out[k]["n_pairs"] == len(ys) - k
        assert abs(out[k]["r"] - want) < 1e-6


def test_acf_lags_short_and_constant_series(spark):
    from platform_etl_literature_spark.operators import timeseries as TSO

    df = spark.createDataFrame(
        [("short", 0, 1), ("short", 1, 2), ("flat", 0, 7), ("flat", 1, 7),
         ("flat", 2, 7)],
        ["id", "p", "y"],
    )
    rows = TSO.acf_lags(df, "id", "p", "y", max_lag=3).collect()
    by = {(r["id"], r["lag"]): r for r in rows}
    # every (id, lag) row exists even when there are no aligned pairs
    assert len(rows) == 6
    assert by[("short", 2)]["n_pairs"] == 0
    assert by[("short", 2)]["r"] is None
    # constant series: zero variance -> NULL r, but pairs counted
    assert by[("flat", 1)]["n_pairs"] == 2
    assert by[("flat", 1)]["r"] is None


def test_ab_welch_matches_scipy_formula(spark):
    import math

    from platform_etl_literature_spark.operators import evalmetrics as EV

    a = [10, 12, 14, 11, 13]
    b = [20, 22, 19, 25]
    rows = [("ctl", v) for v in a] + [("trt", v) for v in b]
    df = spark.createDataFrame(rows, ["arm", "v"])
    out = {r["arm"]: r for r in EV.ab_welch(df, "arm", "v", "ctl").collect()}
    # hand Welch: means, sample vars
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t = (mb - ma) / math.sqrt(se2)
    dfw = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert out["ctl"]["t"] is None and out["ctl"]["df_welch"] is None
    assert abs(out["trt"]["t"] - t) < 1e-6
    assert abs(out["trt"]["df_welch"] - dfw) < 1e-6
    assert abs(out["trt"]["mean"] - mb) < 1e-6
    assert abs(out["trt"]["var"] - vb) < 1e-6


def test_lift_table_exact_buckets_and_lift(spark):
    from platform_etl_literature_spark.operators import evalmetrics as EV

    # 10 rows, scores 10..1 (unique), top half all positive
    rows = [(i, 11 - i, 1 if i <= 5 else 0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["id", "score", "y"])
    out = {
        r["bucket"]: r
        for r in EV.lift_table(df, "score", "y", "id", n_buckets=5).collect()
    }
    assert [out[b]["n"] for b in range(1, 6)] == [2, 2, 2, 2, 2]
    assert [out[b]["n_pos"] for b in range(1, 6)] == [2, 2, 1, 0, 0]
    # base rate 0.5; bucket1 cum_rate 1.0 -> lift 2.0
    assert abs(out[1]["lift"] - 2.0) < 1e-6
    assert abs(out[5]["lift"] - 1.0) < 1e-6
    assert abs(out[3]["cum_rate"] - 5 / 6) < 1e-6


def test_woe_iv_hand_values(spark):
    import math

    from platform_etl_literature_spark.operators import evalmetrics as EV

    # cat A: 3 pos 1 neg; cat B: 1 pos 3 neg
    rows = [("A", 1)] * 3 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 3
    df = spark.createDataFrame(rows, ["cat", "y"])
    out = {r["category"]: r for r in EV.woe_iv(df, "cat", "y", 0.5).collect()}
    p_a, q_a = (3 + 0.5) / 4, (1 + 0.5) / 4
    woe_a = math.log(p_a / q_a)
    assert out["A"]["n_pos"] == 3 and out["A"]["n_neg"] == 1
    assert abs(out["A"]["woe"] - woe_a) < 1e-6
    assert abs(out["A"]["iv_term"] - (p_a - q_a) * woe_a) < 1e-6
    # symmetric by construction
    assert abs(out["A"]["woe"] + out["B"]["woe"]) < 1e-9


def test_burstiness_known_gaps(spark):
    import math
    from datetime import datetime, timedelta

    from platform_etl_literature_spark.operators import timeseries as TSO

    # gaps of 10, 20, 30 seconds
    base = datetime(2024, 1, 1, 0, 0, 0)
    tss = [0, 10, 30, 60]
    rows = [
        ("u", base + timedelta(seconds=s)) for s in tss
    ] + [("lone", base)]
    df = spark.createDataFrame(rows, ["k", "ts"])
    out = {r["k"]: r for r in TSO.burstiness(df, "k", "ts").collect()}
    assert "lone" not in out  # no gaps
    g = [10, 20, 30]
    mu = sum(g) / 3
    sd = math.sqrt(sum((x - mu) ** 2 for x in g) / 2)
    u = out["u"]
    assert u["n_gaps"] == 3
    assert abs(u["mean_s"] - mu) < 1e-6
    assert abs(u["std_s"] - sd) < 1e-6
    assert abs(u["burstiness"] - (sd - mu) / (sd + mu)) < 1e-6
    assert abs(u["cv"] - sd / mu) < 1e-6


def test_burstiness_regular_series_is_minus_one_ish(spark):
    from datetime import datetime, timedelta

    from platform_etl_literature_spark.operators import timeseries as TSO

    rows = [
        ("bot", datetime(2024, 1, 1) + timedelta(seconds=60 * i))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["k", "ts"])
    out = TSO.burstiness(df, "k", "ts").collect()[0]
    # perfectly regular: sigma == 0 -> B == -1 exactly
    assert out["burstiness"] == -1.0


def test_gini_uniform_zero_and_concentrated(spark):
    from platform_etl_literature_spark.operators import robust as RB

    rows = [("eq", i, 5) for i in range(4)] + [
        ("hot", 0, 100), ("hot", 1, 0), ("hot", 2, 0), ("hot", 3, 0)
    ]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    out = {r["g"]: r for r in RB.gini(df, "v", ["g"]).collect()}
    assert abs(out["eq"]["gini"]) < 1e-9
    # one holder of everything among n=4: G = (n-1)/n = 0.75
    assert abs(out["hot"]["gini"] - 0.75) < 1e-9
    assert out["hot"]["total"] == 100


def test_benford_digit_spine_and_chi2_sum(spark):
    from platform_etl_literature_spark.operators import quality_checks as QC

    # only digits 1 and 9 present; spine must still emit 1..9
    rows = [("a", 123)] * 5 + [("a", 91)] * 3 + [("a", -4), ("a", 0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = QC.benford_first_digit(df, "v", ["k"]).collect()
    assert len(out) == 9
    by = {r["digit"]: r for r in out}
    assert by[1]["n_obs"] == 5 and by[9]["n_obs"] == 3
    assert by[2]["n_obs"] == 0  # spine row for the absent digit
    assert sum(r["term_micro"] for r in out) == out[0]["chi2_micro"]
    assert abs(sum(r["obs_p"] for r in out) - 1.0) < 1e-5


def test_naive_bayes_separable_corpus_diagonal(spark):
    from platform_etl_literature_spark.operators import lm as LM

    rows = (
        [(i, "en", "the cat sat on the mat") for i in range(4)]
        + [(10 + i, "fr", "le chat sur le tapis") for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {
        (r["true_label"], r["pred_label"]): r["n_docs"]
        for r in LM.nb_confusion(df, "doc_id", "lang", "text").collect()
    }
    # perfectly separable vocabularies -> diagonal confusion
    assert out == {("en", "en"): 4, ("fr", "fr"): 4}


def test_benford_from_counts_matches_raw_and_merges(spark):
    from platform_etl_literature_spark.operators import quality_checks as QC

    vals = [123, 19, 23, 345, 91, 11, 87, 65, 41, 20]
    df = spark.createDataFrame([("k", v) for v in vals], ["g", "v"])
    raw = {(r["digit"]): r for r in QC.benford_first_digit(df, "v", ["g"]).collect()}
    # split the same data into two per-batch count grids (duplicate
    # cells) -> from_counts must re-sum and agree exactly
    h = len(vals) // 2
    c1 = spark.createDataFrame([("k", v) for v in vals[:h]], ["g", "v"])
    c2 = spark.createDataFrame([("k", v) for v in vals[h:]], ["g", "v"])
    from pyspark.sql import functions as F2

    def cells(d):
        return d.groupBy(
            "g",
            F2.substring(F2.col("v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit"),
        ).agg(F2.count(F2.lit(1)).alias("n_obs"))

    merged = cells(c1).unionByName(cells(c2))
    via = {
        (r["digit"]): r
        for r in QC.benford_from_counts(merged, ["g"]).collect()
    }
    assert set(via) == set(raw)
    for d in raw:
        for c in ("n_obs", "obs_p", "exp_p", "term_micro", "chi2_micro"):
            assert via[d][c] == raw[d][c], (d, c)


def test_rfm_segments_exact_quintiles(spark):
    from datetime import datetime, timedelta

    from platform_etl_literature_spark.operators import sessionize as SS

    base = datetime(2024, 1, 1)
    # 10 users: user i has i+1 events, last event at base + i hours,
    # each event worth (i+1)*100 cents
    rows = []
    for i in range(10):
        for j in range(i + 1):
            rows.append((i, base + timedelta(hours=i, minutes=-j), (i + 1) * 100))
    df = spark.createDataFrame(rows, ["u", "ts", "cents"])
    out = {r["u"]: r for r in SS.rfm_segments(df, "u", "ts", "cents").collect()}
    assert len(out) == 10
    # user 9: most recent, most frequent, highest total -> 555
    assert out[9]["segment"] == 555
    # user 0: least recent/frequent/monetary -> 111
    assert out[0]["segment"] == 111
    # exact integer binning: rank r (1-based best-first) among n=10,
    # score = 5 - (r-1)*5 div 10 -> two users per score
    assert out[8]["segment"] == 555  # rank 2 in every dimension
    assert out[7]["segment"] == 444
    assert out[1]["segment"] == 111
    # recency exact seconds: user 9 age 0, user 0 age 9h
    assert out[9]["r_seconds"] == 0
    assert out[0]["r_seconds"] == 9 * 3600
    assert out[5]["f"] == 6 and out[5]["m_cents"] == 6 * 600


def test_ccf_lags_matches_numpy_and_detects_lead(spark):
    import numpy as np

    from platform_etl_literature_spark.operators import timeseries as TSO

    # y is x shifted forward by 2 (x leads y by 2) plus a wiggle
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    ys = [0, 0] + [v * 2 for v in xs[:-2]]
    rows = [("s", i, x, y) for i, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(rows, ["id", "p", "x", "y"])
    out = {
        r["lag"]: r
        for r in TSO.ccf_lags(df, "id", "p", "x", "y", max_lag=3).collect()
    }
    assert len(out) == 7
    ax, ay = np.array(xs, float), np.array(ys, float)
    for k in range(-3, 4):
        if k >= 0:
            xa, yb = ax[: len(ax) - k or None][: len(ax) - k], ay[k:]
            xa = ax[: len(ax) - k] if k else ax
        else:
            xa, yb = ax[-k:], ay[: len(ay) + k]
        want = np.corrcoef(xa, yb)[0, 1]
        assert out[k]["n_pairs"] == len(xs) - abs(k)
        assert abs(out[k]["r"] - want) < 1e-6, (k, out[k]["r"], want)
    # the lead-2 alignment is (near-)perfect, contemporaneous is not
    assert out[2]["r"] > 0.999
    assert out[2]["r"] > abs(out[0]["r"])


def test_auc_roc_hand_cases(spark):
    from platform_etl_literature_spark.operators import evalmetrics as EV

    # perfectly separated
    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 1), ("g", 4, 1)]
    out = EV.auc_roc(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", ["g"]
    ).collect()[0]
    assert out["auc"] == 1.0 and out["n_pos"] == 2 and out["n_neg"] == 2
    # ties -> midranks: AUC exactly 0.5
    rows = [("g", 1, 0), ("g", 1, 1), ("g", 2, 0), ("g", 2, 1)]
    out = EV.auc_roc(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", ["g"]
    ).collect()[0]
    assert out["auc"] == 0.5
    # anti-predictive
    rows = [("g", 4, 0), ("g", 3, 0), ("g", 2, 1), ("g", 1, 1)]
    out = EV.auc_roc(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", ["g"]
    ).collect()[0]
    assert out["auc"] == 0.0
    # degenerate: all positive -> NULL
    rows = [("g", 1, 1), ("g", 2, 1)]
    out = EV.auc_roc(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", ["g"]
    ).collect()[0]
    assert out["auc"] is None


def test_auc_roc_matches_sklearn_formula(spark):
    import random

    from platform_etl_literature_spark.operators import evalmetrics as EV

    rng = random.Random(7)
    rows = [("g", rng.randrange(20), rng.randrange(2)) for _ in range(200)]
    out = EV.auc_roc(
        spark.createDataFrame(rows, ["g", "s", "y"]), "s", "y", ["g"]
    ).collect()[0]
    # reference: probability a random positive outranks a random
    # negative, ties counting half
    pos = [s for _, s, y in rows if y == 1]
    neg = [s for _, s, y in rows if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    assert abs(out["auc"] - wins / (len(pos) * len(neg))) < 1e-6


def test_kaplan_meier_textbook_curve(spark):
    from platform_etl_literature_spark.operators import survival as SV

    rows = [
        ("g", 1, 1), ("g", 2, 1), ("g", 3, 0), ("g", 4, 1), ("g", 5, 0)
    ]
    out = {
        r["t"]: r
        for r in SV.kaplan_meier(
            spark.createDataFrame(rows, ["g", "dur", "ev"]), "dur", "ev", ["g"]
        ).collect()
    }
    assert out[1]["n_at_risk"] == 5 and abs(out[1]["survival"] - 0.8) < 1e-5
    assert out[2]["n_at_risk"] == 4 and abs(out[2]["survival"] - 0.6) < 1e-5
    assert out[3]["d"] == 0 and abs(out[3]["survival"] - 0.6) < 1e-5
    assert out[4]["n_at_risk"] == 2 and abs(out[4]["survival"] - 0.3) < 1e-5
    assert out[5]["censored"] == 1 and abs(out[5]["survival"] - 0.3) < 1e-5


def test_kaplan_meier_curve_hits_exact_zero(spark):
    from platform_etl_literature_spark.operators import survival as SV

    rows = [("g", 1, 1), ("g", 1, 1), ("g", 2, 1)]
    out = {
        r["t"]: r
        for r in SV.kaplan_meier(
            spark.createDataFrame(rows, ["g", "dur", "ev"]), "dur", "ev", ["g"]
        ).collect()
    }
    assert abs(out[1]["survival"] - 1 / 3) < 1e-5
    # d == n_at_risk at t=2 -> exactly 0.0, no -inf log anywhere
    assert out[2]["survival"] == 0.0


def test_mann_kendall_known_series(spark):
    import math

    from platform_etl_literature_spark.operators import robust as RB

    # strictly increasing: S = n(n-1)/2, no ties
    inc = [("up", i, i * 10) for i in range(8)]
    # flat: S = 0, all tied -> Var 0 -> z NULL
    flat = [("fl", i, 5) for i in range(6)]
    df = spark.createDataFrame(inc + flat, ["g", "x", "y"])
    out = {r["g"]: r for r in RB.mann_kendall(df, "x", "y", ["g"]).collect()}
    n = 8
    assert out["up"]["s"] == n * (n - 1) // 2
    var18 = n * (n - 1) * (2 * n + 5)
    assert out["up"]["var_s_x18"] == var18
    want_z = (out["up"]["s"] - 1) / math.sqrt(var18 / 18.0)
    assert abs(out["up"]["z"] - want_z) < 1e-6
    assert out["fl"]["s"] == 0
    assert out["fl"]["var_s_x18"] == 0
    assert out["fl"]["z"] is None


def test_mann_kendall_tie_correction(spark):
    from platform_etl_literature_spark.operators import robust as RB

    # y = [1, 1, 2]: one tie group of t=2 -> tie18 = 2*1*9 = 18
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 2)], ["g", "x", "y"]
    )
    out = RB.mann_kendall(df, "x", "y", ["g"]).collect()[0]
    n = 3
    assert out["s"] == 2  # (1,2):0 (1,3):+1 (2,3):+1
    assert out["var_s_x18"] == n * (n - 1) * (2 * n + 5) - 18


def test_nelson_aalen_textbook_and_km_consistency(spark):
    from platform_etl_literature_spark.operators import survival as SV

    rows = [
        ("g", 1, 1), ("g", 2, 1), ("g", 3, 0), ("g", 4, 1), ("g", 5, 0)
    ]
    df = spark.createDataFrame(rows, ["g", "dur", "ev"])
    na = {r["t"]: r for r in SV.nelson_aalen(df, "dur", "ev", ["g"]).collect()}
    assert abs(na[1]["cum_hazard"] - 1 / 5) < 1e-5
    assert abs(na[2]["cum_hazard"] - (1 / 5 + 1 / 4)) < 1e-5
    assert abs(na[4]["cum_hazard"] - (1 / 5 + 1 / 4 + 1 / 2)) < 1e-5
    assert na[3]["cum_hazard"] == na[2]["cum_hazard"]  # censoring adds 0
    # exp(-H) upper-bounds the KM curve (standard inequality)
    import math

    km = {
        r["t"]: r["survival"]
        for r in SV.kaplan_meier(df, "dur", "ev", ["g"]).collect()
    }
    for t, r in na.items():
        assert km[t] <= math.exp(-r["cum_hazard"]) + 1e-6


def test_logrank_hand_computed(spark):
    from platform_etl_literature_spark.operators import survival as SV

    rows = [
        ("g", "A", 1, 1), ("g", "A", 2, 1),
        ("g", "B", 3, 1), ("g", "B", 4, 1),
    ]
    df = spark.createDataFrame(rows, ["g", "arm", "dur", "ev"])
    out = SV.logrank_test(df, "dur", "ev", "arm", ["g"]).collect()[0]
    # hand: t=1 ome=.5 v=.25; t=2 ome=2/3 v=2/9; t=3 ome=0 v=0;
    # t=4 skipped (n-1=0) -> chi2 = (7/6)^2 / (17/36) = 49/17
    assert out["arm1"] == "A"
    assert out["n1"] == 2 and out["n2"] == 2 and out["o1"] == 2
    assert abs(out["chi2"] - 49 / 17) < 1e-4


def test_logrank_identical_arms_zero(spark):
    from platform_etl_literature_spark.operators import survival as SV

    rows = []
    for arm in ("x", "y"):
        rows += [("g", arm, t, e) for t, e in ((1, 1), (2, 0), (3, 1))]
    df = spark.createDataFrame(rows, ["g", "arm", "dur", "ev"])
    out = SV.logrank_test(df, "dur", "ev", "arm", ["g"]).collect()[0]
    # identical curves -> O-E exactly 0 -> chi2 exactly 0
    assert out["ome_micro"] == 0
    assert out["chi2"] == 0.0


def test_mann_kendall_duplicate_x_collapse_and_all_tied_x(spark):
    """Duplicate x positions collapse by summing y BEFORE pairing, so
    Var(S)'s n(n-1)(2n+5) term counts distinct positions — consistent
    with the computed S; a group whose every row shares one x
    surfaces with s=0 / z NULL instead of vanishing."""
    from platform_etl_literature_spark.operators import robust as RB

    rows = (
        # dup: x=1 holds (4, 6) -> collapses to 10; series 10, 20, 30
        [("dup", 1, 4), ("dup", 1, 6), ("dup", 2, 20), ("dup", 3, 30)]
        # onex: every row at x=5 -> one collapsed point, no pairs
        + [("onex", 5, 1), ("onex", 5, 2), ("onex", 5, 3)]
    )
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in RB.mann_kendall(df, "x", "y", ["g"]).collect()}
    n = 3
    assert out["dup"]["n"] == n
    assert out["dup"]["s"] == 3  # strictly increasing collapsed series
    assert out["dup"]["var_s_x18"] == n * (n - 1) * (2 * n + 5)
    assert out["onex"]["n"] == 1
    assert out["onex"]["s"] == 0
    assert out["onex"]["var_s_x18"] == 0
    assert out["onex"]["z"] is None


def test_logrank_three_arms_raises_in_plan(spark):
    """3+ arms within a key must fail LOUDLY (raise_error domain
    guard), never silently pool non-first arms into 'arm 2'."""
    import pytest

    from platform_etl_literature_spark.operators import survival as SV

    rows = [
        ("g", "A", 1, 1), ("g", "B", 2, 1), ("g", "C", 3, 1),
    ]
    df = spark.createDataFrame(rows, ["g", "arm", "dur", "ev"])
    with pytest.raises(Exception, match="exactly two arms"):
        SV.logrank_test(df, "dur", "ev", "arm", ["g"]).collect()


def test_ab_welch_missing_control_raises_in_plan(spark):
    """A typo'd / absent control arm fails LOUDLY (raise_error on the
    one-row control aggregate), never silently returns zero rows."""
    import pytest

    from platform_etl_literature_spark.operators import evalmetrics as EV

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], ["arm", "v"]
    )
    with pytest.raises(Exception, match="has no rows"):
        EV.ab_welch(df, "arm", "v", control="nope").collect()
    # and a present control still works
    out = EV.ab_welch(df, "arm", "v", control="a").collect()
    assert {r["arm"] for r in out} == {"a", "b"}


def test_auc_and_lift_exclude_null_scores(spark):
    """NULL scores are unrankable and engine-divergent (Spark NULLS
    FIRST asc vs DuckDB NULLS LAST) — both readouts must exclude
    them, keeping the SQL-oracle replay contract for any input."""
    from platform_etl_literature_spark.operators import evalmetrics as EV

    rows = [
        ("g", 1, 0), ("g", 2, 0), ("g", 3, 1), ("g", 4, 1),
        ("g", None, 1), ("g", None, 0),
    ]
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    out = EV.auc_roc(df, "s", "y", ["g"]).collect()[0]
    assert out["n"] == 4 and out["auc"] == 1.0
    lt = EV.lift_table(
        df.withColumn("id", F.coalesce("s", F.lit(99))),
        "s", "y", "id", n_buckets=2,
    ).collect()
    assert sum(r["n"] for r in lt) == 4


# ---------------------------------------------------------------------------
# Round-8 session 2: corpus statistics + analytics completion
# ---------------------------------------------------------------------------


def test_kendall_tau_known_cases(spark):
    import math

    from platform_etl_literature_spark.operators import robust as RB

    # perfect concordance: tau = 1
    up = [("up", i, i * 3) for i in range(6)]
    # perfect discordance: tau = -1
    dn = [("dn", i, -i) for i in range(6)]
    # hand case with ties: x=[1,1,2,3], y=[2,2,1,3]
    # pairs by index: (1,2)x-tie+y-tie, (1,3)C? x1<2,y2>1 -> D,
    # (1,4)C, (2,3)D, (2,4)C, (3,4)C  => C=3, D=2, n1=1, n2=1, n0=6
    tie = [("tie", 1, 2), ("tie", 1, 2), ("tie", 2, 1), ("tie", 3, 3)]
    df = spark.createDataFrame(up + dn + tie, ["g", "x", "y"])
    out = {r["g"]: r for r in RB.kendall_tau(df, "x", "y", ["g"]).collect()}
    assert out["up"]["tau_b"] == 1.0
    assert out["dn"]["tau_b"] == -1.0
    t = out["tie"]
    assert (t["concordant"], t["discordant"]) == (3, 2)
    want = (3 - 2) / math.sqrt((6 - 1) * (6 - 1))
    assert abs(t["tau_b"] - round(want, 6)) < 1e-9


def test_kendall_tau_degenerate_groups(spark):
    from platform_etl_literature_spark.operators import robust as RB

    rows = (
        # all x tied -> denominator 0 -> tau NULL, pairs all x-ties
        [("ax", 1, v) for v in (1, 2, 3)]
        # single row -> no pairs, surfaces with zero counts
        + [("one", 5, 5)]
    )
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in RB.kendall_tau(df, "x", "y", ["g"]).collect()}
    assert out["ax"]["tau_b"] is None
    assert out["ax"]["concordant"] == 0 and out["ax"]["discordant"] == 0
    assert out["one"]["n"] == 1 and out["one"]["tau_b"] is None


def test_kendall_tau_group_cap_excludes_loudly(spark):
    from platform_etl_literature_spark.operators import robust as RB

    big = [("big", i, i) for i in range(30)]
    small = [("sm", i, i) for i in range(5)]
    df = spark.createDataFrame(big + small, ["g", "x", "y"])
    out = RB.kendall_tau(df, "x", "y", ["g"], max_group_points=10).collect()
    assert {r["g"] for r in out} == {"sm"}


def test_winsorized_stats_hand_case(spark):
    from platform_etl_literature_spark.operators import robust as RB

    # n=20, trim 5% -> g=1: clip one value per tail.
    # values 1..19 plus one huge outlier 1000.
    vals = list(range(1, 20)) + [1000]
    df = spark.createDataFrame([("a", v) for v in vals], ["g", "v"])
    out = RB.winsorized_stats(df, "v", ["g"], trim_pct=5).collect()[0]
    assert (out["n"], out["g_clip"]) == (20, 1)
    assert (out["lo_clip"], out["hi_clip"]) == (2, 19)
    mid = sum(range(2, 20))  # ranks 2..19 = values 2..19
    assert out["winsorized_mean"] == round((mid + 2 + 19) / 20.0, 6)
    assert out["trimmed_mean"] == round(mid / 18.0, 6)


def test_winsorized_stats_small_group_g0_is_plain_mean(spark):
    from platform_etl_literature_spark.operators import robust as RB

    vals = [3, 1, 4, 1, 5]
    df = spark.createDataFrame([("a", v) for v in vals], ["g", "v"])
    out = RB.winsorized_stats(df, "v", ["g"], trim_pct=5).collect()[0]
    assert out["g_clip"] == 0
    assert out["winsorized_mean"] == round(sum(vals) / 5.0, 6)
    assert out["trimmed_mean"] == out["winsorized_mean"]
    # g=0 clips nothing: lo/hi are the min/max order statistics
    assert (out["lo_clip"], out["hi_clip"]) == (1, 5)


def test_categorical_mi_bounds(spark):
    from platform_etl_literature_spark.operators import infotheory as IT

    # identical columns: MI = H(X), NMI = 1
    same = spark.createDataFrame(
        [(c, c) for c in "aabbbc"], ["x", "y"]
    )
    r = IT.categorical_mi(same, "x", "y").collect()[0]
    assert abs(r["mi"] - r["h_x"]) < 2e-6
    assert abs(r["nmi"] - 1.0) < 2e-6
    # independent columns (full factorial, equal counts): MI ~ 0
    indep = spark.createDataFrame(
        [(a, b) for a in "ab" for b in "xy" for _ in range(3)],
        ["x", "y"],
    )
    r2 = IT.categorical_mi(indep, "x", "y").collect()[0]
    assert abs(r2["mi"]) < 2e-6
    # constant column: zero marginal entropy -> NMI NULL
    const = spark.createDataFrame([("k", v) for v in "abc"], ["x", "y"])
    r3 = IT.categorical_mi(const, "x", "y").collect()[0]
    assert r3["h_x"] == 0.0 and r3["nmi"] is None


def test_categorical_mi_null_is_a_level(spark):
    from platform_etl_literature_spark.operators import infotheory as IT

    df = spark.createDataFrame(
        [("a", "p"), (None, "q"), (None, "q"), ("b", "r")], ["x", "y"]
    )
    r = IT.categorical_mi(df, "x", "y").collect()[0]
    assert r["nx_levels"] == 3  # a, b, and the null sentinel


def test_heaps_law_curve_consistency(spark):
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators import textstats as TS
    from platform_etl_literature_spark.operators import ranking as RK

    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b d d"),
            (3, "e"),
            (4, "a e f g"),
            (5, "h h h"),
        ],
        ["doc_id", "text"],
    )
    out = TS.heaps_law(docs, "doc_id", "text", checkpoint_every=2)
    rows = {r["doc_rank"]: r for r in out.collect()}
    RK.release_cached()
    # checkpoints at ranks 2, 4 and the final rank 5
    assert set(rows) == {2, 4, 5}
    assert rows[2]["cum_tokens"] == 7 and rows[2]["cum_types"] == 4
    assert rows[4]["cum_tokens"] == 12 and rows[4]["cum_types"] == 7
    assert rows[5]["cum_tokens"] == 15 and rows[5]["cum_types"] == 8
    # curve is monotone and the fit is attached to every row
    assert rows[2]["beta"] == rows[5]["beta"] is not None


def test_zipf_fit_recovers_power_law(spark):
    docs_rows = []
    # build a corpus whose term counts follow n(r) ~ 1000 / r exactly:
    # term t{r} appears max(1, 1000 // r) times
    did = 0
    for r in range(1, 101):
        for _ in range(max(1, 1000 // r)):
            docs_rows.append((did, f"t{r:03d}"))
            did += 1
    from platform_etl_literature_spark.operators import textstats as TS

    docs = spark.createDataFrame(docs_rows, ["doc_id", "text"])
    out = TS.zipf_fit(docs, "text", top_r=100, skip_top=10).collect()[0]
    assert out["n_terms_ranked"] == 100
    assert out["n_fit"] == 90
    # the floor() quantization flattens the tail slightly; the fitted
    # exponent must still sit near 1
    assert 0.9 < out["s_zipf"] < 1.1


def test_skipgram_cooc_hand_counts(spark):
    from platform_etl_literature_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in TS.skipgram_cooc(
            docs, "text", window_k=2, min_pair_count=1
        ).collect()
    }
    # doc1 pairs within k=2: (a,b)d1, (a,a)d2, (b,a)d1, (b,b)d2,
    # (a,b)d1; doc2: (a,b)d1  => (a,b): n=3 (d=1,1,1), (a,a): n=1 (d=2)
    assert out[("a", "b")]["n_cooc"] == 3
    assert out[("a", "b")]["w_micro"] == 3 * 1_000_000
    assert out[("a", "a")]["n_cooc"] == 1
    assert out[("a", "a")]["w_micro"] == 500_000
    assert out[("b", "a")]["n_cooc"] == 1
    assert out[("b", "b")]["n_cooc"] == 1


def test_semi_hard_negatives_contract(spark):
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators import similarity as SIM

    # two labels along nearly-opposite directions plus a lone label
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [0.5, 0.5], 1),
        (6, [-1.0, 0.0], 2),  # lone label: no positive -> dropped
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = SIM.semi_hard_negatives(emb, emb, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # anchor 6 has no same-label companion
    assert 6 not in by_q
    labels = {r[0]: r[2] for r in rows}
    for qid, neighbors in by_q.items():
        for r in neighbors:
            assert labels[r["neighbor_id"]] != labels[qid]
            assert r["sim"] < r["pos_sim"] + 1e-9
        ranks = sorted(x["rank"] for x in neighbors)
        assert ranks == list(range(1, len(neighbors) + 1))
    # anchor 1 (label 0): pos_sim = cos(v1, v2); hardest semi-hard
    # negative is v5 (cos ~ 0.707 < pos ~ 0.994)
    a1 = sorted(by_q[1], key=lambda r: r["rank"])
    assert a1[0]["neighbor_id"] == 5


def test_jaro_winkler_kernel_matches_duckdb(spark):
    """Property check of the JW verify kernel against DuckDB's native
    jaro_winkler_similarity (the oracle's scorer): identical to 1e-12
    on random pairs incl. empties — pins the boost-threshold-0.7
    variant and the match-window/transposition bookkeeping."""
    import random

    import duckdb

    from platform_etl_literature_spark.operators.edjoin import jaro_winkler

    con = duckdb.connect()
    rng = random.Random(11)
    for _ in range(2000):
        s = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 12)))
        t = "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 12)))
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s, t]
        ).fetchone()[0]
        assert abs(jaro_winkler(s, t) - want) <= 1e-12, (s, t)
    # textbook values
    assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert jaro_winkler("abc", "") == 0.0


def test_jaro_winkler_pairs_blocked_join(spark):
    from platform_etl_literature_spark.operators import edjoin as EJ
    from pyspark.sql import functions as F

    vocab = spark.createDataFrame(
        [("martha", 3), ("marhta", 2), ("different", 1), ("marsha", 5)],
        ["w", "c"],
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in EJ.jaro_winkler_pairs(
            vocab, "w", threshold=0.9, keep_cols=["c"]
        ).collect()
    }
    assert ("marhta", "martha") in out
    r = out[("marhta", "martha")]
    assert r["jw"] == 0.961111 and (r["c_1"], r["c_2"]) == (2, 3)
    # "different" shares no block with the m-words
    assert not any("different" in k for k in out)


def test_isotonic_calibration_pava_hand_case(spark):
    from platform_etl_literature_spark.operators import evalmetrics as EV

    # cells (score -> rate over 5 rows each): 0.2, 0.6, 0.4, 0.8 —
    # PAVA pools the (0.6, 0.4) violation into 0.5
    rows = []
    rates = {1: 1, 2: 3, 3: 2, 4: 4}  # successes out of 5
    for s, k in rates.items():
        rows += [("a", s, 1)] * k + [("a", s, 0)] * (5 - k)
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    out = {
        r["score"]: r
        for r in EV.isotonic_calibration(df, "s", "y", ["g"]).collect()
    }
    assert [out[s]["fit"] for s in (1, 2, 3, 4)] == [0.2, 0.5, 0.5, 0.8]
    assert [out[s]["rate"] for s in (1, 2, 3, 4)] == [0.2, 0.6, 0.4, 0.8]


def test_isotonic_calibration_monotone_and_valve(spark):
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators import evalmetrics as EV

    import random

    rng = random.Random(3)
    rows = [("g", rng.randint(0, 40), rng.randint(0, 1)) for _ in range(400)]
    rows += [("big", i, i % 2) for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    out = EV.isotonic_calibration(df, "s", "y", ["g"], max_cells=45).collect()
    # the 50-cell group is excluded loudly
    assert {r["g"] for r in out} == {"g"}
    fits = [
        r["fit"] for r in sorted(out, key=lambda r: r["score"])
    ]
    assert fits == sorted(fits)  # isotonic
    # weighted mean is preserved by PAVA: sum n*fit == sum sy (to 6dp)
    tot_fit = sum(r["n"] * r["fit"] for r in out)
    tot_y = sum(r["sy"] for r in out)
    assert abs(tot_fit - tot_y) < 1e-2


def test_ece_from_calibration_hand_case(spark):
    from platform_etl_literature_spark.operators import evalmetrics as EV

    # perfectly calibrated cells -> ECE 0 (fit == acc per bin by
    # construction when each bin holds one cell)
    rows = []
    for s, k in {1: 1, 2: 4}.items():
        rows += [("a", s, 1)] * k + [("a", s, 0)] * (5 - k)
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    cal = EV.isotonic_calibration(df, "s", "y", ["g"])
    out = EV.ece_from_calibration(cal, ["g"], n_bins=10).collect()
    assert all(r["ece"] == 0.0 for r in out)
    assert {r["bin"] for r in out} == {2, 8}


def test_corr_matrix_known_values(spark):
    from platform_etl_literature_spark.operators import robust as RB

    rows = []
    # y2 = 2*y1 (r=1); y3 = -y1 (r=-1); y4 constant (r NULL)
    for i in range(1, 8):
        rows.append(("g", i, 2 * i, -i, 5))
    df = spark.createDataFrame(rows, ["g", "a", "b", "c", "k"])
    out = {
        (r["x"], r["y"]): r
        for r in RB.corr_matrix(df, ["a", "b", "c", "k"], ["g"]).collect()
    }
    assert len(out) == 6
    assert out[("a", "b")]["corr"] == 1.0
    assert out[("a", "c")]["corr"] == -1.0
    assert out[("a", "k")]["corr"] is None  # zero variance side
    assert out[("b", "c")]["corr"] == -1.0
    assert all(r["n"] == 7 for r in out.values())


def test_corr_matrix_listwise_nulls_and_reference(spark):
    import random

    from platform_etl_literature_spark.operators import robust as RB

    rng = random.Random(5)
    rows = [
        ("g", rng.randint(0, 100), rng.randint(0, 100))
        for _ in range(200)
    ] + [("g", None, 1), ("g", 1, None)]
    df = spark.createDataFrame(rows, ["g", "a", "b"])
    out = RB.corr_matrix(df, ["a", "b"], ["g"]).collect()[0]
    assert out["n"] == 200  # listwise: null rows dropped
    xs = [r[1] for r in rows if r[1] is not None and r[2] is not None]
    ys = [r[2] for r in rows if r[1] is not None and r[2] is not None]
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    vx = n * sum(x * x for x in xs) - sum(xs) ** 2
    vy = n * sum(y * y for y in ys) - sum(ys) ** 2
    want = num / (vx**0.5 * vy**0.5)
    assert abs(out["corr"] - round(want, 6)) < 1e-9


def test_poisson_bootstrap_ci_contract(spark):
    from platform_etl_literature_spark.operators import robust as RB

    import random

    rng = random.Random(23)
    rows = [("g", i, rng.randint(50, 150)) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "id", "x"])
    out = RB.poisson_bootstrap_ci(
        df, "id", "x", ["g"], n_boot=40, alpha_pct=5
    ).collect()[0]
    # CI brackets the point estimate and is reasonably tight for a
    # well-behaved 300-row sample (se ~ 1.7 -> CI width well under 20)
    assert out["ci_lo"] <= out["mean"] <= out["ci_hi"]
    assert out["ci_hi"] - out["ci_lo"] < 20
    assert out["n_rows"] == 300 and out["n_boot"] == 40
    # deterministic: a second run draws the identical resamples
    again = RB.poisson_bootstrap_ci(
        df, "id", "x", ["g"], n_boot=40, alpha_pct=5
    ).collect()[0]
    assert (again["ci_lo"], again["ci_hi"]) == (out["ci_lo"], out["ci_hi"])


def test_poisson_bootstrap_weights_mean_one(spark):
    """The md5-uniform inverse-CDF draw must look Poisson(1): across
    many (row, b) draws the mean weight sits near 1."""
    from pyspark.sql import functions as F

    from platform_etl_literature_spark.operators.dedup import token_hash
    from platform_etl_literature_spark.operators.robust import POISSON1_CDF

    df = spark.range(20000).select(F.col("id").cast("string").alias("id"))
    u = token_hash(F.concat(F.lit("t:"), F.col("id"))) / F.lit(4294967296.0)
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    stats = df.select(w.alias("w")).agg(
        F.avg("w").alias("m"), F.max("w").alias("mx")
    ).collect()[0]
    assert abs(stats["m"] - 1.0) < 0.03
    assert stats["mx"] <= 9
