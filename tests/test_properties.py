"""Property tests (SURVEY.md §5.3): harmonic-fn invariants, Porter
stemmer sanity, MinHash bounds, salted-agg equivalence.

Pure-Python properties run under hypothesis; Spark equivalences run on
one batched DataFrame per test (a Spark job per hypothesis example
would be prohibitively slow)."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from platform_etl_literature_spark.functions.harmonic import (
    harmonic_sorted,
    harmonic_value,
)
from platform_etl_literature_spark.functions.porter import stem
from platform_etl_literature_spark.operators import dedup as D


def py_harmonic_sorted(vals: list[float]) -> float:
    return sum(v / (i + 1) ** 2 for i, v in enumerate(sorted(vals, reverse=True)))


@given(st.lists(st.floats(min_value=0, max_value=100, allow_nan=False), max_size=20))
@settings(max_examples=200)
def test_python_reference_harmonic_props(vals):
    h = py_harmonic_sorted(vals)
    assert h >= 0
    # permutation invariance
    shuffled = vals[:]
    random.Random(1).shuffle(shuffled)
    assert py_harmonic_sorted(shuffled) == pytest.approx(h)
    # bounded by first-term dominance: h <= max * sum(1/i^2) < max * pi^2/6
    if vals:
        assert h <= max(vals) * 1.644934066848227


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=20))
@settings(max_examples=500)
def test_porter_total_and_stable(word):
    s = stem(word)
    assert isinstance(s, str)
    if word:
        assert len(s) >= 1
    assert s == s.lower()
    if len(word) <= 2:
        assert s == word


def test_porter_known_stems():
    # classic examples from the published algorithm description
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "conflated": "conflat",
        "troubled": "troubl",
        "sized": "size",
        "hopping": "hop",
        "falling": "fall",
        "happy": "happi",
        "relational": "relat",
        "conditional": "condit",
        "digitizer": "digit",
        "operator": "oper",
        "feudalism": "feudal",
        "adoption": "adopt",
        "activate": "activ",
    }
    for w, expected in cases.items():
        assert stem(w) == expected, f"{w} -> {stem(w)} != {expected}"


def test_spark_harmonic_matches_python_reference(spark):
    rng = random.Random(42)
    rows = [
        (i, [round(rng.uniform(0, 50), 2) for _ in range(rng.randint(0, 12))])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id INT, vals ARRAY<DOUBLE>")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", harmonic_sorted("vals").alias("h")).collect()
    }
    for i, vals in rows:
        assert got[i] == pytest.approx(py_harmonic_sorted(vals)), f"id {i}"


def test_spark_harmonic_value_order_sensitivity(spark):
    df = spark.createDataFrame([(1,)], "id INT").select(
        harmonic_value(F.array(F.lit(1.0), F.lit(4.0))).alias("asc"),
        harmonic_value(F.array(F.lit(4.0), F.lit(1.0))).alias("desc"),
    )
    r = df.collect()[0]
    assert r["asc"] == pytest.approx(1.0 + 1.0)  # 1/1 + 4/4
    assert r["desc"] == pytest.approx(4.0 + 0.25)  # 4/1 + 1/4


def test_minhash_estimate_bounds(spark):
    from platform_etl_literature_spark.operators import dedup as D

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 40)))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    sigs = D.minhash_signatures(df, "doc_id", "text", 2)
    pairs = D.minhash_candidate_pairs(sigs, min_matching=1).collect()
    assert all(0.0 <= p["est_jaccard"] <= 1.0 for p in pairs)
    assert all(p["id_a"] < p["id_b"] for p in pairs)


def test_salted_agg_equals_plain_groupby(spark):
    from platform_etl_literature_spark.operators.skew import salted_agg

    rng = random.Random(3)
    rows = [
        ("hot" if rng.random() < 0.7 else f"k{rng.randint(0, 5)}", rng.randint(1, 100))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "k STRING, v INT")
    got = {
        r["k"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in salted_agg(
            df,
            ["k"],
            {"n": ("v", "count"), "total": ("v", "sum"), "vmin": ("v", "min"), "vmax": ("v", "max")},
        ).collect()
    }
    expected = {
        r["k"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert got == expected


def test_banded_size1_equals_per_seed_candidates(spark):
    """band_size=1 banded LSH must coincide exactly with the per-seed
    bucket candidates (n_bands == n_matching seeds)."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(5, 30)))) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    sigs = D.minhash_signatures(df, "doc_id", "text", 2)
    banded = {
        (r["id_a"], r["id_b"]): r["n_bands"]
        for r in D.minhash_banded_pairs(sigs, band_size=1, min_matching_bands=2).collect()
    }
    per_seed = {
        (r["id_a"], r["id_b"]): r["n_matching"]
        for r in D.minhash_candidate_pairs(sigs, min_matching=2).collect()
    }
    assert banded == per_seed


def test_simhash_blocking_is_lossless(spark):
    """Pigeonhole blocking must find EVERY pair within the hamming bound
    (d < n_blocks guarantees a shared exact block) — checked against a
    brute-force all-pairs scan."""
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(4, 15)))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    signed = D.simhash32(df, "doc_id", "text")
    sigs = {r["id"]: r["simhash"] for r in signed.collect()}
    brute = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_pairs(signed, max_hamming=3, n_blocks=4).collect()
    }
    assert blocked == brute


def test_simhash_packed_counters_match_python_reference(spark):
    """The packed-bit-counter aggregation must reproduce the textbook
    per-bit ±1-sum SimHash exactly on random docs (multiplicity
    respected), and documents at/over the 2^15-token counter bound must
    yield a NULL signature (loud overflow guard, not silent wraparound
    and no ANSI overflow error)."""
    import hashlib

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(9)]  # small vocab -> repeated tokens
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 30)))) for i in range(60)
    ]

    def ref_simhash(text: str) -> int:
        sums = [0] * 32
        for t in text.split(" "):
            if t == "":
                continue
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for j in range(32):
                sums[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(32) if sums[j] > 0)

    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r["id"]: r["simhash"] for r in D.simhash32(df, "doc_id", "text").collect()}
    assert got == {i: ref_simhash(t) for i, t in rows}

    # 2^15 tokens: over the validity bound (top packed field would
    # overflow the long at agg time — try_sum absorbs it) -> NULL;
    # 2^15 - 1 tokens: largest exact case; small docs stay exact.
    big = spark.createDataFrame(
        [
            (0, " ".join(["x"] * 32768)),
            (1, " ".join(["x"] * 32767)),
            (2, "x y z"),
        ],
        "doc_id INT, text STRING",
    )
    out = {r["id"]: r["simhash"] for r in D.simhash32(big, "doc_id", "text").collect()}
    assert out[0] is None  # counter bound reached -> loud NULL
    assert out[1] == ref_simhash("x")  # all-same-token doc: sign of each bit
    assert out[2] == ref_simhash("x y z")


def test_hash_split_stable_and_exhaustive(spark):
    """Every row gets a split; assignment depends only on the id (same
    id keeps its split when the corpus changes)."""
    df = spark.createDataFrame([(i, f"t{i}") for i in range(500)], "doc_id INT, t STRING")
    full = {r["doc_id"]: r["split"] for r in D.hash_split(df, "doc_id").collect()}
    assert set(full.values()) <= {"train", "val", "test"}
    assert len(full) == 500
    # split sizes within a loose tolerance of 80/10/10
    n_train = sum(1 for v in full.values() if v == "train")
    assert 320 <= n_train <= 470
    # stability under subsetting: a smaller corpus assigns identically
    sub = {r["doc_id"]: r["split"] for r in D.hash_split(df.limit(100), "doc_id").collect()}
    assert all(full[k] == v for k, v in sub.items())


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=40
    ),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=200)
def test_chunking_covers_every_token_in_order(toks, chunk_size, overlap):
    """Pure-Python model of chunk_tokens: concatenating each chunk's
    non-overlapping head reconstructs the document exactly — chunking
    loses nothing and keeps order."""
    overlap = min(overlap, chunk_size - 1)
    stride = chunk_size - overlap
    starts = list(range(0, max(len(toks) - overlap, 1), stride))
    chunks = [toks[s : s + chunk_size] for s in starts]
    rebuilt = []
    for i, c in enumerate(chunks):
        rebuilt.extend(c if i == 0 else c[overlap:])
    assert rebuilt == toks
    # every chunk except possibly the last is full-size
    assert all(len(c) == chunk_size for c in chunks[:-1])


@given(
    st.integers(min_value=0, max_value=40000),
    st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=50),
)
@settings(max_examples=200)
def test_epoch_repeat_multiplicity_model(bps, buckets):
    """floor(w) + (bucket < frac) gives multiplicity in {floor(w),
    ceil(w)} with the exact fractional share of ceilings."""
    n = [bps // 10000 + (1 if b % 10000 < bps % 10000 else 0) for b in buckets]
    assert all(x in (bps // 10000, bps // 10000 + (1 if bps % 10000 else 0)) for x in n)
    if bps % 10000 == 0:
        assert all(x == bps // 10000 for x in n)


def test_contamination_is_monotone_in_benchmark(spark):
    """Growing the benchmark set can only increase each document's
    shared-gram count (Spark equivalence on one batch)."""
    corpus = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d e") for i in range(20)], ["doc_id", "text"]
    )
    small = spark.createDataFrame([(100, "x y z a")], ["doc_id", "text"])
    big = small.union(
        spark.createDataFrame([(101, "a b c d")], ["doc_id", "text"])
    )
    s = {
        r["doc_id"]: r["shared_ngrams"]
        for r in D.contamination(corpus, small, "doc_id", "text", n=4).collect()
    }
    b = {
        r["doc_id"]: r["shared_ngrams"]
        for r in D.contamination(corpus, big, "doc_id", "text", n=4).collect()
    }
    assert set(s) == set(b)
    assert all(b[k] >= s[k] for k in s)
    assert any(b[k] > s[k] for k in s)  # the added benchmark doc bites


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Large-star/small-star must agree with a reference union-find on
    randomized graphs (one batched Spark run over the union of graphs,
    disjoint id ranges per graph — a job per hypothesis example would
    be prohibitively slow)."""
    from platform_etl_literature_spark.operators import components as CC

    rng = random.Random(20260814)
    edges: list[tuple[int, int]] = []
    expected: dict[int, int] = {}
    base = 0
    for _ in range(12):
        n = rng.randint(2, 30)
        m = rng.randint(1, 45)
        g = [
            (base + rng.randrange(n), base + rng.randrange(n))
            for _ in range(m)
        ]
        g = [(u, v) for u, v in g if u != v]
        if not g:
            g = [(base, base + 1)]
        edges.extend(g)

        # reference union-find over THIS graph's nodes
        parent = {x: x for e in g for x in e}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in g:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        for x in parent:
            expected[x] = find(x)
        base += 1000

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["id"]: r["component"] for r in CC.connected_components(df).collect()}
    # same partition into components AND the same min-id labels
    assert got == expected


def test_window_dup_stats_matches_python_reference(spark):
    """Randomized docs vs a pure-Python recomputation of the
    shared-window fractions (one batched Spark run)."""
    from collections import Counter

    from platform_etl_literature_spark.operators import dedup as D2

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    W = 3

    def windows(text):
        toks = [t for t in text.split(" ") if t]
        return set(
            " ".join(toks[i : i + W]) for i in range(len(toks) - W + 1)
        )

    per_doc = {i: windows(t) for i, t in docs}
    df_counts = Counter(w for ws in per_doc.values() for w in ws)
    expected = {
        i: (
            len(ws),
            sum(1 for w in ws if df_counts[w] > 1),
        )
        for i, ws in per_doc.items()
    }

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["id"]: (r["n_windows"], r["n_dup_windows"])
        for r in D2.window_dup_stats(sdf, "doc_id", "text", window=W).collect()
    }
    assert got == expected


def test_bm25_matches_python_reference(spark):
    """Randomized corpus vs a pure-Python BM25 (same rounding contract:
    idf rounded to 6 before the product, final score rounded to 6)."""
    import math

    from platform_etl_literature_spark.operators import retrieval as RET

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(9)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(60)
    ]
    terms = ["w0", "w3", "w7"]
    k1, b = 1.2, 0.75

    toks = {i: [t for t in text.split(" ") if t] for i, text in docs}
    n_docs = len(docs)
    sum_dl = sum(len(w) for w in toks.values())
    avgdl = sum_dl / n_docs
    dfs = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    expected = {}
    for i, w in toks.items():
        tfs = {t: w.count(t) for t in terms}
        if sum(tfs.values()) == 0:
            continue
        score = 0.0
        for t in terms:
            idf = round(math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0), 6)
            score += idf * (
                (tfs[t] * (k1 + 1.0))
                / (tfs[t] + k1 * ((1.0 - b) + b * (len(w) / avgdl)))
            )
        expected[i] = (sum(tfs.values()), round(score, 6))

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_hits"], r["score"])
        for r in RET.bm25_scores(sdf, "doc_id", "text", terms).collect()
    }
    assert got == expected


def test_winnowing_matches_python_reference(spark):
    """Randomized corpus vs a literal transcription of the SIGMOD'03
    winnowing definition (k-gram md5 hashes, min per sliding window),
    including the short-document conventions (< k tokens -> no
    fingerprints; < window grams -> the single global minimum)."""
    import hashlib

    from platform_etl_literature_spark.operators import dedup as D2

    K, W = 3, 4
    rng = random.Random(20260815)
    vocab = [f"t{i}" for i in range(7)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(80)
    ]

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    expected = set()
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        grams = [
            h(" ".join(toks[j : j + K])) for j in range(len(toks) - K + 1)
        ]
        if not grams:
            continue
        if len(grams) < W:
            fps = {min(grams)}
        else:
            fps = {min(grams[j : j + W]) for j in range(len(grams) - W + 1)}
        expected |= {(i, fp) for fp in fps}

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["id"], r["fp"])
        for r in D2.winnow_fingerprints(sdf, "doc_id", "text", k=K, window=W).collect()
    }
    assert got == expected


def test_bpe_matches_python_reference(spark):
    """Randomized corpus vs a literal transcription of Sennrich ACL'16
    BPE with the same tie-breaks (count DESC, left ASC, right ASC) and
    the same greedy left-to-right merge rule."""
    from platform_etl_literature_spark.operators import bpe as B

    rng = random.Random(20260816)
    alphabet = "abcdef"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(40)
    ]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 12))))
        for i in range(30)
    ]

    freqs: dict[str, int] = {}
    for _, text in docs:
        for w in text.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(w): n for w, n in freqs.items()}
    expected = []
    for rank in range(6):
        counts: dict = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        expected.append((rank, l, r, c))
        nxt: dict = {}
        for syms, n in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        vocab = nxt

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = B.bpe_train(sdf, "text", n_merges=6)
    assert got == expected

    # encode parity on the same corpus: applying the learned merges
    # yields exactly the per-word symbol counts of the python fold
    def py_encode(word):
        out = list(word)
        for _, l, r, _ in expected:
            merged = []
            for s in out:
                if merged and merged[-1] == l and s == r:
                    merged[-1] = l + r
                else:
                    merged.append(s)
            out = merged
        return len(out)

    enc = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in B.bpe_encode(
            sdf, "doc_id", "text", [(l, r) for _, l, r, _ in expected]
        ).collect()
    }
    for i, text in docs:
        ws = [w for w in text.split(" ") if w]
        assert enc[i] == (len(ws), sum(py_encode(w) for w in ws)), i


def test_bpe_exact_batch_stops_on_concat_collisions():
    """The batch walk must stop when a pair's concatenation aliases an
    existing symbol — either one minted in an earlier round or another
    batch member's concatenation — because a non-fresh mint adds
    converted occurrences to already-counted pairs and breaks the
    count-invariance step of the exactness proof (round-5 ADVICE)."""
    from platform_etl_literature_spark.operators.bpe import _exact_batch

    def row(l, r, cnt):
        return {"p": {"l": l, "r": r}, "cnt": cnt}

    # top pair's concatenation collides with a prior round's mint:
    # no safe prefix — caller falls back to the single exact merge
    ranked = [row("ab", "c", 100), row("d", "e", 90)]
    assert (
        _exact_batch(ranked, 10, 1, False, minted=frozenset({"abc"})) == []
    )

    # same-batch collision: (a,bc) and (ab,c) both mint "abc"; the walk
    # stops at the second and trims to counts strictly above its 90
    ranked = [row("a", "bc", 100), row("ab", "c", 90), row("d", "e", 80)]
    assert _exact_batch(ranked, 10, 1, False) == [("a", "bc", 100)]

    # no collision: same shapes with distinct concatenations batch fully
    ranked = [row("a", "bc", 100), row("d", "e", 90)]
    assert _exact_batch(ranked, 10, 1, False) == [
        ("a", "bc", 100),
        ("d", "e", 90),
    ]


def test_bpe_tiny_alphabet_aliasing_matches_python_reference(spark):
    """End-to-end guard for the mint-collision rule: a two-letter
    alphabet forces repeated-structure merges (ab, abab, ababab, ...)
    whose concatenations alias quickly; batched training must still
    replay sequential BPE merge-for-merge."""
    from platform_etl_literature_spark.operators import bpe as B

    rng = random.Random(7)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(2, 10)))
        for _ in range(30)
    ]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 8))))
        for i in range(40)
    ]

    freqs: dict[str, int] = {}
    for _, text in docs:
        for w in text.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(w): n for w, n in freqs.items()}
    expected = []
    for rank in range(12):
        counts: dict = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        expected.append((rank, l, r, c))
        nxt: dict = {}
        for syms, n in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        vocab = nxt

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    assert B.bpe_train(sdf, "text", n_merges=12) == expected


def test_bpe_greedy_mode_matches_python_reference_and_amortizes(spark):
    """exact=False greedy disjoint batching vs a literal python
    transcription of the same rule (rank by (count DESC, l, r), keep
    top-down skipping symbol/concatenation conflicts, apply the batch,
    recount).  Also pins the amortization: on this natural-ish corpus
    the greedy mode must finish in strictly fewer rounds than merges
    (the exact mode's known ~1/round degradation is the reason the
    mode exists)."""
    from platform_etl_literature_spark.operators import bpe as B

    rng = random.Random(42)
    alphabet = "abcdefgh"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 8)))
        for _ in range(60)
    ]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 10))))
        for i in range(50)
    ]

    freqs: dict[str, int] = {}
    for _, text in docs:
        for w in text.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    vocab = {tuple(w): n for w, n in freqs.items()}
    n_merges, batch_cap = 24, 8
    expected: list[tuple[int, str, str, int]] = []
    minted: set[str] = set()
    while len(expected) < n_merges:
        counts: dict = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        # mirror the engine's bounded fetch: only the top 4*batch_cap
        # ranking rows are visible to the batch selector each round
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            : 4 * batch_cap
        ]
        if not ranked or ranked[0][1] < 2:
            break
        batch, used = [], set()
        for (l, r), c in ranked:
            if len(batch) >= min(batch_cap, n_merges - len(expected)):
                break
            if c < 2:
                break
            cat = l + r
            if l in used or r in used or cat in used or cat in minted:
                continue
            batch.append((l, r, c))
            used.update((l, r, cat))
        if not batch:
            (l, r), c = ranked[0]
            batch = [(l, r, c)]
        for l, r, c in batch:
            expected.append((len(expected), l, r, c))
            minted.add(l + r)
        nxt: dict = {}
        for syms, n in vocab.items():
            out = list(syms)
            for l, r, _ in batch:
                merged: list = []
                for s in out:
                    if merged and merged[-1] == l and s == r:
                        merged[-1] = l + r
                    else:
                        merged.append(s)
                out = merged
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        vocab = nxt

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = B.bpe_train(
        sdf, "text", n_merges=n_merges, batch_cap=batch_cap, exact=False
    )
    assert got == expected
    assert B.last_train_rounds < len(got), (
        B.last_train_rounds,
        len(got),
    )


def test_bpe_batch_amortization_on_disjoint_vocab(spark):
    """The merge batching must amortize when the exactness rule allows
    it: a corpus whose top pairs are pairwise symbol-disjoint with
    strictly decreasing counts trains 24 merges in O(1) Spark rounds,
    not 24.  (On adversarial tiny-alphabet corpora the exact rule
    degrades gracefully toward one merge per round — correctness is
    pinned by test_bpe_matches_python_reference either way.)"""
    from platform_etl_literature_spark.operators import bpe as B

    # 24 two-symbol words over disjoint symbol pairs, counts 100,99,...
    alphabet = [chr(ord("a") + i) for i in range(26)] + [
        chr(ord("A") + i) for i in range(26)
    ]
    words = ["".join(alphabet[2 * i : 2 * i + 2]) for i in range(24)]
    rows = []
    doc_id = 0
    for i, w in enumerate(words):
        for _ in range(100 - i):
            rows.append((doc_id, w))
            doc_id += 1
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    got = B.bpe_train(sdf, "text", n_merges=24)
    assert [(m[1], m[2]) for m in got] == [tuple(w) for w in words]
    assert [m[3] for m in got] == [100 - i for i in range(24)]
    assert B.last_train_rounds <= 3, B.last_train_rounds


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 1)),
        min_size=4,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None)
def test_auc_complement_and_monotone_invariance(spark, pairs):
    """AUC(score) == 1 − AUC(−score) whenever defined, and AUC is
    invariant under a strictly monotone integer transform of the
    score (it only reads the ordering) — two identities that catch
    any drift in the midrank algebra."""
    from platform_etl_literature_spark.operators import evalmetrics as EV

    rows = [("g", s, y) for s, y in pairs]
    df = spark.createDataFrame(rows, ["g", "s", "y"])
    a = EV.auc_roc(df, "s", "y", ["g"]).collect()[0]["auc"]
    neg = df.selectExpr("g", "-s AS s", "y")
    b = EV.auc_roc(neg, "s", "y", ["g"]).collect()[0]["auc"]
    mono = df.selectExpr("g", "3 * s + 7 AS s", "y")
    c = EV.auc_roc(mono, "s", "y", ["g"]).collect()[0]["auc"]
    if a is None:
        assert b is None and c is None
    else:
        assert abs((a + b) - 1.0) < 2e-6
        assert abs(a - c) < 1e-9


@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=30),
    st.integers(2, 9),
)
@settings(max_examples=12, deadline=None)
def test_gini_scale_invariance_and_bounds(spark, vals, k):
    """Gini is scale-invariant (gini(k·x) == gini(x)) and bounded in
    [0, (n−1)/n] — the rank-form algebra preserves both or it's
    wrong."""
    from platform_etl_literature_spark.operators import robust as RB

    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    a = RB.gini(df, "v", ["g"]).collect()[0]
    scaled = df.selectExpr("g", "i", f"v * {k} AS v")
    b = RB.gini(scaled, "v", ["g"]).collect()[0]
    if a["gini"] is None:
        assert b["gini"] is None  # all-zero totals stay undefined
    else:
        assert abs(a["gini"] - b["gini"]) < 1e-9
        n = a["n"]
        assert -1e-9 <= a["gini"] <= (n - 1) / n + 1e-9


@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(0, 1)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=12, deadline=None)
def test_kaplan_meier_monotone_and_bounded(spark, subjects):
    """The KM curve is non-increasing in t and stays in [0, 1]; with
    zero events everywhere it is identically 1."""
    from platform_etl_literature_spark.operators import survival as SV

    rows = [("g", t, e) for t, e in subjects]
    df = spark.createDataFrame(rows, ["g", "dur", "ev"])
    out = sorted(
        SV.kaplan_meier(df, "dur", "ev", ["g"]).collect(),
        key=lambda r: r["t"],
    )
    last = 1.0 + 1e-9
    for r in out:
        assert -1e-9 <= r["survival"] <= 1.0 + 1e-9
        assert r["survival"] <= last + 2e-6, (r["t"], r["survival"], last)
        last = r["survival"]
    if all(e == 0 for _, e in subjects):
        assert all(r["survival"] == 1.0 for r in out)
