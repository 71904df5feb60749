"""ANN recall tests: LSH and IVF approximations against the exact
brute-force baseline on the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from platform_etl_literature_spark.operators import similarity as SIM


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.cosine_topk(emb, q, k=5))
    approx = _topk_sets(SIM.ivf_cosine_topk(emb, q, k=5, n_lists=4, n_probe=2))
    hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"


def test_lsh_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.cosine_topk(emb, q, k=5))
    # n_bits sizes buckets: 2^4 buckets over 500 vectors ≈ 30/bucket.
    # Too many bits → sub-singleton buckets → recall collapses.
    approx = _topk_sets(SIM.lsh_cosine_topk(emb, q, k=5, n_tables=8, n_bits=4))
    hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"LSH recall {hits}/{total}"


def test_exact_topk_is_symmetric_sane(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = SIM.cosine_topk(emb, q, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["sim"]))
    for qid, rows in by_q.items():
        rows.sort()
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_persisted_lsh_index_matches_inline(spark, sf_dir, tmp_path):
    """build_lsh_index + query_lsh_index must return exactly what the
    inline lsh_cosine_topk returns for the same parameters."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "lsh_index")
    SIM.build_lsh_index(emb, path, n_tables=8, n_bits=4)
    via_index = sorted(
        tuple(r)
        for r in SIM.query_lsh_index(spark, path, q, k=5, n_tables=8, n_bits=4).collect()
    )
    inline = sorted(
        tuple(r) for r in SIM.lsh_cosine_topk(emb, q, k=5, n_tables=8, n_bits=4).collect()
    )
    assert via_index == inline
    assert len(via_index) > 0
    # the index is partitioned by LSH table id for probe-side pruning
    import os

    assert any(d.startswith("tbl=") for d in os.listdir(path))


def test_blocked_topk_equals_hof_topk(spark, sf_dir):
    """The vectorized pre-reducing path must return exactly the
    brute-force result (same rank order, same rounded sims) — the
    local top-k under the global total order is lossless."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, SIM.cosine_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, SIM.cosine_topk_blocked(emb, q, k=5).collect()))
    assert a == b


def test_blocked_topk_zero_norm_and_small_partition(spark):
    """Zero-norm vectors score 0.0 (never NaN) and partitions smaller
    than k emit what they have."""
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    rows.append((9, [0.0, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(6)
    out = SIM.cosine_topk_blocked(df, df, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 3 for v in by_q.values())
    # the zero-norm row scores 0.0 against everything, and everything
    # scores 0.0 against it
    assert all(r["sim"] == 0.0 for r in by_q[9])


def test_binary_ann_finds_exact_duplicate(spark):
    rows = [(i, [float(i % 5 == j) - 0.5 * float(j % 2) for j in range(64)]) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = SIM.binary_ann_topk(df, df.filter(F.col("vec_id") == 0), k=3, shortlist=8)
    got = {r["neighbor_id"]: (r["rank"], r["sim"], r["hamming"]) for r in out.collect()}
    # vec 5 and 10 are identical to vec 0 -> hamming 0, sim 1.0, top ranks
    assert got[5][2] == 0 and got[10][2] == 0
    assert {got[5][0], got[10][0]} == {1, 2}
    assert got[5][1] == got[10][1] == 1.0


def test_sign_signatures_match_python(spark):
    import random

    rng = random.Random(7)
    vec = [rng.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
    row = SIM.sign_signatures(df, "vec_id", "embedding").collect()[0]
    lo = sum((1 << (i - 1)) for i in range(1, 33) if vec[i - 1] > 0)
    hi = sum((1 << (i - 33)) for i in range(33, 65) if vec[i - 1] > 0)
    assert (row["sig_lo"], row["sig_hi"]) == (lo, hi)


def test_pq_codes_match_python_argmin(spark):
    import random

    from platform_etl_literature_spark.operators.pq_codebooks import (
        PQ_CODEBOOKS_8x16x8 as CB,
    )

    rng = random.Random(11)
    vec = [rng.uniform(-0.3, 0.3) for _ in range(64)]
    df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
    row = SIM.pq_encode(df, "vec_id", "embedding", CB).collect()[0]
    expected = []
    for m in range(8):
        sub = vec[m * 8 : (m + 1) * 8]
        dists = [
            (sum((a - b) ** 2 for a, b in zip(sub, c)), k)
            for k, c in enumerate(CB[m])
        ]
        expected.append(min(dists)[1])
    assert list(row["codes"]) == expected


def test_pq_adc_prefers_identical_vector(spark):
    rows = [(i, [0.1 * ((i * 7 + j) % 11 - 5) for j in range(64)]) for i in range(10)]
    rows.append((100, rows[0][1]))  # identical twin of vec 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = SIM.pq_adc_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    top = sorted(out.collect(), key=lambda r: r["rank"])[0]
    # identical vector has identical codes -> ADC distance equals vec 0's
    # own table sum, the minimum possible
    assert top["neighbor_id"] == 100


def test_ivfpq_finds_identical_twin(spark):
    # non-periodic pattern: no two base vectors collide
    rows = [
        (i, [0.01 * ((i * 37 + j * j) % 101 - 50) for j in range(64)])
        for i in range(20)
    ]
    rows.append((100, rows[2][1]))  # identical twin of vec 2
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = SIM.ivfpq_topk(df, df.filter(F.col("vec_id") == 2), k=3, n_probe=3)
    top = sorted(out.collect(), key=lambda r: r["rank"])[0]
    # identical vector -> same coarse list (always probed first) and
    # identical codes -> minimal ADC distance
    assert top["neighbor_id"] == 100


def test_refine_full_candidates_equals_exact(spark, sf_dir):
    """Refining the FULL pair set must reproduce cosine_topk exactly
    (same fold, same tiebreak) — the losslessness contract of the
    refine stage."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    all_pairs = (
        emb.select(F.col("vec_id").alias("neighbor_id"))
        .crossJoin(q.select(F.col("vec_id").alias("query_id")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    refined = SIM.refine_topk(emb, q, all_pairs, k=3)
    exact = SIM.cosine_topk(emb, q, k=3)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = {key(r): (r["neighbor_id"], r["sim"]) for r in refined.collect()}
    want = {key(r): (r["neighbor_id"], r["sim"]) for r in exact.collect()}
    assert got == want


def test_refine_recovers_ivfpq_recall(spark, sf_dir):
    """Exact re-rank of a wide IVF-PQ shortlist must strictly beat the
    raw IVF-PQ top-k on recall and can never exceed the shortlist's
    candidate ceiling (every refined hit is in the shortlist)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.cosine_topk(emb, q, k=5))
    shortlist = SIM.ivfpq_topk(emb, q, k=50, n_probe=3)
    raw = _topk_sets(SIM.ivfpq_topk(emb, q, k=5, n_probe=3))
    ref = _topk_sets(SIM.refine_topk(emb, q, shortlist, k=5))
    cand = _topk_sets(shortlist)
    hits = lambda a: sum(  # noqa: E731
        len(exact[qid] & a.get(qid, set())) for qid in exact
    )
    assert hits(ref) > hits(raw), (hits(ref), hits(raw))
    for qid, s in ref.items():
        assert s <= cand[qid]


def test_jl_project_deterministic_and_exact_signs(spark):
    """jl_project is a pure ±chain: each projected coordinate equals
    the python-side signed sum exactly (sign flips are exact, adds in
    one fixed order), and the md5-derived sign matrix is reproducible
    call to call."""
    import math

    s1 = SIM.jl_signs(4, 8)
    s2 = SIM.jl_signs(4, 8)
    assert s1 == s2
    assert all(v in (-1, 1) for row in s1 for v in row)
    assert any(v == -1 for row in s1 for v in row)
    assert any(v == 1 for row in s1 for v in row)

    vecs = [(1, [0.5, -1.25, 2.0, 0.125, -3.5, 4.0, 0.0, 1.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = SIM.jl_project(df, in_dim=8, out_dim=4).collect()[0]["rp"]
    for j in range(4):
        want = 0.0
        for i, v in enumerate(vecs[0][1]):
            want = want + v if s1[j][i] > 0 else want - v
        assert out[j] == want and not math.isnan(out[j]), (j, out[j], want)


def test_jl_refine_recall_monotone_in_shortlist(spark, sf_dir):
    """The compress-then-refine route: exact re-rank of a WIDER
    projected-space shortlist never loses recall, and refining the
    full corpus as shortlist reproduces the exact answer (the JL
    route's dial is monotone to exact)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(SIM.cosine_topk(emb, q, k=3))
    p = SIM.jl_project(emb, in_dim=64, out_dim=16).select(
        "vec_id", F.col("rp").alias("embedding")
    )
    pq = p.filter(F.col("vec_id") < 5)
    hits = lambda a: sum(  # noqa: E731
        len(exact[qid] & a.get(qid, set())) for qid in exact
    )
    n = emb.count()
    prev = -1
    for m in (5, 15, n - 1):
        short = SIM.cosine_topk(p, pq, k=m)
        ref = _topk_sets(SIM.refine_topk(emb, q, short, k=3))
        h = hits(ref)
        assert h >= prev, (m, h, prev)
        prev = h
    assert prev == sum(len(v) for v in exact.values())  # full = exact


def test_mmr_rerank_matches_python_reference(spark):
    """MMR greedy selection matches a python reference step-for-step
    on deterministic pseudo-random vectors (same 6dp-rounded rel/pair
    sims, lam=0.5 exact halvings, ties by id); pick 1 is the pure-
    relevance winner; picks are distinct members of the shortlist;
    k > m is rejected."""
    import math

    import pytest as _pytest

    from platform_etl_literature_spark.operators.retrieval import mmr_rerank

    def vec(i):
        # deterministic, irrational-ish components: no accidental ties
        return [
            math.sin(1.0 + 0.7 * i + 0.31 * d) for d in range(8)
        ]

    rows = [(i, vec(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    k, m, lam = 4, 8, 0.5

    got = sorted(
        (
            (r["query_id"], r["pick_order"], r["neighbor_id"], r["score"])
            for r in mmr_rerank(df, q, k=k, m=m, lam=lam).collect()
        ),
        key=lambda t: t[1],
    )

    # python reference with the SAME rounding contract
    def cos(a, b):
        num = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            num += x * y
            na += x * x
            nb += y * y
        den = math.sqrt(na) * math.sqrt(nb)
        return 0.0 if den == 0 else num / den

    qv = rows[0][1]
    sims = sorted(
        ((cos(qv, v), i) for i, v in rows if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:m]
    shortlist = {i: round(s, 6) for s, i in sims}
    cand_vecs = {i: dict(rows)[i] for i in shortlist}
    selected, ref = [], []
    while len(ref) < k:
        best = None
        for i, rel in shortlist.items():
            if i in selected:
                continue
            ms = max(
                (round(cos(cand_vecs[i], cand_vecs[j]), 6) for j in selected),
                default=0.0,
            )
            score = round(lam * rel - (1.0 - lam) * ms, 6)
            cand = (-score, i)
            if best is None or cand < best:
                best = cand
        selected.append(best[1])
        ref.append((0, len(ref) + 1, best[1], -best[0]))

    assert got == ref
    assert got[0][2] == sims[0][1]  # pick 1 = max relevance
    assert len({t[2] for t in got}) == k
    assert {t[2] for t in got} <= set(shortlist)
    with _pytest.raises(ValueError, match="k <= m"):
        mmr_rerank(df, q, k=9, m=8)
