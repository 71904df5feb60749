"""Similarity search over embedding columns (``array<float>``).

Two tiers:

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the corpus, score with a JVM-side HOF cosine, rank with a
  window.  O(|Q|·|corpus|) but fully distributed and shuffle-light
  (the only shuffle is the per-query top-k window, keyed by query id).
  This is the correctness baseline.
* ``lsh_cosine_topk`` — the scale path: random-hyperplane LSH buckets
  both sides, joins on (table, bucket), scores only within buckets.
  At 100 TB this turns the cross product into an equijoin whose right
  side is pruned to candidate buckets; recall is tunable via
  (n_tables, n_bits).

Both keep vectors as ``array<float/double>`` end-to-end — no VectorUDT,
no Python in the scoring path (SURVEY.md §2.9 note).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from platform_etl_literature_spark.functions.vectors import array_cosine

# Deterministic pseudo-random hyperplanes are derived from md5 of
# (table, bit, dim) — reproducible across runs and engines.
_LSH_PRIME = 2147483647


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, sim) with rank 1..k by
    (sim desc, neighbor_id) — the tiebreak makes results deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim_exact", array_cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim_exact", 6).alias("sim"),
        )
    )


def jl_signs(out_dim: int, in_dim: int) -> list[list[int]]:
    """Deterministic ±1 sign matrix for the Johnson-Lindenstrauss
    random projection (Achlioptas 2003, "Database-friendly random
    projections": ±1 entries satisfy the JL lemma — no Gaussians
    needed).  Entry (j, i) is the parity of the first hex digit of
    md5("jl:j:i") — computed DRIVER-SIDE once and shipped as
    literals, the `_hyperplane` rule: per-row work must not re-derive
    constants with per-element hash expressions."""
    import hashlib

    return [
        [
            -1
            if int(
                hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[0], 16
            ) % 2
            else 1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    out_col: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: append
    ``out_col`` = the ±1-projected vector (array<double>, length
    ``out_dim``).  Cosine structure survives with distortion
    O(sqrt(log n / out_dim)) — the cheap front half of a
    compress-then-refine ANN route (project → exact top-m in reduced
    space → :func:`refine_topk` re-ranks with true vectors).

    Each output component is a GENERATED left-associated ±chain
    (``e[1] - e[2] + e[3] …``): sign flips are exact in IEEE754, so
    the only float operation is addition in a FIXED order — any
    engine replaying the same chain produces bit-identical doubles
    (the float-parity policy's safe case; the suite oracle replays
    the chain textually).  The per-row cost is in_dim × out_dim adds
    inside whole-stage codegen; no shuffle, no UDF, no driver state
    beyond the sign literals."""
    signs = jl_signs(out_dim, in_dim)
    comps = []
    for j in range(out_dim):
        # anchored at +0.0 so an all-negative chain can never emit
        # -0.0 (which would format differently across engines)
        terms = ["0.0D"]
        for i in range(in_dim):
            op = "-" if signs[j][i] < 0 else "+"
            terms.append(f"{op} CAST(element_at(`{vec_col}`, {i + 1}) AS DOUBLE)")
        comps.append(F.expr(" ".join(terms)))
    return df.withColumn(out_col, F.array(*comps))


def _hyperplane(table: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane, components in [-1, 1).

    Computed driver-side (md5 of "table:bit:dim") and shipped as an
    array literal: the per-row work is then a single zip_with dot
    product in whole-stage codegen, instead of re-deriving the
    hyperplane with per-element md5 expressions on every row.
    """
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{table}:{bit}:{d}".encode()).hexdigest()[:8], 16)
        out.append((h % _LSH_PRIME) / float(_LSH_PRIME) * 2.0 - 1.0)
    return out


def lsh_bucket(vec, table: int, n_bits: int, dim: int) -> "F.Column":
    """Random-hyperplane signature (int bucket) of an array column."""
    bucket = F.lit(0)
    for bit in range(n_bits):
        plane = F.lit(_hyperplane(table, bit, dim))
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, hcomp: x * hcomp),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**bit)).otherwise(F.lit(0))
    return bucket


def nearest_lists_udf(centroids: list[list[float]]):
    """Pandas UDF: array<int> of centroid indices ordered
    nearest-to-farthest for each vector — the shared coarse-quantizer
    assignment used by the IVF probe and cluster-bucketed semantic
    dedup.

    Ranks in ONE Arrow batch per partition: squared-L2 to every
    centroid via ‖x‖² − 2x·c + ‖c‖² as a numpy matmul.  (The HOF
    formulation shipped n_lists × dim literal doubles into the
    expression tree — codegen cost scaled with the quantizer, not the
    data.)  Ties broken by list index (argsort is stable)."""
    import numpy as np

    cent = np.array(centroids, dtype=np.float64)
    cent_sq = (cent * cent).sum(axis=1)  # (L,)

    def _nearest_lists(v):
        import numpy as _np
        import pandas as _pd

        X = _np.asarray([_np.asarray(row, dtype=_np.float64) for row in v])
        if len(X) == 0:
            return _pd.Series([], dtype=object)
        d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ cent.T) + cent_sq[None, :]
        order = _np.argsort(d2, axis=1, kind="stable")  # (n, L)
        return _pd.Series([row.tolist() for row in order])

    # asNondeterministic: the inner-join on list_id infers an
    # isnotnull(list_id) filter that the optimizer pushes below the
    # assignment projection, re-running the full centroid matmul over
    # every corpus vector (plans/r10/ivf_ann_topk_before.txt nodes
    # 9+12).  Non-deterministic forbids the duplication (guide §4.4);
    # the assignment value is unchanged.
    return F.pandas_udf(_nearest_lists, "array<int>").asNondeterministic()


def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 8,
    seed: int = 42,
) -> list[list[float]]:
    """Train the IVF coarse quantizer (k-means) and return its centroid
    table as plain lists — the build-once artifact.  At 100 TB the
    quantizer trains on a sample, the centroids are persisted alongside
    the corpus version, and every probe batch reuses them; re-training
    per query batch would re-scan the corpus with an iterative ML job
    each time."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 3,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k cosine via an IVF (inverted-file) index:
    k-means coarse quantizer → corpus rows assigned to their nearest
    centroid list → each query probes its ``n_probe`` nearest lists →
    exact cosine only within probed lists.

    The centroid table is tiny and shipped as literal arrays, so both
    the corpus assignment and the query probe are map-side expressions;
    the only shuffle is the equijoin on ``list_id`` (pruned to probed
    lists) plus the final per-query top-k window.  At 100 TB the corpus
    assignment is computed once and persisted with the data; pass
    ``centroids`` from ivf_train_centroids to reuse a trained
    quantizer instead of re-fitting per probe batch.
    """
    if centroids is None:
        centroids = ivf_train_centroids(corpus, vec_col, n_lists, seed)
    _lists_udf = nearest_lists_udf(centroids)
    probe_n = n_probe

    cv = F.col(vec_col).cast("array<double>")
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        cv.alias("cvec"),
        _lists_udf(cv)[0].alias("list_id"),
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        cv.alias("qvec"),
        F.explode(F.slice(_lists_udf(cv), 1, probe_n)).alias("list_id"),
    )

    scored = (
        probed.join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim_exact", array_cosine("qvec", "cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim_exact", 6).alias("sim"))
    )


def build_lsh_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_bits: int = 8,
    dim: int | None = None,
) -> None:
    """Materialize the corpus side of the LSH index as a parquet table
    partitioned by LSH table id — the at-scale pattern: the index is
    built ONCE per corpus version and every query-time probe reads only
    the partitions (tbl) and row groups (bucket min/max) it needs,
    instead of re-hashing 100 TB per query batch.
    """
    rows = _bucket_rows(corpus, "neighbor_id", id_col, vec_col, n_tables, n_bits, dim)
    rows.withColumnRenamed("_v_neighbor_id", "vec").write.mode("overwrite").partitionBy(
        "tbl"
    ).parquet(path)


def query_lsh_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 4,
    n_bits: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Probe a persisted LSH index: bucket the (small) query set, join
    on (tbl, bucket) against the index table, exact-cosine the
    candidates, per-query top-k.  Same result as ``lsh_cosine_topk``
    with the same parameters.  ``dim`` is optional — when None the
    hyperplanes are derived executor-side (see ``_bucket_rows``)."""
    qb = _bucket_rows(queries, "query_id", id_col, vec_col, n_tables, n_bits, dim)
    cb = spark.read.parquet(path).withColumnRenamed("vec", "_v_neighbor_id")
    cands = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "sim_exact", array_cosine("_v_query_id", "_v_neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim_exact", 6).alias("sim"))
    )


@functools.lru_cache(maxsize=16)
def _plane_matrix(n_tables: int, n_bits: int, dim: int):
    """(n_tables·n_bits × dim) hyperplane matrix — pure function of its
    arguments (md5-derived), so it can be built on the driver OR inside
    an executor UDF from the observed vector width with identical
    results.  Cached per process (treat as read-only) so the per-batch
    path derives the md5 components once per executor, not per batch."""
    import numpy as np

    return np.array(
        [_hyperplane(t, b, dim) for t in range(n_tables) for b in range(n_bits)]
    )


def _bucket_rows(
    df: DataFrame,
    idname: str,
    id_col: str,
    vec_col: str,
    n_tables: int,
    n_bits: int,
    dim: int | None,
) -> DataFrame:
    """(id, vector, tbl, bucket) rows via the vectorized matmul UDF —
    shared by the inline join and the persisted-index build/probe.

    ``dim`` is optional: when None the hyperplane matrix is derived
    executor-side from each Arrow batch's own vector width (the planes
    are a pure function of (table, bit, dim)), so no driver-side
    ``first()`` round-trip ever runs — on a cold 100 TB cluster that
    lookup would stall the probe behind a full scan-stage launch.
    Prefer passing ``dim`` when the caller knows it: the matrix then
    ships in the closure, built once; the fallback's lru_cache only
    helps when the package is importable on the workers — a
    by-value-pickled closure rebuilds the 2k-md5 matrix per task
    (~20 ms each, measured ~30% on the sf0.1 probe)."""
    import numpy as np

    planes = None if dim is None else _plane_matrix(n_tables, n_bits, dim)
    bit_weights = (1 << np.arange(n_bits)).astype("int64")
    n_t, n_b = n_tables, n_bits

    def _bucket_batches(v):
        import numpy as _np
        import pandas as _pd

        X = _np.asarray([_np.asarray(row, dtype=_np.float64) for row in v])
        if len(X) == 0:
            return _pd.Series([], dtype=object)
        P = planes if planes is not None else _plane_matrix(n_t, n_b, X.shape[1])
        signs = (X @ P.T) > 0
        buckets = signs.reshape(len(X), n_t, n_b) @ bit_weights
        return _pd.Series([row.tolist() for row in buckets])

    _buckets_udf = F.pandas_udf(_bucket_batches, "array<long>")
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(idname),
        v.alias(f"_v_{idname}"),
        F.posexplode(_buckets_udf(v)).alias("tbl", "bucket"),
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_tables: int = 4,
    n_bits: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane LSH bucket join.

    Candidates = pairs sharing a bucket in ≥1 of n_tables; exact cosine
    is computed only for candidates.  Returns the same shape as
    ``cosine_topk`` (queries with <k candidates return fewer rows).
    ``dim`` is the embedding dimensionality; when omitted the
    hyperplanes are derived executor-side from the observed vector
    width (no driver round-trip — see ``_bucket_rows``).
    """
    # All n_tables × n_bits hyperplane projections in ONE Arrow batch per
    # partition: a numpy (batch × dim) @ (dim × T·B) matmul replaces
    # T·B zip_with/aggregate folds per row.  The HOF formulation built a
    # literal-laden expression tree (T·B·dim literal doubles) whose
    # codegen+eval cost dwarfed the data at any scale; the matmul is the
    # vectorized scale path and keeps the same deterministic md5 planes.
    qb = _bucket_rows(queries, "query_id", id_col, vec_col, n_tables, n_bits, dim)
    cb = _bucket_rows(corpus, "neighbor_id", id_col, vec_col, n_tables, n_bits, dim)
    cands = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_v_query_id", "_v_neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "sim_exact", array_cosine("_v_query_id", "_v_neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim_exact", 6).alias("sim"))
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors — the vectorized 100 TB path.

    Same contract as ``cosine_topk`` (rank 1..k by sim desc,
    neighbor_id asc; 0.0 on zero norms), different physical shape: the
    query block is collected driver-side (query batches are small by
    contract — this is the dense side of an ANN probe) and shipped in
    the mapInPandas closure; every corpus partition computes one
    (batch × Q) numpy matmul and PRE-REDUCES to its local top-k per
    query under the exact global order (sim desc, id asc), so the
    shuffle into the final ranking window carries partitions × Q × k
    rows instead of N × Q.  Any global top-k row is in its partition's
    top-k under the same total order, so the pre-reduction is lossless.

    Float note: numpy accumulates dot products in a different order
    than the sequential HOF fold, so sims can differ from
    ``cosine_topk`` in the last ulp.
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.array([list(map(float, r[1])) for r in q_rows])
    qnorm = np.linalg.norm(qmat, axis=1)

    def local_topk(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xnorm = np.linalg.norm(X, axis=1)
            denom = xnorm[:, None] * qnorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(denom > 0, (X @ qmat.T) / denom, 0.0)
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                mask = ids != qids[j]
                cand_ids, cand_s = ids[mask], S[mask, j]
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out_q.extend([qids[j]] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_s[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "sim_exact": out_s}
            )

    reduced = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, "query_id long, neighbor_id long, sim_exact double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim_exact", 6).alias("sim"),
        )
    )


def sign_signatures(
    df: DataFrame, id_col: str, vec_col: str, dim: int = 64
) -> DataFrame:
    """1-bit-per-dimension sign quantization: pack ``sign(v_i) > 0``
    into two 32-bit halves (``sig_lo`` dims 1-32, ``sig_hi`` dims
    33-64) — 8 bytes per vector instead of 256+ for the floats, the
    32x memory compression that lets a 100 TB embedding corpus keep
    its ENTIRE prescreen index hot.  Two halves rather than one long
    because the packing fold is exact integer arithmetic (acc*2 + bit)
    and a 64-bit top bit would overflow under ANSI mode.  Map-side
    only, deterministic, SQL-replayable (the oracle recomputes the same
    integers as a power-of-two sum).
    """
    if dim > 64:
        raise ValueError(f"sign_signatures packs at most 64 dims, got {dim}")
    v = F.col(vec_col).cast("array<double>")
    half = dim // 2

    def pack(lo: int, hi: int):
        # fold highest dim first: acc*2 + bit == sum(bit_i * 2^(i-lo))
        return F.aggregate(
            F.reverse(F.sequence(F.lit(lo), F.lit(hi))),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(F.element_at(v, i) > 0, 1).otherwise(0),
        )

    return df.select(
        F.col(id_col),
        pack(1, half).alias("sig_lo"),
        pack(half + 1, dim).alias("sig_hi"),
    )


def binary_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 20,
    dim: int = 64,
) -> DataFrame:
    """Binary-quantized ANN: Hamming prescreen over packed sign
    signatures, exact-cosine rerank of the per-query shortlist only.

    Scale shape: the prescreen joins the broadcast query signatures
    against a SIGNATURES-ONLY projection of the corpus (two longs + id
    per row — the float vectors never enter the scan), scores each pair
    with two xor+bit_count ops, and keeps ``shortlist`` candidates per
    query by (hamming ASC, id ASC).  Only the shortlist joins back to
    the corpus to fetch real vectors for the exact rerank — the
    fetch-on-demand pattern that makes 1-bit quantization the cheapest
    ANN prescreen at corpus scale (RaBitQ/BQ practice).  Fully
    deterministic (stable tie-breaks at both stages), so it takes a
    value-level oracle.  Returns (query_id, neighbor_id, rank, sim,
    hamming).
    """
    qsig = (
        sign_signatures(queries, id_col, vec_col, dim)
        .join(
            queries.select(
                F.col(id_col), F.col(vec_col).cast("array<double>").alias("qv")
            ),
            id_col,
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col("sig_lo").alias("qlo"),
            F.col("sig_hi").alias("qhi"),
            "qv",
        )
    )
    csig = sign_signatures(corpus, id_col, vec_col, dim).select(
        F.col(id_col).alias("neighbor_id"), "sig_lo", "sig_hi"
    )
    pre = csig.join(
        F.broadcast(qsig), F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "hamming",
        F.bit_count(F.col("sig_lo").bitwiseXOR(F.col("qlo")))
        + F.bit_count(F.col("sig_hi").bitwiseXOR(F.col("qhi"))),
    )
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    short = (
        pre.withColumn("_rn", F.row_number().over(w_pre))
        .filter(F.col("_rn") <= shortlist)
        .select("query_id", "neighbor_id", "hamming", "qv")
    )
    rerank = short.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ),
        "neighbor_id",
    ).withColumn("sim_exact", array_cosine("qv", "cv"))
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w_top))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim_exact", 6).alias("sim"),
            "hamming",
        )
    )


def _pq_d2_np(sub, cents):
    """Squared L2 from each row of ``sub`` (n, d) to each centroid
    (K, d) — (n, K) float64 — with an EXPLICIT left-fold accumulation
    over the d axis, NOT ``np.sum``: numpy's axis reductions use
    unrolled/pairwise association above tiny sizes, which re-associates
    the doubles; the explicit i=0..d-1 loop reproduces the exact
    left-associative (e−c)·(e−c) + ... chain the DuckDB oracle writes,
    so argmin inputs agree bit-for-bit across engines."""
    import numpy as np

    diff = sub[:, None, :] - cents[None, :, :]
    sq = diff * diff
    acc = sq[..., 0].copy()
    for i in range(1, sq.shape[-1]):
        acc += sq[..., i]
    return acc


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """Product-quantization encode (Jégou/Douze/Schmid, TPAMI'11):
    split each vector into M subspaces and store only the index of the
    nearest codebook centroid per subspace — M small ints (here 8×4
    bits) instead of the float vector, the compression that keeps a
    100 TB embedding corpus's search structure in memory.

    The encode is matmul-shaped work, so it runs as the sanctioned
    Arrow-batched numpy kernel (the IVF-assignment / SemDeDup
    pattern): one (n, K, d) distance tensor per subspace per batch,
    argmin rows to codes — the measured JVM HOF alternative
    (zip_with+aggregate per (row, subspace, centroid)) interpreted its
    lambdas and ran ~10× slower.  Bit-exact with the SQL oracle:
    elementwise float64 ops plus the explicit left-fold in
    :func:`_pq_d2_np`, and ``np.argmin`` returns the FIRST minimum —
    the same (d2 ASC, k ASC) tie rule as the oracle's row_number.
    Returns (id, codes array<int>[M]).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    cb = np.asarray(codebooks, dtype=np.float64)  # (M, K, d)
    M, _K, d = cb.shape

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            codes = np.empty((len(V), M), dtype=np.int32)
            for m in range(M):
                sub = V[:, m * d : (m + 1) * d]
                codes[:, m] = np.argmin(_pq_d2_np(sub, cb[m]), axis=1)
            yield pd.DataFrame(
                {"__id": pdf[id_col], "codes": list(codes)}
            )

    id_field = df.select(id_col).schema.fields[0]
    out_schema = T.StructType(
        [
            T.StructField("__id", id_field.dataType, id_field.nullable),
            T.StructField("codes", T.ArrayType(T.IntegerType()), False),
        ]
    )
    return (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(run, out_schema)
        .withColumnRenamed("__id", id_col)
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    k: int = 5,
) -> DataFrame:
    """PQ asymmetric-distance top-k: each query precomputes its M×K
    distance table (query subvector → every centroid, exact doubles),
    and a corpus row's approximate distance is M table lookups summed
    — the corpus side never touches floats again after encoding.

    Scale shape: corpus codes are a map-side projection (pq_encode);
    the M×K tables ride the broadcast with the query set; scoring is a
    fixed M-term lookup chain inside whole-stage codegen; only the
    per-query top-k window shuffles, keyed by query id.  Deterministic
    (stable argmin + stable top-k tie-break) → full value-level
    oracle.  Returns (query_id, neighbor_id, rank, approx_d2).
    """
    from platform_etl_literature_spark.operators.pq_codebooks import (
        PQ_CODEBOOKS_8x16x8,
    )

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    cb = codebooks if codebooks is not None else PQ_CODEBOOKS_8x16x8
    M, K = len(cb), len(cb[0])
    cbn = np.asarray(cb, dtype=np.float64)  # (M, K, d)
    d = cbn.shape[-1]

    def qrun(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-query M*K distance table, m-major — same numpy kernel
        # (and the same bit-exact fold) as the encode side
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            tabs = np.concatenate(
                [
                    _pq_d2_np(V[:, m * d : (m + 1) * d], cbn[m])
                    for m in range(M)
                ],
                axis=1,
            )
            yield pd.DataFrame({"query_id": pdf[id_col], "_dtab": list(tabs)})

    id_field = queries.select(id_col).schema.fields[0]
    q_schema = T.StructType(
        [
            T.StructField("query_id", id_field.dataType, id_field.nullable),
            T.StructField("_dtab", T.ArrayType(T.DoubleType()), False),
        ]
    )
    q = queries.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(qrun, q_schema)
    codes = pq_encode(corpus, id_col, vec_col, cb).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    pre = codes.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    approx = None
    for m in range(M):
        t = F.element_at(
            F.col("_dtab"), F.lit(m * K + 1) + F.element_at(F.col("codes"), m + 1)
        )
        approx = t if approx is None else approx + t
    w = Window.partitionBy("query_id").orderBy(
        F.col("_ad").asc(), F.col("neighbor_id").asc()
    )
    return (
        pre.withColumn("_ad", approx)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("_ad", 6).alias("approx_d2"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 3,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ: the classic composed ANN index (Jégou TPAMI'11) — an IVF
    coarse quantizer prunes the corpus to ``n_probe`` lists per query,
    and PQ asymmetric distance scores only the surviving rows from
    8×4-bit codes.  At 100 TB this is THE standard shape: the coarse
    index bounds candidate volume, the codes bound memory, and the
    float vectors are never touched at query time.

    One Arrow pass over the corpus emits (id, list_id, codes) —
    assignment reuses the exact ``nearest_lists_udf`` arithmetic
    (‖x‖² − 2x·c + ‖c‖², stable argsort) and codes the exact
    :func:`_pq_d2_np` fold, so both stay bit-consistent with their
    already-proven oracles.  Queries broadcast (probe list, M×K
    distance table); candidates come from the list_id equijoin; the
    only shuffle is the per-query top-k window.  Deterministic → full
    value-level oracle.  Returns (query_id, neighbor_id, rank,
    approx_d2).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from platform_etl_literature_spark.operators.ivf_quantizer import (
        IVF_CENTROIDS_8x64,
    )
    from platform_etl_literature_spark.operators.pq_codebooks import (
        PQ_CODEBOOKS_8x16x8,
    )

    cents = np.asarray(
        centroids if centroids is not None else IVF_CENTROIDS_8x64,
        dtype=np.float64,
    )
    cb = codebooks if codebooks is not None else PQ_CODEBOOKS_8x16x8
    cbn = np.asarray(cb, dtype=np.float64)
    cent_sq = (cents * cents).sum(axis=1)
    M, K, d = cbn.shape

    def _vecs(col) -> "np.ndarray":
        return np.array([np.asarray(x, dtype=np.float64) for x in col])

    def _lists(X: "np.ndarray") -> "np.ndarray":
        d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ cents.T) + cent_sq[None, :]
        return np.argsort(d2, axis=1, kind="stable")

    def crun(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _vecs(pdf[vec_col])
            codes = np.empty((len(X), M), dtype=np.int32)
            for m in range(M):
                codes[:, m] = np.argmin(
                    _pq_d2_np(X[:, m * d : (m + 1) * d], cbn[m]), axis=1
                )
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col],
                    "list_id": _lists(X)[:, 0].astype("int32"),
                    "codes": list(codes),
                }
            )

    def qrun(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _vecs(pdf[vec_col])
            tabs = np.concatenate(
                [_pq_d2_np(X[:, m * d : (m + 1) * d], cbn[m]) for m in range(M)],
                axis=1,
            )
            probes = _lists(X)[:, :n_probe]
            yield pd.DataFrame(
                {
                    "query_id": pdf[id_col],
                    "probes": [p.astype("int32").tolist() for p in probes],
                    "_dtab": list(tabs),
                }
            )

    id_field = corpus.select(id_col).schema.fields[0]
    c_schema = T.StructType(
        [
            T.StructField("neighbor_id", id_field.dataType, id_field.nullable),
            T.StructField("list_id", T.IntegerType(), False),
            T.StructField("codes", T.ArrayType(T.IntegerType()), False),
        ]
    )
    q_schema = T.StructType(
        [
            T.StructField("query_id", id_field.dataType, id_field.nullable),
            T.StructField("probes", T.ArrayType(T.IntegerType()), False),
            T.StructField("_dtab", T.ArrayType(T.DoubleType()), False),
        ]
    )
    prep = lambda df: df.select(  # noqa: E731
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    enc = prep(corpus).mapInPandas(crun, c_schema)
    probed = (
        prep(queries)
        .mapInPandas(qrun, q_schema)
        .select("query_id", "_dtab", F.explode("probes").alias("list_id"))
    )
    pre = enc.join(F.broadcast(probed), "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    approx = None
    for m in range(M):
        t = F.element_at(
            F.col("_dtab"), F.lit(m * K + 1) + F.element_at(F.col("codes"), m + 1)
        )
        approx = t if approx is None else approx + t
    w = Window.partitionBy("query_id").orderBy(
        F.col("_ad").asc(), F.col("neighbor_id").asc()
    )
    return (
        pre.withColumn("_ad", approx)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("_ad", 6).alias("approx_d2"),
        )
    )


def refine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact re-rank of approximate candidates — the refine stage of the
    classic two-phase ANN pipeline (Jégou et al. TPAMI'11 §V: coarse/PQ
    shortlist -> exact re-scoring of the shortlist).  ``candidates`` is
    any (query_id, neighbor_id) pair set, typically an approximate
    top-m with m > k; the output is the exact-cosine top-k *within*
    those candidates, in the same (query_id, neighbor_id, rank, sim)
    contract as :func:`cosine_topk` — so recall lost to quantization is
    recovered wherever the true neighbor made the shortlist at all.

    Scale shape: cost is proportional to |candidates|, never |corpus| —
    that is the point of refining.  The candidate pair set (n_queries
    x m rows, small by contract) joins the broadcast query vectors, and
    that still-small result BROADCASTS into the corpus equijoin on
    neighbor_id, so the corpus is scanned once with no shuffle; the
    only shuffle is the per-query top-k window over <= n_queries x m
    scored rows.  The cosine is the same JVM-side HOF fold as
    ``cosine_topk`` — bit-identical sims, full value-level oracle.
    """
    cand = candidates.select("query_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    probe = cand.join(F.broadcast(q), "query_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = c.join(F.broadcast(probe), "neighbor_id").withColumn(
        "sim_exact", array_cosine("qv", "cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim_exact", 6).alias("sim"),
        )
    )


def semi_hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Semi-hard negative mining for contrastive training (Schroff et
    al., FaceNet CVPR 2015 §3.2): for each anchor, find the k HARDEST
    negatives that are still farther than the anchor's hardest
    positive —

        pos_sim(a)  = max cosine over same-label vectors (a excluded)
        negatives(a) = top-k by sim desc among different-label vectors
                       with sim < pos_sim(a)

    — the in-batch mining step that decides which pairs a contrastive
    epoch actually trains on.  Anchors with NO same-label companion
    have no positive and are dropped (countable loudly: compare the
    output's distinct query_id set against the anchor frame).

    Physical shape (the cosine_topk_blocked discipline): anchors are
    batch-sized BY CONTRACT (this is per-training-batch mining) and
    ship driver-side into two Arrow kernels over the corpus —
    pass 1 computes each partition's same-label max sim and reduces
    to the global pos_sim (anchor-sized agg); pass 2 ships the
    pos_sim array in the closure, masks different-label columns with
    sim < pos_sim, and PRE-REDUCES to a local top-k per anchor under
    the exact global order (sim desc, id asc) — lossless, so the
    final ranking window sees partitions × A × k rows, never N × A.

    Float note: sims come from numpy float64 matmuls in BOTH passes,
    so the semi-hard cut compares like against like; zero-norm
    vectors score 0.0 (the module convention).

    Returns (query_id, neighbor_id, rank, sim, pos_sim).
    """
    import numpy as np

    q_rows = anchors.select(id_col, vec_col, label_col).collect()
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.array([list(map(float, r[1])) for r in q_rows])
    qlab = np.array([r[2] for r in q_rows], dtype=np.int64)
    qnorm = np.linalg.norm(qmat, axis=1)

    def _sims(pdf):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        lab = pdf[label_col].to_numpy(dtype=np.int64)
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        xnorm = np.linalg.norm(X, axis=1)
        denom = xnorm[:, None] * qnorm[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            S = np.where(denom > 0, (X @ qmat.T) / denom, 0.0)
        return ids, lab, S

    def local_pos(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, lab, S = _sims(pdf)
            out_q, out_p = [], []
            for j in range(len(qids)):
                mask = (lab == qlab[j]) & (ids != qids[j])
                if mask.any():
                    out_q.append(qids[j])
                    out_p.append(S[mask, j].max())
            yield pd.DataFrame({"query_id": out_q, "_pos": out_p})

    cols = [id_col, vec_col, label_col]
    pos_rows = (
        corpus.select(*cols)
        .mapInPandas(local_pos, "query_id long, _pos double")
        .groupBy("query_id")
        .agg(F.max("_pos").alias("pos_sim"))
        .collect()
    )
    pos_map = {r["query_id"]: r["pos_sim"] for r in pos_rows}
    keep = np.array([qid in pos_map for qid in qids], dtype=bool)
    pos_arr = np.array(
        [pos_map.get(int(qid), 0.0) for qid in qids], dtype=np.float64
    )

    def local_neg(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, lab, S = _sims(pdf)
            out_q, out_n, out_s, out_p = [], [], [], []
            for j in range(len(qids)):
                if not keep[j]:
                    continue
                mask = (lab != qlab[j]) & (S[:, j] < pos_arr[j])
                cand_ids, cand_s = ids[mask], S[mask, j]
                order = np.lexsort((cand_ids, -cand_s))[:k]
                out_q.extend([qids[j]] * len(order))
                out_n.extend(cand_ids[order])
                out_s.extend(cand_s[order])
                out_p.extend([pos_arr[j]] * len(order))
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "neighbor_id": out_n,
                    "sim_exact": out_s,
                    "_pos": out_p,
                }
            )

    reduced = corpus.select(*cols).mapInPandas(
        local_neg,
        "query_id long, neighbor_id long, sim_exact double, _pos double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_exact").desc(), F.col("neighbor_id").asc()
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim_exact", 6).alias("sim"),
            F.round("_pos", 6).alias("pos_sim"),
        )
    )
