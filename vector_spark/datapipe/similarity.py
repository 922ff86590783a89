"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: higher-order
  functions (`zip_with` + `aggregate`) compute the dot product
  JVM-side; a window takes top-k per query.  The baseline, and the
  verifier for approximate variants.
- :func:`hyperplane_lsh_buckets` — random-hyperplane LSH: sign bits
  against deterministic pseudo-random planes → bucket key; restrict
  search to bucket collisions.  The 100 TB path: candidates come from
  an equi-join on bucket, turning O(N*Q) scoring into
  O(collisions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Output (query_id, neighbor_id, cos) with deterministic tie-break
    (rounded cosine desc, neighbor id asc).  The cross join broadcasts
    the smaller side (queries) — each partition of `vectors` scores
    against the broadcast query set, no shuffle of the big side.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_vv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rk").alias("rank"))
    )


def _plane(plane_id: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: LCG over (plane, dim)."""
    out = []
    for d in range(dim):
        x = (plane_id * 2654435761 + d * 1103515245 + 12345) % 2147483647
        out.append((x / 2147483647.0) * 2.0 - 1.0)
    return out


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    *,
    n_planes: int = 8,
    n_tables: int = 1,
    dim: int = 64,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Sign-bit bucket keys from fixed hyperplanes, ``n_tables``
    independent tables (OR-amplification: a pair is a candidate if it
    collides in ANY table — raises recall without widening buckets).

    Output has one row per (vector, table): bucket = table-prefixed
    sign-bit key.  With n_tables=1 this is plain single-probe LSH.
    """
    # all table keys in ONE projection + explode — a union of
    # per-table branches would re-evaluate the upstream frame (scan +
    # any augmentation) once per table (Catalyst does not share
    # subtrees across union branches)
    keys = []
    for t in range(n_tables):
        key = F.lit(0).cast("long")
        for p in range(n_planes):
            plane = F.array(*[F.lit(x) for x in _plane(t * 1000 + p, dim)])
            d = _dot(F.col(vec_col), plane)
            key = key + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(0)
        keys.append(F.concat_ws(":", F.lit(str(t)), key.cast("string")))
    return vectors.withColumn(bucket_col, F.explode(F.array(*keys)))


def near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    *,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket candidate generation
    + exact cosine rescoring — NO all-pairs cross join anywhere.

    A pair is considered iff it collides in >= 1 of ``n_tables`` bucket
    tables (OR-amplification); collisions are an equi-self-join on the
    bucket key, so the work is O(sum of bucket sizes squared), bounded
    by the bucket width (``n_planes`` — scale it with log2(N) to keep
    buckets fixed-size as the corpus grows).  Candidates are then
    rescored exactly and filtered at ``threshold``.  Recall vs the
    all-pairs verifier is a test gate (test_datapipe.py); at
    cos >= 0.9 the 8x8 config recalls ~0.94+, and every planted
    perturbed clone sits at cos ~0.999 where recall is ~1.
    """
    vb = hyperplane_lsh_buckets(
        vectors, n_planes=n_planes, n_tables=n_tables, dim=dim,
        vec_col=vec_col,
    ).select(F.col(id_col), "bucket")
    a = vb.select(F.col(id_col).alias("id_a"), "bucket")
    b = vb.select(F.col(id_col).alias("id_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_a"))
    vc = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_b"))
    return (
        cand.join(va, "id_a")
        .join(vc, "id_b")
        .withColumn("cos", F.round(cosine(F.col("_a"), F.col("_b")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def all_pairs_cosine(
    vectors: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs verifier for :func:`near_dup_pairs` — O(N²),
    test-time ground truth only."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_a"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("_a"), F.col("_b")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_train_centroids(
    vectors: DataFrame,
    k: int = 16,
    *,
    iters: int = 5,
    sample_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[list[float]]:
    """Train IVF coarse-quantizer centroids: mini k-means on a driver
    sample (Lloyd iterations over numpy).  The SAMPLE is driver-side by
    design — IVF training is always a bounded subsample (10-100k rows)
    regardless of corpus size; assignment (the O(N) part) stays
    distributed in :func:`ivf_assign`.  Deterministic: fixed seed +
    deterministic sample ordering."""
    import numpy as np

    sdf = vectors.select(id_col, vec_col)
    if sample_fraction is not None:
        sdf = sdf.sample(fraction=sample_fraction, seed=seed)
    rows = sdf.orderBy(id_col).limit(100_000).collect()
    x = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T  # cosine == dot on normalized vectors
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return [list(map(float, c)) for c in cents]


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    *,
    n_probe: int = 1,
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroid lists —
    pure Column expressions (one dot product per centroid, a sort, a
    slice + explode), fully distributed, no shuffle."""
    sims = F.array(
        *[
            F.struct(
                F.round(
                    cosine(F.col(vec_col), F.array(*[F.lit(v) for v in c])), 9
                ).alias("sim"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n_probe)
    return vectors.withColumn(
        list_col, F.explode(F.transform(top, lambda s: s.getField("c")))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    centroids: list[list[float]] | None = None,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only vectors in the query's
    ``n_probe`` nearest inverted lists (equi-join on list id) — the
    second scale path next to hyperplane LSH (:func:`ann_topk`).
    Vectors index into 1 list each; queries probe ``n_probe`` lists."""
    if centroids is None:
        centroids = ivf_train_centroids(vectors, k=n_lists,
                                        id_col=id_col, vec_col=vec_col)
    v = ivf_assign(vectors, centroids, n_probe=1, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vv"),
        "ivf_list",
    )
    q = ivf_assign(queries, centroids, n_probe=n_probe, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "ivf_list"
    )
    scored = (
        v.join(F.broadcast(q), "ivf_list")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_vv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rk").alias("rank"))
    )


def ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only bucket collisions (equi-join on
    the LSH key over ``n_tables`` tables, deduped) — recall measured
    against :func:`cosine_topk` in tests."""
    vb = hyperplane_lsh_buckets(
        vectors, n_planes=n_planes, n_tables=n_tables, dim=dim, vec_col=vec_col
    )
    qb = hyperplane_lsh_buckets(
        queries, n_planes=n_planes, n_tables=n_tables, dim=dim, vec_col=vec_col
    )
    q = qb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "bucket"
    )
    v = vb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv"), "bucket"
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_qv", "_vv")
        .dropDuplicates(["query_id", "neighbor_id"])  # collapse multi-table collisions
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_vv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rk").alias("rank"))
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (SQ8)

#: symmetric int8 range: q in [-127, 127]
SQ8_LEVELS = 127


def sq8_quantize(vec: Column) -> Column:
    """Per-vector symmetric int8 scalar quantization:
    ``q_i = floor(x_i / maxabs * 127 + 0.5)`` with maxabs the vector's
    max |x_i| (clamped away from 0).  floor(x + 0.5) — not round() — so
    Spark and the DuckDB oracle produce bit-identical integers from
    identical doubles regardless of either engine's rounding mode.

    Why it matters at 100 TB: an array<float> embedding column is the
    dominant storage/shuffle cost of a similarity pipeline; int8 codes
    are 4× smaller on disk, in shuffle, and in executor memory, and the
    integer dot product is exact (|q|≤127, dim 64 → |Σ| ≤ ~10⁶, far
    inside int64), so scoring is deterministic across engines too.
    Quantized cosine idot/(√Σqa²·√Σqb²) is scale-free — the per-vector
    scale cancels — and empirically preserves cosine ranking (recall
    gate in tests/test_datapipe.py)."""
    maxabs = F.greatest(
        F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),
    )
    return F.transform(
        vec,
        lambda x: F.floor(
            x.cast("double") / maxabs * float(SQ8_LEVELS) + F.lit(0.5)
        ).cast("long"),
    )


def _idot(a: Column, b: Column) -> Column:
    """Exact integer dot product over quantized codes."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq8_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors per query scored on int8-quantized codes — the
    memory-compressed scan path: the big side is read as 4×-smaller
    codes and never touches the float column after quantization (on a
    real deployment the codes are a materialized column; here they are
    computed inline).  Queries are broadcast; ranking uses the exact
    (integer) quantized cosine with neighbor-id tie-break, so the
    result is engine-reproducible (DuckDB oracle recomputes the
    identical integers).

    Output: (query_id, neighbor_id, iscore, cos_q, rank); ``iscore`` is
    the raw integer dot product, ``cos_q`` the quantized cosine.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), sq8_quantize(F.col(vec_col)).alias("_qq")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        sq8_quantize(F.col(vec_col)).alias("_vq"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("iscore", _idot(F.col("_qq"), F.col("_vq")))
        .withColumn(
            "_cos",
            F.col("iscore")
            / (
                F.sqrt(_idot(F.col("_qq"), F.col("_qq")))
                * F.sqrt(_idot(F.col("_vq"), F.col("_vq")))
            ),
        )
        .filter(F.col("_cos").isNotNull())
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "iscore",
            F.round("_cos", 6).alias("cos_q"),
            F.col("_rk").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with ADC scoring + exact re-rank

#: default PQ geometry: 16 subspaces x 16 codes = 16 bytes/vector
#: (vs 256 bytes of float32 at dim 64); refine re-ranks the ADC
#: top-50 exactly (the FAISS IndexRefineFlat recipe)
PQ_M = 16
PQ_KSUB = 16
PQ_REFINE = 50


def pq_train_codebooks(
    vectors: DataFrame,
    *,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[list[list[float]]]:
    """Train product-quantizer codebooks: split the (normalized)
    vector into ``m`` contiguous subspaces and run L2 k-means with
    ``ksub`` centroids independently per subspace, on the same bounded
    driver sample :func:`ivf_train_centroids` uses (training is a
    10-100k subsample regardless of corpus size; encoding — the O(N)
    part — stays distributed in :func:`pq_encode`).  Deterministic:
    fixed seed + deterministic sample ordering.  Returns
    ``codebooks[mi][c][j]`` (m x ksub x dim/m)."""
    import numpy as np

    rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(100_000).collect()
    )
    x = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for mi in range(m):
        sub = x[:, mi * dsub : (mi + 1) * dsub]
        cents = sub[
            rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)
        ].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def _normalized_batch(vecs) -> "object":
    import numpy as np

    x = np.stack(vecs.to_numpy()).astype(np.float64)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Assign each (normalized) subvector its nearest codebook entry.
    The O(N) encode runs as an Arrow-batched pandas UDF over numpy
    (one argmin over a (batch, ksub, dsub) tensor per subspace) — a
    pure projection, zero shuffles.  An unrolled Column expression was
    measured and REJECTED: m*ksub*dsub literal terms (1024 at 16x16x4)
    blow past Janino's method-size limit, so whole-stage codegen
    fails and Spark silently falls back to interpreted row evaluation
    — the Arrow batch path is the honest vectorized plan.  Ties take
    the lowest code (numpy argmin returns the first minimum), so
    encoding is a pure function of the vector.  Adds ``code_col``:
    ``array<int>`` of length m — the 100 TB scan/shuffle payload PQ
    exists for (m bytes/vector instead of 4*dim)."""
    import numpy as np

    books = np.array(codebooks, dtype=np.float64)  # m x ksub x dsub
    m, _, dsub = books.shape

    @F.pandas_udf("array<int>")
    def _enc(vecs: pd.Series) -> pd.Series:
        x = _normalized_batch(vecs)
        codes = np.empty((x.shape[0], m), dtype=np.int32)
        for mi in range(m):
            sub = x[:, mi * dsub : (mi + 1) * dsub]
            d2 = ((sub[:, None, :] - books[mi][None, :, :]) ** 2).sum(-1)
            # round-12 before argmin: makes the code assignment
            # replayable by the SQL oracle (different but valid
            # float summation orders agree after quantization);
            # ties still take the lowest code (first minimum)
            codes[:, mi] = np.round(d2, 12).argmin(1)
        return pd.Series(list(codes))

    return vectors.withColumn(code_col, _enc(F.col(vec_col)))


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    codebooks: list[list[list[float]]] | None = None,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    refine: int = PQ_REFINE,
    ivf_centroids: list[list[float]] | None = None,
    n_lists: int = 0,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate top-k with asymmetric distance computation and
    exact re-rank (the FAISS PQ + IndexRefineFlat recipe, the third
    ANN scale path next to hyperplane LSH and IVF):

    1. ADC scan: the corpus side carries ONLY its m-byte codes; each
       broadcast query carries a precomputed (m x ksub) lookup table
       ``lut[mi][c] = <q_sub_mi, codebook[mi][c]>``, so the per-pair
       score is m table lookups (unrolled, codegen) — no float vector
       ever moves or is touched on the big side.
    2. Refine: only the ADC top-``refine`` candidates per query fetch
       their full vectors (an equi-join on neighbor_id) for exact
       cosine, then exact top-k by (cos DESC, neighbor_id ASC).

    Approximate by construction — verified by a recall gate against
    :func:`cosine_topk` in tests, like ann_topk/ivf_topk.

    IVF-PQ: pass ``n_lists > 0`` (or ``ivf_centroids``) to prune even
    the ADC scan — vectors index into their nearest coarse list,
    queries probe ``n_probe`` lists, and the candidate join becomes an
    equi-join on the list id instead of a broadcast cross join (the
    FAISS IVFPQ layout: at 100 TB the code table is also clustered on
    the list id, so a probe touches n_probe/n_lists of the corpus)."""
    import numpy as np

    # a shortlist narrower than k could never return k rows
    refine = max(refine, k)
    if codebooks is None:
        codebooks = pq_train_codebooks(
            vectors, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
        )
    books = np.array(codebooks, dtype=np.float64)  # m x ksub x dsub
    m, _, dsub = books.shape

    @F.pandas_udf("array<array<double>>")
    def _lut(vecs: pd.Series) -> pd.Series:
        x = _normalized_batch(vecs)
        # per query: lut[mi][c] = <q_sub_mi, codebook[mi][c]>
        luts = np.round(np.stack(
            [
                x[:, mi * dsub : (mi + 1) * dsub] @ books[mi].T
                for mi in range(m)
            ],
            axis=1,
        ), 9)  # B x m x ksub; round-9 = oracle-replayable entries
        return pd.Series([[list(row) for row in l] for l in luts])

    use_ivf = bool(n_lists) or ivf_centroids is not None
    if use_ivf and ivf_centroids is None:
        ivf_centroids = ivf_train_centroids(
            vectors, k=n_lists, id_col=id_col, vec_col=vec_col
        )
    vsrc, qsrc = vectors, queries
    if use_ivf:
        vsrc = ivf_assign(vectors, ivf_centroids, n_probe=1, vec_col=vec_col)
        qsrc = ivf_assign(
            queries, ivf_centroids, n_probe=n_probe, vec_col=vec_col
        )
    q = qsrc.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _lut(F.col(vec_col)).alias("_lut"),
        *(["ivf_list"] if use_ivf else []),
    )
    codes = pq_encode(vsrc, codebooks, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("pq_codes").alias("_codes"),
        *(["ivf_list"] if use_ivf else []),
    )
    adc = sum(
        F.element_at(
            F.element_at("_lut", mi + 1), F.element_at("_codes", mi + 1) + 1
        )
        for mi in range(m)
    )
    if use_ivf:
        # each vector sits in exactly one list, so a (query, neighbor)
        # pair can collide through at most one probe — no dedup needed
        cand = codes.join(
            F.broadcast(q.select("query_id", "_lut", "ivf_list")),
            "ivf_list",
        )
    else:
        cand = codes.crossJoin(F.broadcast(q.select("query_id", "_lut")))
    # round-6 on the ADC score: shortlist membership becomes
    # summation-order-independent (the oracle's grouped SUM need not
    # reproduce the fold order); boundary ties break on neighbor_id
    cand = cand.filter(
        F.col("neighbor_id") != F.col("query_id")
    ).withColumn("_adc", F.round(adc, 6))
    wr = W.partitionBy("query_id").orderBy(
        F.desc("_adc"), F.asc("neighbor_id")
    )
    shortlist = (
        cand.withColumn("_rr", F.row_number().over(wr))
        .filter(F.col("_rr") <= refine)
        .select("query_id", "neighbor_id")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv")
    )
    # rescore against the ORIGINAL queries frame — under IVF, `q`
    # carries one row per probed list and would duplicate each
    # shortlist row n_probe times
    q_flat = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    rescored = (
        shortlist.join(v, "neighbor_id")
        .join(F.broadcast(q_flat), "query_id")
        .withColumn("cos", F.round(cosine(F.col("_qv"), F.col("_vv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rk").alias("rank"))
    )


def anchor_assign(
    vectors: DataFrame,
    anchors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stratify every vector by its nearest anchor (cosine argmax,
    rounded to 6 decimals; ties break to the LOWEST anchor id) —
    deterministic, engine-portable cluster assignment.  The anchor set
    broadcasts; the big side is scanned once, never shuffled on
    vectors.  Output: (id, anchor_id, cos)."""
    a = anchors.select(
        F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("_av")
    )
    scored = vectors.crossJoin(F.broadcast(a)).withColumn(
        "_cos", F.round(cosine(F.col(vec_col), F.col("_av")), 6)
    )
    # argmax as max-of-struct: (cos, -anchor_id) orders lexicographically
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("_cos").alias("_c"),
                (-F.col("anchor_id")).alias("_na"),
            )
        ).alias("_b")
    )
    return best.select(
        id_col,
        (-F.col("_b._na")).alias("anchor_id"),
        F.col("_b._c").alias("cos"),
    )


def diversity_sample(
    vectors: DataFrame,
    *,
    n_anchors: int = 8,
    per_cluster: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced diversity sampling over an embedding column —
    the training-mix counterpart of SemDeDup: stratify the corpus into
    ``n_anchors`` semantic regions and keep an equal quota from each,
    so over-represented regions are capped instead of dominating the
    mix (cluster-balanced sampling as used in corpus curation; same
    family as temperature_mix but in embedding space rather than by a
    categorical column).

    Deterministic and oracle-portable end to end: anchors are the
    ``n_anchors`` LOWEST-id vectors (no k-means — an explicit,
    SQL-reproducible anchor rule; pass driver-trained centroids to
    :func:`anchor_assign` directly when semantic centroids are wanted),
    assignment is rounded-cosine argmax, and the within-cluster quota
    keeps the ``per_cluster`` smallest ``(portable_hash60(id), id)``
    rows — a hash-spread, order-free pick (the quota_sample
    convention).  Plan shape: anchors broadcast; one groupBy(id) for
    the argmax; the quota rank window is pre-bounded by Spark's
    WindowGroupLimit, so no cluster sorts more than its own rows and
    only ~per_cluster survivors leave each task.  Output:
    (id, anchor_id, cos) for the kept rows."""
    from vector_spark.datapipe.dedup import portable_hash60

    anchors = vectors.orderBy(F.col(id_col).asc()).limit(int(n_anchors))
    assigned = anchor_assign(
        vectors, anchors, id_col=id_col, vec_col=vec_col
    )
    h = portable_hash60(F.col(id_col).cast("string"))
    w = W.partitionBy("anchor_id").orderBy(h.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(per_cluster))
        .drop("_rk")
    )
