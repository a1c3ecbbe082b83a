"""Approximate nearest neighbour search over embedding columns.

Three tiers (SURVEY operator class: similarity search / embedding-cosine
near-dup):

* **Brute force** — exact cosine top-k via a crossJoin + window rank;
  the correctness baseline (also exposed as the ``cosine_topk`` driver
  query). O(|Q|·|N|) — fine for small query sets, not a corpus scan.
* **Hyperplane LSH** — random-hyperplane signatures (Charikar SimHash
  for vectors): ``sign(P·v)`` packed into an int bucket id. Vectors
  that share a bucket are candidate neighbours; exact cosine runs only
  within buckets. ``n_probes`` > 1 additionally probes buckets at
  Hamming distance 1 (single-bit flips) for recall. At corpus scale the
  bucket join is an equi-shuffle on bucket id — no quadratic stage, and
  bucket population is capped + reported like every other skew guard in
  this engine.
* **IVF (inverted-file)** — a coarse k-means quantizer partitions the
  corpus into ``n_lists`` inverted lists (each vector indexed under its
  nearest centroid); queries probe their ``n_probes`` nearest lists and
  exact cosine runs only inside the probed lists. The standard
  IVF-Flat layout (Jégou et al., PAMI'11; FAISS) re-expressed as a
  DataFrame equi-join on the list id. Training is driver-side numpy
  k-means over a deterministic sample (centroids broadcast in the UDF
  closure); assignment is one Arrow-batched matmul per batch. Compared
  to hyperplane LSH: data-adaptive lists (better for clustered
  corpora), probe count = explicit recall/cost dial, and the same
  bucket-cap + report skew contract.

All kernels are numpy inside Arrow-batched pandas UDFs (no per-row
Python); the bucket join and ranking are plain DataFrame ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql import types as T


def _planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def planes_for(n_vectors: int, target_bucket: int = 200) -> int:
    """Corpus-sized plane count: expected bucket population stays near
    ``target_bucket`` (2^planes buckets over n vectors). A FIXED plane
    count collapses at scale — e.g. 10 planes = 1024 buckets, so any
    corpus ≥ ~10M vectors pushes every bucket over the population cap
    and, since over-cap buckets are excluded, recall drops to zero.
    Clamped to [8, 40] (int64 bucket ids hold up to 62 bits)."""
    import math

    need = math.ceil(math.log2(max(n_vectors, 2) / max(target_bucket, 1)))
    return int(min(40, max(8, need)))


def make_bucket_udf(n_planes: int, dim: int, seed: int, n_tables: int = 1):
    """array<float> embedding → array<long> of per-table bucket ids
    (sign-bit signatures; one independent hyperplane set per table).

    int64 buckets: n_planes up to 62 without sign-bit aliasing (bit 62 is
    the top usable bit; multiprobe XORs stay positive). An int32 bucket
    would silently wrap at n_planes >= 32, aliasing distinct signatures.
    Table 0's planes are identical to the historical single-table set
    (seed-stable), so n_tables=1 reproduces prior buckets exactly."""
    if not 1 <= n_planes <= 62:
        raise ValueError(f"n_planes must be in [1, 62], got {n_planes}")
    if n_tables < 1:
        raise ValueError(f"n_tables must be >= 1, got {n_tables}")
    planes = np.stack(
        [_planes(n_planes, dim, seed + 7919 * t) for t in range(n_tables)]
    )  # (T, P, D)
    weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_udf(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype="object")
        m = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        out = np.empty((m.shape[0], planes.shape[0]), dtype=np.int64)
        for t in range(planes.shape[0]):
            out[:, t] = ((m @ planes[t].T) > 0) @ weights
        return pd.Series(list(out))

    return bucket_udf


def bucket_ids(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    n_probes: int = 1,
    n_tables: int = 1,
) -> DataFrame:
    """(id, embedding) → one row per (id, table, bucket) probe.

    probe 0 is the vector's own bucket; probes 1..n_probes-1 flip one
    sign bit each (nearest Hamming neighbours), the standard
    recall/multiprobe trade. Independent tables multiply recall the
    orthogonal way: P(candidate) = 1 − Π_t P(miss table t)."""
    udf = make_bucket_udf(n_planes, dim, seed, n_tables)
    b = emb.withColumn("tb", udf(F.col(vec_col))).select(
        "*", F.posexplode("tb").alias("table", "bucket0")
    ).drop("tb")
    # clamp extra probes to the plane count: flipping a bit above
    # n_planes would probe buckets no corpus vector can occupy —
    # join fan-out with zero recall gain
    n_flips = min(n_probes - 1, n_planes)
    probes = [F.col("bucket0")] + [
        F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_flips)
    ]
    return b.withColumn("bucket", F.explode(F.array(*probes))).drop("bucket0")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int | None = 12,
    dim: int = 64,
    seed: int = 42,
    n_probes: int = 4,
    max_bucket: int = 10_000,
    n_tables: int = 1,
    target_bucket: int = 200,
    n_vectors: int | None = None,
) -> DataFrame:
    """LSH-bucketed cosine top-k: queries multiprobe, corpus indexed once.

    Returns (query_id, neighbor_id, sim, rank). Buckets larger than
    ``max_bucket`` are excluded from scoring (skew guard — report them
    with :func:`bucket_skew_report` rather than letting one degenerate
    bucket go quadratic).

    Scale path: pass ``n_planes=None`` to derive the plane count from
    the corpus size (:func:`planes_for` — expected bucket population ≈
    ``target_bucket``; one count() job unless ``n_vectors`` is given),
    and ``n_tables > 1`` for L independent hash tables — the recall
    knob that does NOT grow bucket population the way extra probes do."""
    if n_planes is None:
        n = n_vectors if n_vectors is not None else emb.count()
        n_planes = planes_for(n, target_bucket)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), cast.alias("cv"))
    corpus_b = bucket_ids(
        corpus, "cv", n_planes, dim, seed, n_probes=1, n_tables=n_tables
    ).select("neighbor_id", "cv", "table", "bucket")
    sizes = corpus_b.groupBy("table", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    corpus_b = corpus_b.join(
        sizes.filter(F.col("bucket_size") <= max_bucket).select("table", "bucket"),
        ["table", "bucket"],
    )

    q = queries.select(F.col(id_col).alias("query_id"), cast.alias("qv"))
    q_b = bucket_ids(
        q, "qv", n_planes, dim, seed, n_probes=n_probes, n_tables=n_tables
    ).select("query_id", "qv", "table", "bucket")

    j = (
        q_b.join(corpus_b, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        4,
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        j.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ------------------------------------------------------------------ IVF


def fit_ivf_centroids(
    vectors: np.ndarray, n_lists: int, seed: int = 42, n_iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd k-means → (n_lists, dim) float64 centroids.

    Driver-side on a SAMPLE (the caller controls sampling; centroids
    ship to executors in the assign-UDF closure — a few KB). Distances
    use the |v|² − 2v·c + |c|² expansion so memory stays (n × L), never
    (n × L × D). Ties and init are deterministic (PCG64(seed) init
    without replacement, stable argmin); a list that loses all members
    keeps its previous centroid — no randomness after init."""
    n = vectors.shape[0]
    if n == 0:
        raise ValueError("cannot fit IVF centroids on an empty sample")
    n_lists = min(n_lists, n)
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = vectors[rng.choice(n, size=n_lists, replace=False)].astype(
        np.float64
    ).copy()
    v = vectors.astype(np.float64)
    vv = (v**2).sum(axis=1, keepdims=True)
    for _ in range(n_iters):
        d = vv - 2.0 * (v @ cent.T) + (cent**2).sum(axis=1)[None, :]
        a = d.argmin(axis=1)
        for j in range(n_lists):
            members = v[a == j]
            if members.shape[0]:
                cent[j] = members.mean(axis=0)
    return cent


def sample_training_vectors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target: int = 2048,
    n_vectors: int | None = None,
) -> np.ndarray:
    """Deterministic distributed hash-sample of ~``target`` vectors for
    centroid training. The filter ``pmod(xxhash64(id), mod) == 0`` with
    ``mod = ceil(n / target)`` keeps an expected ``n/mod <= target``
    rows, so the driver collect is BOUNDED by the target (± Poisson
    noise), never by the corpus — k-means quality needs only ~100×
    n_lists points (FAISS guidance), so a full-corpus collect buys
    nothing and OOMs the driver at scale. Deterministic: same ids →
    same sample, independent of partitioning."""
    n = n_vectors if n_vectors is not None else emb.count()
    mod = max(1, -(-n // max(target, 1)))  # ceil(n / target)
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    rows = (
        emb.filter(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(mod)) == 0)
        .select(cast.alias("cv"))
        .collect()
    )
    if not rows:
        # degenerate tiny-corpus + unlucky hash: fall back to the first
        # partition's worth via the same deterministic order (n <= mod
        # here, so this collect is bounded by target too)
        rows = emb.select(cast.alias("cv")).limit(max(target, 1)).collect()
    return np.stack([r["cv"] for r in rows])


def make_ivf_assign_udf(centroids: np.ndarray, n_probes: int):
    """array<float> embedding → array<int> of the ``n_probes`` nearest
    list ids, ascending by L2 distance (stable ties) — probe 0 is the
    vector's OWN list, which is exactly how the corpus side indexes
    (n_probes=1), so query probes and index lists always agree."""
    cent = np.asarray(centroids, dtype=np.float64)
    cc = (cent**2).sum(axis=1)
    n_probes = min(n_probes, cent.shape[0])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def ivf_assign_udf(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype="object")
        m = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        d = (m**2).sum(axis=1, keepdims=True) - 2.0 * (m @ cent.T) + cc[None, :]
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probes].astype(np.int32)
        return pd.Series(list(order))

    return ivf_assign_udf


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_lists: int = 16,
    n_probes: int = 4,
    seed: int = 42,
    n_iters: int = 10,
    max_list: int = 100_000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-Flat cosine top-k: corpus indexed under its nearest centroid,
    queries probe their ``n_probes`` nearest lists, exact cosine only
    inside probed lists. Returns (query_id, neighbor_id, sim, rank).

    ``centroids=None`` trains driver-side on a deterministic
    distributed hash-sample of ~``max(100·n_lists, 2048)`` vectors
    (:func:`sample_training_vectors`) — NO code path collects an
    unbounded corpus. Callers may still pass pre-fit centroids (e.g.
    trained once and reused across queries); the centroid matrix is a
    closure broadcast either way. Lists larger
    than ``max_list`` are excluded from scoring and surface via
    :func:`ivf_skew_report` — same cap+report contract as every bucket
    join in this engine. With ``n_probes = n_lists`` the probed set is
    the whole corpus and the result provably equals brute force — the
    oracle anchor the driver query uses."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if centroids is None:
        sample = sample_training_vectors(
            emb, id_col, vec_col, target=max(100 * n_lists, 2048)
        )
        centroids = fit_ivf_centroids(sample, n_lists, seed, n_iters)
    assign1 = make_ivf_assign_udf(centroids, 1)
    corpus = (
        emb.select(F.col(id_col).alias("neighbor_id"), cast.alias("cv"))
        .withColumn("list", F.element_at(assign1(F.col("cv")), 1))
    )
    sizes = corpus.groupBy("list").agg(F.count(F.lit(1)).alias("list_size"))
    corpus = corpus.join(
        sizes.filter(F.col("list_size") <= max_list).select("list"), ["list"]
    )

    assign_q = make_ivf_assign_udf(centroids, n_probes)
    q = (
        queries.select(F.col(id_col).alias("query_id"), cast.alias("qv"))
        .withColumn("list", F.explode(assign_q(F.col("qv"))))
    )
    j = (
        q.join(corpus, ["list"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = F.round(
        _dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        4,
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        j.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_skew_report(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    max_list: int = 100_000,
) -> DataFrame:
    """Inverted lists over the population cap — logged, never silent."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    assign1 = make_ivf_assign_udf(centroids, 1)
    return (
        emb.select(F.element_at(assign1(cast), 1).alias("list"))
        .groupBy("list")
        .agg(F.count(F.lit(1)).alias("list_size"))
        .filter(F.col("list_size") > max_list)
    )


def bucket_skew_report(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int = 10_000,
    n_tables: int = 1,
) -> DataFrame:
    """Buckets over the population cap — logged, never silently dropped."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    b = bucket_ids(
        emb.select(cast.alias("cv")), "cv", n_planes, dim, seed, 1, n_tables
    )
    return (
        b.groupBy("table", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )
