"""Approximate nearest neighbour search over embedding columns.

Two tiers (SURVEY operator class: similarity search / embedding-cosine
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


def make_bucket_udf(n_planes: int, dim: int, seed: int):
    """array<float> embedding → long bucket id (sign-bit signature).

    int64 buckets: n_planes up to 62 without sign-bit aliasing (bit 62 is
    the top usable bit; multiprobe XORs stay positive). An int32 bucket
    would silently wrap at n_planes >= 32, aliasing distinct signatures."""
    if not 1 <= n_planes <= 62:
        raise ValueError(f"n_planes must be in [1, 62], got {n_planes}")
    planes = _planes(n_planes, dim, seed)

    @F.pandas_udf(T.LongType())
    def bucket_udf(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        bits = (m @ planes.T) > 0  # (n, n_planes)
        weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return bucket_udf


def bucket_ids(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    n_probes: int = 1,
) -> DataFrame:
    """(id, embedding) → one row per (id, bucket) probe.

    probe 0 is the vector's own bucket; probes 1..n_probes-1 flip one
    sign bit each (nearest Hamming neighbours), which is the standard
    recall/multiprobe trade."""
    udf = make_bucket_udf(n_planes, dim, seed)
    b = emb.withColumn("bucket0", udf(F.col(vec_col)))
    probes = [F.col("bucket0")] + [
        F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_probes - 1)
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
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    n_probes: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """LSH-bucketed cosine top-k: queries multiprobe, corpus indexed once.

    Returns (query_id, neighbor_id, sim, rank). Buckets larger than
    ``max_bucket`` are excluded from scoring (skew guard — report them
    with :func:`bucket_skew_report` rather than letting one degenerate
    bucket go quadratic)."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), cast.alias("cv"))
    corpus_b = bucket_ids(
        corpus, "cv", n_planes, dim, seed, n_probes=1
    ).select("neighbor_id", "cv", "bucket")
    sizes = corpus_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_size"))
    corpus_b = corpus_b.join(
        sizes.filter(F.col("bucket_size") <= max_bucket).select("bucket"), "bucket"
    )

    q = queries.select(F.col(id_col).alias("query_id"), cast.alias("qv"))
    q_b = bucket_ids(q, "qv", n_planes, dim, seed, n_probes=n_probes).select(
        "query_id", "qv", "bucket"
    )

    j = (
        q_b.join(corpus_b, "bucket")
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


def bucket_skew_report(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Buckets over the population cap — logged, never silently dropped."""
    cast = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    b = bucket_ids(emb.select(cast.alias("cv")), "cv", n_planes, dim, seed, 1)
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )
