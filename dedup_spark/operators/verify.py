"""Exact verification of LSH candidates: Jaccard + containment + SimHash.

Analog of the reference's exact-containment check (dedup.py:362-369):

    common        = |set_a ∩ set_b|
    containment_i = common / (|set_i| + 1)      # the reference's +1
    keep if containment_a > t OR containment_b > t     (t = 0.2)

plus the north-star SimHash Hamming pre-filter (cheap bit math BEFORE
the array intersection) and exact Jaccard for downstream scoring.

All set math is JVM-side (`array_intersect`, `bit_count`) — no Python in
the verify hot path. The two signature joins shuffle on conv_id; the
pairs side is usually much smaller than the signatures side, and AQE
picks broadcast when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup_spark.config import DedupConfig


def verify_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig
) -> DataFrame:
    sig_a = signatures.select(
        F.col("conv_id").alias("conv_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("n_a"),
        F.col("simhash").alias("simhash_a"),
    )
    sig_b = signatures.select(
        F.col("conv_id").alias("conv_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("n_b"),
        F.col("simhash").alias("simhash_b"),
    )
    # Join shape, pinned for scale: the pairs side is orders of magnitude
    # smaller than signatures (it only exists because LSH already pruned
    # the quadratic space), so it drives both joins; the signature sides
    # are hinted shuffle_hash so Catalyst never tries to BROADCAST the
    # signature table (it carries the full shingle arrays — broadcasting
    # it is impossible at corpus scale and was observed mis-planned when
    # fresh table stats were missing).
    joined = (
        pairs.join(sig_a.hint("shuffle_hash"), "conv_a")
        .join(sig_b.hint("shuffle_hash"), "conv_b")
    )

    hamming = F.bit_count(
        F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))
    ).alias("hamming")
    joined = joined.withColumn("hamming", hamming)
    if cfg.use_simhash_filter:
        joined = joined.filter(F.col("hamming") <= cfg.simhash_hamming_max)

    plus1 = F.lit(1) if cfg.containment_plus1 else F.lit(0)
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    out = (
        joined.withColumn("common", common)
        .withColumn("jaccard", F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")))
        .withColumn("containment_a", F.col("common") / (F.col("n_a") + plus1))
        .withColumn("containment_b", F.col("common") / (F.col("n_b") + plus1))
    )
    t = cfg.verify_containment
    return out.filter(
        (F.col("containment_a") > t) | (F.col("containment_b") > t)
    ).select(
        "conv_a", "conv_b", "common", "jaccard",
        "containment_a", "containment_b", "hamming",
    )
