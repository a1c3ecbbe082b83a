"""Shingling + corpus document frequency + informative-DF band filter.

The transcript analogs of the reference's k-mer machinery:

* shingle sets          ← KMC k-mer counting (kmer_utilities.py:89-120)
* shingle_df            ← read-set k-mer counts (kmer_utilities.py:29)
* DF histogram          ← k-mer spectrum histogram (kmer_spectrum.py:34-68)
* informative band      ← homozygous/duplicated k-mer classification:
                          keep shingles whose corpus DF ∈ [df_lo, df_hi]
                          (kmer_utilities.py:37-38; dedup.py:604,610).
                          df_lo=2 drops unique-noise shingles; df_hi drops
                          boilerplate (the Zipfian head that would
                          otherwise create mega LSH buckets).

Scale notes: shingle explosion multiplies rows by ~doc_len; the
groupBy(shingle) DF aggregation gets map-side partial aggregation from
Catalyst for the `count` path because per-conv shingle sets are already
distinct (so `count(*)` ≡ count of distinct convs — no countDistinct
shuffle-expand needed). The df join back to shingles is a plain
shuffle hash join on shingle_hash; AQE handles skew remnants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.functions.udfs import make_shingle_udf


def shingle_sets(transcripts: DataFrame, cfg: DedupConfig) -> DataFrame:
    """transcripts → (conv_id, shingles array<long> DISTINCT, n_shingles)."""
    from dedup_spark.util import ensure_parallelism

    udf = make_shingle_udf(cfg)
    transcripts = ensure_parallelism(transcripts)
    return transcripts.select(
        "conv_id",
        udf(F.col("doc")).alias("shingles"),
    ).withColumn("n_shingles", F.size("shingles"))


def exploded_shingles(sets_df: DataFrame) -> DataFrame:
    """(conv_id, shingles[]) → (conv_id, shingle) — one row per distinct
    shingle per conversation."""
    return sets_df.select("conv_id", F.explode("shingles").alias("shingle"))


def shingle_document_frequency(exploded: DataFrame) -> DataFrame:
    """(conv_id, shingle) → (shingle, df). Per-conv sets are distinct, so
    count(*) equals the number of distinct conversations per shingle."""
    return exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))


def df_histogram(shingle_df: DataFrame) -> DataFrame:
    """counts-of-counts (df → n_shingles) — spectrum-histogram analog
    (kmer_spectrum.py:34-68). Tiny result; safe to collect."""
    return shingle_df.groupBy("df").agg(F.count(F.lit(1)).alias("n_shingles"))


def pick_df_band(hist_rows: list[tuple[int, int]], cfg: DedupConfig) -> tuple[int, int]:
    """Auto-select the informative DF band from the histogram — the
    driver-side analog of the bimodal-spectrum fit
    (kmer_spectrum.py:146-227), adapted to Zipfian text corpora:

    * lower bound: df_lo (≥2 — a shingle must appear in ≥2 convs to be a
      duplication signal at all);
    * upper bound: smallest df that already covers ``tail_mass`` of all
      df≥df_lo shingles — everything above is boilerplate head.
    Manual override via cfg.df_hi when auto_df_band is False (the analog
    of --homozygous_lower/upper_bound, dedup.py:552-560).
    """
    if not cfg.auto_df_band:
        return cfg.df_lo, cfg.df_hi
    tail_mass = 0.999
    rows = sorted((int(d), int(n)) for d, n in hist_rows if int(d) >= cfg.df_lo)
    total = sum(n for _, n in rows)
    if total == 0:
        return cfg.df_lo, cfg.df_hi
    acc = 0
    hi = rows[-1][0]
    for d, n_sh in rows:
        acc += n_sh
        if acc >= tail_mass * total:
            hi = d
            break
    return cfg.df_lo, max(hi, cfg.df_hi)


def informative_shingle_sets(
    exploded: DataFrame, shingle_df: DataFrame, lo: int, hi: int
) -> DataFrame:
    """Keep shingles with corpus DF in [lo, hi]; regroup to per-conv
    sorted arrays. Conversations with zero informative shingles vanish
    here (empty-set guard analog, reference dedup.py:350) and rejoin the
    result as singleton clusters downstream."""
    informative = shingle_df.filter(F.col("df").between(F.lit(lo), F.lit(hi)))
    return (
        exploded.join(informative.select("shingle"), "shingle")
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_list("shingle")).alias("shingles"))
        .withColumn("n_shingles", F.size("shingles"))
    )
