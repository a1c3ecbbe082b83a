"""Small plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition up to ``factor × defaultParallelism`` when
    the plan has fewer partitions.

    Checkpointed stage tables are small on disk, so a parquet re-read
    often yields just a few input splits — a downstream stage that
    AMPLIFIES rows (shingle/suffix explode: ×doc_len) or burns CPU per
    row (signature UDFs) then runs nearly serial no matter how many
    cores the session has. On a real cluster big inputs already carry
    thousands of splits and this is a no-op (we never shrink); it only
    widens degenerate narrow inputs.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
