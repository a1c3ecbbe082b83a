"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full near-duplicate pipeline over a
turns table derived from sf0.001 ``documents``; returns the clusters
DataFrame. ``queries()`` / ``oracle_sql()`` — one entry per implemented
operator family (SURVEY.md §2), oracled via DuckDB where SQL can express
the semantics (custom hash kernels are rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dedup_spark.entry_queries import QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dedup clusters over transcripts derived from sf0.001
    documents (assembly → shingles → DF band → MinHash/SimHash → LSH →
    verify → connected components)."""
    return QUERIES["cc_clusters"].spark_fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}
