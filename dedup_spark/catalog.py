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

Backends (``table_format``):

* ``"parquet"`` (default, and the only backend exercised in this
  sandbox — no Iceberg runtime jars are installed here): plain parquet
  directories under the warehouse path with atomic replace via
  temp-dir rename and a JSON sidecar carrying the config fingerprint.
* ``"iceberg"``: real Iceberg tables via ``df.writeTo(ns.name)
  .using("iceberg").createOrReplace()`` with the fingerprint stored in
  table properties. Requires an Iceberg catalog configured on the
  session (``spark.sql.catalog.<cat>`` + iceberg-spark-runtime jar);
  constructing the catalog with this format raises immediately when no
  such catalog is configured, so the capability is never silently
  faked. This branch is code-complete but UNTESTED in this sandbox.

Resume semantics (skip-if-exists + fingerprint gate) are identical in
both backends.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageMetric:
    stage: str
    rows_out: int
    wall_ms: int
    partitions: int
    reused: bool
    # run-relative stage window (seconds since catalog creation) — the
    # per-stage lineage timestamps that let a timeline profiler attribute
    # busy-core samples to stages (driver threads overlap stages, so
    # ordering alone cannot)
    t_start: float = 0.0
    t_end: float = 0.0


def _has_iceberg_catalog(spark: SparkSession, catalog: str) -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:  # noqa: BLE001 - unset conf raises
        return False
    return impl is not None and "iceberg" in impl.lower()


@dataclass
class StageCatalog:
    spark: SparkSession
    warehouse: str
    fingerprint: str
    metrics: list[StageMetric] = field(default_factory=list)
    table_format: str = "parquet"   # "parquet" | "iceberg"
    iceberg_namespace: str = "dedup"
    iceberg_catalog: str = "spark_catalog"
    _pending: list[Future] = field(default_factory=list, repr=False)
    _writer_pool: ThreadPoolExecutor | None = field(default=None, repr=False)
    _live: dict[str, DataFrame] = field(default_factory=dict, repr=False)
    _t0: float = field(default_factory=time.monotonic, repr=False)

    def __post_init__(self) -> None:
        if self.table_format not in ("parquet", "iceberg"):
            raise ValueError(f"bad table_format {self.table_format!r}")
        if self.table_format == "iceberg":
            if not _has_iceberg_catalog(self.spark, self.iceberg_catalog):
                raise RuntimeError(
                    f"table_format='iceberg' but no Iceberg catalog is "
                    f"configured at spark.sql.catalog.{self.iceberg_catalog} "
                    "(iceberg-spark-runtime jar + catalog conf required)"
                )
            self.spark.sql(
                f"CREATE NAMESPACE IF NOT EXISTS "
                f"{self.iceberg_catalog}.{self.iceberg_namespace}"
            )

    def _qualified(self, name: str) -> str:
        return f"{self.iceberg_catalog}.{self.iceberg_namespace}.{name}"

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.warehouse, f"_{name}.meta.json")

    def exists(self, name: str) -> bool:
        """True iff the stage table exists AND was written under the
        current config fingerprint (stale-config outputs are recomputed)."""
        if self.table_format == "iceberg":
            q = self._qualified(name)
            if not self.spark.catalog.tableExists(q):
                return False
            props = {
                r["key"]: r["value"]
                for r in self.spark.sql(f"SHOW TBLPROPERTIES {q}").collect()
            }
            return props.get("dedup.fingerprint") == self.fingerprint
        meta = self._meta_path(name)
        if not (os.path.isdir(self._path(name)) and os.path.isfile(meta)):
            return False
        try:
            with open(meta) as f:
                return json.load(f).get("fingerprint") == self.fingerprint
        except (json.JSONDecodeError, OSError):
            return False

    def read(self, name: str) -> DataFrame:
        if self.table_format == "iceberg":
            return self.spark.read.table(self._qualified(name))
        return self.spark.read.parquet(self._path(name))

    def read_meta(self, name: str) -> dict | None:
        """Sidecar metadata of a stage table (fingerprint + any extra
        keys the writer attached, e.g. the incremental state epoch), or
        None when the table or its sidecar is missing/corrupt. Driver-
        local file read — no Spark job."""
        if self.table_format == "iceberg":
            q = self._qualified(name)
            if not self.spark.catalog.tableExists(q):
                return None
            props = {
                r["key"]: r["value"]
                for r in self.spark.sql(f"SHOW TBLPROPERTIES {q}").collect()
            }
            meta = {"fingerprint": props.get("dedup.fingerprint")}
            if "dedup.meta" in props:
                try:
                    meta.update(json.loads(props["dedup.meta"]))
                except json.JSONDecodeError:
                    return None
            return meta
        if not os.path.isdir(self._path(name)):
            return None
        try:
            with open(self._meta_path(name)) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    def write(self, name: str, df: DataFrame, meta: dict | None = None) -> DataFrame:
        if self.table_format == "iceberg":
            q = self._qualified(name)
            df.writeTo(q).using("iceberg").createOrReplace()
            props = f"'dedup.fingerprint' = '{self.fingerprint}'"
            if meta:
                props += f", 'dedup.meta' = '{json.dumps(meta)}'"
            self.spark.sql(f"ALTER TABLE {q} SET TBLPROPERTIES ({props})")
            return self.read(name)
        path = self._path(name)
        tmp = path + ".__tmp__"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        sidecar = {"fingerprint": self.fingerprint, "stage": name}
        if meta:
            sidecar.update(meta)
        with open(self._meta_path(name), "w") as f:
            json.dump(sidecar, f)
        return self.read(name)

    def adopt(self, src: str, dst: str, meta: dict | None = None) -> None:
        """MOVE an existing stage table to a new name (driver-side
        rename — no Spark job, no data copy) and stamp a fresh sidecar.
        The source stage ceases to exist (its checkpoint is consumed,
        not shared): used by the incremental bootstrap to take ownership
        of batch-pipeline outputs as durable state segments."""
        self.flush()  # a pending background write must land first
        self._live.pop(src, None)
        self._live.pop(dst, None)
        if self.table_format == "iceberg":
            self.spark.sql(
                f"ALTER TABLE {self._qualified(src)} "
                f"RENAME TO {self._qualified(dst)}"
            )
            if meta:
                self.spark.sql(
                    f"ALTER TABLE {self._qualified(dst)} SET TBLPROPERTIES "
                    f"('dedup.meta' = '{json.dumps(meta)}')"
                )
            return
        if not os.path.isdir(self._path(src)):
            raise RuntimeError(f"adopt: source stage '{src}' does not exist")
        dst_path = self._path(dst)
        if os.path.isdir(dst_path):
            shutil.rmtree(dst_path)
        os.replace(self._path(src), dst_path)
        sidecar = {"fingerprint": self.fingerprint, "stage": dst}
        if meta:
            sidecar.update(meta)
        with open(self._meta_path(dst), "w") as f:
            json.dump(sidecar, f)
        src_meta = self._meta_path(src)
        if os.path.isfile(src_meta):
            os.remove(src_meta)

    def _footer_stats(self, name: str) -> tuple[int, int]:
        """(rows, files) from parquet footers — driver-local metadata
        reads, NO Spark job. ~19 per-stage count() jobs used to add
        seconds of serial wall time per run, a pure scaling-efficiency
        tax."""
        parts = self.partition_stats(name)
        return sum(p["rows"] for p in parts), len(parts)

    def partition_stats(self, name: str) -> list[dict]:
        """Per-partition lineage of a stage table: one record per output
        file with its row count and byte size, read from parquet footers
        (driver-local metadata, no Spark job). This is the per-PARTITION
        half of the north rule's "per-partition lineage + throughput
        metrics" — stage-level rows/wall/partitions live in ``metrics``;
        this exposes how those rows are distributed across files, which
        is what a skew investigation actually needs."""
        import pyarrow.parquet as pq

        path = self._path(name)
        out = []
        for entry in sorted(os.listdir(path)):
            if entry.endswith(".parquet"):
                fp = os.path.join(path, entry)
                out.append(
                    {
                        "file": entry,
                        "rows": pq.read_metadata(fp).num_rows,
                        "bytes": os.path.getsize(fp),
                    }
                )
        return out

    def write_run_report(self, path: str) -> None:
        """Durable JSON run report: per-stage metrics (incl. the stage
        timeline) plus per-partition lineage for every checkpointed
        stage. Driver-local file ops only — zero Spark jobs, so it adds
        no serial tax to the measured pipeline wall. Call after
        ``flush()`` (it flushes itself to be safe).

        Pure observability: a failure here (unwritable path, a stage dir
        missing from the warehouse) is logged as a warning, never
        propagated — it must not turn an otherwise-successful run into a
        failed exit after the timed work is done. ``flush()`` errors DO
        propagate (checkpoint durability is correctness, not telemetry)."""
        self.flush()
        try:
            report = {
                "fingerprint": self.fingerprint,
                "stages": [
                    {
                        "stage": m.stage,
                        "rows_out": m.rows_out,
                        "wall_ms": m.wall_ms,
                        "partitions": m.partitions,
                        "reused": m.reused,
                        "t_start": m.t_start,
                        "t_end": m.t_end,
                        "partition_lineage": (
                            self.partition_stats(m.stage)
                            if self.table_format == "parquet"
                            else []
                        ),
                    }
                    for m in self.metrics
                ],
            }
            with open(path, "w") as f:
                json.dump(report, f)
        except Exception:  # noqa: BLE001 - observability only
            import logging

            logging.getLogger(__name__).warning(
                "run-report write to %s failed (observability only; "
                "pipeline outputs are unaffected)", path, exc_info=True,
            )

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Build-or-resume: skip ``build`` when a fingerprint-matching
        checkpoint exists (the reference's resume contract, S10).

        Parquet backend is WRITE-THROUGH: the stage is materialized once
        into executor block storage (``localCheckpoint``) and returned
        immediately — downstream stages consume the in-memory blocks —
        while the durable parquet write happens on a background writer
        thread. The critical path pays only the compute job; the
        encode+write+rename+re-read cycle that used to serialize every
        stage (≈17 barriers of pure Amdahl tax per run) overlaps with
        downstream work. ``flush()`` (called before run() returns)
        guarantees every checkpoint is durable on disk, so the resume
        contract is unchanged.
        """
        t0 = time.monotonic()
        if name in self._live:
            # same-session re-request while (or after) the background
            # write runs: serve the in-memory checkpoint — the metric for
            # this stage lands exactly once, via the writer thread
            return self._live[name]
        reused = self.exists(name)
        if reused:
            out = self.read(name)
            if self.table_format == "iceberg":
                rows, files = out.count(), out.rdd.getNumPartitions()
            else:
                rows, files = self._footer_stats(name)
            self._record(name, t0, rows, files, reused=True)
            return out
        if self.table_format == "iceberg":
            out = self.write(name, build())
            rows, files = out.count(), out.rdd.getNumPartitions()
            self._record(name, t0, rows, files, reused=False)
            return out
        from dedup_spark.util import eager_ckpt

        ckpt = eager_ckpt(build())
        t1 = time.monotonic()
        self._live[name] = ckpt
        self._pending.append(
            self._writer().submit(self._write_and_record, name, ckpt, t0, t1)
        )
        return ckpt

    def _record(
        self, name: str, t0: float, rows: int, files: int, reused: bool,
        t1: float | None = None,
    ) -> None:
        t1 = time.monotonic() if t1 is None else t1
        m = StageMetric(
            stage=name, rows_out=rows,
            wall_ms=int((t1 - t0) * 1000), partitions=files, reused=reused,
            t_start=round(t0 - self._t0, 3), t_end=round(t1 - self._t0, 3),
        )
        self.metrics.append(m)
        if os.environ.get("SPARK_GRAFT_STAGE_TRACE") == "1":
            import sys

            print(
                f"##stage {m.stage} start={m.t_start:.1f} end={m.t_end:.1f} "
                f"rows={m.rows_out} reused={m.reused}",
                file=sys.stderr, flush=True,
            )

    def _write_and_record(
        self, name: str, ckpt: DataFrame, t0: float, t1: float
    ) -> None:
        self.write(name, ckpt)
        rows, files = self._footer_stats(name)
        self._record(name, t0, rows, files, reused=False, t1=t1)

    def _writer(self) -> ThreadPoolExecutor:
        if self._writer_pool is None:
            self._writer_pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="stage-writer"
            )
        return self._writer_pool

    def flush(self) -> None:
        """Wait for all background checkpoint writes; re-raise the first
        failure. Must run before the pipeline returns — a stage is only
        'checkpointed' once its parquet + fingerprint sidecar are durable."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    def invalidate(self, name: str) -> None:
        self._live.pop(name, None)
        if self.table_format == "iceberg":
            self.spark.sql(f"DROP TABLE IF EXISTS {self._qualified(name)}")
            return
        self.flush()  # a pending write must not resurrect the stage
        for p in (self._path(name), self._meta_path(name)):
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.isfile(p):
                os.remove(p)

    def metrics_df(self) -> DataFrame:
        self.flush()  # metrics rows for write-through stages land on write
        rows = [
            (m.stage, m.rows_out, m.wall_ms, m.partitions, m.reused,
             m.t_start, m.t_end)
            for m in self.metrics
        ]
        return self.spark.createDataFrame(
            rows,
            "stage string, rows_out long, wall_ms long, partitions int, "
            "reused boolean, t_start double, t_end double",
        )
