"""SparkSession factory tuned for the dedup pipeline.

Local-mode defaults mirror what the job would set cluster-side via
spark-submit conf: AQE on (runtime re-plan + skew-join splitting,
the Spark-native half of our LSH skew story), Arrow on (all UDFs are
pandas/Arrow-batched), shuffle partitions sized to the parallelism
rather than the 200 default.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

#: a JVM garbage-collector *selection* flag (-XX:+UseParallelGC,
#: -XX:+UseG1GC, -XX:+UseZGC, ...) — tuning flags like
#: -XX:MaxGCPauseMillis deliberately do NOT match
_GC_SELECT = re.compile(r"-XX:\+Use\w*GC\b")


def compose_driver_jvm_opts(user_opts: str | None, gc_opts: str) -> str:
    """Compose caller-supplied driver JVM options with the default GC
    choice. The default GC flag is appended ONLY when the caller has not
    already selected a collector: two GC selection flags make the JVM
    refuse to start ('Multiple garbage collectors selected'), so a
    caller passing -XX:+UseG1GC keeps exactly their flags."""
    if not user_opts:
        return gc_opts
    if _GC_SELECT.search(user_opts):
        return user_opts
    return f"{user_opts} {gc_opts}"


def get_spark(
    master: str | None = None,
    app_name: str = "dedup_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Under spark-submit the master comes from --master; setting it here
    # would override the submitted value and break the N-vs-4N scaling
    # protocol. Only set a master when launched as a plain python driver.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not under_submit:
        master = f"local[{cpus}]"
    # Driver JVM options COMPOSE instead of replacing: a caller-supplied
    # spark.driver.extraJavaOptions (extra_conf) keeps its flags (-Xss,
    # GC logging, ...) with our GC choice appended — a plain
    # builder.config would overwrite whichever side ran last. A caller
    # who SELECTS their own collector keeps it unchallenged (see
    # compose_driver_jvm_opts — duplicate GC selection flags abort JVM
    # startup). SPARK_GRAFT_GC carries the FULL GC/JVM flag string
    # (documented contract: setting it replaces the default GC flag, not
    # the user's other options); users relying on spark-defaults.conf
    # for driver JVM options should pass them via extra_conf or
    # SPARK_GRAFT_GC.
    extra_conf = dict(extra_conf or {})
    gc_opts = os.environ.get("SPARK_GRAFT_GC", "-XX:+UseParallelGC")
    user_jvm = extra_conf.pop("spark.driver.extraJavaOptions", None)
    driver_jvm_opts = compose_driver_jvm_opts(user_jvm, gc_opts)
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.adaptive.enabled", os.environ.get("SPARK_GRAFT_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # doc-level UDF rows are small (ids + hashes); 10k-row Arrow
        # batches amortize the per-batch Python crossing without memory
        # pressure (2048 measurably added task time at every core count)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # the two pipeline branches submit jobs concurrently; FAIR keeps
        # a wide stage of one branch from head-of-line-blocking the
        # other's short stages (measured ~5% wall at local[4])
        .config("spark.scheduler.mode", os.environ.get("SPARK_GRAFT_SCHEDULER", "FAIR"))
        # constraint propagation is O(plan²) analysis time on our wide
        # exploded/aliased plans and buys nothing here (filters are
        # explicit); disabling it cut several seconds of between-job
        # driver stalls per run — pure serial Amdahl tax at high cores
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # 32m: a "64m" plan-estimated build side deserializes to several
        # hundred MB in the in-memory hash relation — measured OOMing an
        # 8g single-JVM heap at the 12k-conv scaling corpus. Cluster
        # deploys with real executor memory can raise via submit conf.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST", "32m"),
        )
        # collect_list/collect_set aggregations (transcript assembly,
        # informative-set regroup, suffix buckets) use ObjectHashAggregate,
        # which falls back to SORT-based aggregation after only 128 map
        # entries by default — that turns every wide grouping into a full
        # sort + spill. Our collect_list groups are conversation-keyed
        # (bounded lists, modest group counts per task once AQE sizes the
        # partitions), so half a million in-memory groups per task is a
        # safe trade — big enough to stay hash-based, small enough not to
        # blow the heap at high parallelism. (Suffix anchors deliberately
        # avoid object aggregation entirely — sorted mapInPandas pass.)
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", str(1 << 19))
        # High initial shuffle width; AQE coalesces every exchange down to
        # advisory-sized partitions, so wide aggs get parallelism while
        # small shuffles still collapse to a few tasks. 128 covers local
        # parallelism with headroom; cluster deploys override via submit
        # conf (512 at >1TB inputs — width per map task is a real cost,
        # so don't overshoot by default).
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTS", "128"),
        )
        # 8m advisory (default 64m): AQE was coalescing the big
        # shuffles (informative regroup, position classes) down to ~2
        # waves of large tasks per core, so every stage ended in a long
        # straggler tail — measured 46s of <N-cores-busy time per
        # pipeline run at local[4] at 64m, halved by 16m, and 8m buys a
        # further ~3.5% wall (outputs identical at every setting).
        # Finer tasks cost scheduling overhead that is noise next to
        # the reclaimed tails at local core counts; large-cluster
        # deploys (where per-task overhead × 10^5 partitions is real
        # money) should raise this via submit conf along with
        # initialPartitionNum.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "8m"),
        )
        # Throughput GC for a batch pipeline: G1's concurrent
        # mark/refinement threads compete with executor task threads for
        # the same cores — swapping to ParallelGC measured 6% faster
        # pipeline wall at local[4] (260.8s vs 274.6s combined with the
        # 8m advisory; identical outputs). Effective in python-driver
        # mode only — under spark-submit the JVM is already running, so
        # bench_scaling/spark-submit deploys pass the same flag as a
        # submit conf. (Composition with caller options: see
        # driver_jvm_opts above.)
        .config("spark.driver.extraJavaOptions", driver_jvm_opts)
    )
    # Shuffle/spill on tmpfs when available: the sandbox's block device is
    # heavily throttled, which turns shuffle-heavy stages I/O-bound and
    # hides CPU scaling; a cluster's NVMe scratch is the real-world analog.
    if master is not None and os.path.isdir("/dev/shm"):
        builder = builder.config(
            "spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-scratch")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Base shuffle width: several waves per core so wide aggregations
    # (suffix buckets, shingle DF) keep per-task group counts under the
    # object-hash-agg fallback threshold; AQE coalesces the partitions of
    # SMALL shuffles back down, so narrow stages don't pay for the width.
    if shuffle_partitions is None:
        shuffle_partitions = max(64, 4 * spark.sparkContext.defaultParallelism)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
