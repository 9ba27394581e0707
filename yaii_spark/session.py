"""SparkSession factory tuned for the engine.

Local mode in the sandbox; the same config block is what we'd pass to
spark-submit on a real cluster (AQE, Arrow, shuffle partitions sized to
cores). Scale knobs documented inline.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "yaii_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster, pass master=None via spark-submit and these
    configs ride along unchanged.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    # shuffle partitions ~ cores in local mode; on a 1000-executor
    # cluster this would be ~2-3x total cores (set via spark-submit).
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # floor for AQE's post-shuffle coalescing: this engine's shuffles
        # carry compressed binary blobs (posting streams) whose DECODE
        # work per byte is far above ordinary columnar data, so the
        # byte-proxy AQE uses would happily coalesce a CPU-heavy pandas
        # stage to one task. 64k keeps small-but-hot stages wide while
        # still folding away truly empty partitions; at cluster data
        # sizes partitions are far above this floor and behavior is
        # unchanged (guide §2.2 — partition sizing is a *target*, and
        # the default 1m proxy mis-sizes high-work-per-byte stages).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # scan parallelism floor: aim for >= cores splits per scan so a
        # single multi-row-group file (e.g. one 126 MB parquet written
        # by an upstream single task) does not serialize the whole read
        # on one core. Scale-adaptive by construction: inputs that
        # already produce more splits than cores are untouched
        # (guide §6 "Input split size" / §2.5 input skew).
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # this sandbox's host oversubscribes CPU in daily windows
        # (BENCH/BASELINE.md): with the default 120 s network timeout a
        # starved driver JVM drops executor heartbeats and the RPC
        # cascade kills the whole session mid-run. Long timeouts trade
        # failure-detection latency (irrelevant in local mode — there
        # is no other node to fail over to) for survival under
        # starvation.
        .config("spark.network.timeout", "600s")
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # task-side commit moves (v2): the v1 driver-serial rename of
        # hundreds of partition dirs dominates small-build wall time
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    # YAII_ICEBERG_JARS=<paths> puts Iceberg runtime jars on the
    # classpath so the storage seam's iceberg branch (and its
    # otherwise-skipped test) runs end-to-end in any jar-equipped
    # environment without code changes — this sandbox image has none
    iceberg_jars = os.environ.get("YAII_ICEBERG_JARS")
    if iceberg_jars:
        builder = builder.config("spark.jars", iceberg_jars).config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
