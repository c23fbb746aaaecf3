"""SparkSession factory with scale-appropriate defaults.

Local mode is the sandbox stand-in for a multi-executor cluster; every
setting here is chosen to also be correct at 1000-executor / 100 TB
scale (AQE on, skew-join on, Arrow transport on, UTC timestamps for
oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "surfactant_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # independent pipeline stages run as concurrent driver threads
        # (plans/pipeline.py); FAIR keeps a small dimension job from
        # queueing behind hundreds of tasks of the big Arrow pass
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local-bench corpora are a few GB: the 128m default packs the
        # scan into ~a dozen splits and starves cores; 8m keeps every
        # core fed. On a real 100 TB cluster the default is fine (800k
        # splits) — override via SPARK_GRAFT_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        # same reasoning post-shuffle: AQE's 64m advisory target would
        # coalesce a ~1 GB shuffle into fewer partitions than cores
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "16m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # this sandbox VM has lazily host-backed memory: first touch of
        # a new page costs 1-9 s/GB (host-side fault). A fixed,
        # pre-touched heap (set e.g. "-Xms24g -XX:+AlwaysPreTouch" via
        # SPARK_GRAFT_DRIVER_JAVA_OPTS) pays that once at startup
        # instead of mid-benchmark. Harmless on normal hosts.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", ""),
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
