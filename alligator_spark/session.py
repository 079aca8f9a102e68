"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same settings are what we would
ship for a multi-executor cluster (AQE on, skew-join on, Arrow on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "alligator_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> honour $SPARK_GRAFT_CPUS, else all cores.
    Shuffle partitions default to max(cores, 32): on a real cluster this
    would be sized to ~2-3x total executor cores / target partition size
    (~128MB post-shuffle); AQE coalesces the excess at runtime.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores or 0, DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes post-shuffle partitions by COMPRESSED bytes; text-heavy
        # tables compress ~6x, so the default 1m floor coalesces a CPU-bound
        # Python stage onto a handful of tasks. 64k keeps small shuffles at
        # ~core-count partitions without affecting large-scale sizing.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: the driver heap IS the cluster — size it generously
        # or 32 concurrent tasks thrash GC (measured 2.4x slowdown at 16g)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # 8MB broadcast ceiling (static AND adaptive): corpus-derived
        # tables (featurized docs, per-doc key sets) must NEVER be
        # broadcast — a broadcast build is serial driver time that grows
        # with the corpus (measured r3: ~67s of the score stage at 150k
        # docs was the planner broadcasting the whole featurized corpus
        # under the 64MB default), and at real scale it would OOM the
        # driver outright. Genuinely small dims still fit under 8MB, and
        # explicit F.broadcast hints are unaffected.
        .config("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(8 * 1024 * 1024),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
