"""SparkSession factory tuned for this engine.

Local test profile: ``local[$SPARK_GRAFT_CPUS]`` single-JVM.  The same
settings (AQE on, shuffle partitions sized to parallelism, UTC session
timezone, Arrow enabled) are the ones we would ship on a real cluster;
only ``master``/memory are local-mode specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ksiq-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    AQE handles runtime coalescing and skew-join splitting, so the static
    ``spark.sql.shuffle.partitions`` is an upper bound sized to the local
    core count rather than the 200 default (wrong for both tiny local
    runs and as a fixed number at 100 TB — on a cluster we'd raise it and
    let AQE coalesce).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8g, not "as much as fits": an oversized single-JVM heap lets
        # garbage accumulate until multi-second G1 full-GC pauses hit
        # mid-query; a right-sized heap keeps collections incremental.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Long-lived sessions accumulate shuffle files and broadcast
        # blocks until a JVM GC happens to run the ContextCleaner; a
        # short periodic GC keeps cleanup incremental instead of letting
        # multi-GB backlogs stall a random later query.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Split small files down to the core count: a single-file table
        # otherwise becomes ONE scan task, serializing every per-row
        # expression (minhash/simhash/text stats) above it.  At scale
        # files exceed maxPartitionBytes and this hint is a no-op.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # Testdata parquet carries TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long-nanos and convert in the loader
        # (sources.tables.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark's DataFrame-debugging wrapper captures a Python call
        # site and pushes it to the JVM around EVERY DataFrame API call
        # (3 extra py4j round-trips each).  Wide plan builders make
        # thousands of such calls per query — measured 4.6 -> 3.6 s of
        # pure construction on the widest union (x6) with it off.  The
        # cost we give up is call-site enrichment in AnalysisException
        # messages, not any error itself.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
