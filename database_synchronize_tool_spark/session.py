"""SparkSession factory.

Defaults follow the local[32] test harness (single JVM, 32 threads) but every
knob scales to a real cluster: AQE on (runtime coalesce / skew-join / broadcast
conversion), shuffle partitions sized to cores locally (vs. ~2-3x total cores on
a cluster), UTC session timezone so results are reproducible against the DuckDB
oracle, and Arrow enabled for every pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "database_synchronize_tool_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``SPARK_GRAFT_CPUS`` (harness contract) sets local parallelism; shuffle
    partitions default to the same so tiny SFs don't over-parallelize. On a
    real cluster these come from spark-submit instead — nothing here pins
    local mode if a master is already configured.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Production guidance: prefer the advisory partition size over raw
        # parallelism when coalescing — avoids swarms of tiny post-shuffle
        # partitions whose scheduling overhead dominates at every scale
        # (measured ~13% on the sf0.1 headline set).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # Large-memory-executor profile: a 64 MB broadcast side is cheap
        # against a shuffle of the big side. Safe at any scale — only
        # relations whose MEASURED size is under the threshold broadcast;
        # a 100 TB table always falls back to sort-merge.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); read as long, the
        # catalog converts to timestamp_ntz (micros) on load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Respect an externally configured master (driver/cluster); default local.
    master_url = os.environ.get("SPARK_MASTER_URL")
    if master_url:
        # apply the URL, don't just detect it: skipping .master() entirely
        # left spark.master unset and getOrCreate() failing with "A master
        # URL must be set" outside spark-submit (round-7 review)
        builder = builder.master(master_url)
    else:
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
