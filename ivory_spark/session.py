"""SparkSession factory with scale-appropriate defaults.

Local-mode knobs are tuned for the sandbox (single JVM, local[N]); the
same builder settings (AQE, shuffle partitions ~ cores, Arrow enabled)
are what we would ship in `spark-submit --conf` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ivory_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: parallelism for local mode (local[cores]); default = env
    SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to cores (local mode rule of thumb —
    the stock 200 over-parallelizes small inputs and under-parallelizes
    huge ones).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_cores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_cores = cores
    if shuffle_partitions is None:
        shuffle_partitions = n_cores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # bench-scale inputs are tens of MB; the 128 MB/64 MB defaults for
        # scan splits and AQE-coalesced shuffle partitions would collapse
        # parallelism to 1-4 tasks regardless of core count. At real scale
        # (100 TB) revert these to defaults via extra_conf.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("IVORY_MAX_PARTITION_BYTES", "8m"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", os.environ.get("IVORY_ADVISORY_PARTITION_BYTES", "4m"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
