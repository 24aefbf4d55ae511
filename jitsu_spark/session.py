"""SparkSession factory with engine defaults.

Defaults chosen for correctness-vs-oracle and local[N] benchmarking:
- UTC session timezone (oracle comparisons against DuckDB are UTC-naive).
- AQE on (runtime coalesce + skew-join handling at scale).
- Arrow enabled (all Python-touching stages are pandas/Arrow vectorized).
- shuffle partitions ~ cores for local mode; a real cluster deployment
  should size this to ~2-3x total executor cores instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jitsu-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` -> ``local[*]``. For the scaling-efficiency benchmark the
    same job is run at local[8] and local[32] (sandbox proxy for N vs 4N
    executors, BASELINE.json north_rule).
    """
    master = os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{cores}]" if cores else "local[*]"
    )
    if shuffle_partitions is None:
        shuffle_partitions = cores if cores else (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (the legacy default) carries NO footer min/max stats;
        # TIMESTAMP_MICROS makes per-file timestamp stats available for
        # the lake's file-level pruning (write.stats.column)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # lake-table reads pass explicit file lists (tens to hundreds of
        # paths); below this threshold listing stays driver-side instead of
        # launching a listing job per read (~0.5-1s saved per micro-batch)
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
