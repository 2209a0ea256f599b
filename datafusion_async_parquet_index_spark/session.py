"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same settings are the ones we'd ship
on a 1000-executor cluster: AQE on (runtime re-plan, skew-join handling,
partition coalescing), Arrow enabled for the Pandas-UDF operators, and
shuffle partitions sized for the local corpus (override per deployment).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datafusion_async_parquet_index_spark",
    shuffle_partitions: int = 32,
    master: str | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as long (epoch nanos) and convert explicitly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # without this, any plan under a .cache() loses AQE partition
        # coalescing and every tiny shuffle runs at full width — the
        # dominant overhead for the cached-signature dedup operators
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        # runtime bloom-filter injection degenerates on self-join-heavy
        # plans (minutes of BigInteger size-stat churn in the optimizer;
        # see operators/util.py) and has no pushdown target for computed
        # join keys — off engine-wide
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
