"""SparkSession bootstrap.

The reference holds one process-wide engine handle (AppState,
src/main.rs:60-73); here that is the SparkSession. Config is tuned so the
same code runs on local[N] for tests and on a real cluster at scale:

- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast —
  the 100 TB safety net (SURVEY.md §4.4).
- shuffle.partitions sized to cores locally; on a cluster AQE coalesces
  from a higher initial number, so queries never hard-code partition counts.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled for the few Pandas-UDF paths (multimodal, custom ops).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "polars_express_spark"


def _local_cores() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    On a cluster, pass master=None and let spark-submit decide; locally we
    default to local[N] with N from $SPARK_GRAFT_CPUS.
    """
    cores = _local_cores()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS), which Spark's
        # reader rejects; read as long and convert in catalog.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
    )
    if master or not os.environ.get("SPARK_MASTER"):
        builder = builder.master(master or f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
