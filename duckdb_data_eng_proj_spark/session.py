"""SparkSession factory.

The reference opens one embedded DuckDB connection per run
(reference: pipeline.py:35). The Spark-native equivalent is one long-
lived SparkSession; all staging happens as lazy DataFrames / temp views
instead of ``CREATE TABLE AS`` chains (reference: pipeline.py:45+).

Scale posture (100 TB design point, tested on local[N]):
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy demotion replace hand-tuned physical plans.
- ``spark.sql.shuffle.partitions`` defaults to 2×cores locally; on a
  real cluster this is overridden (AQE coalesces down anyway).
- UTC session timezone so timestamp semantics are stable regardless of
  host zone (the reference pins Europe/Berlin only for the
  ``processed_at`` audit column — that stays an explicit expression,
  see functions.clock).
- Arrow enabled: every Python-boundary exchange (pandas UDFs,
  toPandas) is columnar-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "duckdb-data-eng-proj-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS then 32 (driver contract).
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cpus = int(cpus)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 2 * cpus // 1 if cpus <= 64 else cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
