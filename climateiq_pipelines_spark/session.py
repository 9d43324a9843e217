"""SparkSession factory.

Single shared session per process: BASELINE.md shows session startup
(~4.3 s) dominates per-query time (~0.5 s warm) at bench scale, so every
surface (tests, bench, driver entry points) must reuse one session.

Scale notes (100 TB target, local[N] test harness):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion replace hand-tuned partition counts
  when the same plans run on a 1000-executor cluster.
- shuffle.partitions is a *local* default; on a real cluster it is set to
  ~2-3x total cores and AQE coalesces down. Nothing in the engine assumes
  a fixed partition count.
- Arrow enabled so the few Pandas-UDF operators (SURVEY §2.11) move
  columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "climateiq-pipelines-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS); declared here so sessions
        # from this factory never flip confs mid-flight (registry.py also
        # ensures it for driver-owned sessions).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
