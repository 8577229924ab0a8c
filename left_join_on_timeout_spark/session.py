"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every knob here is chosen so the same
plan shape survives a 1000-executor / 100 TB deployment:

* AQE on (runtime partition coalescing, skew-join splitting) — at 100 TB the
  static shuffle-partition count is always wrong for *some* stage.
* ``spark.sql.session.timeZone=UTC`` — deterministic timestamps and required
  for DuckDB-oracle comparison (DuckDB timestamps are UTC-naive).
* Arrow enabled — every Pandas UDF / ``mapInPandas`` batch transfer is
  Arrow-backed.
* Broadcast threshold left at default (10 MB): dimension tables (region,
  nation, supplier, part at these SFs) broadcast automatically; fact-fact
  joins shuffle on their keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "left_join_on_timeout_spark",
              cpus: str | int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to the core count: right for local SFs;
    on a real cluster you'd size it to ~2-3× total cores and let AQE coalesce.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    shuffle = str(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
