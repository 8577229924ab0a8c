"""Multi-format round-trip query (sources/formats.py): half the events
travel parquet -> JSON -> DataFrame, the other half parquet -> CSV ->
DataFrame; the union must aggregate identically to the original
parquet (the oracle reads the untouched parquet view). Counts, exact
decimal sums, and min/max event times catch value corruption, type
drift, and timestamp truncation in either text codec.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from left_join_on_timeout_spark.queries import query
from left_join_on_timeout_spark.sources.formats import read_format, stage_as
from left_join_on_timeout_spark.sources.tables import load_table

_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


@query("multi_format_roundtrip", """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
       min(ts) AS min_ts,
       max(ts) AS max_ts
FROM events
GROUP BY event_type
""")
def q_multi_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O8 format coverage: JSON-lines and CSV writes + explicit-schema
    reads preserve longs, doubles, strings, and microsecond timestamps
    bit-for-bit — verified against the parquet original."""
    ev = load_table(spark, sf_dir, "events").select(*_COLS)
    base = tempfile.mkdtemp(prefix="ljot_formats_")
    jpath = stage_as(ev.where(F.col("event_id") % 2 == 0), base, "json")
    cpath = stage_as(ev.where(F.col("event_id") % 2 == 1), base, "csv")
    schema = ev.schema
    back = read_format(spark, jpath, "json", schema).unionByName(
        read_format(spark, cpath, "csv", schema))
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
        .alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"))
