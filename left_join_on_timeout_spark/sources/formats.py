"""Multi-format source adapters (reference O1, widened): the engine
reads JSON lines, CSV, and ORC alongside parquet, with explicit schemas
so malformed rows surface as nulls/errors instead of silent type
drift.

The reference's only wire format is JSON-over-Kafka
(``JsonSerializer.java`` / ``JsonGenericDeserializer.java``); a 100 TB
lake has raw landing zones in all of these. Explicit-schema reads keep
scans vectorized and skip the double-pass schema inference a naive
``spark.read.json(path)`` would do over the full input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "json", "csv", "orc")


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats (json/csv) require a
    schema — at 100 TB, inference means a full extra pass and a plan
    that can flip types between runs."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema")
    reader = spark.read.schema(schema)
    if fmt == "json":
        return reader.option("timestampFormat", timestamp_format).json(path)
    return (reader.option("header", "true")
            .option("timestampFormat", timestamp_format).csv(path))


def stage_as(
    df: DataFrame,
    base_dir: str,
    fmt: str,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
) -> str:
    """Write ``df`` out as ``fmt`` under ``base_dir`` and return the
    path — the write half of the round-trip (O8 sink, file flavors).
    Timestamps serialize at full microsecond precision (the default
    millisecond format silently truncates — same pitfall as the JSON
    serde in streaming/timer_join.py)."""
    path = os.path.join(base_dir, fmt)
    w = df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "json":
        w.option("timestampFormat", timestamp_format).json(path)
    elif fmt == "csv":
        (w.option("header", "true")
         .option("timestampFormat", timestamp_format).csv(path))
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    return path
