"""Streaming sources (reference O1 — the stream side of the topic scan).

The reference consumes partitioned Kafka topics into keyed, timestamped
streams (``LeftJoinOnTimeoutTest.java:201-202``; streams held at
``LeftJoinOnTimeoutBuilder.java:28-29``). Spark's equivalents:

* **production** — ``spark.readStream.format("kafka")``: every record is
  ``(key BINARY, value BINARY, topic, partition, offset, timestamp)``;
  payloads decode via ``from_json`` (O13 deserialize,
  reference ``JsonGenericDeserializer.java:15-30``).
* **harness / file-fed** — ``spark.readStream.parquet(dir)`` with an
  explicit schema; the driver's test tables are parquet, and file sources
  give deterministic replays (no broker, no wall clock).

Both return plain streaming DataFrames, so everything downstream
(watermarks, the timeout join, sinks) is source-agnostic — same property
as the reference being generic over serdes.

Scale notes: Kafka source parallelism = topic partitions (one Spark task
per partition per micro-batch); ``maxOffsetsPerTrigger`` /
``maxFilesPerTrigger`` bound micro-batch size — that is Spark's form of
the reference's capacity-bounded backpressure (O11,
``BlockingScheduledExecutor.java:19-31``): bound the work admitted per
unit, never block a task thread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_keyed_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-backed keyed stream (the harness analog of a topic consumer).

    ``schema`` is required — streaming file sources do not infer — and
    ``max_files_per_trigger`` bounds each micro-batch (backpressure,
    O11's Spark idiom)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Raw Kafka topic stream: ``(key BINARY, value BINARY, …)`` exactly
    as the broker stores it. Decode with :func:`decode_json_records`.

    Requires the spark-sql-kafka connector on the classpath (standard on
    real clusters; not shipped in this container — construction is lazy,
    nothing connects until ``.start()``)."""
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", brokers)
              .option("subscribe", topic)
              .option("startingOffsets", starting_offsets))
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def decode_json_records(
    records: DataFrame,
    value_schema: StructType | str,
    key_type: str = "string",
    ts_col: str = "ts",
) -> DataFrame:
    """Kafka-record layout → typed keyed stream (O13 deserialize side).

    ``records`` must carry ``key BINARY|STRING`` and ``value
    BINARY|STRING`` (the Kafka source layout); the JSON value decodes via
    ``from_json`` into top-level columns — the Spark twin of the
    reference's ``JsonGenericDeserializer`` (generic over the value type
    through the schema argument, ``ScheduledStateStoreSupplier.java:41-45``).
    If the payload has no ``ts_col`` field, the record's broker
    ``timestamp`` column is used when present."""
    out = records.select(
        F.col("key").cast("string").cast(key_type).alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        *([F.col("timestamp")] if "timestamp" in records.columns else []),
    )
    value_fields = out.select("v.*").columns
    cols = [F.col("key")] + [F.col(f"v.{c}").alias(c) for c in value_fields]
    if ts_col not in value_fields and "timestamp" in records.columns:
        cols.append(F.col("timestamp").alias(ts_col))
    return out.select(*cols)
