"""Streaming-operator queries surfaced through the driver's correctness
gate: each runs a *real* Structured Streaming plan over the bounded
harness tables (file source → stateful operator → memory sink, drained
deterministically) and returns the sink as a batch DataFrame whose
contents an ANSI-SQL oracle can verify.

These complement ``stream_timeout_left_join`` (the flagship streaming
join in ``queries.py``) with the other stateful-streaming primitives a
100 TB pipeline runs: watermarked dedup and watermarked tumbling-window
aggregation — both with watermark-evicted (bounded) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.dedup import streaming_exact_dedup
from left_join_on_timeout_spark.queries import query
from left_join_on_timeout_spark.sources.tables import load_table
from left_join_on_timeout_spark.streaming.harness import drain_stream

_FLUSH_TS = "2100-01-01 00:00:00"


@query("stream_dedup_keys", """
SELECT DISTINCT user_id, event_type FROM events
""")
def q_stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (``dropDuplicatesWithinWatermark``) over the
    bounded events table: one emission per distinct (user_id, event_type)
    — the key projection makes the result arrival-order-independent, so
    the batch DISTINCT is an exact oracle. State is watermark-evicted;
    at 100 TB the horizon bounds memory, unlike a plain streaming
    dropDuplicates."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type",
                                                    "ts")
    out = drain_stream(
        spark, ev,
        lambda s: streaming_exact_dedup(
            s, keys=["user_id", "event_type"], ts_col="ts",
            delay="10 seconds").select("user_id", "event_type"))
    return out


@query("stream_tumbling_counts", f"""
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       count(*) AS n
FROM events
GROUP BY 1, 2
""")
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming tumbling-window aggregation in append mode:
    windows finalize exactly when the watermark passes their end, so a
    far-future sentinel row flushes every real window through the sink
    (then filters itself out) — deterministic, no wall-clock waits. The
    batch GROUP BY date_trunc is an exact oracle for the finalized
    windows."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    sentinel = spark.range(1).select(
        F.lit(_FLUSH_TS).cast("timestamp").alias("ts"),
        F.lit("__flush__").alias("event_type"))

    def build(s: DataFrame) -> DataFrame:
        return (s.withWatermark("ts", "1 second")
                .groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count("*").alias("n"))
                .select(F.col("window.start").alias("hour_start"),
                        "event_type", "n"))

    out = drain_stream(spark, ev.unionAll(sentinel), build)
    return out.where(F.col("event_type") != "__flush__")
