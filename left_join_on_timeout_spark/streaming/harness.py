"""Run a streaming timeout join to completion over bounded inputs.

The driver's correctness gate compares batch DataFrames, and the reference
tests assert on fully-drained topologies — this harness gives both: feed
bounded keyed streams through the *real* streaming operator (file source →
stream-stream join → memory sink), advance the watermark past everything
with sentinel flush rows, and hand back the sink contents as a batch
DataFrame.

Flush rows use negative keys (real keys in the test tables are ≥ 0) and a
far-future timestamp; they advance both sides' watermarks so every
pending left either matched or timed out, then are filtered from the
result. This mirrors the reference tests' Awaitility polling
(``LeftJoinOnTimeoutTest.java:221-235``) — wait-until-drained — without
wall-clock races.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.timeout_join import Joiner
from left_join_on_timeout_spark.streaming.timeout_join import (
    left_join_on_timeout_stream,
)

FLUSH_TS = "2100-01-01 00:00:00"


@contextmanager
def _drain_tuning(spark: SparkSession):
    """Size state partitioning for a bounded drain. Every stateful
    micro-batch costs one task per shuffle partition per stateful
    operator — a vanilla session's 200 partitions turn a 60k-row drain
    into thousands of near-empty state-store tasks. The count is
    snapshotted per query at stream start (state partitioning is pinned
    for the checkpoint's life), so capping it here affects only this
    drain; the session value is restored afterwards. On a real cluster
    the default stands — this is drain sizing, not an engine default."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(min(int(prev), 16)))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def run_timeout_join_stream(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    on: str,
    window: str | int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    timeout: str | int | None = None,
    joiner: Joiner | None = None,
    joined_col: str = "joined",
    right_prefix: str = "r_",
    how: str = "leftOuter",
) -> DataFrame:
    """Feed two *batch* DataFrames through the streaming operator and
    return the drained sink as a batch DataFrame (flush rows removed).

    The inputs are staged as parquet and re-read with ``readStream`` so
    the plan under test is the real ``StreamingSymmetricHashJoinExec``
    with watermark state eviction, not a batch rewrite."""
    base = tempfile.mkdtemp(prefix="ljot_stream_")
    ldir, rdir, ckpt = (os.path.join(base, d) for d in ("l", "r", "ck"))
    qname = "ljot_sink_" + uuid.uuid4().hex[:12]

    def flush_row(df: DataFrame, key_val: int, ts_col: str) -> DataFrame:
        """One sentinel row regardless of input contents (an empty input
        still must advance its side's watermark): nulls everywhere except
        the (negative) key and the far-future event time."""
        cols = [
            F.lit(key_val).cast(df.schema[on].dataType).alias(on)
            if f.name == on else
            F.lit(FLUSH_TS).cast("timestamp").alias(ts_col)
            if f.name == ts_col else
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
        return df.sparkSession.range(1).select(*cols)

    left.unionAll(flush_row(left, -1, left_ts)) \
        .write.mode("overwrite").parquet(ldir)
    right.unionAll(flush_row(right, -2, right_ts)) \
        .write.mode("overwrite").parquet(rdir)

    lstream = spark.readStream.schema(left.schema).parquet(ldir)
    rstream = spark.readStream.schema(right.schema).parquet(rdir)
    out = left_join_on_timeout_stream(
        lstream, rstream, on=on, window=window, left_ts=left_ts,
        right_ts=right_ts, timeout=timeout, joiner=joiner,
        joined_col=joined_col, right_prefix=right_prefix, how=how)

    with _drain_tuning(spark):
        q = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # drop flush sentinels: left-side key >= 0 keeps every left-join
    # row; under fullOuter, right-only rows have a null left key, so
    # judge them by the (renamed) right key instead
    keep = F.coalesce(F.col(on), F.col(f"{right_prefix}{on}")) >= 0 \
        if how == "fullOuter" else F.col(on) >= 0
    return spark.table(qname).where(keep)


def drain_stream(spark: SparkSession, inp: DataFrame, build) -> DataFrame:
    """Feed one bounded *batch* DataFrame through a streaming transform
    and return the drained sink as a batch DataFrame.

    ``build(stream)`` gets the ``readStream`` DataFrame (same schema as
    ``inp``, staged through parquet so event-time columns survive) and
    returns the streaming output to materialize. ``processAllAvailable``
    plus Spark's no-data micro-batches drain watermark-gated emissions,
    so append-mode windowed aggregations finalize without wall-clock
    waits — the single-stream sibling of :func:`run_timeout_join_stream`."""
    base = tempfile.mkdtemp(prefix="ljot_stream1_")
    src, ckpt = os.path.join(base, "in"), os.path.join(base, "ck")
    qname = "ljot_sink_" + uuid.uuid4().hex[:12]
    inp.write.mode("overwrite").parquet(src)
    out = build(spark.readStream.schema(inp.schema).parquet(src))
    with _drain_tuning(spark):
        q = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(qname)


def drain_two_streams(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    on: str,
    build,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Two-input generalization of :func:`drain_stream`: stage both batch
    inputs (plus watermark-advancing flush rows on each side), hand the
    two ``readStream`` DataFrames to ``build(lstream, rstream)``, drain
    the result, and return it with flush keys filtered out."""
    base = tempfile.mkdtemp(prefix="ljot_stream2_")
    ldir, rdir, ckpt = (os.path.join(base, d) for d in ("l", "r", "ck"))
    qname = "ljot_sink_" + uuid.uuid4().hex[:12]

    def flush_row(df: DataFrame, key_val: int, ts_col: str) -> DataFrame:
        cols = [
            F.lit(key_val).cast(df.schema[on].dataType).alias(on)
            if f.name == on else
            F.lit(FLUSH_TS).cast("timestamp").alias(ts_col)
            if f.name == ts_col else
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
        return df.sparkSession.range(1).select(*cols)

    left.unionAll(flush_row(left, -1, left_ts)) \
        .write.mode("overwrite").parquet(ldir)
    right.unionAll(flush_row(right, -2, right_ts)) \
        .write.mode("overwrite").parquet(rdir)
    out = build(spark.readStream.schema(left.schema).parquet(ldir),
                spark.readStream.schema(right.schema).parquet(rdir))
    with _drain_tuning(spark):
        q = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(qname).where(F.col(on) >= 0)


def run_tws_join_stream(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    on: str,
    window: str | int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    joiner: Joiner | None = None,
) -> DataFrame:
    """Drain the ``transformWithStateInPandas`` tier over bounded inputs.

    tws requires a state store with column families, so the query runs
    under ``RocksDBStateStoreProvider`` (bundled rocksdbjni); the
    session's provider conf is restored afterwards. Same SQL-equivalent
    mode and flush discipline as :func:`run_timer_join_stream`."""
    from left_join_on_timeout_spark.streaming.timer_join import (
        left_join_on_timeout_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                        "state.RocksDBStateStoreProvider")
    try:
        return drain_two_streams(
            spark, left, right, on,
            lambda l, r: left_join_on_timeout_tws(
                l, r, on=on, window=window, left_ts=left_ts,
                right_ts=right_ts, joiner=joiner,
                strict_reference_semantics=False),
            left_ts=left_ts, right_ts=right_ts)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def run_timer_join_stream(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    on: str,
    window: str | int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    joiner: Joiner | None = None,
) -> DataFrame:
    """Drain the exact-timer tier (``streaming.timer_join``) over bounded
    inputs — same flush-row discipline as :func:`run_timeout_join_stream`.
    Runs with ``strict_reference_semantics=False`` (cancel only the
    matched left), the SQL-equivalent mode whose drained output is the
    batch left join's multiset."""
    from left_join_on_timeout_spark.streaming.timer_join import (
        left_join_on_timeout_timers,
    )

    base = tempfile.mkdtemp(prefix="ljot_timer_stream_")
    ldir, rdir, ckpt = (os.path.join(base, d) for d in ("l", "r", "ck"))
    qname = "ljot_timer_sink_" + uuid.uuid4().hex[:12]

    def flush_row(df: DataFrame, key_val: int, ts_col: str) -> DataFrame:
        cols = [
            F.lit(key_val).cast(df.schema[on].dataType).alias(on)
            if f.name == on else
            F.lit(FLUSH_TS).cast("timestamp").alias(ts_col)
            if f.name == ts_col else
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
        return df.sparkSession.range(1).select(*cols)

    left.unionAll(flush_row(left, -1, left_ts)) \
        .write.mode("overwrite").parquet(ldir)
    right.unionAll(flush_row(right, -2, right_ts)) \
        .write.mode("overwrite").parquet(rdir)
    out = left_join_on_timeout_timers(
        spark.readStream.schema(left.schema).parquet(ldir),
        spark.readStream.schema(right.schema).parquet(rdir),
        on=on, window=window, left_ts=left_ts, right_ts=right_ts,
        joiner=joiner, strict_reference_semantics=False)
    with _drain_tuning(spark):
        q = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(qname).where(F.col(on) >= 0)
