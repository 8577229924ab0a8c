"""Batch ports of the reference's five integration scenarios
(/root/reference/src/test/java/kafkastreams/leftjoin/LeftJoinOnTimeoutTest.java)
plus config-invariant tests (O15). Event times are explicit — watermark/
timer races are replaced by deterministic batch evaluation."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from left_join_on_timeout_spark.config import TimeoutJoinConfig, parse_interval_ms
from left_join_on_timeout_spark.operators.timeout_join import (
    left_join_on_timeout,
    timeout_only,
    window_inner_join,
)

T0 = datetime(2026, 1, 1)
SCHEMA = StructType([
    StructField("key", LongType()),
    StructField("value", StringType()),
    StructField("ts", TimestampType()),
])


def ms(n: int) -> datetime:
    return T0 + timedelta(milliseconds=n)


def mk(spark, rows):
    return spark.createDataFrame([(k, v, ms(t)) for k, v, t in rows], SCHEMA)


def joiner(l, r):
    # reference ValueJoiner: lhs + "+" + rhs on match, lhs + "+" on timeout
    # (LeftJoinOnTimeoutTest.java:205)
    return F.when(r["value"].isNull(), F.concat(l["value"], F.lit("+"))) \
            .otherwise(F.concat(l["value"], F.lit("+"), r["value"]))


def out_tuples(df):
    return sorted((r["key"], r["joined"]) for r in df.collect())


def test_should_join_left_with_right(spark):
    """LeftJoinOnTimeoutTest.java:79-95 — two lefts (ts=1, 20), one right
    (ts=1), 100 s window: both lefts join, no timeout row."""
    lhs = mk(spark, [(1, "left_1", 1), (1, "left_2", 20)])
    rhs = mk(spark, [(1, "right", 1)])
    out = left_join_on_timeout(lhs, rhs, on="key", window="100 seconds", joiner=joiner)
    assert out_tuples(out) == [(1, "left_1+right"), (1, "left_2+right")]
    assert out.where(F.col("r_value").isNull()).count() == 0


def test_should_left_join_on_timeout(spark):
    """LeftJoinOnTimeoutTest.java:117-129 — left only, 100 ms window:
    exactly [(1, 'left+')], original left event timestamp preserved."""
    lhs = mk(spark, [(1, "left", 1)])
    rhs = spark.createDataFrame([], SCHEMA)
    out = left_join_on_timeout(lhs, rhs, on="key", window="100 ms", joiner=joiner)
    rows = out.collect()
    assert out_tuples(out) == [(1, "left+")]
    assert rows[0]["ts"] == ms(1)  # LeftJoinOnTimeoutBuilder.java:166


def test_out_of_window_right_times_out(spark):
    """A right outside |Δts| ≤ D must not match: left times out."""
    lhs = mk(spark, [(1, "left", 0)])
    rhs = mk(spark, [(1, "right", 250)])
    out = left_join_on_timeout(lhs, rhs, on="key", window="100 ms", joiner=joiner)
    assert out_tuples(out) == [(1, "left+")]


def test_window_is_symmetric(spark):
    """JoinWindows.of(D) is symmetric: right may precede the left."""
    lhs = mk(spark, [(1, "left", 200)])
    rhs = mk(spark, [(1, "right", 150)])
    out = left_join_on_timeout(lhs, rhs, on="key", window="100 ms", joiner=joiner)
    assert out_tuples(out) == [(1, "left+right")]


def test_multi_left_multi_right_cardinality(spark):
    """Per-key multimap semantics (O12): every pending left pairs with every
    in-window right (LeftJoinOnTimeoutTest.java:85-91 generalized)."""
    lhs = mk(spark, [(1, "l1", 0), (1, "l2", 10)])
    rhs = mk(spark, [(1, "r1", 5), (1, "r2", 8)])
    out = window_inner_join(lhs, rhs, on="key", window="100 ms", joiner=joiner)
    assert out.count() == 4


def test_keys_do_not_cross(spark):
    lhs = mk(spark, [(1, "left", 0)])
    rhs = mk(spark, [(2, "right", 0)])
    out = left_join_on_timeout(lhs, rhs, on="key", window="100 s", joiner=joiner)
    assert out_tuples(out) == [(1, "left+")]


def test_timeout_only_is_anti_join(spark):
    lhs = mk(spark, [(1, "a", 0), (2, "b", 0), (3, "c", 0)])
    rhs = mk(spark, [(2, "x", 50)])
    out = timeout_only(lhs, rhs, on="key", window="100 ms")
    assert sorted(r["key"] for r in out.collect()) == [1, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_cancel_divergence_documented(spark):
    """SURVEY.md §2 fine print 2: reference cancels ALL pending timers for a
    key on any join output — a left whose own window does NOT contain the
    right then emits nothing. We adopt SQL-correct semantics: that left
    still emits its timeout row. This test pins OUR behavior."""
    lhs = mk(spark, [(1, "in_win", 0), (1, "out_win", 100_000)])
    rhs = mk(spark, [(1, "right", 10)])
    out = left_join_on_timeout(lhs, rhs, on="key", window="1 second", joiner=joiner)
    assert out_tuples(out) == [(1, "in_win+right"), (1, "out_win+")]


def test_config_invariants():
    """O15 (LeftJoinOnTimeoutBuilder.java:124-143): timeout > window,
    default timeout = window + 100 ms gap."""
    cfg = TimeoutJoinConfig.of("1 second")
    assert cfg.timeout_ms == 1100
    with pytest.raises(ValueError):
        TimeoutJoinConfig.of("1 second", timeout="1 second")
    with pytest.raises(ValueError):
        TimeoutJoinConfig.of(0)
    with pytest.raises(ValueError):
        parse_interval_ms("1 fortnight")
    assert parse_interval_ms("30 minutes") == 1_800_000
    assert parse_interval_ms("100 ms") == 100
    assert parse_interval_ms(250) == 250


def test_composite_key(spark):
    schema = StructType([
        StructField("k1", LongType()), StructField("k2", StringType()),
        StructField("value", StringType()), StructField("ts", TimestampType()),
    ])
    lhs = spark.createDataFrame([(1, "a", "l", ms(0))], schema)
    rhs = spark.createDataFrame([(1, "a", "r", ms(5)), (1, "b", "r2", ms(5))], schema)
    out = left_join_on_timeout(lhs, rhs, on=["k1", "k2"], window="1 s")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["r_value"] == "r"


def test_null_key_left_emits_timeout_only(spark):
    """SQL null semantics on the join key: a null-keyed left matches
    nothing (NULL = NULL is not true) but still emits its timeout row —
    and a null-keyed right never cancels anything."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = "key LONG, value STRING, ts TIMESTAMP"
    left = spark.createDataFrame(
        [(None, "l_null", t0), (1, "l_one", t0)], schema)
    right = spark.createDataFrame(
        [(None, "r_null", t0), (1, "r_one", t0)], schema)
    out = left_join_on_timeout(left, right, on="key", window="1 minute")
    got = {r.value: r.r_value for r in out.collect()}
    assert got == {"l_null": None, "l_one": "r_one"}


def test_dynamic_negative_window_raises(spark):
    """A negative evaluated per-row window is a bug in the caller's SLA
    expression, not a timeout — it must fail loudly (ADVICE r5), never
    silently produce an empty range / null-padded left."""
    from left_join_on_timeout_spark.operators.timeout_join import (
        dynamic_left_join_on_timeout,
    )

    left = mk(spark, [(1, "A", 0)]).withColumn(
        "w", F.lit(-5).cast("long"))
    right = mk(spark, [(1, "a", 0)])
    out = dynamic_left_join_on_timeout(left, right, "key", F.col("w"))
    with pytest.raises(Exception, match="non-negative"):
        out.collect()


def test_dynamic_null_window_is_defined_timeout(spark):
    """A NULL per-row window is the documented no-match: the left emits
    its timeout row (unknown SLA class waits for nothing)."""
    from left_join_on_timeout_spark.operators.timeout_join import (
        dynamic_left_join_on_timeout,
    )

    left = mk(spark, [(1, "A", 0), (2, "B", 0)]).withColumn(
        "w", F.when(F.col("key") == 2, F.lit(1000)).cast("long"))
    right = mk(spark, [(1, "a", 0), (2, "b", 0)])
    out = dynamic_left_join_on_timeout(left, right, "key", F.col("w"),
                                       joiner=joiner)
    assert out_tuples(out) == [(1, "A+"), (2, "B+b")]
