"""operators/range_join.py: chunked overlap join vs a naive inequality
join — exactly-once emission for pairs spanning multiple shared chunks,
closed-interval boundary semantics, and the optional equi key."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.range_join import (
    _interval_seconds,
    interval_overlap_join,
)


def TS(minutes: float) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=minutes)


def mk(spark, prefix, rows):
    return spark.createDataFrame(
        [(i, TS(a), TS(b)) for i, (a, b) in enumerate(rows)],
        f"{prefix}_id LONG, {prefix}_start TIMESTAMP, {prefix}_end TIMESTAMP")


def naive(spark, left, right):
    return left.join(
        right,
        (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end")))


@pytest.mark.parametrize("chunk", ["30 minutes", "1 hour", "1 day"])
def test_matches_naive_join_any_chunk(spark, chunk):
    # intervals deliberately spanning 0-4 chunk boundaries
    left = mk(spark, "a", [(0, 10), (5, 300), (59, 61), (100, 100),
                           (240, 480)])
    right = mk(spark, "b", [(8, 12), (0, 1000), (61, 61), (500, 600),
                            (90, 110)])
    got = interval_overlap_join(
        left, right, "a_start", "a_end", "b_start", "b_end", chunk=chunk)
    expect = naive(spark, left, right)
    key = lambda r: (r["a_id"], r["b_id"])  # noqa: E731
    got_pairs = sorted(map(key, got.collect()))
    exp_pairs = sorted(map(key, expect.collect()))
    assert got_pairs == exp_pairs
    assert len(got_pairs) == len(set(got_pairs))  # exactly-once


def test_closed_interval_touching_endpoints_match(spark):
    left = mk(spark, "a", [(0, 60)])
    right = mk(spark, "b", [(60, 90), (90, 120)])
    got = interval_overlap_join(
        left, right, "a_start", "a_end", "b_start", "b_end",
        chunk="1 hour")
    assert [(r.a_id, r.b_id) for r in got.collect()] == [(0, 0)]


def test_equi_key_restricts_pairs(spark):
    left = spark.createDataFrame(
        [(1, "u1", TS(0), TS(100)), (2, "u2", TS(0), TS(100))],
        "a_id LONG, k STRING, a_start TIMESTAMP, a_end TIMESTAMP")
    right = spark.createDataFrame(
        [(10, "u1", TS(50), TS(60))],
        "b_id LONG, k STRING, b_start TIMESTAMP, b_end TIMESTAMP")
    got = interval_overlap_join(
        left, right, "a_start", "a_end", "b_start", "b_end",
        on="k", chunk="1 hour")
    assert [(r.a_id, r.b_id) for r in got.collect()] == [(1, 10)]


def test_interval_seconds_parse():
    assert _interval_seconds("90 seconds") == 90
    assert _interval_seconds("30 minutes") == 1800
    with pytest.raises(ValueError):
        _interval_seconds("3 fortnights")
