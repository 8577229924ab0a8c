"""Edge-case tests for operators/asof_join.py: exact-tie matching,
tolerance boundary, duplicate-timestamp tiebreak, forward direction,
and union-window vs range-join plan equivalence."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from left_join_on_timeout_spark.operators.asof_join import (
    asof_join,
    asof_join_range,
)

T0 = datetime(2026, 1, 1)
SCHEMA = StructType([
    StructField("key", LongType()),
    StructField("id", StringType()),
    StructField("ts", TimestampType()),
])


def ms(n: int) -> datetime:
    return T0 + timedelta(milliseconds=n)


def mk(spark, rows):
    return spark.createDataFrame([(k, v, ms(t)) for k, v, t in rows], SCHEMA)


def pairs(df):
    return sorted((r["id"], r["r_id"]) for r in df.collect())


def test_backward_picks_nearest_and_ties_match(spark):
    left = mk(spark, [(1, "L1", 100), (1, "L2", 300)])
    right = mk(spark, [(1, "A", 50), (1, "B", 100), (1, "C", 250)])
    out = asof_join(left, right, on="key", tiebreak="id")
    # L1@100: B@100 ties and matches (not A@50); L2@300: C@250 is nearest.
    assert pairs(out) == [("L1", "B"), ("L2", "C")]


def test_tolerance_boundary_inclusive_and_unmatched_null(spark):
    left = mk(spark, [(1, "L1", 1000), (1, "L2", 5000)])
    right = mk(spark, [(1, "A", 0)])
    out = asof_join(left, right, on="key", tolerance="1 seconds",
                    tiebreak="id")
    # A@0 is exactly 1000 ms before L1 -> inclusive match; 5000 ms before
    # L2 -> out of tolerance, null-padded.
    assert pairs(out) == [("L1", "A"), ("L2", None)]


def test_duplicate_ts_greatest_tiebreak_wins(spark):
    left = mk(spark, [(1, "L1", 200)])
    right = mk(spark, [(1, "A", 100), (1, "Z", 100)])
    out = asof_join(left, right, on="key", tiebreak="id")
    assert pairs(out) == [("L1", "Z")]


def test_forward_direction(spark):
    left = mk(spark, [(1, "L1", 100), (1, "L2", 400)])
    right = mk(spark, [(1, "A", 150), (1, "B", 300)])
    out = asof_join(left, right, on="key", direction="forward",
                    tiebreak="id")
    # L1@100 -> next at-or-after is A@150; L2@400 -> nothing after.
    assert pairs(out) == [("L1", "A"), ("L2", None)]


def test_keys_do_not_cross(spark):
    left = mk(spark, [(1, "L1", 100), (2, "L2", 100)])
    right = mk(spark, [(2, "B", 50)])
    out = asof_join(left, right, on="key", tiebreak="id")
    assert pairs(out) == [("L1", None), ("L2", "B")]


def test_range_twin_equivalence(spark):
    left = mk(spark, [(k, f"L{k}_{t}", t) for k in (1, 2, 3)
                      for t in (100, 900, 2500, 4000)])
    right = mk(spark, [(k, f"R{k}_{t}", t) for k in (1, 2)
                       for t in (0, 100, 800, 3000, 3000)])
    a = asof_join(left, right, on="key", tolerance="2 seconds",
                  tiebreak="id")
    b = asof_join_range(left, right, on="key", tolerance="2 seconds",
                        tiebreak="id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
