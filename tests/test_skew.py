"""Salted-join semantics: result-identical to the plain join for inner
and left joins, spread across salt partitions, invalid modes rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.skew import (
    salted_join,
    skewed_key_stats,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def skewed_pair(spark):
    # key 1 is hot (8 rows with distinct payloads); keys 2, 3 are cold;
    # key 4 exists only on the skewed side (left-join probe)
    left = spark.createDataFrame(
        [(1, i) for i in range(8)] + [(2, 100), (3, 200), (4, 300)],
        "k LONG, lv LONG")
    right = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (5, "z")], "k LONG, rv STRING")
    return left, right


def test_salted_inner_equals_plain(spark, skewed_pair):
    left, right = skewed_pair
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt=4)
    assert _rows(salted, "k", "lv", "rv") == _rows(plain, "k", "lv", "rv")


def test_salted_left_keeps_unmatched_once(spark, skewed_pair):
    left, right = skewed_pair
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", how="left", salt=4)
    assert _rows(salted, "k", "lv", "rv") == _rows(plain, "k", "lv", "rv")
    # the unmatched key appears exactly once, not once per salt
    assert salted.where(F.col("k") == 4).count() == 1


def test_salt_spreads_hot_key(spark, skewed_pair):
    left, _ = skewed_pair
    salts = (left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(4)))
        .where(F.col("k") == 1).select("_salt").distinct().count())
    assert salts > 1  # distinct payloads of the hot key hit several salts


def test_right_join_rejected(spark, skewed_pair):
    left, right = skewed_pair
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="right")


def test_skewed_key_stats(spark, skewed_pair):
    left, _ = skewed_pair
    top = skewed_key_stats(left, "k", top=2).collect()
    assert (top[0].k, top[0].n) == (1, 8)
