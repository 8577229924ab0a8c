"""MERGE INTO semantics (operators/merge.py): the three clauses, clause
order (delete before update), insert gating, and no-op rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k INT, name STRING, v DOUBLE")


def test_merge_update_delete_insert(spark):
    src = spark.createDataFrame(
        [(1, "U", 11.0), (2, "D", None), (9, "I", 90.0), (7, "D", None)],
        "k INT, op STRING, nv DOUBLE")
    out = merge_into(
        _target(spark), src, on="k",
        matched_update=lambda t, s: {
            "v": F.when(s.op == "U", s.nv).otherwise(t.v)},
        matched_delete=lambda t, s: s.op == "D",
        not_matched_insert=lambda s: {
            "k": s.k, "name": F.lit("new"), "v": s.nv},
        not_matched_condition=lambda s: s.op == "I")
    got = sorted((r.k, r.name, r.v) for r in out.collect())
    # 1 updated, 2 deleted, 3 untouched, 9 inserted, 7 (delete of a
    # missing key) a no-op
    assert got == [(1, "a", 11.0), (3, "c", 30.0), (9, "new", 90.0)]


def test_merge_without_insert_drops_source_only(spark):
    src = spark.createDataFrame([(3, 99.0), (8, 88.0)], "k INT, nv DOUBLE")
    out = merge_into(
        _target(spark), src, on="k",
        matched_update=lambda t, s: {"v": s.nv})
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 99.0)]


def test_merge_insert_requires_all_columns(spark):
    src = spark.createDataFrame([(8, 88.0)], "k INT, nv DOUBLE")
    with pytest.raises(ValueError, match="missing 'name'"):
        merge_into(_target(spark), src, on="k",
                   not_matched_insert=lambda s: {"k": s.k, "v": s.nv})


def test_merge_delete_checked_before_update(spark):
    # a row that satisfies both clauses must be deleted, not updated
    src = spark.createDataFrame([(1, "D", 11.0)], "k INT, op STRING, nv DOUBLE")
    out = merge_into(
        _target(spark), src, on="k",
        matched_update=lambda t, s: {"v": s.nv},
        matched_delete=lambda t, s: s.op == "D")
    assert sorted(r.k for r in out.collect()) == [2, 3]
