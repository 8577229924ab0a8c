"""Property-based batch/streaming equivalence: for arbitrary small keyed
event sets, the streaming watermarked LEFT JOIN ON TIMEOUT must produce
exactly the batch operator's multiset. The five reference scenarios are
specific points in this space; the fuzz covers the in-between shapes
(duplicate timestamps, multi-match keys, empty sides, boundary gaps)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.timeout_join import (
    left_join_on_timeout,
)
from left_join_on_timeout_spark.streaming.harness import (
    run_timeout_join_stream,
)

SCHEMA = "key LONG, value STRING, ts TIMESTAMP"
BASE = dt.datetime(2024, 1, 1)

event = st.tuples(
    st.integers(min_value=0, max_value=2),            # key
    st.integers(min_value=0, max_value=4000),         # ts offset ms
)
event_sets = st.tuples(
    st.lists(event, min_size=1, max_size=6),          # lefts
    st.lists(event, min_size=0, max_size=6),          # rights
)


def _df(spark, rows, tag):
    data = [(k, f"{tag}{i}", BASE + dt.timedelta(milliseconds=ms))
            for i, (k, ms) in enumerate(rows)]
    return spark.createDataFrame(data, SCHEMA)


def _multiset(df):
    return sorted((r.key, r.value, r.r_value)
                  for r in df.select("key", "value", "r_value").collect())


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(event_sets)
def test_stream_matches_batch_on_random_inputs(spark, sets):
    lefts, rights = sets
    l, r = _df(spark, lefts, "L"), _df(spark, rights, "R")
    batch = left_join_on_timeout(l, r, on="key", window="1 second")
    stream = run_timeout_join_stream(
        spark, l, r, on="key", window="1 second")
    assert _multiset(stream) == _multiset(batch)
    # every left appears at least once (matched or null-padded) — the
    # reference's core contract
    assert (stream.select("key", "value").distinct().count()
            == l.select("key", "value").distinct().count())
