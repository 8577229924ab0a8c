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


# --- timer_core vs an independent declarative model (no Spark) -------------

US = 1_000_000
WINDOW_US = 1000 * US          # 1000 s
TIMEOUT_MS = 1000 * 1000 + 100  # window + reference default gap

core_events = st.lists(
    st.tuples(st.booleans(),                          # is_left
              st.integers(min_value=0, max_value=50)  # ts (seconds)
              ), min_size=1, max_size=14)


def _drain_core(rows, strict: bool):
    from left_join_on_timeout_spark.streaming import timer_core
    out, lefts, rights = timer_core.replay(
        [], [], sorted(rows, key=lambda x: (x[0], x[2])),
        window_us=WINDOW_US, timeout_ms=TIMEOUT_MS, strict=strict,
        capacity=10**6, capacity_policy="error")
    fired, lefts = timer_core.fire_due(lefts, now_ms=10**15,
                                       window_us=WINDOW_US)
    rights = timer_core.gc_rights(rights, 10**15, WINDOW_US)
    lefts = timer_core.gc_lefts(lefts, 10**15, WINDOW_US)
    assert lefts == [] and rights == []   # full drain, always
    return out, fired


@settings(max_examples=200, deadline=None)
@given(core_events)
def test_timer_core_sql_mode_matches_declarative_model(events):
    """The mechanism (schedule/cancel/fire replay) must equal the
    *declarative* LEFT JOIN ON TIMEOUT: every (left, right) pair within
    the window, plus (left, null) exactly for match-less lefts —
    independent of arrival interleaving within a timestamp. This is the
    property the three Spark tiers hash against; here it pins the pure
    core on thousands of orderings Spark tests can't afford."""
    rows = [(ts * US, f"{'L' if is_l else 'R'}{i}", "L" if is_l else "R")
            for i, (is_l, ts) in enumerate(events)]
    lefts = [r for r in rows if r[2] == "L"]
    rights = [r for r in rows if r[2] == "R"]
    out, fired = _drain_core(rows, strict=False)
    got = sorted([(o[1], o[2]) for o in out] + [(f[1], None) for f in fired])
    expected = []
    for lts, lv, _ in lefts:
        matches = [rv for rts, rv, _ in rights if abs(rts - lts) <= WINDOW_US]
        expected += [(lv, rv) for rv in matches] or [(lv, None)]
    assert got == sorted(expected)


@settings(max_examples=200, deadline=None)
@given(core_events, st.integers(min_value=1, max_value=4))
def test_timer_core_batched_watermark_replay(events, nbatches):
    """The actual adapter loop: ts-ordered micro-batches, each followed
    by a fire_due/gc pass at the batch watermark — with a window small
    enough (3 s over 0-50 s ts) that timers genuinely fire mid-stream.
    The combined output must still equal the declarative LEFT JOIN ON
    TIMEOUT: watermark ordering makes mid-stream firing safe (a fired
    left's window is always behind the watermark), and this pins the
    replay/fire/gc interaction the single-shot tests skip."""
    from left_join_on_timeout_spark.streaming import timer_core
    win_us, timeout_ms = 3 * US, 3 * 1000 + 100
    rows = sorted(
        [(ts * US, f"{'L' if is_l else 'R'}{i}", "L" if is_l else "R")
         for i, (is_l, ts) in enumerate(events)],
        key=lambda x: (x[0], x[2]))
    size = (len(rows) + nbatches - 1) // nbatches
    lefts, rights, out, fired = [], [], [], []
    for b in range(0, len(rows), size):
        chunk = rows[b:b + size]
        o, lefts, rights = timer_core.replay(
            lefts, rights, chunk, window_us=win_us, timeout_ms=timeout_ms,
            strict=False, capacity=10**6, capacity_policy="error")
        out += o
        wm_ms = max(r[0] for r in chunk) // 1000
        f, lefts = timer_core.fire_due(lefts, wm_ms, win_us)
        fired += f
        rights = timer_core.gc_rights(rights, wm_ms, win_us)
        lefts = timer_core.gc_lefts(lefts, wm_ms, win_us)
    f, lefts = timer_core.fire_due(lefts, 10**15, win_us)
    fired += f
    got = sorted([(o[1], o[2]) for o in out] + [(x[1], None) for x in fired])
    expected = []
    for lts, lv, _ in (r for r in rows if r[2] == "L"):
        matches = [rv for rts, rv, s in rows
                   if s == "R" and abs(rts - lts) <= win_us]
        expected += [(lv, rv) for rv in matches] or [(lv, None)]
    assert got == sorted(expected)


@settings(max_examples=200, deadline=None)
@given(core_events)
def test_timer_core_strict_mode_invariants(events):
    """Strict (reference-quirk) mode on arbitrary interleavings: join
    outputs are exactly the declarative inner join; every timeout
    emission is a genuinely match-less left; each left appears at most
    once as a timeout; and a left never both joins and times out."""
    rows = [(ts * US, f"{'L' if is_l else 'R'}{i}", "L" if is_l else "R")
            for i, (is_l, ts) in enumerate(events)]
    lefts = [r for r in rows if r[2] == "L"]
    rights = [r for r in rows if r[2] == "R"]
    out, fired = _drain_core(rows, strict=True)
    inner = []
    for lts, lv, _ in lefts:
        inner += [(lv, rv) for rts, rv, _ in rights
                  if abs(rts - lts) <= WINDOW_US]
    assert sorted((o[1], o[2]) for o in out) == sorted(inner)
    matchless = {lv for lts, lv, _ in lefts
                 if not any(abs(rts - lts) <= WINDOW_US
                            for rts, _, _ in rights)}
    timed_out = [f[1] for f in fired]
    assert len(timed_out) == len(set(timed_out))
    assert set(timed_out) <= matchless
    joined_lefts = {o[1] for o in out}
    assert joined_lefts.isdisjoint(timed_out)
