"""Brute-force completeness fuzz for ``full_outer_join_on_timeout`` —
the symmetric O3 extension, first in the round-5 driver window, given
the same adversarial treatment as the dynamic-window join
(``tests/test_dynamic_window_fuzz.py``).

One Spark job covers 220 independent random scenarios by folding
``scenario_id`` into the join key. The brute force recomputes the full
outer multiset per scenario in plain Python: every in-window (l, r)
pair, a null-padded row for every matchless left (the reference's
timeout emission), and a null-padded row for every matchless right (the
emission the reference cannot express — its topology only arms timers
for lefts, ``LeftJoinOnTimeoutBuilder.java:95-122``). Boundary rights
sit at exactly ``|Δts| == window`` (must match) and ``window + 1 ms``
(must not — and must then surface as an unmatched-right row).
"""

from __future__ import annotations

import datetime as dt
import random

from left_join_on_timeout_spark.operators.timeout_join import (
    full_outer_join_on_timeout,
    left_join_on_timeout,
)

BASE = dt.datetime(2024, 1, 1)
N_SCENARIOS = 220
SEED = 20260814
WINDOW_MS = 1000


def _scenarios():
    rng = random.Random(SEED)
    lefts, rights = [], []
    for sid in range(N_SCENARIOS):
        for i in range(rng.randint(0, 5)):
            key = rng.randint(0, 2)
            lefts.append((sid, key, f"L{sid}_{i}", rng.randint(0, 4000)))
        for i in range(rng.randint(0, 5)):
            key = rng.randint(0, 2)
            rights.append((sid, key, f"R{sid}_{i}", rng.randint(0, 4000)))
        # adversarial boundary rights anchored to a random left: exactly
        # at the window edge (match) and 1 ms past it (no match — must
        # emit as an unmatched right instead of vanishing)
        mine = [l for l in lefts if l[0] == sid]
        if mine and rng.random() < 0.5:
            _, key, _, lts = rng.choice(mine)
            sign = rng.choice((-1, 1))
            rights.append((sid, key, f"Rb{sid}_on", lts + sign * WINDOW_MS))
            rights.append((sid, key, f"Rb{sid}_off",
                           lts + sign * (WINDOW_MS + 1)))
    return lefts, rights


def _brute_force(lefts, rights):
    expected = []
    r_by_sk: dict[tuple[int, int], list] = {}
    for sid, key, val, ts in rights:
        r_by_sk.setdefault((sid, key), []).append((val, ts))
    matched_rights = set()
    for sid, key, lval, lts in lefts:
        matches = [rval for rval, rts in r_by_sk.get((sid, key), [])
                   if abs(rts - lts) <= WINDOW_MS]
        for rval in matches:
            matched_rights.add((sid, key, rval))
        expected += ([(sid, key, lval, rval) for rval in matches]
                     or [(sid, key, lval, None)])
    for sid, key, rval, _ in rights:
        if (sid, key, rval) not in matched_rights:
            expected.append((sid, key, None, rval))
    return sorted(expected,
                  key=lambda t: (t[0], t[1], t[2] or "", t[3] or ""))


def _df(spark, rows):
    schema = "sid INT, key INT, value STRING, ts TIMESTAMP"
    return spark.createDataFrame(
        [(sid, key, val, BASE + dt.timedelta(milliseconds=ms))
         for sid, key, val, ms in rows], schema)


def test_full_outer_join_matches_bruteforce(spark):
    from pyspark.sql import functions as F

    lefts, rights = _scenarios()
    out = full_outer_join_on_timeout(
        _df(spark, lefts), _df(spark, rights),
        on=["sid", "key"], window=WINDOW_MS)
    got = sorted(
        ((r["sid"], r["key"], r["value"], r["r_value"])
         for r in out.select(
             F.coalesce("sid", "r_sid").alias("sid"),
             F.coalesce("key", "r_key").alias("key"),
             "value", "r_value").collect()),
        key=lambda t: (t[0], t[1], t[2] or "", t[3] or ""))
    assert got == _brute_force(lefts, rights)


def test_full_outer_left_projection_equals_left_join(spark):
    """Dropping the unmatched-right rows from the full outer must
    reproduce ``left_join_on_timeout`` exactly, row for row — the
    symmetric operator strictly extends the core one."""
    lefts, rights = _scenarios()
    l, r = _df(spark, lefts), _df(spark, rights)
    full = full_outer_join_on_timeout(
        l, r, on=["sid", "key"], window=WINDOW_MS)
    left_rows = sorted(
        ((x["sid"], x["key"], x["value"], x["r_value"])
         for x in full.where("value IS NOT NULL").collect()),
        key=lambda t: (t[0], t[1], t[2], t[3] or ""))
    core = sorted(
        ((x["sid"], x["key"], x["value"], x["r_value"])
         for x in left_join_on_timeout(
             l, r, on=["sid", "key"], window=WINDOW_MS).collect()),
        key=lambda t: (t[0], t[1], t[2], t[3] or ""))
    assert left_rows == core
