"""Brute-force completeness fuzz for the per-key-class dynamic-window
join (VERDICT r4 item 6) — the treatment the containment join got in
``tests/test_span_containment.py``, applied to
``dynamic_left_join_on_timeout``.

Design: one Spark job covers 200+ independent random scenarios — each
scenario is a (scenario_id, key)-scoped event set with its own per-key
window class — by folding ``scenario_id`` into the join key. The
per-row brute-force evaluator recomputes every scenario in plain
Python; the multisets must match exactly. Scenario batches deliberately
include boundary rights at exactly ``|Δts| == window`` (must match) and
``window + 1 ms`` (must not).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from left_join_on_timeout_spark.operators.timeout_join import (
    dynamic_left_join_on_timeout,
)

BASE = dt.datetime(2024, 1, 1)
N_SCENARIOS = 220
SEED = 20260814

# window class for (scenario, key): one of 5 tiers, 500..2500 ms —
# mirrored EXACTLY by the brute force below
WINDOW_TIERS_MS = [500, 1000, 1500, 2000, 2500]


def _window_ms(sid: int, key: int) -> int:
    return WINDOW_TIERS_MS[(sid * 7 + key * 3) % len(WINDOW_TIERS_MS)]


def _scenarios():
    rng = random.Random(SEED)
    lefts, rights = [], []
    for sid in range(N_SCENARIOS):
        for i in range(rng.randint(1, 6)):
            key = rng.randint(0, 2)
            lefts.append((sid, key, f"L{sid}_{i}", rng.randint(0, 5000)))
        for i in range(rng.randint(0, 6)):
            key = rng.randint(0, 2)
            rights.append((sid, key, f"R{sid}_{i}", rng.randint(0, 5000)))
        # adversarial boundary rights anchored to a random left of this
        # scenario: exactly at the window edge (match) and 1 ms past
        # (no match)
        mine = [l for l in lefts if l[0] == sid]
        if mine and rng.random() < 0.5:
            _, key, _, lts = rng.choice(mine)
            w = _window_ms(sid, key)
            sign = rng.choice((-1, 1))
            rights.append((sid, key, f"Rb{sid}_on", lts + sign * w))
            rights.append((sid, key, f"Rb{sid}_off", lts + sign * (w + 1)))
    return lefts, rights


def _brute_force(lefts, rights):
    by_sk: dict[tuple[int, int], list] = {}
    for sid, key, val, ts in rights:
        by_sk.setdefault((sid, key), []).append((val, ts))
    expected = []
    for sid, key, lval, lts in lefts:
        w = _window_ms(sid, key)
        matches = [rval for rval, rts in by_sk.get((sid, key), [])
                   if abs(rts - lts) <= w]
        expected += ([(sid, key, lval, rval) for rval in matches]
                     or [(sid, key, lval, None)])
    return sorted(expected, key=lambda t: (t[0], t[1], t[2], t[3] or ""))


def test_dynamic_window_join_matches_bruteforce(spark):
    lefts, rights = _scenarios()
    schema = "sid INT, key INT, value STRING, ts TIMESTAMP"

    def df(rows):
        return spark.createDataFrame(
            [(sid, key, val, BASE + dt.timedelta(milliseconds=ms))
             for sid, key, val, ms in rows], schema)

    wcol = F.element_at(
        F.array(*[F.lit(w) for w in WINDOW_TIERS_MS]),
        (F.pmod(F.col("sid") * 7 + F.col("key") * 3,
                F.lit(len(WINDOW_TIERS_MS))) + 1).cast("int"))
    out = dynamic_left_join_on_timeout(
        df(lefts), df(rights), on=["sid", "key"], window_ms=wcol)
    got = sorted(((r["sid"], r["key"], r["value"], r["r_value"])
                  for r in out.collect()),
                 key=lambda t: (t[0], t[1], t[2], t[3] or ""))
    assert got == _brute_force(lefts, rights)
    # every left emits at least once (matched or null-padded) — the
    # reference's core contract, per scenario
    n_lefts = len({(sid, key, val) for sid, key, val, _ in lefts})
    assert len({(s, k, v) for s, k, v, _ in got}) == n_lefts


def test_dynamic_window_degenerates_to_constant(spark):
    """With a constant window Column the dynamic operator must equal the
    constant-window operator row for row."""
    from left_join_on_timeout_spark.operators.timeout_join import (
        left_join_on_timeout,
    )

    rng = random.Random(SEED + 1)
    schema = "key INT, value STRING, ts TIMESTAMP"

    def df(tag, n):
        return spark.createDataFrame(
            [(rng.randint(0, 2), f"{tag}{i}",
              BASE + dt.timedelta(milliseconds=rng.randint(0, 4000)))
             for i in range(n)], schema)

    l, r = df("L", 25), df("R", 25)
    dyn = dynamic_left_join_on_timeout(
        l, r, on="key", window_ms=F.lit(1000))
    const = left_join_on_timeout(l, r, on="key", window="1 second")
    key = ["key", "value", "r_value"]
    assert (sorted(map(tuple, dyn.select(*key).collect()))
            == sorted(map(tuple, const.select(*key).collect())))
