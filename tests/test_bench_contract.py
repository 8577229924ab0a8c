"""The bench.py ↔ driver contract (VERDICT r5 "What's wrong" #1): the
driver records only the last ~2000 chars of stdout and json-parses that
tail, so the printed line must always fit it with the summary fields
present — regardless of how many headline queries exist or how slow a
round is. No Spark needed: the line builder is pure."""

from __future__ import annotations

import json

import bench


def _check(timings):
    total = round(sum(timings.values()), 3)
    line = bench.build_line(timings, total, total, 0.1)
    assert len(line) <= 2000
    d = json.loads(line)
    # summary fields survive and lead the object
    keys = list(d)
    assert keys.index("value") < keys.index("queries")
    assert d["value"] == total
    assert "shared_with_prev_total_sec" in d
    assert d["queries_n"] == len(timings)
    # printed entries are the heaviest ones
    if d["queries"]:
        printed_min = min(d["queries"].values())
        omitted = [v for k, v in timings.items() if k not in d["queries"]]
        assert all(round(v, 2) <= printed_min + 0.01 for v in omitted)
    return d


def test_current_headline_set_fits():
    _check({n: 1.234 for n in bench.HEADLINE})


def test_pathological_round_still_fits():
    # every query slow (4-digit seconds) and twice today's query count
    names = bench.HEADLINE + [f"future_query_name_{i:02d}" for i in range(80)]
    d = _check({n: 1234.567 for n in names})
    assert len(d["queries"]) < len(names)  # truncation happened, loudly


def test_headline_queries_are_registered():
    from left_join_on_timeout_spark import queries as q

    missing = [n for n in bench.HEADLINE if n not in q.QUERIES]
    assert not missing
