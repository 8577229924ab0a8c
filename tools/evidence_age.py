"""Evidence-staleness report for the driver window (VERDICT r6 item 4).

The driver adjudicates ~the first 50 registry names per round; union
coverage is total since r6, so the successor problem is *staleness* —
a name whose last driver-green row is many rounds old while code under
it churns. This tool reads every ``CORRECTNESS_r*.json``, computes each
registered query's latest green round, and prints the 50-name window
the next round should front-load: never-adjudicated names first (new
queries always adjudicate inside the window), then oldest vintage
first, alphabetical within a vintage (deterministic).

Usage: python tools/evidence_age.py [window_size]
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            ok = (row.get("err") is None and row.get("rows_match")
                  and row.get("hash_match") is not False)
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from left_join_on_timeout_spark import queries as q

    latest = latest_green()
    ages = sorted((latest.get(n, 0), n) for n in q.QUERIES)
    print(f"# registered: {len(ages)}; window: {window}")
    for vintage in sorted({a for a, _ in ages}):
        n = sum(1 for a, _ in ages if a == vintage)
        print(f"# vintage r{vintage}: {n} names")
    print("# window (oldest evidence first):")
    for a, n in ages[:window]:
        print(f'    "{n}",  # r{a}' if a else f'    "{n}",  # NEW')


if __name__ == "__main__":
    main()
