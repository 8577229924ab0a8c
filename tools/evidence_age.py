"""Evidence-staleness report for the driver window (VERDICT r6 item 4).

The driver adjudicates ~the first 50 registry names per round; union
coverage is total since r6, so the successor problem is *staleness* —
a name whose last driver-green row is many rounds old while code under
it churns. This tool reads every ``CORRECTNESS_r*.json``, computes each
registered query's latest green round, and prints the 50-name window
the next round should front-load: never-adjudicated names first (new
queries always adjudicate inside the window), then oldest vintage
first, alphabetical within a vintage (deterministic).

ADVICE r7 rule: names whose OPERATOR OR ORACLE code paths changed this
round must re-adjudicate regardless of age — pass them as
``--sentinel name,name,...`` and they are hoisted to the window's
front (after never-adjudicated names), displacing the youngest tail.
A semantics change must never ship with only local test coverage.

Usage: python tools/evidence_age.py [window_size] [--sentinel a,b,c]
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    window = int(args[0]) if args else 50
    sentinels: list[str] = []
    for i, a in enumerate(sys.argv[1:], 1):
        if a == "--sentinel" and i < len(sys.argv) - 1:
            sentinels = sys.argv[i + 1].split(",")
        elif a.startswith("--sentinel="):
            sentinels = a.split("=", 1)[1].split(",")
    from left_join_on_timeout_spark import queries as q

    latest = latest_green()
    unknown = [s for s in sentinels if s not in q.QUERIES]
    assert not unknown, f"unknown sentinel names: {unknown}"
    ages = sorted((latest.get(n, 0), n) for n in q.QUERIES)
    # never-adjudicated first, then changed-path sentinels, then oldest
    new = [(a, n) for a, n in ages if a == 0]
    sent = [(a, n) for a, n in ages
            if a > 0 and n in set(sentinels)]
    rest = [(a, n) for a, n in ages
            if a > 0 and n not in set(sentinels)]
    ordered = new + sent + rest
    print(f"# registered: {len(ages)}; window: {window}; "
          f"sentinels: {len(sent)}")
    for vintage in sorted({a for a, _ in ages}):
        n = sum(1 for a, _ in ages if a == vintage)
        print(f"# vintage r{vintage}: {n} names")
    print("# window (new, then changed-path sentinels, then oldest):")
    for a, n in ordered[:window]:
        tag = "NEW" if a == 0 else (
            f"r{a} SENTINEL" if n in set(sentinels) else f"r{a}")
        print(f'    "{n}",  # {tag}')


if __name__ == "__main__":
    main()
