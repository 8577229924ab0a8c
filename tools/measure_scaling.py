#!/usr/bin/env python
"""Steady-state wall time for the PLANS.md heavy queries at a given
sf_dir — the measurement half of the scaling study (VERDICT r3 item 5).

Each query gets one warm-up run then two timed runs; the minimum is
reported (same discipline as bench.py). Output: one JSON line
{"sf_dir": ..., "queries": {name: sec}}.

Usage: python tools/measure_scaling.py <sf_dir> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from left_join_on_timeout_spark import queries as q
from left_join_on_timeout_spark.session import get_spark

HEAVY = [
    "dedup_cc_clusters",
    "ann_top1_srp",
    "ann_top1_ivf",
    "ivf_kmeans_cells",
    "dedup_minhash_lsh",
    "dedup_edit_distance",
    "tfidf_top_terms",
    "dedup_lsh_jaccard",
    "text_token_entropy",
]


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    q.QUERIES[name](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or HEAVY
    spark = get_spark(app_name="measure_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    timings = {}
    for n in names:
        run_query(spark, n, sf_dir)  # warm
        t = min(run_query(spark, n, sf_dir), run_query(spark, n, sf_dir))
        timings[n] = round(t, 3)
        print(f"# {n}: {timings[n]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
